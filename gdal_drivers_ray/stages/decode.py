"""Tile decode + tile/cell assignment as a stateful Ray Data stage.

This is the engine's counterpart of the reference's per-block pull decode
(solid.cpp:443-448 / blender.cpp:559-655 read one 256x256 block at a time,
single-threaded): here one Arrow batch of encoded tiles is decoded per call,
and the stage runs as an actor pool (`map_batches(DecodeImages,
concurrency=N)`) so codec state lives once per worker — the reference's
open-handle reuse (blender.cpp:354-384, T3 in SURVEY.md §2.3).

Scale note (100 TB): the decoded pixel payload (64 KiB-512 KiB per tile)
NEVER enters a shuffle. The stage emits
  - narrow per-tile features (cell id, mean/std, phash) that downstream
    groupby/sort/join stages shuffle cheaply, and
  - optionally the decoded pixels as a `px` large_binary column for
    map-only consumers (LOD downsample, blend) that are written or
    re-grouped with explicit small batch sizes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import codecs
from ..grid import Extents, cell_id, pack_zxy, tile_of_points


class DecodeImages:
    """Actor-pool batch fn: encoded `bytes` -> decoded features (+pixels).

    Parameters
    ----------
    lod : grid level; image i occupies tile (i % 2^lod, (i // 2^lod) % 2^lod)
        per the fixture addressing (fixtures.tile_addr_of).
    keep_pixels : also emit the decoded pixel buffer (`px`, large_binary) and
        its dtype tag. Off for narrow analytics paths.
    """

    def __init__(self, lod: int = 5, keep_pixels: bool = False):
        # tile addresses derive purely from image_id index + lod — no
        # world-extents dependency exists (a former parameter suggested
        # one and was removed)
        self.lod = lod
        self.keep_pixels = keep_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch["image_id"].to_pylist()
        bufs = batch["bytes"].to_pylist()
        means = np.empty(n, dtype=np.float64)
        stds = np.empty(n, dtype=np.float64)
        phash = np.empty(n, dtype=np.int64)
        status: list[str] = []
        pxs: list[bytes] = []
        dts: list[str] = []
        for i, b in enumerate(bufs):
            # poison-row quarantine (SURVEY §4): a corrupt payload becomes a
            # dead-letter ROW (status='decode_error', zeroed features), not
            # a task failure — at 10^12 rows a single bad blob must never
            # kill a whole block's work or poison retries.
            try:
                px = codecs.decode_image(b)
            except Exception:
                status.append("decode_error")
                means[i] = 0.0
                stds[i] = 0.0
                phash[i] = 0
                if self.keep_pixels:
                    pxs.append(b"")
                    dts.append("")
                continue
            status.append("ok")
            means[i] = px.mean()
            stds[i] = px.std()
            phash[i] = codecs.phash64(px)
            if self.keep_pixels:
                pxs.append(px.tobytes())
                dts.append(str(px.dtype))
        # deterministic image index -> tile address (fixtures.tile_addr_of)
        idx = np.array([int(s.rsplit("-", 1)[-1]) for s in ids], dtype=np.int64)
        side = 1 << self.lod
        tx = idx % side
        ty = (idx // side) % side
        z = np.full(n, self.lod, dtype=np.int64)
        out = {
            "image_id": batch["image_id"],
            "caption": batch["caption"],
            "fmt": batch["fmt"],
            "stored_phash": batch["phash"],
            "lod": pa.array(z),
            "tile_x": pa.array(tx),
            "tile_y": pa.array(ty),
            "cell": pa.array(cell_id(z, tx, ty)),
            "cell_packed": pa.array(pack_zxy(z, tx, ty)),
            "mean_px": pa.array(means),
            "std_px": pa.array(stds),
            "phash": pa.array(phash),
            "status": pa.array(status),
        }
        if self.keep_pixels:
            out["px"] = pa.array(pxs, pa.large_binary())
            # the promised dtype tag: every TILE_SCHEMA px consumer zips
            # px with a dtype column to frombuffer the payload ("" for
            # decode_error rows — filter status first, as they do)
            out["dtype"] = pa.array(dts, pa.string())
        return pa.table(out)


def assign_points_batch(batch: pa.Table, world: Extents, lod_col: str,
                        x_col: str, y_col: str) -> pa.Table:
    """Vectorized point -> tile assignment for arbitrary point tables
    (the grid math of blender.cpp:449-463 applied batch-wise)."""
    z = batch[lod_col].to_numpy()
    tx, ty = tile_of_points(batch[x_col].to_numpy(), batch[y_col].to_numpy(),
                            world, z)
    return batch.append_column("tile_x", pa.array(tx)) \
                .append_column("tile_y", pa.array(ty)) \
                .append_column("cell_packed", pa.array(pack_zxy(z, tx, ty)))
