"""Flagship pipeline: image+caption table -> decoded tile index.

The end-to-end slice of SURVEY.md §7.3: read the input_hint table, decode
tile bytes on an actor pool over zero-copy Arrow batches, assign each tile
to its hierarchical grid cell, verify the per-row invariants (caption tile
address, phash of decoded pixels), and roll counts up one LOD
(groupby(parent) — the shuffle is over narrow feature rows only; pixels
never shuffle).

Reference counterparts: block decode solid.cpp:443-448 / blender.cpp:559-655,
LOD rollup solid.cpp:352-369, cell keying detail/mbtiles.cpp:128-225.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..grid import cell_parent
from ..stages.decode import DecodeImages


def tile_index(images_path: str, lod: int, *, concurrency=None,
               batch_size: int = 512, keep_pixels: bool = False) -> ray.data.Dataset:
    """images parquet -> per-tile feature Dataset (narrow unless keep_pixels).

    Read parallelism comes from the input being MANY FILES (one read task
    per fragment) — a single big file is read by one task regardless of
    row groups (measured 2.7s serial at 64k rows). Fixtures and outputs
    are multi-file directories for this reason; so is any real input."""
    from ..api import read_images
    ds = read_images(images_path)
    return ds.map_batches(
        DecodeImages(lod=lod, keep_pixels=keep_pixels),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def check_invariants(tiles: ray.data.Dataset) -> ray.data.Dataset:
    """Append boolean invariant columns (BASELINE.json per-row gates):
    `caption_ok` — caption names the tile's own (z/x/y) address;
    `phash_ok`   — recomputed phash equals the stored one exactly for
    lossless rows, within Hamming<=4 for the lossy stand-in."""

    def _check(batch: pa.Table) -> pa.Table:
        z = batch["lod"].to_numpy()
        tx = batch["tile_x"].to_numpy()
        ty = batch["tile_y"].to_numpy()
        # vectorized: parse the caption's own 'tile z/x/y ' address and
        # compare numerically (no per-row Python in the headline path)
        # digit cap keeps every captured value int64-castable; a longer
        # (corrupt) address simply fails the match -> caption_ok False
        m = pc.extract_regex(
            batch["caption"],
            r"^tile (?P<z>0|[1-9]\d{0,17})/(?P<x>0|[1-9]\d{0,17})"
            r"/(?P<y>0|[1-9]\d{0,17}) ")
        ok_shape = pc.is_valid(m).to_numpy(zero_copy_only=False)
        filled = [pc.cast(pc.fill_null(pc.struct_field(m, f), "0"),
                          pa.int64()).to_numpy(zero_copy_only=False)
                  for f in ("z", "x", "y")]
        cap_ok = ok_shape & (filled[0] == z) & (filled[1] == tx) \
            & (filled[2] == ty)
        from ..codecs import hamming64
        dist = hamming64(batch["phash"].to_numpy(), batch["stored_phash"].to_numpy())
        lossy = pc.equal(batch["fmt"], "jpeg").to_numpy(zero_copy_only=False)
        ph_ok = np.where(lossy, dist <= 4, dist == 0)
        return (batch.append_column("caption_ok", pa.array(cap_ok))
                     .append_column("phash_ok", pa.array(ph_ok)))

    return tiles.map_batches(_check, batch_format="pyarrow")


def lod_rollup(tiles: ray.data.Dataset) -> ray.data.Dataset:
    """Counts + mean brightness per parent cell (one LOD up). Pre-aggregates
    per batch before the groupby so the shuffle moves one row per parent
    cell per batch, not one per tile."""

    def partial(batch: pa.Table) -> pa.Table:
        parent = cell_parent(batch["cell"].to_numpy())
        order = np.argsort(parent, kind="stable")
        parent = parent[order]
        mean_px = batch["mean_px"].to_numpy()[order]
        keys, starts = np.unique(parent, return_index=True)
        sums = np.add.reduceat(mean_px, starts)
        cnts = np.diff(np.append(starts, len(parent)))
        return pa.table({"parent_cell": pa.array(keys),
                         "px_sum": pa.array(sums),
                         "n_tiles": pa.array(cnts.astype(np.int64))})

    partials = tiles.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum
    agg = partials.groupby("parent_cell").aggregate(
        Sum("px_sum", alias_name="px_sum"),
        Sum("n_tiles", alias_name="n_tiles"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        mean = pc.divide(batch["px_sum"], pc.cast(batch["n_tiles"], pa.float64()))
        return (batch.append_column("mean_px", mean)
                     .drop_columns(["px_sum"]))

    return agg.map_batches(finish, batch_format="pyarrow")


def flagship(images_path: str, lod: int, *, concurrency=None,
             batch_size: int = 512) -> ray.data.Dataset:
    """decode -> invariants -> narrow tile index (the driver smoke surface)."""
    tiles = tile_index(images_path, lod, concurrency=concurrency,
                       batch_size=batch_size)
    return check_invariants(tiles)


class IngestTiles:
    """Actor-pool ingest stage: the full per-tile work of a real LOD-build
    pipeline — decode, invariant phash, 2x2 box downsample, re-encode the
    child for the next LOD (solid.cpp:352-369 halving generalized to real
    payloads). Heavier than DecodeImages by design: it is the per-tile cost
    profile a production ingest has (decode + transform + encode), and the
    workload the scaling bench measures."""

    def __init__(self, lod: int):
        self.lod = lod

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .. import codecs
        ids = batch["image_id"].to_pylist()
        bufs = batch["bytes"].to_pylist()
        n = batch.num_rows
        phash = np.empty(n, dtype=np.int64)
        means = np.empty(n, dtype=np.float64)
        small_bytes: list[bytes] = []
        status: list[str] = []
        for i, b in enumerate(bufs):
            try:
                px = codecs.decode_image(b)
            except Exception:
                # poison-row quarantine: dead-letter row, not task failure
                status.append("decode_error")
                phash[i] = 0
                means[i] = 0.0
                small_bytes.append(b"")
                continue
            status.append("ok")
            phash[i] = codecs.phash64(px)
            means[i] = px.mean()
            h, w = px.shape[:2]
            sm = px[:h // 2 * 2, :w // 2 * 2].astype(np.float64) \
                .reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)) \
                .astype(px.dtype)
            small_bytes.append(codecs.encode_image(sm, "png"))
        idx = np.asarray([int(s.rsplit("-", 1)[1]) for s in ids],
                         dtype=np.int64)
        side = 1 << self.lod
        from ..grid import cell_id, cell_parent as _parent
        cell = cell_id(self.lod, idx % side, (idx // side) % side)
        return pa.table({
            "image_id": batch["image_id"],
            "cell": pa.array(cell),
            "parent_cell": pa.array(_parent(cell)),
            "phash": pa.array(phash),
            "mean_px": pa.array(means),
            "status": pa.array(status),
            "child_bytes": pa.array(small_bytes, type=pa.large_binary()),
        })


def ingest(images_path: str, lod: int, *, batch_size: int = 256,
           concurrency=None) -> ray.data.Dataset:
    """read -> IngestTiles actor pool -> narrow features + child tiles."""
    from ..api import read_images
    ds = read_images(images_path)
    return ds.map_batches(IngestTiles(lod), batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
