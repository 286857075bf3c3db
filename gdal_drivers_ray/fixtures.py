"""Deterministic synthetic ``images`` table per BASELINE.json ``input_hint``.

Schema: (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64). Each ``image_id`` maps deterministically to a
tile address (lod, x, y), giving ground truth for tile-assignment and join
checks (FIXTURES.md F1). Every 97th row duplicates an earlier image's pixels
(and phash) for dedup tests. Seed is fixed; no external data.

Lance is unavailable in this container, so the table is written as parquet
(FIXTURES.md: "parquet mirror acceptable"); the read path is format-agnostic
(`ray.data.read_parquet` today, `read_lance` on a cluster).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import codecs
from .grid import Extents

SEED = 42
DUP_EVERY = 97
WORLD = Extents(0.0, 0.0, 4096.0, 4096.0)  # fixture world extents

_ADJ = ["quiet", "vivid", "pale", "dense", "rough", "smooth", "bright", "dim"]
_NOUN = ["field", "coast", "ridge", "delta", "forest", "dune", "glacier", "mesa"]


def lod_for_count(n: int) -> int:
    """Smallest lod whose 2^lod × 2^lod grid holds n tiles."""
    return max(1, math.ceil(math.log(max(n, 1), 4)))


def tile_addr_of(i: int, lod: int) -> tuple[int, int, int]:
    """Deterministic image index -> (lod, x, y): row-major over the grid."""
    side = 1 << lod
    return lod, i % side, (i // side) % side


def caption_of(i: int, lod: int) -> str:
    z, x, y = tile_addr_of(i, lod)
    return f"tile {z}/{x}/{y} {_ADJ[i % len(_ADJ)]} {_NOUN[i % len(_NOUN)]}"


def make_tile_pixels(i: int, h: int = 256, w: int = 256) -> np.ndarray:
    """Seeded gradient + checker pattern parameterized by i (FIXTURES.md F1)."""
    yy, xx = np.mgrid[0:h, 0:w]
    gx = (i * 37) % 251
    gy = (i * 91) % 241
    grad = ((xx * gx // max(w, 1)) + (yy * gy // max(h, 1))) % 256
    checker = (((xx >> 4) ^ (yy >> 4)) & 1) * ((i * 53) % 97)
    return ((grad + checker) % 256).astype(np.uint8)


def image_row(i: int, lod: int) -> dict:
    # every 97th row repeats an earlier image's *pixels* (and phash) for
    # dedup tests; caption/tile address stay the row's own
    src = i - (i % DUP_EVERY == 0 and i > 0) * DUP_EVERY
    px = make_tile_pixels(src)
    fmt = "png" if i % 2 == 0 else "jpeg"
    return {
        "image_id": f"img-{i:08d}",
        "bytes": codecs.encode_image(px, fmt),
        "w": np.int32(px.shape[1]),
        "h": np.int32(px.shape[0]),
        "fmt": fmt,
        "caption": caption_of(i, lod),
        "phash": codecs.phash64(px),
    }


def _rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.table({
        "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
        "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
        "w": pa.array([r["w"] for r in rows], pa.int32()),
        "h": pa.array([r["h"] for r in rows], pa.int32()),
        "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
        "caption": pa.array([r["caption"] for r in rows], pa.string()),
        "phash": pa.array([r["phash"] for r in rows], pa.int64()),
    })


def make_images_table_slice(start: int, stop: int, lod: int) -> pa.Table:
    """Rows [start, stop) — identical to the same slice of
    make_images_table (image_row is per-index deterministic)."""
    return _rows_to_table([image_row(i, lod) for i in range(start, stop)])


def make_images_table(n: int, lod: int | None = None) -> pa.Table:
    lod = lod if lod is not None else lod_for_count(n)
    return _rows_to_table([image_row(i, lod) for i in range(n)])


def count_rows(path: str) -> int:
    """Row count of a parquet file OR multi-file directory (footers only)."""
    if os.path.isdir(path):
        return sum(pq.read_metadata(os.path.join(path, f)).num_rows
                   for f in os.listdir(path) if f.endswith(".parquet"))
    return pq.read_metadata(path).num_rows


def write_images_parquet(path: str, n: int, lod: int | None = None,
                         rows_per_file: int = 2048) -> str:
    """Write (and cache) the fixture as a DIRECTORY of ~2048-row parquet
    files — the many-fragments layout a real 100 TB input has, and what
    lets ray.data.read_parquet fan the read out across tasks (a single
    file is read by ONE task regardless of row groups; measured 2.7s
    serial at 64k rows). Idempotent on matching row count.

    Rows are PER-INDEX deterministic (image_row), so each output file is
    built by its own Ray task when a session is up (~N_cores faster for
    the 64k+ scaling fixtures); the serial path is the no-Ray fallback
    and produces byte-identical files."""
    if os.path.exists(path):
        try:
            if count_rows(path) == n:
                return path
        except Exception:
            pass
        import shutil
        shutil.rmtree(path, ignore_errors=True)
        if os.path.isfile(path):
            os.unlink(path)
    os.makedirs(path, exist_ok=True)
    lod = lod if lod is not None else lod_for_count(n)
    starts = list(range(0, n, rows_per_file))

    import ray
    if ray.is_initialized() and len(starts) > 1:
        @ray.remote(num_cpus=1)
        def _write_file(fi: int, start: int) -> None:
            t = make_images_table_slice(start, min(start + rows_per_file, n),
                                        lod)
            pq.write_table(t, os.path.join(path, f"part-{fi:05d}.parquet"))

        ray.get([_write_file.remote(fi, s) for fi, s in enumerate(starts)])
        return path

    t = make_images_table(n, lod)
    for fi, start in enumerate(starts):
        pq.write_table(t.slice(start, rows_per_file),
                       os.path.join(path, f"part-{fi:05d}.parquet"))
    return path


def images_path_for(sf_dir: str, n: int | None = None) -> str:
    """Deterministic per-sf images fixture under /tmp, sized to the sf
    (sf0.001 -> 1k rows, sf0.01 -> 4k, sf0.1 -> 16k)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    if n is None:
        n = {"sf0.001": 1000, "sf0.01": 4000, "sf0.1": 16000}.get(tag, 1000)
    path = f"/tmp/graft_fixtures/{tag}/images_{n}"
    return write_images_parquet(path, n)
