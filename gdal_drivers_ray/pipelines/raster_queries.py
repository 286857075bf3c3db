"""Rows-only query entries for the raster generator sources (solid, quadtree
mask). Binary tile generation is not SQL-expressible, so these have no
DuckDB oracle — correctness is covered by tests/test_solid_mask.py against
NumPy oracles; the driver records row-count stability."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from ..grid import Extents
from ..sources import mask as qm
from ..sources import solid


def _fixed_solid_spec() -> solid.SolidSpec:
    return solid.SolidSpec(
        srs="EPSG:3857", size=(1536, 1024),
        extents=Extents(0.0, 0.0, 1536.0, 1024.0),
        bands=[solid.Band(value=7.0, data_type="Byte"),
               solid.Band(value=1.5, data_type="Float32")])


def q_solid_tiles(sf_dir: str) -> ray.data.Dataset:
    """Solid generator smoke: per (lod, band) tile count + constant checksum
    (solid.cpp:443-448 block serving + solid.cpp:352-369 overviews)."""
    ds = solid.solid_dataset(_fixed_solid_spec())

    def stats(b: pa.Table) -> pa.Table:
        sums = []
        for px, dt, vw, vh in zip(b["px"].to_pylist(), b["dtype"].to_pylist(),
                                  b["valid_w"].to_numpy(), b["valid_h"].to_numpy()):
            arr = np.frombuffer(px, dtype=solid.DTYPES[dt]).reshape(256, 256)
            sums.append(float(arr[:vh, :vw].sum()))
        return pa.table({"lod": b["lod"], "band": b["band"],
                         "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                         "px_sum": pa.array(sums)})

    return ds.map_batches(stats, batch_format="pyarrow") \
             .groupby(["lod", "band"]).aggregate(
                 Sum("n", alias_name="n_tiles"),
                 Sum("px_sum", alias_name="px_sum"))


def _fixed_mask() -> bytes:
    rng = np.random.default_rng(42)
    size = 1024
    a = np.zeros((size, size), dtype=bool)
    for _ in range(16):
        x0, y0 = rng.integers(0, size - 128, 2)
        w, h = rng.integers(32, 256, 2)
        a[y0:y0 + h, x0:x0 + w] = True
    m = qm.mask_from_array(a, "EPSG:3857", Extents(0, 0, 1024, 1024))
    return qm.serialize(m)


def q_mask_tiles(sf_dir: str) -> ray.data.Dataset:
    """Quadtree-mask rasterizer smoke: white/gray pixel counts per level
    (mask.cpp:219-264 render, one overview per depth mask.cpp:168-174)."""
    buf = _fixed_mask()
    ds = qm.mask_tiles(buf)

    def stats(b: pa.Table) -> pa.Table:
        white, gray = [], []
        for px in b["px"].to_pylist():
            arr = np.frombuffer(px, np.uint8)
            white.append(int((arr == 0xFF).sum()))
            gray.append(int((arr == 0x80).sum()))
        return pa.table({"lod": b["lod"],
                         "white_px": pa.array(white, pa.int64()),
                         "gray_px": pa.array(gray, pa.int64())})

    return ds.map_batches(stats, batch_format="pyarrow") \
             .groupby("lod").aggregate(
                 Sum("white_px", alias_name="white_px"),
                 Sum("gray_px", alias_name="gray_px"))


def q_lod_pyramid(sf_dir: str) -> ray.data.Dataset:
    """Full-pixel LOD pyramid from a deterministic mask raster: per-level
    tile counts + pixel checksum (rows-only; pixel parity vs the NumPy
    oracle in tests/test_pyramid.py). M2 as groupby(parent).map_groups."""
    from ..stages import pyramid as P

    base = _fixed_mask_tiles_lod2()
    ds = P.build_pyramid(base, 2, top_lod=0)

    def stats(b: pa.Table) -> pa.Table:
        sums = []
        for px, dt in zip(b["px"].to_pylist(), b["dtype"].to_pylist()):
            arr = np.frombuffer(px, dtype=np.dtype(dt))
            sums.append(int(arr.astype(np.int64).sum()))
        return pa.table({"lod": b["lod"],
                         "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                         "px_sum": pa.array(sums, type=pa.int64())})

    return ds.map_batches(stats, batch_format="pyarrow") \
             .groupby("lod").aggregate(Sum("n", alias_name="n_tiles"),
                                       Sum("px_sum", alias_name="px_sum"))


def _fixed_mask_tiles_lod2() -> ray.data.Dataset:
    """Deterministic 1024x1024 uint8 raster as 16 tiles at lod 2."""
    import ray

    rng = np.random.default_rng(77)
    arr = rng.integers(0, 255, (1024, 1024), dtype=np.uint8)
    rows = []
    for ty in range(4):
        for tx in range(4):
            block = arr[ty * 256:(ty + 1) * 256, tx * 256:(tx + 1) * 256]
            rows.append({"lod": 2, "band": 0, "tile_x": tx, "tile_y": ty,
                         "valid_w": 256, "valid_h": 256, "dtype": "uint8",
                         "px": block.tobytes()})
    return ray.data.from_items(rows)


def q_solid_copy(sf_dir: str) -> ray.data.Dataset:
    """CreateCopy (S3, solid.cpp:276-328): derive a constant dataset from
    an existing tile source — same grid/schema, constant per band — then
    verify per-lod: every tile constant, the source grid preserved.
    Rows-only; the schema-preservation contract is what the aggregate
    checks."""
    src = solid.solid_dataset(_fixed_solid_spec())
    const = solid.create_copy(src, values=[7.0, 7.0, 7.0])

    def stats(b: pa.Table) -> pa.Table:
        ok = []
        for px, dt in zip(b["px"].to_pylist(), b["dtype"].to_pylist()):
            arr = np.frombuffer(px, dtype=solid.DTYPES[dt])
            ok.append(bool((arr == 7).all()))
        return pa.table({"lod": b["lod"],
                         "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                         "all_const": pa.array(ok)})

    from ray.data.aggregate import Min as _Min
    return const.map_batches(stats, batch_format="pyarrow") \
        .groupby("lod").aggregate(Sum("n", alias_name="n_tiles"),
                                  _Min("all_const", alias_name="all_const"))
