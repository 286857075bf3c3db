"""Query entries for the raster generator sources (solid, quadtree mask),
each with a DuckDB oracle:

- solid_tiles / solid_copy: constant tiles have CLOSED-FORM per-(lod,band)
  sums — the oracle recomputes the overview pyramid (round-halving,
  solid.cpp:352-369) and per-level pixel sums entirely in SQL via a
  recursive CTE. Nothing is copied from the pipeline output.
- lod_pyramid / mask_tiles: the fixtures are seeded arrays, so the oracle
  embeds a VALUES table computed by an INDEPENDENT NumPy re-derivation
  (full-raster 2x2 box downsample; per-level block all/any coverage) that
  never touches the engine's quadtree or shuffle code paths."""

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


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

# overview pyramid of the fixed 1536x1024 solid spec, recomputed in SQL:
# halve with round-half-away (floor(x/2 + 0.5), solid.cpp:352-369) while
# either dim stays >= tileSize; per (lod, band) a constant raster's pixel
# sum is value * w * h and its tile count is ceil(w/256)*ceil(h/256)
_LEVELS_CTE = """
WITH RECURSIVE lv(lod, w, h) AS (
  SELECT 0, 1536, 1024
  UNION ALL
  SELECT lod + 1,
         CAST(floor(w / 2.0 + 0.5) AS INTEGER),
         CAST(floor(h / 2.0 + 0.5) AS INTEGER)
  FROM lv
  WHERE floor(w / 2.0 + 0.5) >= 256 OR floor(h / 2.0 + 0.5) >= 256
)"""

SQL_SOLID_TILES = _LEVELS_CTE + """
, bands(band, val) AS (VALUES (0, 7.0), (1, 1.5))
SELECT CAST(lv.lod AS BIGINT) AS lod,
       CAST(b.band AS BIGINT) AS band,
       CAST(ceil(w / 256.0) * ceil(h / 256.0) AS BIGINT) AS n_tiles,
       CAST(b.val * w * h AS DOUBLE) AS px_sum
FROM lv, bands b
"""

SQL_SOLID_COPY = _LEVELS_CTE + """
SELECT CAST(lod AS BIGINT) AS lod,
       CAST(2 * ceil(w / 256.0) * ceil(h / 256.0) AS BIGINT) AS n_tiles,
       TRUE AS all_const
FROM lv
"""


def _sql_lod_pyramid() -> str:
    """Independent NumPy re-derivation of the pyramid checksums: repeated
    FULL-RASTER 2x2 box downsample (cast-first mean, truncating back to
    uint8 — blender.cpp:648-654 convertTo semantics) of the seeded base.
    Tile-aligned assembly in stages/pyramid.py must agree exactly."""
    rng = np.random.default_rng(77)
    arr = rng.integers(0, 255, (1024, 1024), dtype=np.uint8)

    def down(x: np.ndarray) -> np.ndarray:
        h, w = x.shape
        return x[:h // 2 * 2, :w // 2 * 2].astype(np.float64) \
            .reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)).astype(x.dtype)

    rows = []
    level = arr
    per_lod = {2: level}
    per_lod[1] = down(per_lod[2])
    per_lod[0] = down(per_lod[1])
    for lod in (0, 1, 2):
        m = per_lod[lod]
        n = (m.shape[0] // 256) * (m.shape[1] // 256)
        rows.append(f"({lod}, {n}, {int(m.astype(np.int64).sum())})")
    values = ",\n    ".join(rows)
    return f"""
SELECT CAST(lod AS BIGINT) AS lod,
       CAST(n_tiles AS BIGINT) AS n_tiles,
       CAST(px_sum AS BIGINT) AS px_sum
FROM (VALUES {values}) t(lod, n_tiles, px_sum)
"""


SQL_LOD_PYRAMID = _sql_lod_pyramid()


def _sql_mask_tiles() -> str:
    """Independent re-derivation of the quadtree-mask render counts from
    the base boolean array alone: at overview level v (tail = depth - v) a
    level pixel is WHITE iff its 2^tail x 2^tail full-res block is all
    true (a merged white quad at or above that level covers it), GRAY iff
    mixed (only sub-level-pixel white quads intersect -> the tribool
    indeterminate fill of mask.cpp:243-258), else black. No quadtree code
    involved."""
    rng = np.random.default_rng(42)
    size = 1024
    a = np.zeros((size, size), dtype=bool)
    for _ in range(16):
        x0, y0 = rng.integers(0, size - 128, 2)
        w, h = rng.integers(32, 256, 2)
        a[y0:y0 + h, x0:x0 + w] = True
    depth = 10
    rows = []
    for lv in range(depth + 1):
        s = 1 << (depth - lv)
        blocks = a.reshape(size // s, s, size // s, s)
        allw = blocks.all(axis=(1, 3))
        anyw = blocks.any(axis=(1, 3))
        rows.append(f"({lv}, {int(allw.sum())}, "
                    f"{int((anyw & ~allw).sum())})")
    values = ",\n    ".join(rows)
    return f"""
SELECT CAST(lod AS BIGINT) AS lod,
       CAST(white_px AS BIGINT) AS white_px,
       CAST(gray_px AS BIGINT) AS gray_px
FROM (VALUES {values}) t(lod, white_px, gray_px)
"""


SQL_MASK_TILES = _sql_mask_tiles()
