"""Query entries for the spatial join operators (PIP, k-ring kNN).

kNN is SQL-checked: coordinates are INTEGERS so squared distances are
exact in both engines and the (dist, neighbor_id) ordering cannot diverge
on float rounding; the output carries rank, not the float distance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..grid import Extents
from ..stages import spatial

WORLD = Extents(0.0, 0.0, 1024.0, 1024.0)


def _points(sf_dir: str) -> ray.data.Dataset:
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])

    def f(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].to_numpy()
        return pa.table({"point_id": pa.array(ck),
                         "x": pa.array(((ck * 13) % 1000).astype(np.float64)),
                         "y": pa.array(((ck * 29) % 900).astype(np.float64))})

    return cust.map_batches(f, batch_format="pyarrow")


def q_knn_kring(sf_dir: str) -> pd.DataFrame:
    """k=5 nearest customer-points per supplier-query via k-ring cell
    expansion (sorted-cell kNN of the north rule)."""
    import pyarrow.parquet as pq
    st = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    sk = st["s_suppkey"].to_numpy()
    queries = pd.DataFrame({"query_id": sk.astype(np.int64),
                            "x": ((sk * 37) % 1000).astype(np.float64),
                            "y": ((sk * 53) % 900).astype(np.float64)})
    out = spatial.knn_kring(_points(sf_dir), queries, k=5, world=WORLD, lod=5)
    return out[["query_id", "neighbor_id", "rank"]]


SQL_KNN_KRING = """
WITH pts AS (
  SELECT c_custkey AS point_id,
         CAST((c_custkey * 13) % 1000 AS DOUBLE) AS x,
         CAST((c_custkey * 29) % 900 AS DOUBLE) AS y
  FROM customer
), q AS (
  SELECT s_suppkey AS query_id,
         CAST((s_suppkey * 37) % 1000 AS DOUBLE) AS x,
         CAST((s_suppkey * 53) % 900 AS DOUBLE) AS y
  FROM supplier
), d AS (
  SELECT q.query_id, pts.point_id AS neighbor_id,
         (pts.x - q.x) * (pts.x - q.x) + (pts.y - q.y) * (pts.y - q.y) AS d2
  FROM q CROSS JOIN pts
), r AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY d2, neighbor_id) AS rank
  FROM d
)
SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 5
"""


def _star_polygons(n: int = 8) -> list[tuple[int, list[np.ndarray]]]:
    rng = np.random.default_rng(42)
    out = []
    for pid in range(n):
        cx = float(rng.uniform(150, 900))
        cy = float(rng.uniform(150, 750))
        ang = np.sort(rng.uniform(0, 2 * np.pi, 10))
        rad = rng.uniform(40, 120, 10)
        ring = np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)
        out.append((pid, [ring]))
    return out


def _pip_poly_sql() -> str:
    """DuckDB twin of the CONCAVE-polygon PIP: the exact even-odd
    crossing predicate of spatial.points_in_ring, evaluated edge-by-edge
    (same expression tree, so IEEE double results are bit-identical; the
    fixture's integer points never sit on the irrational star edges).
    Proves the general ray-cast path — not just the rect fast path — at
    hash level."""
    rows = []
    for pid, rings in _star_polygons():
        ring = rings[0]
        rx, ry = ring[:, 0], ring[:, 1]
        for i in range(len(rx)):
            j = (i + 1) % len(rx)
            # float() first: repr(np.float64) under NumPy >= 2.0 renders
            # 'np.float64(1.5)' — invalid SQL; builtin float repr is stable
            rows.append(f"({pid}, {float(rx[i])!r}, {float(ry[i])!r}, "
                        f"{float(rx[j])!r}, {float(ry[j])!r})")
    values = ",\n    ".join(rows)
    return f"""
WITH pts AS (
  SELECT c_custkey AS point_id,
         CAST((c_custkey * 13) % 1000 AS DOUBLE) AS x,
         CAST((c_custkey * 29) % 900 AS DOUBLE) AS y
  FROM customer
), edges(poly_id, x1, y1, x2, y2) AS (
  VALUES {values}
), inside AS (
  SELECT e.poly_id, p.point_id
  FROM pts p JOIN edges e
    ON ((e.y1 > p.y) != (e.y2 > p.y))
   AND p.x < e.x1 + (p.y - e.y1) / (e.y2 - e.y1) * (e.x2 - e.x1)
  GROUP BY e.poly_id, p.point_id
  HAVING count(*) % 2 = 1
)
SELECT CAST(poly_id AS BIGINT) AS poly_id,
       CAST(count(*) AS BIGINT) AS n_points
FROM inside GROUP BY poly_id
"""


def q_pip_poly(sf_dir: str) -> ray.data.Dataset:
    """General-polygon PIP with cell prefilter: customer points vs 8 seeded
    star polygons -> match count per polygon, SQL-checked against the
    exact even-odd crossing predicate (see _pip_poly_sql)."""
    from ray.data.aggregate import Count

    matches = spatial.pip_join(_points(sf_dir), _star_polygons(), WORLD, lod=4)
    return matches.groupby("poly_id").aggregate(Count(alias_name="n_points"))


def q_pip_shuffle(sf_dir: str) -> ray.data.Dataset:
    """Both-sides-large PIP: the same 8 star polygons as pip_poly but
    shipped as a DATASET through the cell-cogroup plan
    (stages.spatial.pip_join_shuffle) — per-polygon match counts must
    equal pip_poly's (cross-plan parity is tested in test_spatial.py)."""
    from ray.data.aggregate import Count

    polys = _star_polygons()
    poly_ds = ray.data.from_arrow(pa.table({
        "poly_id": pa.array([p for p, _ in polys], pa.int64()),
        "rings": pa.array([spatial.pack_rings(r) for _, r in polys],
                          pa.large_binary())}))
    matches = spatial.pip_join_shuffle(_points(sf_dir), poly_ds, WORLD,
                                       lod=4)
    return matches.groupby("poly_id").aggregate(Count(alias_name="n_points"))


def _zonal_polys():
    """Polygon list alone — import-time safe (no Ray, no raster)."""
    return [
        (1, [np.array([[100.0, 100.0], [700.0, 150.0], [300.0, 800.0]])]),
        (2, [np.array([[500.0, 500.0], [1000.0, 500.0],
                       [1000.0, 1000.0], [500.0, 1000.0]]),
             np.array([[600.0, 600.0], [800.0, 600.0],
                       [800.0, 800.0], [600.0, 800.0]])]),
    ]


def _zonal_fixture():
    import ray.data

    from ..grid import Extents

    world = Extents(0.0, 0.0, 1024.0, 1024.0)
    # integer-valued closed form of the pixel address: exact float64 sums
    # in ANY aggregation order, and a SQL oracle can recompute every pixel
    gx, gy = np.meshgrid(np.arange(1024, dtype=np.int64),
                         np.arange(1024, dtype=np.int64))
    full = ((gx * 7919 + gy * 104729) % 100001).astype(np.float64)
    rows = []
    for ty in range(4):
        for tx in range(4):
            block = full[ty*256:(ty+1)*256, tx*256:(tx+1)*256]
            rows.append({"lod": 2, "band": 0, "tile_x": tx, "tile_y": ty,
                         "valid_w": 256, "valid_h": 256, "dtype": "float64",
                         "px": block.tobytes()})
    tiles = ray.data.from_items(rows)
    return tiles, _zonal_polys(), world


def q_zonal_stats(sf_dir: str):
    """Raster<->vector join: per-polygon pixel stats over a deterministic
    4x4-tile raster. SQL-checked at hash level (the oracle recomputes
    every pixel of the closed-form raster and applies the identical
    crossing predicate, _zonal_sql); NumPy full-raster parity in
    tests/test_spatial.py."""
    from ..stages.spatial import zonal_stats

    tiles, polys, world = _zonal_fixture()
    return zonal_stats(tiles, polys, world, 2)


def q_zonal_shuffle(sf_dir: str):
    """Same raster<->vector join through the both-sides-large plan
    (polygons as a Dataset, cell cogroup) — SQL-checked against the same
    oracle as q_zonal_stats (and cross-plan parity-tested)."""
    import ray.data

    from ..stages.spatial import pack_rings, zonal_stats_shuffle

    tiles, polys, world = _zonal_fixture()
    poly_ds = ray.data.from_arrow(pa.table({
        "poly_id": pa.array([p for p, _ in polys], pa.int64()),
        "rings": pa.array([pack_rings(r) for _, r in polys],
                          pa.large_binary())}))
    return zonal_stats_shuffle(tiles, poly_ds, world, 2)


# built after _star_polygons exists; shared by pip_poly and pip_shuffle
SQL_PIP_POLY = _pip_poly_sql()


def _zonal_sql() -> str:
    """DuckDB twin of the zonal raster<->vector join: recompute every
    pixel of the closed-form fixture raster, apply the IDENTICAL even-odd
    crossing predicate to the pixel centers (y is top-down:
    y = 1023.5 - row), and aggregate. Pixel values are integers, so the
    float64 sums are exact in any order — hash-stable across engines."""
    polys = _zonal_polys()
    rows = []
    for pid, rings in polys:
        for ring in rings:               # hole rings join the same parity
            rx, ry = ring[:, 0], ring[:, 1]
            for i in range(len(rx)):
                j = (i + 1) % len(rx)
                rows.append(f"({pid}, {float(rx[i])!r}, {float(ry[i])!r}, "
                            f"{float(rx[j])!r}, {float(ry[j])!r})")
    values = ",\n    ".join(rows)
    return f"""
WITH px AS (
  SELECT CAST(i % 1024 AS BIGINT) AS gx,
         CAST(i // 1024 AS BIGINT) AS gy,
         ((i % 1024) * 7919 + (i // 1024) * 104729) % 100001 AS v
  FROM range(1048576) t(i)
), pts AS (
  SELECT gx + 0.5 AS x, 1023.5 - gy AS y, CAST(v AS DOUBLE) AS v FROM px
), edges(poly_id, x1, y1, x2, y2) AS (
  VALUES {values}
), inside AS (
  SELECT e.poly_id, p.x, p.y, any_value(p.v) AS v
  FROM pts p JOIN edges e
    ON ((e.y1 > p.y) != (e.y2 > p.y))
   AND p.x < e.x1 + (p.y - e.y1) / (e.y2 - e.y1) * (e.x2 - e.x1)
  GROUP BY e.poly_id, p.x, p.y
  HAVING count(*) % 2 = 1
)
SELECT CAST(poly_id AS BIGINT) AS poly_id,
       CAST(count(*) AS BIGINT) AS n_px,
       CAST(sum(v) AS DOUBLE) AS px_sum,
       min(v) AS px_min, max(v) AS px_max
FROM inside GROUP BY poly_id
"""


SQL_ZONAL = _zonal_sql()


def q_hex_assign(sf_dir: str) -> ray.data.Dataset:
    """H3-style hexagonal cell assignment (stages/spatial.hex_bin): the
    hex analog of tile_assign — customer-derived integer points bin to
    the nearest center of two interleaved lattices (exact int64
    arithmetic, no sqrt(3), no float borders), counts per hex cell.
    Per-batch partial counts pre-aggregate before the groupby (the
    combiner discipline)."""
    from ray.data.aggregate import Sum

    from ..stages.spatial import hex_bin

    DX, DY = 40, 60
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey"])

    def partial(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].to_numpy().astype(np.int64)
        x = (ck * 13) % 1000
        y = (ck * 29) % 900
        lat, i, j = hex_bin(x, y, dx=DX, dy=DY)
        key = lat * (1 << 60) + i * (1 << 30) + j
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"hex_key": pa.array(uk),
                         "n": pa.array(cnt.astype(np.int64))})

    agg = cust.map_batches(partial, batch_format="pyarrow") \
        .groupby("hex_key").aggregate(Sum("n", alias_name="n_points"))

    def unpack(b: pa.Table) -> pa.Table:
        k = b["hex_key"].to_numpy()
        return pa.table({
            "hex_key": b["hex_key"],
            "lattice": pa.array(k >> 60),
            "hex_i": pa.array((k >> 30) & ((1 << 30) - 1)),
            "hex_j": pa.array(k & ((1 << 30) - 1)),
            "n_points": b["n_points"]})

    return agg.map_batches(unpack, batch_format="pyarrow",
                           batch_size=None)


# integer twin of hex_bin: all points are NON-NEGATIVE here, so
# DuckDB's truncating // equals numpy's floor //; the tie rule
# (d1 <= d2 -> lattice A) is pinned identically
SQL_HEX_ASSIGN = """
WITH pts AS (
  SELECT (c_custkey * 13) % 1000 AS x, (c_custkey * 29) % 900 AS y
  FROM customer
), cand AS (
  SELECT x, y,
         80 * ((x + 40) // 80) AS cx1, 120 * ((y + 60) // 120) AS cy1,
         80 * (x // 80) + 40 AS cx2, 120 * (y // 120) + 60 AS cy2
  FROM pts
), assigned AS (
  SELECT CASE WHEN d1 <= d2 THEN 0 ELSE 1 END AS lattice,
         CASE WHEN d1 <= d2 THEN cx1 // 80 ELSE (cx2 - 40) // 80 END AS i,
         CASE WHEN d1 <= d2 THEN cy1 // 120 ELSE (cy2 - 60) // 120 END AS j
  FROM (SELECT *,
               ((x - cx1) * 60) * ((x - cx1) * 60)
               + ((y - cy1) * 40) * ((y - cy1) * 40) AS d1,
               ((x - cx2) * 60) * ((x - cx2) * 60)
               + ((y - cy2) * 40) * ((y - cy2) * 40) AS d2
        FROM cand)
)
SELECT lattice * 1152921504606846976 + i * 1073741824 + j AS hex_key,
       CAST(lattice AS BIGINT) AS lattice,
       CAST(i AS BIGINT) AS hex_i, CAST(j AS BIGINT) AS hex_j,
       CAST(count(*) AS BIGINT) AS n_points
FROM assigned GROUP BY 1, 2, 3, 4
"""
