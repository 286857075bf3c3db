"""Vector-path query entries: MVT tile store -> keyed lookup -> protobuf
decode -> feature rows -> aggregates (the end-to-end trace of SURVEY.md
§3.2). Binary decode is not SQL-expressible -> rows-only driver check;
semantics are covered by tests/test_mvt.py and tests/test_tilestore.py."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Sum

from ..grid import Extents
from ..sources import mvt, tilestore


def _fixture_store(path: str, zoom: int = 3) -> str:
    """Deterministic MVT tile store: one tile per (col, row) at `zoom`, each
    with a points layer and a polygons layer sized by position."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = []
    side = 1 << zoom
    for c in range(side):
        for r in range(side):
            n_pts = 1 + (c + r) % 4
            pts = [[(100 * (i + 1), 200 * (i + 1)) for i in range(n_pts)]]
            sq = [(c * 10, r * 10), (c * 10 + 50, r * 10),
                  (c * 10 + 50, r * 10 + 50), (c * 10, r * 10 + 50),
                  (c * 10, r * 10)]
            layers = [
                {"name": "pts", "extent": 4096,
                 "keys": ["kind", "id"],
                 "values": [(1, "poi"), (4, c * side + r)],
                 "features": [{"type": mvt.GEOM_POINT,
                               "tags": [0, 0, 1, 1],
                               "geometry": mvt.geometry_stream(pts, mvt.GEOM_POINT)}]},
                {"name": "polys", "extent": 4096,
                 "features": [{"type": mvt.GEOM_POLYGON, "id": c,
                               "geometry": mvt.geometry_stream([sq], mvt.GEOM_POLYGON)}]},
            ]
            rows.append((zoom, c, r, mvt.encode_tile(layers)))
    return tilestore.write_store(path, rows)


def q_mvt_pipeline(sf_dir: str) -> ray.data.Dataset:
    """requests -> store lookup (TMS flip + gunzip) -> decode -> feature
    rows -> per-layer stats. Bad keys and misses flow to error rows."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    store = _fixture_store(f"/tmp/graft_fixtures/{tag}/mvt_store.parquet")
    zoom, side = 3, 8
    paths = [f"a.store/{zoom}-{c}-{r}" for c in range(side) for r in range(side)]
    paths += ["a.store/3-9-0", "a.store/3-01-2", "a.store/4-1-1"]  # errors
    reqs = ray.data.from_arrow(pa.table({"path": pa.array(paths)}))
    hits = tilestore.lookup(reqs, store)

    def explode(batch: pa.Table) -> pa.Table:
        ok = batch.filter(pa.compute.equal(batch["status"], "ok"))
        t = mvt.parse_tiles_batch(ok, extents=Extents(0, 0, 4096, 4096),
                                  bytes_col="tile_data", tile_id_col="path")
        nv = [sum(len(part) for part in g) for g in
              [[p for p in row] for row in t["geometry"].to_pylist()]]
        return t.append_column("n_vertices", pa.array(np.asarray(nv, np.int64)))

    feats = hits.map_batches(explode, batch_format="pyarrow")
    return feats.groupby(["layer", "geom_type"]).aggregate(
        Count(alias_name="n_features"),
        Sum("n_vertices", alias_name="n_vertices"),
        Max("fid", alias_name="max_fid"),
    )


def q_mvt_errors(sf_dir: str) -> ray.data.Dataset:
    """Dead-letter accounting for the same request stream: row counts per
    lookup status (the quarantine table of SURVEY.md §4)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    store = _fixture_store(f"/tmp/graft_fixtures/{tag}/mvt_store.parquet")
    zoom, side = 3, 8
    paths = [f"a.store/{zoom}-{c}-{r}" for c in range(side) for r in range(side)]
    paths += ["a.store/3-9-0", "a.store/3-01-2", "a.store/4-1-1"]
    reqs = ray.data.from_arrow(pa.table({"path": pa.array(paths)}))
    return tilestore.lookup(reqs, store).groupby("status").count()


# closed-form twin of q_mvt_pipeline, derived from the fixture DEFINITION
# (one pts feature of 1+(c+r)%4 points and one closed 5-vertex square
# polygon per tile; fid coalesces to the 'id' attribute for pts,
# mvt.cpp:569-581, and to feature.id = c for polys): per (layer,
# geom_type) the feature count, decoded vertex count (closePath re-appends
# the start point, mvt.cpp:316-349) and max fid are SQL over the tile grid
SQL_MVT_PIPELINE = """
WITH tiles AS (
  SELECT c.g AS c, r.g AS r
  FROM generate_series(0, 7) c(g), generate_series(0, 7) r(g)
)
SELECT 'pts' AS layer, CAST(1 AS BIGINT) AS geom_type,
       CAST(count(*) AS BIGINT) AS n_features,
       CAST(sum(1 + (c + r) % 4) AS BIGINT) AS n_vertices,
       CAST(max(c * 8 + r) AS BIGINT) AS max_fid
FROM tiles
UNION ALL
SELECT 'polys', CAST(3 AS BIGINT), CAST(count(*) AS BIGINT),
       CAST(count(*) * 5 AS BIGINT), CAST(max(c) AS BIGINT)
FROM tiles
"""

# the request stream is 64 valid keys + three planted errors whose
# statuses follow the strict-parse / bounds / lookup rules of
# detail/mbtiles.cpp:63-110 and :146-151: '3-9-0' exceeds 2^3-1 ->
# out_of_bounds, '3-01-2' has a leading zero -> bad_key, '4-1-1' names a
# zoom absent from the store -> not_found
SQL_MVT_ERRORS = """
SELECT status, CAST(n AS BIGINT) AS "count()"
FROM (VALUES ('ok', 64), ('bad_key', 1), ('not_found', 1),
             ('out_of_bounds', 1)) t(status, n)
"""


def q_vector_tiling(sf_dir: str):
    """Inverse vector path: deterministic features -> MVT tiles
    (flat_map cover -> groupby(tile) encode) -> decode back -> per-tile
    per-layer feature counts (rows-only; geometry round-trip parity in
    tests/test_vectortile.py)."""
    import pandas as pd

    from ..grid import Extents
    from ..stages import vectortile as VT

    world = Extents(0.0, 0.0, 1024.0, 1024.0)
    rng = np.random.default_rng(21)
    rows = []
    for i in range(200):
        x, y = rng.uniform(0, 1024, 2)
        if i % 3 == 0:
            geom = [[{"x": x, "y": y}]]
            gt = 1
        elif i % 3 == 1:
            geom = [[{"x": x, "y": y},
                     {"x": min(x + 50, 1023), "y": min(y + 30, 1023)}]]
            gt = 2
        else:
            s = 40.0
            geom = [[{"x": x, "y": y}, {"x": min(x+s, 1023), "y": y},
                     {"x": min(x+s, 1023), "y": min(y+s, 1023)},
                     {"x": x, "y": min(y+s, 1023)}, {"x": x, "y": y}]]
            gt = 3
        rows.append({"fid": i, "layer": ["pts", "lines", "polys"][i % 3],
                     "geom_type": gt, "geometry": geom, "attrs": f"i={i}"})
    feats = ray.data.from_items(rows).repartition(4)
    store = VT.build_tiles(feats, world, lod=2, num_partitions=8)

    def decode_counts(b: pa.Table) -> pa.Table:
        out = {"zoom": [], "col": [], "row": [], "layer": [], "n": []}
        for i in range(b.num_rows):
            z = int(b["zoom"][i].as_py())
            tx = int(b["col"][i].as_py())
            trow = int(b["row"][i].as_py())
            ty = (1 << z) - 1 - trow
            te = VT.tile_world_extents(world, z, tx, ty)
            rows_ = mvt.decode_tile(b["tile_data"][i].as_py(), extents=te)
            import collections
            c = collections.Counter(r["layer"] for r in rows_)
            for lname, n in sorted(c.items()):
                out["zoom"].append(z)
                out["col"].append(tx)
                out["row"].append(trow)
                out["layer"].append(lname)
                out["n"].append(n)
        return pa.table({"zoom": pa.array(out["zoom"], pa.int32()),
                         "col": pa.array(out["col"], pa.int32()),
                         "row": pa.array(out["row"], pa.int32()),
                         "layer": pa.array(out["layer"]),
                         "n": pa.array(out["n"], pa.int64())})

    return store.map_batches(decode_counts, batch_format="pyarrow")


def _sql_vector_tiling() -> str:
    """Independent cover re-derivation for q_vector_tiling: regenerate the
    seeded features and count, per (tile, layer), the features whose bbox
    touches the tile — straight floor/clamp interval math on the 4x4 grid
    plus the TMS row flip. None of stages/vectortile.py (cover flat_map,
    groupby encode, MVT codec) is involved; a feature lost or duplicated
    anywhere in build_tiles -> decode_tile would shift a count."""
    import collections

    rng = np.random.default_rng(21)
    counts: dict[tuple[int, int, str], int] = collections.Counter()
    side, tw = 4, 256.0
    for i in range(200):
        x, y = rng.uniform(0, 1024, 2)
        if i % 3 == 0:
            xs, ys = [x], [y]
        elif i % 3 == 1:
            xs = [x, min(x + 50, 1023)]
            ys = [y, min(y + 30, 1023)]
        else:
            s = 40.0
            xs = [x, min(x + s, 1023), min(x + s, 1023), x, x]
            ys = [y, y, min(y + s, 1023), min(y + s, 1023), y]
        layer = ["pts", "lines", "polys"][i % 3]
        tx0 = max(0, int(np.floor(min(xs) / tw)))
        tx1 = min(side - 1, int(np.floor(max(xs) / tw)))
        ty0 = max(0, int(np.floor((1024.0 - max(ys)) / tw)))
        ty1 = min(side - 1, int(np.floor((1024.0 - min(ys)) / tw)))
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                counts[(tx, side - 1 - ty, layer)] += 1
    rows = [f"({tx}, {row}, '{layer}', {n})"
            for (tx, row, layer), n in sorted(counts.items())]
    values = ",\n    ".join(rows)
    return f"""
SELECT CAST(2 AS INTEGER) AS zoom, CAST(col AS INTEGER) AS col,
       CAST(row AS INTEGER) AS row, layer, CAST(n AS BIGINT) AS n
FROM (VALUES {values}) t(col, row, layer, n)
"""


SQL_VECTOR_TILING = _sql_vector_tiling()


def _simplify_fixture(n_features: int = 200, n_pts: int = 120):
    """Deterministic integer polylines: a drifting walk with occasional
    sharp turns, parameterized by feature index — collinear stretches
    make DP genuinely drop points, kinks make it keep them."""
    import numpy as np

    feats = []
    for f in range(n_features):
        t = np.arange(n_pts, dtype=np.int64)
        xs = 5 * t + ((t * (f + 3)) % 11 == 0) * ((t * 7 + f) % 13)
        ys = 3 * t + ((t * (f + 5)) % 7 == 0) * ((t * 5 + f) % 17) \
            + (f % 9) * (t // 10)
        feats.append((f, xs.tolist(), ys.tolist()))
    return feats


def q_simplify_lines(sf_dir: str) -> "ray.data.Dataset":
    """Douglas-Peucker simplification (stages/simplify.py) over the
    deterministic polyline fixture at integer tolerance 3: per-feature
    counts + an exact kept-vertex checksum, so WHICH vertices survive is
    hash-pinned, not just how many. Integer-exact criterion (cross^2 vs
    tol^2*len^2) — no floats anywhere."""
    import pyarrow as pa
    import ray.data

    from ..stages.simplify import simplify_lines

    feats = _simplify_fixture()
    t = pa.table({
        "feature_id": pa.array([f for f, _, _ in feats], pa.int64()),
        "xs": pa.array([x for _, x, _ in feats], pa.list_(pa.int64())),
        "ys": pa.array([y for _, _, y in feats], pa.list_(pa.int64())),
    })
    ds = ray.data.from_arrow(t).repartition(8)
    out = simplify_lines(ds, tol=3)
    return out.select_columns(["feature_id", "n_before", "n_after",
                               "kept_idx_checksum"])


def _sql_simplify_lines() -> str:
    from ..stages.simplify import dp_keep_mask
    import numpy as np

    rows = []
    for f, xs, ys in _simplify_fixture():
        keep = dp_keep_mask(np.asarray(xs), np.asarray(ys), 3)
        idx = np.flatnonzero(keep).astype(np.int64)
        rows.append(f"({f}, {len(xs)}, {int(keep.sum())}, "
                    f"{int(((idx + 1) * (idx + 7)).sum())})")
    values = ",\n    ".join(rows)
    return f"""
SELECT CAST(feature_id AS BIGINT) AS feature_id,
       CAST(n_before AS BIGINT) AS n_before,
       CAST(n_after AS BIGINT) AS n_after,
       CAST(kept_idx_checksum AS BIGINT) AS kept_idx_checksum
FROM (VALUES {values}) t(feature_id, n_before, n_after, kept_idx_checksum)
"""


SQL_SIMPLIFY_LINES = _sql_simplify_lines()
