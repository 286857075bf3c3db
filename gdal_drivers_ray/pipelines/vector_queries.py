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
