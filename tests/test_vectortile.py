"""Vector tiling round trip: features -> MVT tiles -> store lookup ->
decode -> world coords within quantization error."""

import numpy as np
import pyarrow as pa
import ray.data

from gdal_drivers_ray.grid import Extents, tms_flip
from gdal_drivers_ray.sources import mvt, tilestore
from gdal_drivers_ray.stages import vectortile as VT

WORLD = Extents(0.0, 0.0, 1024.0, 1024.0)


def _features():
    rows = [
        {"fid": 1, "layer": "pts", "geom_type": 1,
         "geometry": [[{"x": 100.0, "y": 200.0}]], "attrs": "a=1"},
        {"fid": 2, "layer": "lines", "geom_type": 2,
         "geometry": [[{"x": 10.0, "y": 10.0}, {"x": 300.0, "y": 480.0}]],
         "attrs": "b=2"},
        # CCW-in-world square crossing tile boundaries at lod 1
        {"fid": 3, "layer": "polys", "geom_type": 3,
         "geometry": [[{"x": 400.0, "y": 400.0}, {"x": 700.0, "y": 400.0},
                       {"x": 700.0, "y": 700.0}, {"x": 400.0, "y": 700.0},
                       {"x": 400.0, "y": 400.0}]], "attrs": "c=3"},
    ]
    return ray.data.from_items(rows)


def test_build_decode_roundtrip(ray_session, tmp_path):
    lod = 1
    store = VT.build_tiles(_features(), WORLD, lod).to_pandas()
    # polygon spans all 4 tiles at lod 1; others 1 tile each
    assert len(store) == 4
    q = WORLD.width / (1 << lod) / 4096  # quantization step

    for _, r in store.iterrows():
        tx = int(r["col"])
        ty = (1 << lod) - 1 - int(r["row"])  # un-flip TMS
        te = VT.tile_world_extents(WORLD, lod, tx, ty)
        rows = mvt.decode_tile(bytes(r["tile_data"]), extents=te)
        assert rows, (tx, ty)
        for f in rows:
            orig = {1: [[(100.0, 200.0)]],
                    2: [[(10.0, 10.0), (300.0, 480.0)]],
                    3: [[(400.0, 400.0), (700.0, 400.0), (700.0, 700.0),
                         (400.0, 700.0), (400.0, 400.0)]]}[f["fid"]]
            got = f["geometry"]
            assert len(got) == len(orig)
            for gp, op in zip(got, orig):
                assert len(gp) == len(op)
                for (gx, gy), (ox, oy) in zip(gp, op):
                    assert abs(gx - ox) <= q and abs(gy - oy) <= q
            import json
            assert json.loads(f["attrs"])["attrs"].endswith(str(f["fid"]))


def test_built_tiles_feed_tilestore_lookup(ray_session, tmp_path):
    lod = 1
    store = VT.build_tiles(_features(), WORLD, lod).to_pandas()
    path = str(tmp_path / "built.parquet")
    tilestore.write_store(
        path, [(int(r["zoom"]), int(r["col"]), int(r["row"]),
                bytes(r["tile_data"])) for _, r in store.iterrows()],
        gzip_every=2)
    # request the tile containing the point feature: world (100,200) at
    # lod 1 -> tile (0, 1) -> request key z-x-y with y in XYZ addressing
    reqs = ray.data.from_items([{"path": "1-0-1"}])
    out = tilestore.lookup(reqs, path).to_pandas()
    assert out["status"].iloc[0] == "ok"
    rows = mvt.decode_tile(bytes(out["tile_data"].iloc[0]),
                           extents=VT.tile_world_extents(WORLD, 1, 0, 1))
    assert any(f["fid"] == 1 for f in rows)


def test_built_tiles_through_real_mbtiles_archive(ray_session, tmp_path):
    """Full loop across BOTH new surfaces: build_tiles -> write a REAL
    sqlite .mbtiles -> lookup_mbtiles (cached-connection actor pool) ->
    decode_tile -> feature ids survive."""
    from gdal_drivers_ray.sources import mbtiles

    lod = 1
    store = VT.build_tiles(_features(), WORLD, lod).to_pandas()
    db = mbtiles.write_mbtiles(
        str(tmp_path / "built.mbtiles"),
        [(int(r["zoom"]), int(r["col"]), int(r["row"]),
          bytes(r["tile_data"])) for _, r in store.iterrows()])

    # request every tile we just built (top-down rows: unflip)
    paths = [f"b.mbtiles/{int(r['zoom'])}-{int(r['col'])}-"
             f"{int(tms_flip(int(r['zoom']), int(r['row'])))}"
             for _, r in store.iterrows()]
    out = mbtiles.lookup_mbtiles(
        ray.data.from_arrow(pa.table({"path": pa.array(paths)})), db) \
        .take_all()
    assert all(r["status"] == "ok" for r in out)
    fids = set()
    for r in out:
        tx, ty = r["col"], int(tms_flip(r["zoom"], r["row"]))
        te = VT.tile_world_extents(WORLD, lod, tx, ty)
        for f in mvt.decode_tile(bytes(r["tile_data"]), extents=te):
            fids.add(f["fid"])
    assert fids == {1, 2, 3}


def test_built_tiles_through_sharded_sink(ray_session, tmp_path):
    """Dataset-to-Dataset loop: build_tiles streams into the SHARDED
    mbtiles sink (no driver materialization), shards merge, and every
    decoded feature id survives the archive round trip."""
    from gdal_drivers_ray.sources import mbtiles

    lod = 1
    tiles_ds = VT.build_tiles(_features(), WORLD, lod)
    manifest = mbtiles.write_mbtiles_shards(
        tiles_ds, str(tmp_path / "shards"), num_shards=3).to_pandas()
    db = mbtiles.merge_mbtiles(list(manifest["path"]),
                               str(tmp_path / "all.mbtiles"))

    store = VT.build_tiles(_features(), WORLD, lod).to_pandas()
    paths = [f"b.mbtiles/{int(r['zoom'])}-{int(r['col'])}-"
             f"{int(tms_flip(int(r['zoom']), int(r['row'])))}"
             for _, r in store.iterrows()]
    out = mbtiles.lookup_mbtiles(
        ray.data.from_arrow(pa.table({"path": pa.array(paths)})), db) \
        .take_all()
    assert all(r["status"] == "ok" for r in out)
    fids = set()
    for r in out:
        tx, ty = r["col"], int(tms_flip(r["zoom"], r["row"]))
        te = VT.tile_world_extents(WORLD, lod, tx, ty)
        for f in mvt.decode_tile(bytes(r["tile_data"]), extents=te):
            fids.add(f["fid"])
    assert fids == {1, 2, 3}


def test_typed_attrs_roundtrip(ray_session):
    """Dict attrs encode through REAL per-layer key/value dictionaries
    (dedup + 7-way typed Value mapping) and decode back typed: int stays
    int, float double, bool bool, string string — and shared values are
    stored once per layer."""
    import json

    rows = [
        {"fid": 1, "layer": "pts", "geom_type": 1,
         "geometry": [[{"x": 100.0, "y": 200.0}]],
         "attrs": {"name": "alpha", "count": 7, "score": 1.5,
                   "flag": True}},
        {"fid": 2, "layer": "pts", "geom_type": 1,
         "geometry": [[{"x": 150.0, "y": 250.0}]],
         "attrs": {"name": "beta", "count": 7, "neg": -3}},
    ]
    store = VT.build_tiles(ray.data.from_items(rows), WORLD, 0).to_pandas()
    assert len(store) == 1
    blob = bytes(store["tile_data"][0])

    te = VT.tile_world_extents(WORLD, 0, 0, 0)
    feats = {f["fid"]: json.loads(f["attrs"])
             for f in mvt.decode_tile(blob, extents=te)}
    assert feats[1] == {"name": "alpha", "count": 7, "score": 1.5,
                        "flag": True}
    assert feats[2] == {"name": "beta", "count": 7, "neg": -3}

    # dictionary dedup: 'count' key once, value 7 once in the layer body
    from gdal_drivers_ray.sources.mvt import _fields
    for field, _, layer_body in _fields(blob):
        if field != 3:
            continue
        keys = [v.decode() for f2, _, v in _fields(layer_body) if f2 == 3]
        vals = [mvt.decode_value(v) for f2, _, v in _fields(layer_body)
                if f2 == 4]
        assert keys.count("count") == 1
        assert vals.count((4, 7)) == 1
        # 7-way kinds actually exercised: string, double, int, bool
        assert {k for k, _ in vals} >= {1, 3, 4, 7}


def test_explicit_kind_values_roundtrip(ray_session):
    """Explicit (kind, value) pairs reach the float/uint/sint slots the
    type inference can't: kind 2 float32, kind 5 uint, kind 6 sint."""
    import json

    rows = [{"fid": 1, "layer": "l", "geom_type": 1,
             "geometry": [[{"x": 1.0, "y": 1.0}]],
             "attrs": {"f32": (2, 0.25), "u": (5, 12), "s": (6, -9)}}]
    store = VT.build_tiles(ray.data.from_items(rows), WORLD, 0).to_pandas()
    te = VT.tile_world_extents(WORLD, 0, 0, 0)
    [feat] = mvt.decode_tile(bytes(store["tile_data"][0]), extents=te)
    assert json.loads(feat["attrs"]) == {"f32": 0.25, "u": 12, "s": -9}


def test_out_of_world_feature_dropped_not_crash(ray_session):
    """ADVICE fix: a bbox entirely outside the world extents used to
    produce a negative repeat count (np.repeat raises); it must simply be
    dropped, like the old per-feature loop's empty range."""
    rows = [
        {"fid": 1, "layer": "pts", "geom_type": 1,
         "geometry": [[{"x": 100.0, "y": 200.0}]], "attrs": "a=1"},
        # entirely east of the world
        {"fid": 2, "layer": "pts", "geom_type": 1,
         "geometry": [[{"x": 5000.0, "y": 200.0}]], "attrs": "b=2"},
        # entirely south of the world
        {"fid": 3, "layer": "lines", "geom_type": 2,
         "geometry": [[{"x": 10.0, "y": -900.0}, {"x": 20.0, "y": -800.0}]],
         "attrs": "c=3"},
    ]
    store = VT.build_tiles(ray.data.from_items(rows), WORLD, 1).to_pandas()
    assert len(store) == 1          # only the in-world point's tile
    tx = int(store["col"].iloc[0])
    ty = (1 << 1) - 1 - int(store["row"].iloc[0])
    te = VT.tile_world_extents(WORLD, 1, tx, ty)
    decoded = mvt.decode_tile(bytes(store["tile_data"].iloc[0]), extents=te)
    assert [f["fid"] for f in decoded] == [1]


def test_build_tiles_null_fid_and_empty_geometry(ray_session):
    """Null fid encodes as a feature WITHOUT an id; empty/null geometry
    rows drop cleanly (no reduceat crash, no stolen bbox); a 1-point
    LINESTRING part never emits the zero-count LineTo that would abort
    the whole layer on decode."""
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.grid import Extents
    from gdal_drivers_ray.sources import mvt
    from gdal_drivers_ray.stages.vectortile import build_tiles

    world = Extents(0.0, 0.0, 1024.0, 1024.0)
    geom_t = mvt.FEATURE_SCHEMA.field("geometry").type

    def g(parts):
        return [[{"x": float(x), "y": float(y)} for (x, y) in p]
                for p in parts]

    t = pa.table({
        "fid": pa.array([1, None, 7, 8], pa.int64()),
        "layer": pa.array(["l", "l", "l", "l"]),
        "geom_type": pa.array([mvt.GEOM_POINT, mvt.GEOM_POINT,
                               mvt.GEOM_LINESTRING,
                               mvt.GEOM_LINESTRING], pa.int8()),
        "geometry": pa.array([g([[(10, 10)]]),      # fid=1, fine
                              g([[(20, 20)]]),      # null fid
                              g([[(30, 30)]]),      # 1-pt line: dropped
                              g([[(40, 40), (50, 50)]])], geom_t),
        "attrs": pa.array([None, None, None, None], pa.string()),
    })
    out = build_tiles(ray.data.from_arrow(t), world, lod=0).take_all()
    assert len(out) == 1
    feats = mvt.decode_tile(out[0]["tile_data"])
    fids = sorted((f["fid"] is None, f["fid"]) for f in feats
                  if f["fid"] is not None or True)
    got = {(f["fid"], f["geom_type"]) for f in feats}
    # the 1-point line vanished; the others survive with right fids
    assert got == {(1, mvt.GEOM_POINT), (None, mvt.GEOM_POINT),
                   (8, mvt.GEOM_LINESTRING)}


def test_lookup_empty_store(ray_session, tmp_path):
    """An empty store answers not_found for every request, never
    IndexError."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from gdal_drivers_ray.sources import tilestore

    p = str(tmp_path / "store.parquet")
    pq.write_table(pa.table({
        "zoom": pa.array([], pa.int64()),
        "col": pa.array([], pa.int64()),
        "row": pa.array([], pa.int64()),
        "tile_data": pa.array([], pa.large_binary())}), p)
    reqs = ray.data.from_items([{"path": "s/1-0-0"}, {"path": "s/2-1-1"}])
    rows = tilestore.lookup(reqs, p).take_all()
    assert [r["status"] for r in rows] == ["not_found", "not_found"]
