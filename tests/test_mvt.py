"""MVT wire codec + decode semantics vs the reference rules
(mvt.cpp:62-618; edge cases from FIXTURES.md F5)."""

import json

import numpy as np
import pytest

from gdal_drivers_ray.grid import Extents
from gdal_drivers_ray.sources import mvt


def tile_with(features, keys=None, values=None, extent=4096, name="lyr"):
    return mvt.encode_tile([{
        "name": name, "extent": extent,
        "keys": keys or [], "values": values or [],
        "features": features,
    }])


class TestGeometry:
    def test_single_point_normalized(self):
        # no extents -> [0,1] with y flip (mvt.cpp:75-79)
        g = mvt.geometry_stream([[(2048, 1024)]], mvt.GEOM_POINT)
        buf = tile_with([{"type": mvt.GEOM_POINT, "geometry": g}])
        rows = mvt.decode_tile(buf)
        assert len(rows) == 1
        (pt,), = rows[0]["geometry"]
        assert pt == pytest.approx((0.5, 1.0 - 0.25))

    def test_multipoint_world_extents(self):
        g = mvt.geometry_stream([[(0, 0), (4096, 4096)]], mvt.GEOM_POINT)
        buf = tile_with([{"type": mvt.GEOM_POINT, "geometry": g}])
        rows = mvt.decode_tile(buf, extents=Extents(100, 200, 300, 400))
        pts = rows[0]["geometry"][0]
        # local (0,0) -> world UL (100, 400); (4096,4096) -> LR (300, 200)
        assert pts[0] == pytest.approx((100.0, 400.0))
        assert pts[1] == pytest.approx((300.0, 200.0))

    def test_multilinestring_cursor_persists(self):
        parts = [[(0, 0), (10, 0), (10, 10)], [(20, 20), (30, 30)]]
        g = mvt.geometry_stream(parts, mvt.GEOM_LINESTRING)
        buf = tile_with([{"type": mvt.GEOM_LINESTRING, "geometry": g}])
        rows = mvt.decode_tile(buf, extents=Extents(0, 0, 4096, 4096))
        got = rows[0]["geometry"]
        assert len(got) == 2
        assert got[0][1] == pytest.approx((10.0, 4096.0))
        assert got[1][0] == pytest.approx((20.0, 4096.0- 20.0))

    def test_polygon_ring_closed_and_grouped(self):
        # tile y-down: this ring is CCW in tile coords -> CW after y flip
        ext = [(0, 0), (100, 0), (100, 100), (0, 100), (0, 0)]
        hole = [(20, 20), (20, 40), (40, 40), (40, 20), (20, 20)]  # opposite
        g = mvt.geometry_stream([ext, hole], mvt.GEOM_POLYGON)
        buf = tile_with([{"type": mvt.GEOM_POLYGON, "geometry": g}])
        rows = mvt.decode_tile(buf, extents=Extents(0, 0, 4096, 4096))
        rings = rows[0]["geometry"]
        assert len(rings) == 2
        assert rings[0][0] == rings[0][-1]      # closePath appends start
        polys = mvt.group_rings(rings)
        assert len(polys) == 1 and len(polys[0]) == 2  # exterior + hole

    def test_two_polygons_split_on_cw(self):
        sq1 = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
        sq2 = [(50, 50), (60, 50), (60, 60), (50, 60), (50, 50)]
        g = mvt.geometry_stream([sq1, sq2], mvt.GEOM_POLYGON)
        buf = tile_with([{"type": mvt.GEOM_POLYGON, "geometry": g}])
        rows = mvt.decode_tile(buf, extents=Extents(0, 0, 4096, 4096))
        polys = mvt.group_rings(rows[0]["geometry"])
        assert len(polys) == 2

    def test_geometry_error_aborts_layer(self):
        good = mvt.geometry_stream([[(1, 1)]], mvt.GEOM_POINT)
        bad = [(1 << 3) | 1]  # moveTo(1) with no coords
        buf = tile_with([
            {"type": mvt.GEOM_POINT, "geometry": good},
            {"type": mvt.GEOM_POINT, "geometry": bad},
            {"type": mvt.GEOM_POINT, "geometry": good},
        ])
        rows = mvt.decode_tile(buf)
        # first decodes; error on second ends the layer (mvt.cpp:608-613)
        assert len(rows) == 1

    def test_unknown_type_skipped(self):
        g = mvt.geometry_stream([[(1, 1)]], mvt.GEOM_POINT)
        buf = tile_with([
            {"type": mvt.GEOM_UNKNOWN, "geometry": g},
            {"type": mvt.GEOM_POINT, "geometry": g},
        ])
        rows = mvt.decode_tile(buf)
        assert len(rows) == 1 and rows[0]["feature_idx"] == 1


class TestAttributes:
    def run(self, tags, keys, values, fid=None):
        g = mvt.geometry_stream([[(1, 1)]], mvt.GEOM_POINT)
        buf = tile_with([{"type": mvt.GEOM_POINT, "geometry": g,
                          "tags": tags, "id": fid}],
                        keys=keys, values=values)
        return mvt.decode_tile(buf)[0]

    def test_all_value_kinds(self):
        vals = [(1, "s"), (2, 1.5), (3, 2.5), (4, -7), (5, 8), (6, -9), (7, True)]
        keys = [f"k{i}" for i in range(7)]
        tags = [i for pair in ((i, i) for i in range(7)) for i in pair]
        r = self.run(tags, keys, vals)
        a = json.loads(r["attrs"])
        assert a == {"k0": "s", "k1": 1.5, "k2": 2.5, "k3": -7, "k4": 8,
                     "k5": -9, "k6": True}

    def test_odd_tag_count_truncated(self):
        r = self.run([0, 0, 1], ["a", "b"], [(4, 5)])
        assert json.loads(r["attrs"]) == {"a": 5}

    def test_oob_indices_dropped(self):
        r = self.run([0, 9, 9, 0, 1, 0], ["a", "b"], [(4, 5)])
        assert json.loads(r["attrs"]) == {"b": 5}

    def test_fid_from_feature_id(self):
        r = self.run([0, 0], ["id"], [(4, 77)], fid=123)
        assert r["fid"] == 123     # feature.id wins (mvt.cpp:573-577)

    def test_fid_from_id_attribute_int(self):
        r = self.run([0, 0], ["id"], [(4, 77)])
        assert r["fid"] == 77

    def test_fid_uint_quirk_reads_unset_int_slot(self):
        # mvt.cpp:503-511: uint/sint-valued "id" sets FID from int_value()=0
        r = self.run([0, 0], ["id"], [(5, 77)])
        assert r["fid"] == 0
        r = self.run([0, 0], ["id"], [(6, -5)])
        assert r["fid"] == 0

    def test_fid_absent(self):
        r = self.run([0, 0], ["x"], [(1, "v")])
        assert r["fid"] is None


class TestWire:
    def test_value_first_present_wins_order(self):
        # string checked before double (mvt.cpp:478-520)
        buf = mvt.encode_value(3, 9.0) + mvt.encode_value(1, "s")
        kind, v = mvt.decode_value(buf)
        assert (kind, v) == (1, "s")

    def test_extent_variants(self):
        for extent in (256, 4096, 8192):
            g = mvt.geometry_stream([[(extent, 0)]], mvt.GEOM_POINT)
            buf = tile_with([{"type": mvt.GEOM_POINT, "geometry": g}],
                            extent=extent)
            rows = mvt.decode_tile(buf)
            assert rows[0]["geometry"][0][0] == pytest.approx((1.0, 1.0))

    def test_multilayer_order_columns(self):
        g = mvt.geometry_stream([[(1, 1)]], mvt.GEOM_POINT)
        buf = mvt.encode_tile([
            {"name": "a", "extent": 4096,
             "features": [{"type": 1, "geometry": g}] * 2},
            {"name": "b", "extent": 4096,
             "features": [{"type": 1, "geometry": g}]},
        ])
        rows = mvt.decode_tile(buf)
        assert [(r["layer"], r["layer_idx"], r["feature_idx"]) for r in rows] \
            == [("a", 0, 0), ("a", 0, 1), ("b", 1, 0)]


def test_parse_tiles_batch_ray(ray_session):
    import pyarrow as pa
    import ray.data

    g1 = mvt.geometry_stream([[(10, 10)]], mvt.GEOM_POINT)
    tiles = []
    for i in range(20):
        tiles.append({"tile_id": f"1-0-{i}",
                      "bytes": tile_with([{"type": 1, "geometry": g1}],
                                         name=f"l{i}")})
    ds = ray.data.from_arrow(pa.table({
        "tile_id": [t["tile_id"] for t in tiles],
        "bytes": pa.array([t["bytes"] for t in tiles], pa.binary()),
    }))
    feats = ds.map_batches(mvt.parse_tiles_batch, batch_format="pyarrow")
    rows = feats.take_all()
    assert len(rows) == 20
    assert {r["layer"] for r in rows} == {f"l{i}" for i in range(20)}


# --- property: wire codec round-trips arbitrary geometries ----------------

from hypothesis import given, settings, strategies as st

_coord = st.integers(0, 4096)
_pt = st.tuples(_coord, _coord)


@settings(max_examples=120, deadline=None)
@given(st.lists(_pt, min_size=1, max_size=12, unique=True))
def test_point_roundtrip_property(pts):
    g = mvt.geometry_stream([pts], mvt.GEOM_POINT)
    buf = tile_with([{"type": mvt.GEOM_POINT, "geometry": g}])
    rows = mvt.decode_tile(buf, extents=Extents(0, 0, 4096, 4096))
    got = [(x, 4096.0 - y) for x, y in rows[0]["geometry"][0]]
    assert got == pytest.approx([(float(x), float(y)) for x, y in pts])


@settings(max_examples=120, deadline=None)
@given(st.lists(st.lists(_pt, min_size=2, max_size=8, unique=True),
                min_size=1, max_size=4))
def test_linestring_roundtrip_property(parts):
    g = mvt.geometry_stream(parts, mvt.GEOM_LINESTRING)
    buf = tile_with([{"type": mvt.GEOM_LINESTRING, "geometry": g}])
    rows = mvt.decode_tile(buf, extents=Extents(0, 0, 4096, 4096))
    got = rows[0]["geometry"]
    assert len(got) == len(parts)
    for gp, wp in zip(got, parts):
        back = [(x, 4096.0 - y) for x, y in gp]
        assert back == pytest.approx([(float(x), float(y)) for x, y in wp])


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 3000), st.integers(0, 3000),
       st.integers(1, 1000), st.integers(1, 1000))
def test_rect_polygon_roundtrip_property(x0, y0, w, h):
    ring = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h),
            (x0, y0)]
    g = mvt.geometry_stream([ring], mvt.GEOM_POLYGON)
    buf = tile_with([{"type": mvt.GEOM_POLYGON, "geometry": g}])
    rows = mvt.decode_tile(buf, extents=Extents(0, 0, 4096, 4096))
    (got,) = rows[0]["geometry"]
    assert got[0] == got[-1]                  # closePath restores closure
    back = [(x, 4096.0 - y) for x, y in got]
    assert back == pytest.approx([(float(x), float(y)) for x, y in ring])


def test_encode_uvarints_rejects_oversized_values():
    """ADVICE fix: the 5-byte vectorized encoder silently truncated values
    >= 2^35; it must raise instead. 2^35-1 (the documented max) still
    round-trips."""
    big_ok = np.array([(1 << 35) - 1, 0, 1], dtype=np.uint64)
    enc = mvt.encode_uvarints(big_ok)
    vals, pos = [], 0
    while pos < len(enc):
        v, pos = mvt._uvarint(enc, pos)
        vals.append(v)
    assert vals == [(1 << 35) - 1, 0, 1]

    with pytest.raises(ValueError, match="2\\^35"):
        mvt.encode_uvarints(np.array([1 << 35], dtype=np.uint64))


def test_parse_tiles_batch_skips_null_and_corrupt(ray_session):
    """NULL tile bytes (lookup not_found rows) and wire-corrupt tiles are
    skipped per tile — they must never kill the whole batch task."""
    import pyarrow as pa

    from gdal_drivers_ray.sources.mvt import parse_tiles_batch

    g1 = mvt.geometry_stream([[(10, 10)]], mvt.GEOM_POINT)
    good = tile_with([{"type": 1, "geometry": g1}])
    batch = pa.table({
        "tile_id": pa.array(["ok", "null", "trunc", "junk"]),
        "bytes": pa.array([good, None, good[:max(1, len(good) // 3)],
                           b"\x1a\x02\xff"], pa.large_binary()),
    })
    out = parse_tiles_batch(batch)
    assert set(out["tile_id"].to_pylist()) == {"ok"}


def test_uint64_fid_wraps_like_gintbig(ray_session):
    """A spec-valid Feature.id >= 2^63 wraps two's-complement (the
    reference's GIntBig cast) instead of overflowing the int64 column."""
    import pyarrow as pa

    from gdal_drivers_ray.sources.mvt import parse_tiles_batch

    big = (1 << 63) + 7
    g1 = mvt.geometry_stream([[(10, 10)]], mvt.GEOM_POINT)
    tile = tile_with([{"type": 1, "geometry": g1, "id": big}])
    out = parse_tiles_batch(pa.table({
        "tile_id": pa.array(["t"]),
        "bytes": pa.array([tile], pa.large_binary())}))
    assert out["fid"].to_pylist() == [big - (1 << 64)]
