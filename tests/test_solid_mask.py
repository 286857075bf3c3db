"""Solid + QuadtreeMask sources: config/binary round-trips and rendered
tiles vs a NumPy oracle (SURVEY.md §5: write->open->read-back conformance)."""

import numpy as np
import pytest

from gdal_drivers_ray.grid import Extents
from gdal_drivers_ray.sources import mask as qm
from gdal_drivers_ray.sources import solid


def make_spec(**kw):
    d = dict(srs="EPSG:3857", size=(600, 400),
             extents=Extents(0.0, 0.0, 600.0, 400.0),
             bands=[solid.Band(value=7.0, data_type="Byte"),
                    solid.Band(value=-1.5, data_type="Float32",
                               color_interpretation="Alpha")])
    d.update(kw)
    return solid.SolidSpec(**d)


class TestSolidSpec:
    def test_roundtrip(self):
        spec = make_spec()
        back = solid.parse_config(solid.write_config(spec))
        assert back.srs == spec.srs
        assert back.size == spec.size
        assert back.extents == pytest.approx(spec.extents.as_tuple()) or \
            back.extents.as_tuple() == pytest.approx(spec.extents.as_tuple())
        assert [b.value for b in back.bands] == [7.0, -1.5]
        assert [b.data_type for b in back.bands] == ["Byte", "Float32"]

    def test_geotransform_roundtrip(self):
        spec = make_spec(extents=None,
                         geo_transform=(10.0, 0.5, 0.0, 90.0, 0.0, -0.25))
        back = solid.parse_config(solid.write_config(spec))
        assert back.geo_transform == pytest.approx(spec.geo_transform)

    def test_extents_xor_geotransform(self):
        # solid.cpp:234-248
        with pytest.raises(ValueError):
            make_spec(geo_transform=(0, 1, 0, 0, 0, -1))
        with pytest.raises(ValueError):
            make_spec(extents=None)

    def test_unsupported_dtype_rejected(self):
        # solid.cpp:437-439
        with pytest.raises(ValueError):
            solid.Band(value=0, data_type="CInt16")

    def test_probe_failure(self):
        with pytest.raises(ValueError):
            solid.parse_config("not an ini at all")
        with pytest.raises(ValueError):
            solid.parse_config("[solid]\nsrs = x\n")  # missing size


class TestSolidDataset:
    def test_tiles_constant_and_complete(self, ray_session):
        spec = make_spec(size=(600, 400))
        ds = solid.solid_dataset(spec, include_overviews=False)
        rows = ds.take_all()
        # 600x400 -> 3x2 tiles x 2 bands
        assert len(rows) == 3 * 2 * 2
        r = next(r for r in rows if r["band"] == 0)
        px = np.frombuffer(r["px"], dtype=np.uint8).reshape(256, 256)
        assert (px == 7).all()
        r = next(r for r in rows if r["band"] == 1)
        px = np.frombuffer(r["px"], dtype=np.float32).reshape(256, 256)
        assert (px == -1.5).all()
        # edge tile truncation bookkeeping
        edge = next(r for r in rows if r["tile_x"] == 2 and r["tile_y"] == 1
                    and r["band"] == 0)
        assert (edge["valid_w"], edge["valid_h"]) == (600 - 512, 144)

    def test_overview_pyramid(self, ray_session):
        spec = make_spec(size=(1024, 1024),
                         extents=Extents(0, 0, 1024, 1024),
                         bands=[solid.Band(value=3)])
        ds = solid.solid_dataset(spec)
        rows = ds.take_all()
        # levels: 1024 (4x4), 512 (2x2), 256 (1x1); halving stops below 256
        lods = sorted({r["lod"] for r in rows})
        assert lods == [0, 1, 2]
        assert sum(1 for r in rows if r["lod"] == 0) == 16
        assert sum(1 for r in rows if r["lod"] == 1) == 4
        assert sum(1 for r in rows if r["lod"] == 2) == 1

    def test_create_copy(self, ray_session):
        spec = make_spec(size=(300, 300))
        src = solid.solid_dataset(spec, include_overviews=False)
        out = solid.create_copy(src, values=[9.0, 9.0]).take_all()
        px = np.frombuffer(out[0]["px"],
                           dtype=solid.DTYPES[out[0]["dtype"]])
        assert (px == 9.0).all()


def oracle_render(arr: np.ndarray, depth_level: int, tx: int, ty: int,
                  depth: int) -> np.ndarray:
    """Slow oracle: downsample the boolean grid to the level, then paint
    white where all-true, gray where mixed, over a 256 tile window."""
    size = 1 << depth
    f = 1 << (depth - depth_level)
    lv = arr.reshape(size // f, f, size // f, f).swapaxes(1, 2).reshape(
        size // f, size // f, f * f)
    full = lv.all(axis=2)
    some = lv.any(axis=2)
    img = np.zeros((size // f, size // f), dtype=np.uint8)
    img[some] = 0x80
    img[full] = 0xFF
    out = np.zeros((256, 256), dtype=np.uint8)
    win = img[ty * 256:(ty + 1) * 256, tx * 256:(tx + 1) * 256]
    out[:win.shape[0], :win.shape[1]] = win
    return out


class TestQuadMask:
    @pytest.fixture()
    def arr(self):
        rng = np.random.default_rng(42)
        size = 512  # depth 9
        a = np.zeros((size, size), dtype=bool)
        for _ in range(12):  # seeded random rect unions (FIXTURES.md F3)
            x0, y0 = rng.integers(0, size - 64, 2)
            w, h = rng.integers(16, 128, 2)
            a[y0:y0 + h, x0:x0 + w] = True
        return a

    def test_serialize_roundtrip(self, arr):
        m = qm.mask_from_array(arr, "EPSG:3857", Extents(0, 0, 512, 512))
        back = qm.deserialize(qm.serialize(m))
        assert back.depth == m.depth == 9
        assert back.srs == m.srs
        assert back.extents == m.extents
        assert (back.nodes == m.nodes).all()

    def test_magic_sniff(self):
        with pytest.raises(ValueError):
            qm.deserialize(b"JUNKXXXXXXXX")

    def test_square_extents(self):
        # mask.cpp:286-297: UL corner fixed, grows right/down
        e = qm.square_extents(Extents(10, 10, 20, 30), 100, 200, 8)
        assert e.llx == 10 and e.ury == 30
        assert e.urx == pytest.approx(10 + 10 * 256 / 100)
        assert e.lly == pytest.approx(30 - 20 * 256 / 200)

    def test_full_res_render_matches_oracle(self, arr):
        m = qm.mask_from_array(arr, "", Extents(0, 0, 512, 512))
        for tx, ty in [(0, 0), (1, 1), (0, 1)]:
            got = qm.render_tile(m, m.depth, tx, ty)
            want = np.zeros((256, 256), np.uint8)
            win = arr[ty * 256:(ty + 1) * 256, tx * 256:(tx + 1) * 256]
            want[:win.shape[0], :win.shape[1]] = win * 0xFF
            assert (got == want).all(), (tx, ty)

    def test_overview_render_matches_oracle(self, arr):
        m = qm.mask_from_array(arr, "", Extents(0, 0, 512, 512))
        for lv in (8, 7, 5, 3):
            got = qm.render_tile(m, lv, 0, 0)
            want = oracle_render(arr, lv, 0, 0, m.depth)
            assert (got == want).all(), lv

    def test_mask_tiles_dataset(self, ray_session, arr):
        m = qm.mask_from_array(arr, "EPSG:3857", Extents(0, 0, 512, 512))
        buf = qm.serialize(m)
        rows = qm.mask_tiles(buf, depth_level=9).take_all()
        assert len(rows) == 4  # 512/256 = 2x2
        r = next(r for r in rows if (r["tile_x"], r["tile_y"]) == (1, 0))
        px = np.frombuffer(r["px"], np.uint8).reshape(256, 256)
        win = arr[0:256, 256:512]
        assert (px == win * 0xFF).all()
        # all levels dataset: one overview per depth (mask.cpp:168-174)
        all_rows = qm.mask_tiles(buf).take_all()
        assert {r["lod"] for r in all_rows} == set(range(10))
