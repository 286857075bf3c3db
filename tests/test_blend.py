"""Blender mosaic: per-block math vs a whole-raster oracle, weight kernels,
compatibility validation (blender.cpp:120-185, 559-731; FIXTURES.md F4)."""

import numpy as np
import pytest

from gdal_drivers_ray.grid import Extents
from gdal_drivers_ray.stages import blend as bl


def make_source(origin, size, seed, valid=None, mask_mode="all_valid",
                res=1.0, bands=1):
    rng = np.random.default_rng(seed)
    shape = (size[1], size[0]) if bands == 1 else (size[1], size[0], bands)
    px = rng.integers(0, 255, shape).astype(np.uint8)
    gt = (origin[0], res, 0.0, origin[1], 0.0, -res)
    world = Extents(origin[0], origin[1] - size[1] * res,
                    origin[0] + size[0] * res, origin[1])
    mask = None
    if mask_mode == "random_holes":
        mask = (rng.random((size[1], size[0])) > 0.2).astype(np.uint8) * 255
    return bl.BlendSource(gt=gt, pixels=px, valid=valid or world, mask=mask)


class TestValidation:
    def test_rejects_rotated(self):
        s = make_source((0, 100), (50, 50), 1)
        s.gt = (0, 1, 0.5, 100, 0, -1)
        with pytest.raises(bl.IncompatibleSources):
            bl.plan_blend(bl.BlendSpec(extents=Extents(0, 0, 50, 100)), [s])

    def test_rejects_resolution_mismatch(self):
        a = make_source((0, 100), (50, 50), 1)
        b = make_source((0, 100), (50, 50), 2, res=2.0)
        with pytest.raises(bl.IncompatibleSources):
            bl.plan_blend(bl.BlendSpec(extents=Extents(0, 0, 100, 100)), [a, b])

    def test_rejects_band_mismatch(self):
        a = make_source((0, 100), (50, 50), 1)
        b = make_source((0, 100), (50, 50), 2, bands=3)
        with pytest.raises(bl.IncompatibleSources):
            bl.plan_blend(bl.BlendSpec(extents=Extents(0, 0, 100, 100)), [a, b])

    def test_resolution_epsilon_tolerated(self):
        # blender.cpp:120 eps=1e-4
        a = make_source((0, 100), (50, 50), 1)
        b = make_source((0, 100), (50, 50), 2)
        b.gt = (0, 1.0 + 5e-5, 0, 100, 0, -1)
        plan = bl.plan_blend(bl.BlendSpec(extents=Extents(0, 0, 50, 100)), [a, b])
        assert plan.size[0] == 50

    def test_alignment_and_size(self):
        s = make_source((0, 512), (512, 512), 1)
        plan = bl.plan_blend(
            bl.BlendSpec(extents=Extents(10.3, 10.3, 500.2, 500.2)), [s])
        # snapped outward to integer grid anchored at origin (0, 512)
        assert plan.extents == Extents(10.0, 10.0, 501.0, 501.0)
        assert plan.size == (491, 491)


def _assemble(rows, plan):
    got = np.zeros((len(rows) and (max(r["tile_y"] for r in rows) + 1) * 256,
                    (max(r["tile_x"] for r in rows) + 1) * 256, plan.bands),
                   dtype=plan.dtype)
    gmask = np.zeros(got.shape[:2], dtype=np.uint8)
    for r in rows:
        px = np.frombuffer(r["px"], dtype=plan.dtype).reshape(256, 256,
                                                              plan.bands)
        got[r["tile_y"] * 256:(r["tile_y"] + 1) * 256,
            r["tile_x"] * 256:(r["tile_x"] + 1) * 256] = px
        gmask[r["tile_y"] * 256:(r["tile_y"] + 1) * 256,
              r["tile_x"] * 256:(r["tile_x"] + 1) * 256] = \
            np.frombuffer(r["mask"], np.uint8).reshape(256, 256)
    nx, ny = plan.size
    return got[:ny, :nx], gmask[:ny, :nx]


def check_pipeline_vs_oracle(spec, sources, ray_session):
    """Both physical plans (broadcast + shuffle) must match the whole-raster
    oracle EXACTLY (fp-sum order is pinned to config order in both)."""
    plan = bl.plan_blend(spec, sources)
    want_px, want_mask = bl.blend_oracle(plan, sources)
    if want_px.ndim == 2:
        want_px = want_px[:, :, None]
    got_s, gmask_s = _assemble(
        bl.blend_dataset(spec, sources, physical_plan="shuffle").take_all(),
        plan)
    np.testing.assert_array_equal(got_s, want_px)
    np.testing.assert_array_equal(gmask_s, want_mask)
    rows = bl.blend_dataset(spec, sources).take_all()
    nx, ny = plan.size
    got = np.zeros((len(rows) and (max(r["tile_y"] for r in rows) + 1) * 256,
                    (max(r["tile_x"] for r in rows) + 1) * 256, plan.bands),
                   dtype=plan.dtype)
    gmask = np.zeros(got.shape[:2], dtype=np.uint8)
    for r in rows:
        px = np.frombuffer(r["px"], dtype=plan.dtype).reshape(256, 256, plan.bands)
        got[r["tile_y"] * 256:(r["tile_y"] + 1) * 256,
            r["tile_x"] * 256:(r["tile_x"] + 1) * 256] = px
        gmask[r["tile_y"] * 256:(r["tile_y"] + 1) * 256,
              r["tile_x"] * 256:(r["tile_x"] + 1) * 256] = \
            np.frombuffer(r["mask"], np.uint8).reshape(256, 256)
    got = got[:ny, :nx]
    gmask = gmask[:ny, :nx]
    if want_px.ndim == 2:
        want_px = want_px[:, :, None]
    np.testing.assert_array_equal(got, want_px)
    np.testing.assert_array_equal(gmask, want_mask)
    return plan, got, gmask


class TestBlend:
    def test_two_overlapping_sources_no_overlap_param(self, ray_session):
        # neighboring valid extents that touch (F4): left half / right half
        a = make_source((0, 256), (300, 256), 1,
                        valid=Extents(0, 0, 150, 256))
        b = make_source((100, 256), (300, 256), 2,
                        valid=Extents(150, 0, 400, 256))
        spec = bl.BlendSpec(extents=Extents(0, 0, 400, 256), nodata=0.0)
        plan, got, gmask = check_pipeline_vs_oracle(spec, [a, b], ray_session)
        # hard cut at x=150: left pixels only from a, right only from b
        assert (got[100, 10] == a.pixels[100, 10]).all()
        assert (got[100, 200] == b.pixels[100, 100]).all()

    def test_overlap_kernel_blend(self, ray_session):
        a = make_source((0, 256), (300, 256), 3,
                        valid=Extents(0, 0, 160, 256))
        b = make_source((0, 256), (300, 256), 4,
                        valid=Extents(140, 0, 300, 256))
        spec = bl.BlendSpec(extents=Extents(0, 0, 300, 256), overlap=20.0,
                            nodata=0.0)
        plan, got, gmask = check_pipeline_vs_oracle(spec, [a, b], ray_session)
        assert plan.overlap_px == (20, 20)
        # in the transition zone output lies between the two sources
        x = 150
        lo = np.minimum(a.pixels[:, x], b.pixels[:, x]).astype(np.float64)
        hi = np.maximum(a.pixels[:, x], b.pixels[:, x]).astype(np.float64)
        col = got[:, x, 0].astype(np.float64)
        assert ((col >= lo - 1) & (col <= hi + 1)).all()

    def test_masked_holes_and_nodata(self, ray_session):
        a = make_source((0, 256), (256, 256), 5, mask_mode="random_holes")
        spec = bl.BlendSpec(extents=Extents(0, 0, 256, 256), nodata=7.0)
        plan, got, gmask = check_pipeline_vs_oracle(spec, [a], ray_session)
        holes = a.mask == 0
        assert (got[holes, 0] == 7).all()
        assert (gmask[holes] == 0).all()
        assert (gmask[~holes] == 255).all()

    def test_multiband_and_float_output(self, ray_session):
        a = make_source((0, 512), (400, 512), 6, bands=3)
        b = make_source((100, 512), (400, 512), 7, bands=3)
        spec = bl.BlendSpec(extents=Extents(0, 0, 520, 512), overlap=10.0,
                            dtype="float64", nodata=-1.0)
        plan, got, gmask = check_pipeline_vs_oracle(spec, [a, b], ray_session)
        assert plan.bands == 3 and got.dtype == np.float64
        # x in [500, 520) is beyond both sources -> nodata, invalid mask
        assert (got[:, 510, :] == -1.0).all()
        assert (gmask[:, 510] == 0).all()

    def test_color_table_disables_overlap(self, ray_session):
        """blender.cpp:526-530: a paletted (discrete) first source clones
        its color table into the plan and FORCES the no-overlap weight path
        even when the spec asks for overlap blending."""
        palette = [(i, 255 - i, 0, 255) for i in range(4)]
        a = make_source((0, 256), (300, 256), 3,
                        valid=Extents(0, 0, 160, 256))
        b = make_source((0, 256), (300, 256), 4,
                        valid=Extents(140, 0, 300, 256))
        a.color_table = palette
        a.color_interp = "Palette"
        spec = bl.BlendSpec(extents=Extents(0, 0, 300, 256), overlap=20.0,
                            nodata=0.0)
        plan = bl.plan_blend(spec, [a, b])
        assert plan.overlap_px == (0, 0)          # discrete data rule
        assert plan.color_table == palette
        assert plan.color_table is not a.color_table   # cloned, not shared
        assert plan.color_interp == "Palette"
        # pixels equal the overlap=0 render (no averaging of indices)
        got, _ = _assemble(bl.blend_dataset(spec, [a, b]).take_all(), plan)
        spec0 = bl.BlendSpec(extents=Extents(0, 0, 300, 256), overlap=0.0,
                             nodata=0.0)
        a0 = bl.BlendSource(gt=a.gt, pixels=a.pixels, valid=a.valid,
                            mask=a.mask)
        b0 = bl.BlendSource(gt=b.gt, pixels=b.pixels, valid=b.valid,
                            mask=b.mask)
        want, _ = bl.blend_oracle(bl.plan_blend(spec0, [a0, b0]), [a0, b0])
        if want.ndim == 2:
            want = want[:, :, None]
        np.testing.assert_array_equal(got, want)

    def test_seamless_across_block_borders(self, ray_session):
        # one source spanning multiple blocks: output == input exactly
        a = make_source((0, 600), (600, 600), 8)
        spec = bl.BlendSpec(extents=Extents(0, 0, 600, 600))
        plan, got, gmask = check_pipeline_vs_oracle(spec, [a], ray_session)
        np.testing.assert_array_equal(got[:, :, 0], a.pixels)
        assert (gmask == 255).all()


class TestBlendConfig:
    def test_roundtrip(self):
        spec = bl.BlendSpec(extents=Extents(1.5, 2.5, 100.25, 200.75),
                            overlap=12.5, srs="EPSG:3857", dtype="uint8",
                            resolution=(0.5, 0.5), nodata=-9999.0)
        ds = [("a.tif", Extents(0, 0, 50, 200)),
              ("b.tif", Extents(50, 0, 100, 200))]
        text = bl.write_blend_config(spec, ds)
        spec2, ds2 = bl.parse_blend_config(text)
        assert spec2 == spec
        assert ds2 == ds

    def test_probe_failure(self):
        import pytest as _pt
        with _pt.raises(ValueError):
            bl.parse_blend_config("[blender]\nsrs = x\n")  # missing requireds
        with _pt.raises(ValueError):
            bl.parse_blend_config("garbage")
