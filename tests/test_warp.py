"""Warp/reproject stage vs the pure-NumPy full-raster oracle.

Reference semantics: python/gdaldriversmodule.cpp:182-204 (warp sink),
detail/srsholder.hpp:54-61 (once-parsed SRS state)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from gdal_drivers_ray.grid import TILE, Extents
from gdal_drivers_ray.stages import warp as W


def _tiles_from_array(arr: np.ndarray, dtype="float64") -> ray.data.Dataset:
    ny, nx = arr.shape
    rows = []
    for ty in range(-(-ny // TILE)):
        for tx in range(-(-nx // TILE)):
            vw = min(TILE, nx - tx * TILE)
            vh = min(TILE, ny - ty * TILE)
            block = np.zeros((TILE, TILE), dtype=np.dtype(dtype))
            block[:vh, :vw] = arr[ty * TILE:ty * TILE + vh,
                                  tx * TILE:tx * TILE + vw]
            rows.append({"lod": 0, "band": 0, "tile_x": tx, "tile_y": ty,
                         "valid_w": vw, "valid_h": vh, "dtype": dtype,
                         "px": block.tobytes()})
    return ray.data.from_items(rows)


def _assemble(ds: ray.data.Dataset, grid: W.RasterGrid,
              nodata: float) -> np.ndarray:
    out = np.full((grid.ny, grid.nx), nodata, dtype=np.float64)
    for r in ds.take_all():
        a = np.frombuffer(r["px"], dtype=np.float64).reshape(TILE, TILE)
        tx, ty, vw, vh = r["tile_x"], r["tile_y"], r["valid_w"], r["valid_h"]
        out[ty * TILE:ty * TILE + vh, tx * TILE:tx * TILE + vw] = a[:vh, :vw]
    return out


def _src(ny=520, nx=770, seed=7):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 255, size=(ny, nx)).round(3)


def test_transformer_roundtrip():
    rng = np.random.default_rng(0)
    lon = rng.uniform(-179, 179, 1000)
    lat = rng.uniform(-84, 84, 1000)
    mx, my = W.transform_points(lon, lat, "EPSG:4326", "EPSG:3857")
    lon2, lat2 = W.transform_points(mx, my, "EPSG:3857", "EPSG:4326")
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # known anchor: (0,0) -> (0,0); 180 deg -> pi*R
    x, y = W.transform_points([180.0], [0.0], "EPSG:4326", "EPSG:3857")
    np.testing.assert_allclose(x[0], np.pi * 6378137.0)
    np.testing.assert_allclose(y[0], 0.0, atol=1e-9)


def test_no_transform_path_raises():
    # 'local' never reprojects (not geographic), and CRSs outside the
    # built-in projection table stay honest errors
    with pytest.raises(ValueError):
        W.get_transformer("local", "EPSG:3857")
    with pytest.raises(ValueError):
        W.get_transformer("EPSG:2180", "EPSG:4326")
    # ...but the UTM family transforms now (gdal_drivers_ray.projections)
    x, y = W.get_transformer("EPSG:32633", "EPSG:4326")(
        np.array([500000.0]), np.array([0.0]))
    assert abs(float(x[0]) - 15.0) < 1e-9 and abs(float(y[0])) < 1e-9


def test_identity_warp_exact(ray_session):
    src = _src()
    g = W.RasterGrid(Extents(0.0, 0.0, 770.0, 520.0), "local", 770, 520)
    out = W.warp_tiles(_tiles_from_array(src), g, g, "nearest", nodata=-1.0)
    res = _assemble(out, g, -1.0)
    np.testing.assert_array_equal(res, src)


def test_same_srs_resample_matches_oracle(ray_session):
    """Downscale + shift on the same SRS, bilinear: pipeline == oracle."""
    src = _src()
    sg = W.RasterGrid(Extents(10.0, 20.0, 780.0, 540.0), "local", 770, 520)
    dg = W.RasterGrid(Extents(-25.0, 0.0, 800.0, 560.0), "local", 300, 280)
    for resampling in ("nearest", "bilinear"):
        want = W.warp_oracle(src, sg, dg, resampling, nodata=-5.0)
        out = W.warp_tiles(_tiles_from_array(src), sg, dg, resampling,
                           nodata=-5.0)
        got = _assemble(out, dg, -5.0)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_reproject_4326_to_3857_matches_oracle(ray_session):
    src = _src(ny=400, nx=800)
    sg = W.RasterGrid(Extents(-180.0, -85.0, 180.0, 85.0), "EPSG:4326",
                      800, 400)
    m = np.pi * 6378137.0
    my0, my1 = W.transform_points([0.0, 0.0], [-85.0, 85.0],
                                  "EPSG:4326", "EPSG:3857")[1]
    dg = W.RasterGrid(Extents(-m, float(my0), m, float(my1)), "EPSG:3857",
                      512, 512)
    for resampling in ("nearest", "bilinear"):
        want = W.warp_oracle(src, sg, dg, resampling, nodata=0.0)
        out = W.warp_tiles(_tiles_from_array(src), sg, dg, resampling)
        got = _assemble(out, dg, 0.0)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
        assert (got != 0.0).any()


def test_warp_preserves_float32_source(ray_session):
    src = _src(ny=300, nx=300).astype(np.float32)
    g = W.RasterGrid(Extents(0.0, 0.0, 300.0, 300.0), "local", 300, 300)
    out = W.warp_tiles(_tiles_from_array(src, dtype="float32"), g, g,
                       "nearest", nodata=-1.0)
    res = _assemble(out, g, -1.0)
    np.testing.assert_array_equal(res, src.astype(np.float64))


def _int_src(ny, nx):
    """Integer-valued varying raster: average sums are exact in float64,
    so tiled-vs-oracle comparisons are bitwise even across different
    integral-image windows."""
    iy, ix = np.mgrid[0:ny, 0:nx]
    return ((3 * ix + 5 * iy + (ix * iy) % 7) % 251).astype(np.float64)


def test_cubic_same_srs_matches_oracle(ray_session):
    src = _src()
    sg = W.RasterGrid(Extents(10.0, 20.0, 780.0, 540.0), "local", 770, 520)
    dg = W.RasterGrid(Extents(-25.0, 0.0, 800.0, 560.0), "local", 300, 280)
    want = W.warp_oracle(src, sg, dg, "cubic", nodata=-5.0)
    out = W.warp_tiles(_tiles_from_array(src), sg, dg, "cubic", nodata=-5.0)
    got = _assemble(out, dg, -5.0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    assert (want != -5.0).any()


def test_cubic_reproject_matches_oracle(ray_session):
    src = _src(ny=400, nx=800)
    sg = W.RasterGrid(Extents(-180.0, -85.0, 180.0, 85.0), "EPSG:4326",
                      800, 400)
    m = np.pi * 6378137.0
    my0, my1 = W.transform_points([0.0, 0.0], [-85.0, 85.0],
                                  "EPSG:4326", "EPSG:3857")[1]
    dg = W.RasterGrid(Extents(-m, float(my0), m, float(my1)), "EPSG:3857",
                      512, 512)
    want = W.warp_oracle(src, sg, dg, "cubic", nodata=-1.0)
    out = W.warp_tiles(_tiles_from_array(src), sg, dg, "cubic", nodata=-1.0)
    got = _assemble(out, dg, -1.0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    assert (want >= 0).mean() > 0.3


def test_cubic_constant_fixed_point():
    """A constant raster is a fixed point of the normalized Keys kernel
    (weights sum to 1); the valid area is the 4x4-stencil interior."""
    src = np.full((300, 300), 42.0)
    g = W.RasterGrid(Extents(0.0, 0.0, 300.0, 300.0), "local", 300, 300)
    out = W.warp_oracle(src, g, g, "cubic", nodata=-1.0)
    inner = out[2:-2, 2:-2]
    np.testing.assert_allclose(inner, 42.0, rtol=1e-12)
    # border rows/cols whose stencil leaves the raster are nodata
    assert (out[0] == -1.0).all() and (out[:, 0] == -1.0).all()


def test_average_2x_matches_pyramid_path(ray_session):
    """resampling='average' at an exact 2x downsample reproduces the LOD
    pyramid's 2x2 box filter (stages/pyramid.downsample2) bit-for-bit —
    the reference's downsample semantics through two independent plans."""
    from gdal_drivers_ray.stages.pyramid import downsample2

    src = _int_src(512, 768)
    sg = W.RasterGrid(Extents(0.0, 0.0, 768.0, 512.0), "local", 768, 512)
    dg = W.RasterGrid(Extents(0.0, 0.0, 768.0, 512.0), "local", 384, 256)
    out = W.warp_tiles(_tiles_from_array(src), sg, dg, "average",
                       nodata=-1.0)
    got = _assemble(out, dg, -1.0)
    np.testing.assert_array_equal(got, downsample2(src))


def test_average_fractional_downsample_matches_oracle(ray_session):
    """Non-integer footprints (770x520 -> 300x280 across shifted extents):
    tiled plan == whole-raster oracle within integral-image rounding."""
    src = _src()
    sg = W.RasterGrid(Extents(10.0, 20.0, 780.0, 540.0), "local", 770, 520)
    dg = W.RasterGrid(Extents(-25.0, 0.0, 800.0, 560.0), "local", 300, 280)
    want = W.warp_oracle(src, sg, dg, "average", nodata=-5.0)
    out = W.warp_tiles(_tiles_from_array(src), sg, dg, "average",
                       nodata=-5.0)
    got = _assemble(out, dg, -5.0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)
    assert (want != -5.0).any()


def test_average_reproject_integer_exact(ray_session):
    """Average across a reprojection (4326 -> 3857 downsample) on
    integer-valued data: exact tiled-vs-oracle equality (integer sums)."""
    src = _int_src(400, 800)
    sg = W.RasterGrid(Extents(-180.0, -85.0, 180.0, 85.0), "EPSG:4326",
                      800, 400)
    m = np.pi * 6378137.0
    my0, my1 = W.transform_points([0.0, 0.0], [-85.0, 85.0],
                                  "EPSG:4326", "EPSG:3857")[1]
    dg = W.RasterGrid(Extents(-m, float(my0), m, float(my1)), "EPSG:3857",
                      256, 256)
    want = W.warp_oracle(src, sg, dg, "average", nodata=-1.0)
    out = W.warp_tiles(_tiles_from_array(src), sg, dg, "average",
                       nodata=-1.0)
    got = _assemble(out, dg, -1.0)
    np.testing.assert_array_equal(got, want)
    assert (want >= 0).mean() > 0.5


def test_unknown_resampling_raises(ray_session):
    src = _src(ny=300, nx=300)
    g = W.RasterGrid(Extents(0.0, 0.0, 300.0, 300.0), "local", 300, 300)
    with pytest.raises(ValueError, match="resampling"):
        W.warp_tiles(_tiles_from_array(src), g, g, "cubicspline")


def test_utm_warp_tiled_matches_oracle(ray_session):
    # lat/lon source raster -> UTM zone 33 grid: the tiled shuffle plan
    # must equal the whole-raster oracle EXACTLY. This exercises the 3x3
    # cover stencil on a curved-graticule projection (corner-only cover
    # under-covers Transverse Mercator tiles and would leave nodata holes
    # the oracle fills).
    src = _src(ny=512, nx=768)
    sg = W.RasterGrid(Extents(12.0, 40.0, 18.0, 44.0), "EPSG:4326",
                      768, 512)
    # zone-33 footprint of the same box (corners transformed manually)
    ux, uy = W.transform_points(
        np.array([12.0, 18.0, 12.0, 18.0]), np.array([40.0, 40.0, 44.0, 44.0]),
        "EPSG:4326", "EPSG:32633")
    dg = W.RasterGrid(Extents(float(ux.min()), float(uy.min()),
                              float(ux.max()), float(uy.max())),
                      "EPSG:32633", 512, 512)
    for resampling in ("nearest", "bilinear"):
        out = W.warp_tiles(_tiles_from_array(src), sg, dg, resampling,
                           nodata=-1.0)
        res = _assemble(out, dg, -1.0)
        want = W.warp_oracle(src, sg, dg, resampling, nodata=-1.0)
        np.testing.assert_array_equal(res, want)
        # the UTM box contains real data (not all nodata)
        assert (want >= 0).mean() > 0.5


def test_lanczos_identity_and_constant():
    """Lanczos-3 at exact pixel centers reproduces the raster (sinc zeros
    at integer offsets); a constant raster is a fixed point of the
    normalized kernel away from the 6x6-stencil border."""
    src = _src(ny=64, nx=64)
    g = W.RasterGrid(Extents(0.0, 0.0, 64.0, 64.0), "local", 64, 64)
    out = W.warp_oracle(src, g, g, "lanczos", nodata=-1.0)
    np.testing.assert_allclose(out[3:-3, 3:-3], src[3:-3, 3:-3],
                               rtol=0, atol=1e-9)
    assert (out[0] == -1.0).all() and (out[:, 0] == -1.0).all()
    const = np.full((64, 64), 7.0)
    g2 = W.RasterGrid(Extents(3.3, 2.7, 35.3, 34.7), "local", 64, 64)
    out2 = W.warp_oracle(const, g, g2, "lanczos", nodata=-1.0)
    v = out2[out2 != -1.0]
    assert v.size > 0
    np.testing.assert_allclose(v, 7.0, rtol=1e-12)


def test_lanczos_reproject_matches_oracle(ray_session):
    """Tiled lanczos plan == whole-raster oracle across a curved
    4326 -> 3857 reprojection (seam-straddling 6x6 stencils through the
    4-px cover pad)."""
    src = _src(ny=400, nx=800)
    sg = W.RasterGrid(Extents(-180.0, -85.0, 180.0, 85.0), "EPSG:4326",
                      800, 400)
    m = np.pi * 6378137.0
    my0, my1 = W.transform_points([0.0, 0.0], [-85.0, 85.0],
                                  "EPSG:4326", "EPSG:3857")[1]
    dg = W.RasterGrid(Extents(-m, float(my0), m, float(my1)), "EPSG:3857",
                      512, 512)
    want = W.warp_oracle(src, sg, dg, "lanczos", nodata=-1.0)
    out = W.warp_tiles(_tiles_from_array(src), sg, dg, "lanczos",
                       nodata=-1.0)
    got = _assemble(out, dg, -1.0)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    assert (want >= 0).mean() > 0.3


def test_minmax_exact_downsample():
    """minimum/maximum at an exact 2x downsample equal per-block
    reductions of the source."""
    src = _int_src(256, 512)
    sg = W.RasterGrid(Extents(0.0, 0.0, 512.0, 256.0), "local", 512, 256)
    dg = W.RasterGrid(Extents(0.0, 0.0, 512.0, 256.0), "local", 256, 128)
    blocks = src.reshape(128, 2, 256, 2).transpose(0, 2, 1, 3) \
                .reshape(128, 256, 4)
    got_min = W.warp_oracle(src, sg, dg, "minimum", nodata=-1.0)
    got_max = W.warp_oracle(src, sg, dg, "maximum", nodata=-1.0)
    np.testing.assert_array_equal(got_min, blocks.min(axis=2))
    np.testing.assert_array_equal(got_max, blocks.max(axis=2))


def test_minmax_mode_tiled_matches_oracle(ray_session):
    """Tiled footprint-kernel plans == whole-raster oracle on a
    fractional downsample (variable-size footprints exercise the
    gathered-window sweep)."""
    src = _int_src(520, 770)
    sg = W.RasterGrid(Extents(10.0, 20.0, 780.0, 540.0), "local", 770, 520)
    dg = W.RasterGrid(Extents(-25.0, 0.0, 800.0, 560.0), "local", 300, 280)
    for kern in ("minimum", "maximum", "mode"):
        want = W.warp_oracle(src, sg, dg, kern, nodata=-5.0)
        out = W.warp_tiles(_tiles_from_array(src), sg, dg, kern,
                           nodata=-5.0)
        got = _assemble(out, dg, -5.0)
        np.testing.assert_array_equal(got, want)
        assert (want != -5.0).any()


def test_mode_tie_breaks_to_smallest():
    """mode ties resolve to the SMALLEST member value, deterministically
    (documented engine semantics; GDAL leaves tie order unspecified)."""
    src = np.array([[9.0, 1.0], [1.0, 9.0]]).repeat(2, 0).repeat(2, 1)
    # one dst pixel covering the whole 4x4: members tie 8 vs 8? make 2x2
    sg = W.RasterGrid(Extents(0.0, 0.0, 4.0, 4.0), "local", 4, 4)
    dg = W.RasterGrid(Extents(0.0, 0.0, 4.0, 4.0), "local", 1, 1)
    out = W.warp_oracle(src, sg, dg, "mode", nodata=-1.0)
    assert out[0, 0] == 1.0  # 1 and 9 each appear 8 times -> smallest wins


def test_focal_sum_halo_exchange_matches_oracle(ray_session):
    """Tiled 3x3 focal sum (1-px border-strip halo exchange) == the
    whole-raster stencil, including ragged edge tiles; the raster's
    outer ring is nodata."""
    from gdal_drivers_ray.stages import focal as F

    ny, nx = 300, 520
    src = _int_src(ny, nx)
    tiles = _tiles_from_array(src)
    out = F.focal_sum3(tiles, nx=nx, ny=ny, nodata=-1.0)
    grid = W.RasterGrid(Extents(0.0, 0.0, float(nx), float(ny)),
                        "local", nx, ny)
    got = _assemble(out, grid, -1.0)
    want = F.focal_sum3_oracle(src, -1.0)
    np.testing.assert_array_equal(got, want)
    assert (got[0] == -1.0).all() and (got[:, 0] == -1.0).all()
    assert (got[1:-1, 1:-1] != -1.0).all()


def test_focal_sum_tiny_raster():
    """A raster thinner than the stencil is all nodata."""
    from gdal_drivers_ray.stages import focal as F

    out = F.focal_sum3_oracle(np.ones((2, 5)), -9.0)
    assert (out == -9.0).all()


def test_warp_tiles_multiband(ray_session):
    """Each band warps independently (band is part of the group key):
    a two-band constant raster keeps both bands, each pixel-constant —
    merged groups would mix the bands nondeterministically. Overview
    rows are dropped (their coords are overview units, not level-0)."""
    import numpy as np
    import ray.data

    from gdal_drivers_ray.sources import solid
    from gdal_drivers_ray.stages.warp import RasterGrid, warp_tiles

    world = solid.Extents(0.0, 0.0, 512.0, 512.0)
    spec = solid.SolidSpec(srs="local", size=(512, 512), extents=world,
                           bands=[solid.Band(37.0, "Byte"),
                                  solid.Band(73.0, "Byte")])
    tiles = solid.solid_dataset(spec, include_overviews=True)
    src = RasterGrid(srs="local", extents=world, nx=512, ny=512)
    dst = RasterGrid(srs="local", extents=world, nx=512, ny=512)
    out = warp_tiles(tiles, src, dst, resampling="nearest").to_pandas()
    # 2x2 tiles x 2 bands, every band intact and constant
    assert len(out) == 8
    assert sorted(out["band"].unique().tolist()) == [0, 1]
    for _, r in out.iterrows():
        px = np.frombuffer(r["px"], dtype=np.float64).reshape(256, 256)
        want = 37.0 if r["band"] == 0 else 73.0
        assert (px[:r["valid_h"], :r["valid_w"]] == want).all()
