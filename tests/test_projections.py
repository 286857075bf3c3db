"""Projection math tests: independent numerical checks (meridian-arc
integral, geometric invariants, scale factors) + spelling resolution +
transformer composition. No projection library exists in the container,
so correctness rests on checks that do NOT reuse the series under test."""

import numpy as np
import pytest

from gdal_drivers_ray import projections as P
from gdal_drivers_ray.stages import warp as W


def _trapz(y, x):
    return np.trapz(y, x)


def test_meridian_arc_vs_numerical_integration():
    # M(phi) = a(1-e^2) * integral_0^phi (1 - e^2 sin^2 t)^(-3/2) dt —
    # evaluated numerically, fully independent of the Snyder series
    for deg in (5.0, 23.5, 45.0, 66.6, 80.0):
        phi = np.radians(deg)
        t = np.linspace(0.0, phi, 200_001)
        integral = P.A * (1.0 - P.E2) * _trapz(
            (1.0 - P.E2 * np.sin(t) ** 2) ** -1.5, t)
        assert abs(float(P.meridian_arc(phi)) - integral) < 1e-3  # < 1 mm


def test_utm_central_meridian_equator_is_origin():
    x, y = P.tmerc_forward(15.0, 0.0, 15.0)   # UTM zone 33 CM, equator
    assert abs(float(x) - 500_000.0) < 1e-6
    assert abs(float(y)) < 1e-6


def test_utm_on_cm_is_scaled_meridian_arc():
    lat = 47.0
    _, y = P.tmerc_forward(9.0, lat, 9.0)     # zone 32 CM
    assert abs(float(y) - 0.9996 * float(
        P.meridian_arc(np.radians(lat)))) < 1e-6


def test_utm_south_false_northing():
    pd_n = P.utm_projdef(33, south=False)
    pd_s = P.utm_projdef(33, south=True)
    xn, yn = pd_n.forward(16.0, -33.0)
    xs, ys = pd_s.forward(16.0, -33.0)
    assert abs(float(xs) - float(xn)) < 1e-9
    assert abs(float(ys) - (float(yn) + 10_000_000.0)) < 1e-9


def test_tmerc_longitude_symmetry():
    # x is antisymmetric and y symmetric about the central meridian
    x1, y1 = P.tmerc_forward(15.0 + 2.3, 40.0, 15.0)
    x2, y2 = P.tmerc_forward(15.0 - 2.3, 40.0, 15.0)
    assert abs((float(x1) - 500_000.0) + (float(x2) - 500_000.0)) < 1e-6
    assert abs(float(y1) - float(y2)) < 1e-6


def test_tmerc_roundtrip_across_zone():
    lon = 15.0 + np.linspace(-3.0, 3.0, 13)
    lat = np.linspace(-80.0, 84.0, 21)
    LO, LA = np.meshgrid(lon, lat)
    x, y = P.tmerc_forward(LO.ravel(), LA.ravel(), 15.0)
    lo2, la2 = P.tmerc_inverse(x, y, 15.0)
    # the Redfearn series truncation reaches ~1e-8 deg (~1 mm) at the
    # zone edge above 80 deg latitude; sub-mm elsewhere
    assert np.abs(lo2 - LO.ravel()).max() < 2e-8
    assert np.abs(la2 - LA.ravel()).max() < 2e-8


def test_scale_factor_at_cm_is_k0():
    # ds_projected/ds_ellipsoid along the CM must equal k0 = 0.9996
    lat = 31.0
    dphi = 1e-6
    _, y1 = P.tmerc_forward(15.0, lat, 15.0)
    _, y2 = P.tmerc_forward(15.0, lat + np.degrees(dphi), 15.0)
    # ellipsoidal meridian arc for dphi: rho * dphi
    w = 1.0 - P.E2 * np.sin(np.radians(lat)) ** 2
    rho = P.A * (1.0 - P.E2) / w ** 1.5
    k = (float(y2) - float(y1)) / (rho * dphi)
    assert abs(k - 0.9996) < 1e-6


def test_lcc_scale_unity_on_standard_parallels():
    # On a standard parallel the 2SP cone is true-to-scale: a small
    # east-west step of dlam projects to nu cos(phi) dlam meters
    lat1, lat2 = 33.0, 45.0
    pd = P.ProjDef("lcc", lon0=-96.0, lat0=39.0, lat1=lat1, lat2=lat2)
    for latp in (lat1, lat2):
        dlam = 1e-6
        x1, y1 = pd.forward(-96.0, latp)
        x2, y2 = pd.forward(-96.0 + np.degrees(dlam), latp)
        d_proj = np.hypot(float(x2) - float(x1), float(y2) - float(y1))
        nu = P.A / np.sqrt(1.0 - P.E2 * np.sin(np.radians(latp)) ** 2)
        d_true = nu * np.cos(np.radians(latp)) * dlam
        assert abs(d_proj / d_true - 1.0) < 1e-6
    # ...and strictly > 1 outside the parallels, < 1 between them
    def k_at(latp):
        dlam = 1e-6
        x1, y1 = pd.forward(-96.0, latp)
        x2, y2 = pd.forward(-96.0 + np.degrees(dlam), latp)
        nu = P.A / np.sqrt(1.0 - P.E2 * np.sin(np.radians(latp)) ** 2)
        return np.hypot(float(x2) - float(x1), float(y2) - float(y1)) / (
            nu * np.cos(np.radians(latp)) * dlam)
    assert k_at(39.0) < 1.0
    assert k_at(25.0) > 1.0 and k_at(50.0) > 1.0


def test_lcc_roundtrip():
    pd = P.ProjDef("lcc", lon0=-96.0, lat0=39.0, lat1=33.0, lat2=45.0,
                   fe=1_000_000.0, fn=2_000_000.0)
    lon = -96.0 + np.linspace(-20.0, 20.0, 11)
    lat = np.linspace(20.0, 60.0, 11)
    LO, LA = np.meshgrid(lon, lat)
    x, y = pd.forward(LO.ravel(), LA.ravel())
    lo2, la2 = pd.inverse(x, y)
    assert np.abs(lo2 - LO.ravel()).max() < 1e-9
    assert np.abs(la2 - LA.ravel()).max() < 1e-9


_WKT_UTM33_NO_AUTH = (
    'PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",DATUM["WGS_1984",'
    'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Transverse_Mercator"],'
    'PARAMETER["latitude_of_origin",0],'
    'PARAMETER["central_meridian",15],'
    'PARAMETER["scale_factor",0.9996],'
    'PARAMETER["false_easting",500000],'
    'PARAMETER["false_northing",0],UNIT["metre",1]]')


def test_spellings_resolve_to_same_transform():
    # EPSG code, proj4 (utm + tmerc forms) and parameter-WKT (no
    # AUTHORITY node, so the PARAMETER path must do the work) must all
    # produce identical coordinates
    pds = [P.projection_of("EPSG:32633"),
           P.projection_of("+proj=utm +zone=33 +datum=WGS84"),
           P.projection_of("+proj=tmerc +lat_0=0 +lon_0=15 +k=0.9996 "
                           "+x_0=500000 +y_0=0 +ellps=WGS84"),
           P.projection_of(_WKT_UTM33_NO_AUTH)]
    ref = pds[0].forward(13.4, 52.5)
    for pd in pds[1:]:
        x, y = pd.forward(13.4, 52.5)
        assert abs(float(x) - float(ref[0])) < 1e-9
        assert abs(float(y) - float(ref[1])) < 1e-9


def test_transformer_utm_pair_and_hub_composition():
    # EPSG:32633 -> EPSG:3857 through the public transformer == manual
    # inverse-then-forward composition
    tr = W.get_transformer("EPSG:32633", "EPSG:3857")
    pd = P.projection_of("EPSG:32633")
    x, y = pd.forward(np.array([13.4, 16.1]), np.array([52.5, 48.2]))
    mx, my = tr(x, y)
    lon, lat = pd.inverse(x, y)
    ex, ey = W.transform_points(lon, lat, "EPSG:4326", "EPSG:3857")
    assert np.abs(mx - ex).max() < 1e-9
    assert np.abs(my - ey).max() < 1e-9


def test_transformer_4326_to_utm_matches_forward():
    tr = W.get_transformer("EPSG:4326", "EPSG:32733")   # 33 south
    x, y = tr(np.array([16.0]), np.array([-33.0]))
    ex, ey = P.utm_projdef(33, south=True).forward(16.0, -33.0)
    assert abs(float(x) - float(ex)) < 1e-9
    assert abs(float(y) - float(ey)) < 1e-9


def test_unsupported_crs_still_raises():
    with pytest.raises(ValueError, match="no transform path"):
        W.get_transformer("EPSG:2180", "EPSG:4326")     # non-WGS84 grid
    with pytest.raises(ValueError, match="WGS84-only"):
        P.projection_of("+proj=tmerc +lon_0=19 +ellps=GRS80")
    with pytest.raises(ValueError, match="unrecognized SRS"):
        W.get_transformer("utter garbage", "EPSG:4326")


def test_mercator_pair_unchanged_by_dispatch():
    # the new resolution path must NOT perturb the SQL-oracle-pinned
    # spherical pair
    x, y = W.transform_points([12.0], [51.0], "EPSG:4326", "EPSG:3857")
    assert abs(float(x[0]) - 6378137.0 * np.radians(12.0)) < 1e-9
    assert abs(float(y[0]) - 6378137.0 * np.log(
        np.tan(np.pi / 4.0 + np.radians(51.0) / 2.0))) < 1e-9


# --- property tests: random points within each projection's domain -------

from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(st.floats(-3.0, 3.0), st.floats(-80.0, 84.0),
       st.integers(1, 60), st.booleans())
def test_tmerc_roundtrip_property(dlon, lat, zone, south):
    pd_ = P.utm_projdef(zone, south=south)
    lon = pd_.lon0 + dlon
    x, y = pd_.forward(lon, lat)
    lo2, la2 = pd_.inverse(x, y)
    assert abs(float(lo2) - lon) < 2e-8
    assert abs(float(la2) - lat) < 2e-8


@settings(max_examples=200, deadline=None)
@given(st.floats(-20.0, 20.0), st.floats(20.0, 60.0))
def test_lcc_roundtrip_property(dlon, lat):
    pd_ = P.ProjDef("lcc", lon0=-96.0, lat0=39.0, lat1=33.0, lat2=45.0)
    lon = -96.0 + dlon
    x, y = pd_.forward(lon, lat)
    lo2, la2 = pd_.inverse(x, y)
    assert abs(float(lo2) - lon) < 1e-9
    assert abs(float(la2) - lat) < 1e-9


@settings(max_examples=100, deadline=None)
@given(st.floats(-2.5, 2.5), st.floats(-75.0, 75.0), st.integers(1, 60))
def test_utm_spellings_property(dlon, lat, zone):
    # EPSG code and proj4 spellings must transform identically everywhere
    a = P.projection_of(32600 + zone)
    b = P.projection_of(f"+proj=utm +zone={zone} +datum=WGS84")
    xa, ya = a.forward(a.lon0 + dlon, lat)
    xb, yb = b.forward(a.lon0 + dlon, lat)
    assert float(xa) == float(xb) and float(ya) == float(yb)


def test_proj4_scientific_notation_and_guards():
    import pytest

    from gdal_drivers_ray.projections import projdef_from_proj4

    # positive-exponent values must tokenize (the old '+'-split broke them)
    d = projdef_from_proj4(
        "+proj=tmerc +lat_0=0 +lon_0=9 +k=0.9996 +x_0=3.5e+06 +y_0=0 "
        "+datum=WGS84")
    assert d is not None and d.fe == 3.5e6
    # non-WGS84 axes raise honestly instead of silently projecting wrong
    with pytest.raises(ValueError, match="WGS84|[+]b"):
        projdef_from_proj4("+proj=tmerc +lon_0=9 +a=6378137 +b=6378137")
    # LCC-1SP scale factor is unimplemented -> raise, never drop
    with pytest.raises(ValueError, match="k_0"):
        projdef_from_proj4(
            "+proj=lcc +lat_1=49 +lat_0=49 +lon_0=-95 +k_0=0.999 "
            "+datum=WGS84")


def test_wkt_equator_parallel_and_sphere_guard():
    import pytest

    from gdal_drivers_ray.projections import projdef_from_wkt

    wkt = ('PROJCS["t",GEOGCS["g",DATUM["WGS_1984",SPHEROID["WGS 84",'
           '6378137,298.257223563]]],PROJECTION["Lambert_Conformal_'
           'Conic_2SP"],PARAMETER["standard_parallel_1",30],'
           'PARAMETER["standard_parallel_2",0],'
           'PARAMETER["central_meridian",-95]]')
    d = projdef_from_wkt(wkt)
    assert d.lat2 == 0.0        # `or` fallback would have picked 30
    with pytest.raises(ValueError, match="ellipsoid"):
        projdef_from_wkt(wkt.replace("298.257223563", "0"))
