"""SRS definition surface (srs.py): classification, authority resolution,
canonicalization, WKT round-trip, and transformer hookup — the
geo::SrsDefinition semantics behind srsholder.hpp:39-62."""

import numpy as np
import pytest

from gdal_drivers_ray import srs
from gdal_drivers_ray.stages import warp


def test_classify_epsg_forms():
    for spelling in ["EPSG:4326", "epsg:4326", " EPSG : 4326 ", "4326", 4326]:
        d = srs.parse_srs(spelling)
        assert d.kind == "epsg" and d.epsg == 4326
        assert d.canonical == "EPSG:4326"


def test_classify_local():
    assert srs.parse_srs("").kind == "local"
    assert srs.parse_srs(None).canonical == "local"
    assert srs.parse_srs("local").canonical == "local"


def test_classify_proj4_signatures():
    d = srs.parse_srs("+proj=longlat +datum=WGS84 +no_defs")
    assert d.kind == "proj4" and d.epsg == 4326
    d = srs.parse_srs("+proj=merc +a=6378137 +b=6378137 +lat_ts=0 "
                      "+lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m "
                      "+nadgrids=@null +no_defs")
    assert d.epsg == 3857
    d = srs.parse_srs("+init=epsg:32633")
    assert d.epsg == 32633
    # a valid but unknown proj4 parses with no code
    d = srs.parse_srs("+proj=utm +zone=33 +datum=WGS84")
    assert d.kind == "proj4" and d.epsg is None


def test_classify_wkt_authority_resolution():
    d = srs.parse_srs(srs.WKT_EPSG_4326)
    assert d.kind == "wkt" and d.epsg == 4326
    d = srs.parse_srs(srs.WKT_EPSG_3857)
    # the LAST authority is the CRS's own code (not the nested datum codes)
    assert d.epsg == 3857
    # WKT without authority parses, canonical = original text
    plain = 'LOCAL_CS["pixel grid",UNIT["metre",1]]'
    d = srs.parse_srs(plain)
    assert d.kind == "wkt" and d.epsg is None and d.canonical == plain


def test_invalid_srs_raises():
    for bad in ["not an srs", "EPSG:abc", "GEOGCS", "12a4"]:
        with pytest.raises(ValueError):
            srs.parse_srs(bad)


def test_wkt_round_trip():
    assert srs.parse_srs(srs.parse_srs("EPSG:3857").to_wkt()).epsg == 3857
    assert srs.parse_srs("EPSG:4326").to_wkt() == srs.WKT_EPSG_4326
    with pytest.raises(ValueError):
        srs.parse_srs("EPSG:32633").to_wkt()


def test_transformer_accepts_any_spelling():
    xs = np.array([10.0])
    ys = np.array([45.0])
    base = warp.transform_points(xs, ys, "EPSG:4326", "EPSG:3857")
    for src in [srs.WKT_EPSG_4326, "+proj=longlat +datum=WGS84", "4326"]:
        for dst in [srs.WKT_EPSG_3857, "epsg:3857"]:
            got = warp.transform_points(xs, ys, src, dst)
            np.testing.assert_allclose(got, base)


def test_transformer_valid_but_unsupported_crs():
    # parses fine; projection table lacks it -> clear canonical-name error
    # (EPSG:32633 moved to the supported set in gdal_drivers_ray.projections,
    # so the unsupported example is a non-WGS84 national grid)
    with pytest.raises(ValueError, match="no transform path.*EPSG:2180"):
        warp.get_transformer("EPSG:2180", "EPSG:4326")
    # same CRS in different spellings = identity, even when unsupported
    f = warp.get_transformer("2180", "EPSG:2180")
    np.testing.assert_array_equal(f([1.0], [2.0])[0], [1.0])


def test_wkt_inner_authority_not_mistaken_for_crs_code():
    """A custom PROJCS with no CRS-level AUTHORITY but a standard
    UNIT[...AUTHORITY 9001] must NOT resolve to EPSG:9001."""
    from gdal_drivers_ray.srs import parse_srs

    wkt = ('PROJCS["custom",GEOGCS["WGS 84",DATUM["WGS_1984",'
           'SPHEROID["WGS 84",6378137,298.257223563]],'
           'AUTHORITY["EPSG","4326"]],'
           'PROJECTION["Transverse_Mercator"],'
           'PARAMETER["central_meridian",9],'
           'UNIT["metre",1,AUTHORITY["EPSG","9001"]]]')
    d = parse_srs(wkt)
    assert d.epsg is None           # no depth-1 code -> honest None
    # a REAL top-level AUTHORITY still resolves
    d2 = parse_srs(wkt[:-1] + ',AUTHORITY["EPSG","32632"]]')
    assert d2.epsg == 32632
