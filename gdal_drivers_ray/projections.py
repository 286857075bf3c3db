"""Pure-NumPy ellipsoidal map projections (WGS84).

Closes the reference's "any WKT / proj4 / EPSG SRS" transform surface
(detail/srsholder.hpp:39-62 accepts arbitrary SrsDefinition spellings and
GDAL supplies the math) without a projection library in the container:
the math is implemented here from the public formulas —

- Transverse Mercator (+ the UTM zone family EPSG:326xx / 327xx):
  Snyder, "Map Projections: A Working Manual", USGS PP 1395 (public
  domain), eqs. 3-21, 8-9..8-25 (the Redfearn series, the same series
  EPSG Guidance Note 7-2 publishes as "Transverse Mercator").
- Lambert Conformal Conic 2SP: Snyder eqs. 14-15, 15-1..15-11.
- Spherical ("Web") Mercator EPSG:3857 and geographic EPSG:4326 are kept
  in stages/warp.py (their public formulas predate this module and the
  SQL oracles pin their exact expression order).

Everything is vectorized float64 NumPy over coordinate arrays; a
ProjDef is plain data so transformer closures build once per worker
(stages/warp.get_transformer's lru_cache) and ship nothing but floats.

Accuracy: the series are exact to < 1mm within a UTM zone's +-3 degrees
of the central meridian (tests verify round-trip < 1e-9 deg and check
the meridian arc against independent numerical integration).

Supported input spellings (resolved by ``projection_of``):
- EPSG codes: 4326, 3857, 32601-32660 (UTM north), 32701-32760 (south);
- proj4: +proj=utm/tmerc/lcc/longlat/merc with their standard params
  (WGS84 datum only — other ellipsoids raise, honestly);
- WKT1: PROJECTION["Transverse_Mercator"|"Lambert_Conformal_Conic_2SP"]
  with PARAMETER[...] nodes on a WGS84 GEOGCS.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Optional

import numpy as np

# WGS84 (public EPSG:7030 definition)
A = 6378137.0
F = 1.0 / 298.257223563
E2 = F * (2.0 - F)                 # first eccentricity squared
EP2 = E2 / (1.0 - E2)              # second eccentricity squared
E = math.sqrt(E2)

# Meridian-arc series coefficients (Snyder 3-21). Module-level floats so
# the SQL oracle can embed the IDENTICAL constants (bit-equal arithmetic).
M_C0 = 1.0 - E2 / 4.0 - 3.0 * E2 ** 2 / 64.0 - 5.0 * E2 ** 3 / 256.0
M_C2 = 3.0 * E2 / 8.0 + 3.0 * E2 ** 2 / 32.0 + 45.0 * E2 ** 3 / 1024.0
M_C4 = 15.0 * E2 ** 2 / 256.0 + 45.0 * E2 ** 3 / 1024.0
M_C6 = 35.0 * E2 ** 3 / 3072.0

# Footpoint-latitude series coefficients (Snyder 3-26), e1 = (1-b/a)/(1+b/a)
_E1 = (1.0 - math.sqrt(1.0 - E2)) / (1.0 + math.sqrt(1.0 - E2))
F_C2 = 3.0 * _E1 / 2.0 - 27.0 * _E1 ** 3 / 32.0
F_C4 = 21.0 * _E1 ** 2 / 16.0 - 55.0 * _E1 ** 4 / 32.0
F_C6 = 151.0 * _E1 ** 3 / 96.0
F_C8 = 1097.0 * _E1 ** 4 / 512.0


def meridian_arc(lat_rad: np.ndarray) -> np.ndarray:
    """Distance along the meridian from the equator, M(phi) (Snyder 3-21)."""
    p = np.asarray(lat_rad, dtype=np.float64)
    return A * (M_C0 * p - M_C2 * np.sin(2.0 * p)
                + M_C4 * np.sin(4.0 * p) - M_C6 * np.sin(6.0 * p))


def tmerc_forward(lon_deg, lat_deg, lon0_deg: float, lat0_deg: float = 0.0,
                  k0: float = 0.9996, fe: float = 500000.0, fn: float = 0.0):
    """Ellipsoidal Transverse Mercator forward (Snyder 8-9..8-13)."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon0 = math.radians(lon0_deg)
    sin_lat = np.sin(lat)
    cos_lat = np.cos(lat)
    n = A / np.sqrt(1.0 - E2 * sin_lat ** 2)
    t = np.tan(lat) ** 2
    c = EP2 * cos_lat ** 2
    a_ = (lon - lon0) * cos_lat
    m = meridian_arc(lat)
    m0 = meridian_arc(np.float64(math.radians(lat0_deg)))
    x = fe + k0 * n * (a_ + (1.0 - t + c) * a_ ** 3 / 6.0
                       + (5.0 - 18.0 * t + t ** 2 + 72.0 * c
                          - 58.0 * EP2) * a_ ** 5 / 120.0)
    y = fn + k0 * (m - m0 + n * np.tan(lat) * (
        a_ ** 2 / 2.0
        + (5.0 - t + 9.0 * c + 4.0 * c ** 2) * a_ ** 4 / 24.0
        + (61.0 - 58.0 * t + t ** 2 + 600.0 * c
           - 330.0 * EP2) * a_ ** 6 / 720.0))
    return x, y


def tmerc_inverse(x, y, lon0_deg: float, lat0_deg: float = 0.0,
                  k0: float = 0.9996, fe: float = 500000.0, fn: float = 0.0):
    """Ellipsoidal Transverse Mercator inverse (Snyder 8-16..8-25)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    m0 = meridian_arc(np.float64(math.radians(lat0_deg)))
    m = m0 + (y - fn) / k0
    mu = m / (A * M_C0)
    p1 = mu + F_C2 * np.sin(2.0 * mu) + F_C4 * np.sin(4.0 * mu) \
        + F_C6 * np.sin(6.0 * mu) + F_C8 * np.sin(8.0 * mu)
    sin_p1 = np.sin(p1)
    cos_p1 = np.cos(p1)
    c1 = EP2 * cos_p1 ** 2
    t1 = np.tan(p1) ** 2
    w = 1.0 - E2 * sin_p1 ** 2
    n1 = A / np.sqrt(w)
    r1 = A * (1.0 - E2) / w ** 1.5
    d = (x - fe) / (n1 * k0)
    lat = p1 - (n1 * np.tan(p1) / r1) * (
        d ** 2 / 2.0
        - (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 ** 2
           - 9.0 * EP2) * d ** 4 / 24.0
        + (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 ** 2
           - 252.0 * EP2 - 3.0 * c1 ** 2) * d ** 6 / 720.0)
    lon = math.radians(lon0_deg) + (
        d - (1.0 + 2.0 * t1 + c1) * d ** 3 / 6.0
        + (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 ** 2
           + 8.0 * EP2 + 24.0 * t1 ** 2) * d ** 5 / 120.0) / cos_p1
    return np.degrees(lon), np.degrees(lat)


def _lcc_m(lat: np.ndarray) -> np.ndarray:
    """Snyder 14-15: m = cos(phi) / sqrt(1 - e^2 sin^2 phi)."""
    return np.cos(lat) / np.sqrt(1.0 - E2 * np.sin(lat) ** 2)


def _lcc_t(lat: np.ndarray) -> np.ndarray:
    """Snyder 15-9: t = tan(pi/4 - phi/2) / ((1-e sin)/(1+e sin))^(e/2)."""
    s = np.sin(lat)
    return np.tan(np.pi / 4.0 - lat / 2.0) / \
        ((1.0 - E * s) / (1.0 + E * s)) ** (E / 2.0)


def lcc_forward(lon_deg, lat_deg, lat1_deg: float, lat2_deg: float,
                lat0_deg: float, lon0_deg: float,
                fe: float = 0.0, fn: float = 0.0):
    """Lambert Conformal Conic 2SP forward (Snyder 15-1..15-4)."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    l1, l2 = math.radians(lat1_deg), math.radians(lat2_deg)
    l0, ln0 = math.radians(lat0_deg), math.radians(lon0_deg)
    m1, m2 = float(_lcc_m(np.float64(l1))), float(_lcc_m(np.float64(l2)))
    t1, t2 = float(_lcc_t(np.float64(l1))), float(_lcc_t(np.float64(l2)))
    t0 = float(_lcc_t(np.float64(l0)))
    if abs(l1 - l2) > 1e-12:
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    else:
        n = math.sin(l1)
    f_ = m1 / (n * t1 ** n)
    rho0 = A * f_ * t0 ** n
    rho = A * f_ * _lcc_t(lat) ** n
    th = n * (lon - ln0)
    return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)


def lcc_inverse(x, y, lat1_deg: float, lat2_deg: float,
                lat0_deg: float, lon0_deg: float,
                fe: float = 0.0, fn: float = 0.0):
    """Lambert Conformal Conic 2SP inverse (Snyder 15-5..15-11; the
    latitude is the standard fixed-point iteration on eq. 7-9, which
    converges to float64 precision in < 10 rounds)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    l1, l2 = math.radians(lat1_deg), math.radians(lat2_deg)
    l0, ln0 = math.radians(lat0_deg), math.radians(lon0_deg)
    m1, m2 = float(_lcc_m(np.float64(l1))), float(_lcc_m(np.float64(l2)))
    t1, t2 = float(_lcc_t(np.float64(l1))), float(_lcc_t(np.float64(l2)))
    t0 = float(_lcc_t(np.float64(l0)))
    if abs(l1 - l2) > 1e-12:
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    else:
        n = math.sin(l1)
    f_ = m1 / (n * t1 ** n)
    rho0 = A * f_ * t0 ** n
    dx, dy = x - fe, rho0 - (y - fn)
    rho = np.sign(n) * np.sqrt(dx ** 2 + dy ** 2)
    t = (rho / (A * f_)) ** (1.0 / n)
    th = np.arctan2(np.sign(n) * dx, np.sign(n) * dy)
    lon = th / n + ln0
    lat = np.pi / 2.0 - 2.0 * np.arctan(t)
    for _ in range(12):
        s = E * np.sin(lat)
        lat = np.pi / 2.0 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (E / 2.0))
    return np.degrees(lon), np.degrees(lat)


# ---------------------------------------------------------------------------
# ProjDef resolution: EPSG / proj4 / WKT1 -> plain projection parameters
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ProjDef:
    """A resolved projection: kind + parameters. 'longlat' and 'merc_sph'
    carry no params (their formulas live in stages/warp.py)."""

    kind: str            # 'longlat' | 'merc_sph' | 'tmerc' | 'lcc'
    lon0: float = 0.0
    lat0: float = 0.0
    lat1: float = 0.0
    lat2: float = 0.0
    k0: float = 1.0
    fe: float = 0.0
    fn: float = 0.0

    def forward(self, lon, lat):
        """(lon, lat) degrees -> projected (x, y) meters."""
        if self.kind == "longlat":
            return (np.asarray(lon, np.float64), np.asarray(lat, np.float64))
        if self.kind == "tmerc":
            return tmerc_forward(lon, lat, self.lon0, self.lat0,
                                 self.k0, self.fe, self.fn)
        if self.kind == "lcc":
            return lcc_forward(lon, lat, self.lat1, self.lat2,
                               self.lat0, self.lon0, self.fe, self.fn)
        raise ValueError(f"no forward for kind {self.kind!r}")

    def inverse(self, x, y):
        """Projected (x, y) meters -> (lon, lat) degrees."""
        if self.kind == "longlat":
            return (np.asarray(x, np.float64), np.asarray(y, np.float64))
        if self.kind == "tmerc":
            return tmerc_inverse(x, y, self.lon0, self.lat0,
                                 self.k0, self.fe, self.fn)
        if self.kind == "lcc":
            return lcc_inverse(x, y, self.lat1, self.lat2,
                               self.lat0, self.lon0, self.fe, self.fn)
        raise ValueError(f"no inverse for kind {self.kind!r}")


def utm_projdef(zone: int, south: bool = False) -> ProjDef:
    """UTM zone -> tmerc params (the public EPSG:326xx/327xx definition)."""
    if not 1 <= zone <= 60:
        raise ValueError(f"UTM zone out of range: {zone}")
    return ProjDef("tmerc", lon0=-183.0 + 6.0 * zone, lat0=0.0, k0=0.9996,
                   fe=500000.0, fn=10000000.0 if south else 0.0)


def projdef_for_epsg(code: int) -> Optional[ProjDef]:
    if code == 4326:
        return ProjDef("longlat")
    if code == 3857:
        return ProjDef("merc_sph")
    if 32601 <= code <= 32660:
        return utm_projdef(code - 32600, south=False)
    if 32701 <= code <= 32760:
        return utm_projdef(code - 32700, south=True)
    return None


def _proj4_tokens(text: str) -> dict:
    # split on WHITESPACE and keep '+'-prefixed tokens: inserting a space
    # before every '+' would split scientific-notation values with
    # positive exponents ('+x_0=3.5e+06' -> '3.5e' / '+06')
    toks = dict(t.split("=", 1) if "=" in t else (t, "")
                for t in text.split()
                if t.startswith("+"))
    return {k.lstrip("+"): v for k, v in toks.items()}


_WGS84_ELLPS = {"WGS84", "wgs84"}


def _require_wgs84(toks: dict, text: str) -> None:
    dat = toks.get("datum") or toks.get("ellps")
    if dat is not None and dat not in _WGS84_ELLPS:
        raise ValueError(
            f"unsupported ellipsoid {dat!r} in {text[:60]!r} "
            "(built-in projections are WGS84-only)")
    # explicit axis tokens must ALSO match WGS84 — '+a=6378137 +b=6378137'
    # (the authalic sphere) has the right semi-major axis but zero
    # flattening, and projecting it with WGS84 eccentricity is silently
    # wrong by up to ~20 km
    if "a" in toks and abs(float(toks["a"]) - A) > 1e-3:
        raise ValueError("unsupported +a (built-in projections are "
                         "WGS84-only)")
    if "R" in toks:
        raise ValueError("spherical +R ellipsoid is not WGS84")
    if "b" in toks and abs(float(toks["b"]) - A * (1.0 - F)) > 1e-3:
        raise ValueError("unsupported +b (built-in projections are "
                         "WGS84-only)")
    if "f" in toks and abs(float(toks["f"]) - F) > 1e-12:
        raise ValueError("unsupported +f (built-in projections are "
                         "WGS84-only)")


def projdef_from_proj4(text: str) -> Optional[ProjDef]:
    toks = _proj4_tokens(text)
    proj = toks.get("proj")
    if proj is None:
        return None
    g = lambda k, d=0.0: float(toks[k]) if k in toks else d  # noqa: E731
    if proj == "longlat":
        return ProjDef("longlat")
    if proj == "merc":
        # the spherical (Web-Mercator) signature handled by srs._proj4_epsg;
        # ellipsoidal +proj=merc is not implemented -> honest error
        if toks.get("a") == "6378137" and (
                toks.get("b") == "6378137" or toks.get("R") == "6378137"
                or "nadgrids" in toks):
            return ProjDef("merc_sph")
        raise ValueError("ellipsoidal +proj=merc not implemented "
                         "(spherical EPSG:3857 signature is)")
    if proj == "utm":
        _require_wgs84(toks, text)
        return utm_projdef(int(toks["zone"]), south="south" in toks)
    if proj == "tmerc":
        _require_wgs84(toks, text)
        return ProjDef("tmerc", lon0=g("lon_0"), lat0=g("lat_0"),
                       k0=g("k", g("k_0", 1.0)), fe=g("x_0"), fn=g("y_0"))
    if proj == "lcc":
        _require_wgs84(toks, text)
        if g("k_0", g("k", 1.0)) != 1.0:
            # LCC-1SP scale factors are not implemented; dropping one
            # silently would misplace every coordinate by ~k_0-1
            raise ValueError("+proj=lcc with k_0 != 1 (LCC-1SP scale) "
                             "not implemented")
        return ProjDef("lcc", lon0=g("lon_0"), lat0=g("lat_0"),
                       lat1=g("lat_1"), lat2=g("lat_2", g("lat_1")),
                       fe=g("x_0"), fn=g("y_0"))
    return None


_WKT_PROJECTION_RE = re.compile(r'PROJECTION\s*\[\s*"([^"]+)"', re.I)
_WKT_PARAM_RE = re.compile(
    r'PARAMETER\s*\[\s*"([^"]+)"\s*,\s*([-+0-9.eE]+)\s*\]', re.I)
_WKT_SPHEROID_RE = re.compile(
    r'SPHEROID\s*\[\s*"[^"]*"\s*,\s*([-+0-9.eE]+)\s*,\s*([-+0-9.eE]+)',
    re.I)

_WKT_PROJ_KINDS = {
    "transverse_mercator": "tmerc",
    "lambert_conformal_conic_2sp": "lcc",
    "lambert_conformal_conic": "lcc",
}


def projdef_from_wkt(text: str) -> Optional[ProjDef]:
    m = _WKT_PROJECTION_RE.search(text)
    if not m:
        return None  # bare GEOGCS etc. — let EPSG resolution handle it
    kind = _WKT_PROJ_KINDS.get(m.group(1).strip().lower())
    if kind is None:
        raise ValueError(f"unsupported WKT PROJECTION {m.group(1)!r}")
    sph = _WKT_SPHEROID_RE.search(text)
    if sph and (abs(float(sph.group(1)) - A) > 1e-3
                or abs(float(sph.group(2)) - 1.0 / F) > 1e-6):
        # BOTH axes matter: the authalic sphere shares WGS84's semi-major
        # axis but has inverse flattening 0 — projecting it with WGS84
        # eccentricity is silently wrong by up to ~20 km
        raise ValueError("unsupported WKT ellipsoid "
                         "(built-in projections are WGS84-only)")
    p = {k.strip().lower(): float(v)
         for k, v in _WKT_PARAM_RE.findall(text)}
    g = lambda *ks: next((p[k] for k in ks if k in p), 0.0)  # noqa: E731
    if kind == "tmerc":
        return ProjDef("tmerc",
                       lon0=g("central_meridian", "longitude_of_origin"),
                       lat0=g("latitude_of_origin"),
                       k0=g("scale_factor") or 1.0,
                       fe=g("false_easting"), fn=g("false_northing"))
    # explicit membership test: `or` would treat a legal
    # standard_parallel_2 == 0.0 (equator) as missing and pick the
    # wrong cone
    lat2 = p["standard_parallel_2"] if "standard_parallel_2" in p \
        else g("standard_parallel_1")
    return ProjDef("lcc",
                   lon0=g("central_meridian", "longitude_of_origin"),
                   lat0=g("latitude_of_origin"),
                   lat1=g("standard_parallel_1"),
                   lat2=lat2,
                   fe=g("false_easting"), fn=g("false_northing"))


def projection_of(srs_text) -> ProjDef:
    """Any SRS spelling -> ProjDef, or raise with the canonical name.

    Resolution order mirrors srs.parse_srs: EPSG code first (covers every
    spelling that resolves to a known code), then the proj4 / WKT1
    parameter forms for definitions without a known code."""
    from .srs import parse_srs

    d = parse_srs(srs_text)
    if d.kind == "local":
        # 'local' coordinates are not geographic: they can identity-map to
        # themselves (handled upstream) but never reproject
        raise ValueError("no transform path for 'local' coordinates")
    if d.epsg is not None:
        pd = projdef_for_epsg(d.epsg)
        if pd is not None:
            return pd
    if d.kind == "proj4":
        pd = projdef_from_proj4(d.text)
        if pd is not None:
            return pd
    if d.kind == "wkt":
        pd = projdef_from_wkt(d.text)
        if pd is not None:
            return pd
    raise ValueError(
        f"no transform path for {d.canonical!r} (built-in projections: "
        "EPSG:4326, EPSG:3857, UTM EPSG:326xx/327xx, +proj=tmerc/lcc/utm, "
        "WKT Transverse_Mercator / Lambert_Conformal_Conic_2SP on WGS84)")
