"""SRS definition parsing/validation — the reference's SrsDefinition
surface (/root/reference/gdal-drivers/detail/srsholder.hpp:39-62 delegates
to geo::SrsDefinition, which accepts WKT / proj4 / EPSG strings and
normalizes them; config parse sites: solid.cpp:181-182, mask.cpp:278-283).

This module re-creates that surface from the PUBLIC formats themselves:

- classification of an SRS string into {local, epsg, proj4, wkt};
- authority-code resolution (EPSG:nnnn, +init=epsg:nnnn, the top-level
  AUTHORITY node of WKT1, well-known proj4 signatures);
- canonicalization so every spelling of a CRS maps to one key;
- validation (garbage raises, with the offending text).

Actual coordinate transforms are delegated to stages/warp.py, which
implements the spherical-Mercator pair from the public EPSG formulas (no
projection library ships in this container). Any OTHER valid CRS parses
and validates here but raises a clear "no transform path" error when a
transform is requested — the parse/validate surface is complete, the
transform table is the container-limited part.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional, Union

# WKT1 for the two CRSs with built-in transforms, written from the public
# EPSG registry definitions (4326 geographic WGS84; 3857 spherical
# Mercator). Exposed so datasets can carry real WKT metadata.
WKT_EPSG_4326 = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563,AUTHORITY["EPSG","7030"]],AUTHORITY["EPSG","6326"]],'
    'PRIMEM["Greenwich",0,AUTHORITY["EPSG","8901"]],UNIT["degree",'
    '0.0174532925199433,AUTHORITY["EPSG","9122"]],'
    'AUTHORITY["EPSG","4326"]]')
WKT_EPSG_3857 = (
    'PROJCS["WGS 84 / Pseudo-Mercator",GEOGCS["WGS 84",DATUM["WGS_1984",'
    'SPHEROID["WGS 84",6378137,298.257223563,AUTHORITY["EPSG","7030"]],'
    'AUTHORITY["EPSG","6326"]],PRIMEM["Greenwich",0,'
    'AUTHORITY["EPSG","8901"]],UNIT["degree",0.0174532925199433,'
    'AUTHORITY["EPSG","9122"]],AUTHORITY["EPSG","4326"]],'
    'PROJECTION["Mercator_1SP"],PARAMETER["central_meridian",0],'
    'PARAMETER["scale_factor",1],PARAMETER["false_easting",0],'
    'PARAMETER["false_northing",0],UNIT["metre",1,'
    'AUTHORITY["EPSG","9001"]],AUTHORITY["EPSG","3857"]]')

_WKT_NODES = ("GEOGCS", "PROJCS", "GEOCCS", "LOCAL_CS", "COMPD_CS",
              "GEOGCRS", "PROJCRS", "GEODCRS", "BOUNDCRS", "VERTCRS")
_EPSG_RE = re.compile(r"^\s*epsg\s*:\s*(\d+)\s*$", re.IGNORECASE)
_INIT_RE = re.compile(r"\+init\s*=\s*epsg\s*:\s*(\d+)", re.IGNORECASE)
_AUTH_RE = re.compile(r'AUTHORITY\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]',
                      re.IGNORECASE)
_WKT2_ID_RE = re.compile(r'ID\s*\[\s*"EPSG"\s*,\s*(\d+)\s*\]',
                         re.IGNORECASE)


@dataclass(frozen=True)
class SrsDef:
    """A parsed SRS: original text, detected kind, resolved EPSG code
    (None when underivable). The engine analog of geo::SrsDefinition."""

    text: str
    kind: str                      # 'local' | 'epsg' | 'proj4' | 'wkt'
    epsg: Optional[int] = None

    @property
    def canonical(self) -> str:
        """One spelling per CRS: 'local', 'EPSG:nnnn', or the original
        text for CRSs without a resolvable authority code."""
        if self.kind == "local":
            return "local"
        if self.epsg is not None:
            return f"EPSG:{self.epsg}"
        return self.text

    def to_wkt(self) -> str:
        """WKT1 when known (the mask header stores length-prefixed WKT,
        mask.cpp:278-283); passthrough for wkt inputs; error otherwise."""
        if self.epsg == 4326:
            return WKT_EPSG_4326
        if self.epsg == 3857:
            return WKT_EPSG_3857
        if self.kind == "wkt":
            return self.text
        raise ValueError(f"no WKT form known for {self.canonical!r}")


def _proj4_epsg(text: str) -> Optional[int]:
    """Resolve well-known proj4 signatures to their EPSG codes."""
    m = _INIT_RE.search(text)
    if m:
        return int(m.group(1))
    toks = dict(t.split("=", 1) if "=" in t else (t, "")
                for t in text.replace("+", " +").split() if t.startswith("+"))
    toks = {k.lstrip("+"): v for k, v in toks.items()}
    proj = toks.get("proj")
    if proj == "longlat" and toks.get("datum") == "WGS84":
        return 4326
    if proj == "merc" and toks.get("a") == "6378137" and (
            toks.get("b") == "6378137" or toks.get("R") == "6378137"
            or "nadgrids" in toks):
        return 3857
    return None


def parse_srs(value: Union[str, int, None]) -> SrsDef:
    """String/int -> SrsDef; unrecognized input raises ValueError with the
    offending text (the reference's probe-failure behavior for bad SRS
    config, solid.cpp:209-219)."""
    if value is None:
        return SrsDef("", "local")
    if isinstance(value, int):
        return SrsDef(str(value), "epsg", value)
    s = value.strip()
    if s == "" or s.lower() == "local":
        return SrsDef(s, "local")
    if s.isdigit():
        return SrsDef(s, "epsg", int(s))
    m = _EPSG_RE.match(s)
    if m:
        return SrsDef(s, "epsg", int(m.group(1)))
    if s.startswith("+"):
        return SrsDef(s, "proj4", _proj4_epsg(s))
    head = s.split("[", 1)[0].strip().upper()
    if "[" in s and head in _WKT_NODES:
        # WKT1: the CRS's OWN code is the last AUTHORITY at bracket
        # DEPTH 1 — a flat findall would grab inner nodes' codes (the
        # UNIT's 9001, the base GEOGCS's 4326) for any custom CRS that
        # omits its own, silently routing transforms to a wrong CRS.
        # No depth-1 code -> None: the canonical key falls back to the
        # WKT text itself, which is honest.
        def depth1_codes(rx):
            return [int(m.group(1)) for m in rx.finditer(s)
                    if s.count("[", 0, m.start())
                    - s.count("]", 0, m.start()) == 1]
        codes = depth1_codes(_AUTH_RE) or depth1_codes(_WKT2_ID_RE)
        return SrsDef(s, "wkt", codes[-1] if codes else None)
    raise ValueError(f"unrecognized SRS definition: {s[:80]!r}")


def resolve_srs(value: Union[str, int, None]) -> str:
    """Any spelling -> canonical key ('local' / 'EPSG:nnnn' / wkt text)."""
    return parse_srs(value).canonical
