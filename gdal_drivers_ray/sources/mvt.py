"""MVT vector tiles: protobuf-wire decode -> feature rows, plus an encoder
for fixtures.

Re-expression of the reference MVT driver
(/root/reference/gdal-drivers/mvt.{hpp,cpp} + proto/vector_tile.proto).
The wire codec is a from-scratch implementation of the public protobuf
wire format for exactly the vector_tile.proto schema (field numbers cited
inline); the geometry/attribute semantics mirror the reference decoder:

- command stream: Command{type = raw & 7, count = raw >> 3} (mvt.cpp:171-179),
  zigzag deltas against a running cursor that persists across rings/parts
  (mvt.cpp:241-260, 316-376);
- points: moveTo+, count==1 -> Point else MultiPoint (mvt.cpp:289-314);
- linestrings: [moveTo{1} lineTo+]+ (mvt.cpp:316-376);
- polygons: closed rings (closePath appends the start vertex,
  mvt.cpp:342-347); a CLOCKWISE ring starts a new exterior
  (OGR isClockwise rule, mvt.cpp:386-395), CCW rings attach as holes;
- local->world: diagonal Trafo with negative Y scale; no extents ->
  normalize to [0, 1] (mvt.cpp:62-93);
- attributes: odd tag count truncated (mvt.cpp:545-546), out-of-bounds
  key/value indices silently dropped (mvt.cpp:556-560), `Value` 7-way
  variant (proto:19-30); fid precedence: feature.id wins, else an attribute
  named "id" (mvt.cpp:569-581) — including the reference's quirk that a
  uint/sint-valued "id" sets FID from the (unset) int slot, i.e. 0
  (mvt.cpp:503-511);
- UNKNOWN-type features are skipped (mvt.cpp:527-532);
- geometry errors abort the feature stream for the layer (mvt.cpp:608-613);
- feature order = file order, carried as (layer_idx, feature_idx).

Output rows (one per feature):
  layer:str, layer_idx:int32, feature_idx:int32, fid:int64 (nullable),
  geom_type:int8, geometry:list<list<struct<x,y>>> (parts x ring/verts),
  attrs: map-as-JSON string (stable key order).
"""

from __future__ import annotations

import json
import math
import struct
from typing import Any, Iterator, Optional

import numpy as np
import pyarrow as pa

from ..grid import Extents, mvt_trafo

GEOM_UNKNOWN, GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 0, 1, 2, 3
CMD_MOVE, CMD_LINE, CMD_CLOSE = 1, 2, 7


# ---------------------------------------------------------------------------
# protobuf wire primitives (public wire format: varint + length-delimited)
# ---------------------------------------------------------------------------

def _uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _enc_uvarint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_tag(field: int, wt: int) -> bytes:
    return _enc_uvarint((field << 3) | wt)


def _enc_len(field: int, payload: bytes) -> bytes:
    return _enc_tag(field, 2) + _enc_uvarint(len(payload)) + payload


def encode_uvarints(vals: np.ndarray) -> bytes:
    """Vectorized uvarint encoding of a uint array (values < 2^35 — MVT
    geometry streams are u32): per-value byte counts, one scatter per
    byte position instead of a Python loop per integer."""
    v = np.asarray(vals, dtype=np.uint64)
    if len(v) == 0:
        return b""
    if bool((v >> np.uint64(35)).any()):
        raise ValueError(
            "encode_uvarints: value >= 2^35 — the 5-byte vectorized "
            "encoder would emit truncated bytes; use the scalar path")
    nb = np.ones(len(v), dtype=np.int64)
    for kk in range(1, 5):
        nb += (v >= (np.uint64(1) << np.uint64(7 * kk))).astype(np.int64)
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    rem = v.copy()
    for kk in range(5):
        m = nb > kk
        if not m.any():
            break
        cont = (nb[m] > kk + 1).astype(np.uint8)
        out[starts[m] + kk] = (rem[m] & np.uint64(0x7F)).astype(np.uint8) \
            | (cont << 7)
        rem[m] >>= np.uint64(7)
    return out.tobytes()


def _enc_packed(field: int, values) -> bytes:
    if isinstance(values, np.ndarray):
        return _enc_len(field, encode_uvarints(values))
    return _enc_len(field, b"".join(_enc_uvarint(int(v)) for v in values))


def _fields(buf: bytes) -> Iterator[tuple[int, int, Any]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _uvarint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = _uvarint(buf, pos)
        elif wt == 2:
            ln, pos = _uvarint(buf, pos)
            v = buf[pos:pos + ln]
            if len(v) != ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
        elif wt == 5:
            v = buf[pos:pos + 4]
            pos += 4
        elif wt == 1:
            v = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def _packed_u32(v: bytes) -> np.ndarray:
    out = []
    pos = 0
    while pos < len(v):
        x, pos = _uvarint(v, pos)
        out.append(x)
    return np.asarray(out, dtype=np.uint32)


# ---------------------------------------------------------------------------
# Value variant (proto:19-30; type mapping mvt.cpp:457-474)
# ---------------------------------------------------------------------------

def decode_value(buf: bytes):
    """First-present-wins in the reference's check order
    (mvt.cpp:478-520: string, float, double, int, uint, sint, bool)."""
    slots: dict[int, Any] = {}
    for field, wt, v in _fields(buf):
        if field == 1:
            slots.setdefault(1, v.decode("utf-8"))
        elif field == 2:
            slots.setdefault(2, struct.unpack("<f", v)[0])
        elif field == 3:
            slots.setdefault(3, struct.unpack("<d", v)[0])
        elif field == 4:
            slots.setdefault(4, v - (1 << 64) if v >= (1 << 63) else v)
        elif field == 5:
            slots.setdefault(5, v)
        elif field == 6:
            slots.setdefault(6, (v >> 1) ^ -(v & 1))
        elif field == 7:
            slots.setdefault(7, bool(v))
    for f in (1, 2, 3, 4, 5, 6, 7):
        if f in slots:
            return f, slots[f]
    return 0, ""   # unknown -> empty string (mvt.cpp:518-519)


def encode_value(kind: int, v) -> bytes:
    if kind == 1:
        return _enc_len(1, str(v).encode())
    if kind == 2:
        return _enc_tag(2, 5) + struct.pack("<f", v)
    if kind == 3:
        return _enc_tag(3, 1) + struct.pack("<d", v)
    if kind == 4:
        return _enc_tag(4, 0) + _enc_uvarint(v & ((1 << 64) - 1))
    if kind == 5:
        return _enc_tag(5, 0) + _enc_uvarint(int(v))
    if kind == 6:
        return _enc_tag(6, 0) + _enc_uvarint(((int(v) << 1) ^ (int(v) >> 63)) & ((1 << 64) - 1))
    if kind == 7:
        return _enc_tag(7, 0) + _enc_uvarint(1 if v else 0)
    raise ValueError(f"bad value kind {kind}")


# ---------------------------------------------------------------------------
# tile encode (fixture generator; field numbers from vector_tile.proto)
# ---------------------------------------------------------------------------

def encode_tile(layers: list[dict]) -> bytes:
    """layers: [{name, extent, keys, values: [(kind, v)...],
    features: [{id?, tags: [..], type, geometry: [u32...]}]}]"""
    out = b""
    for lay in layers:
        body = _enc_len(1, lay["name"].encode())
        for f in lay.get("features", []):
            fb = b""
            if f.get("id") is not None:
                fb += _enc_tag(1, 0) + _enc_uvarint(f["id"])
            if f.get("tags"):
                fb += _enc_packed(2, f["tags"])
            fb += _enc_tag(3, 0) + _enc_uvarint(f.get("type", 0))
            if f.get("geometry") is not None:
                fb += _enc_packed(4, f["geometry"])
            body += _enc_len(2, fb)
        for k in lay.get("keys", []):
            body += _enc_len(3, k.encode())
        for kind, v in lay.get("values", []):
            body += _enc_len(4, encode_value(kind, v))
        if lay.get("extent") is not None:
            body += _enc_tag(5, 0) + _enc_uvarint(lay["extent"])
        body += _enc_tag(15, 0) + _enc_uvarint(lay.get("version", 1))
        out += _enc_len(3, body)
    return out


def geometry_stream(parts: list[list[tuple[int, int]]], geom_type: int,
                    cursor=(0, 0)) -> list[int]:
    """Encode geometry parts to a command stream (inverse of the decoder):
    points -> one moveTo(n); lines -> moveTo(1)+lineTo(n-1) per part;
    polygons -> rings WITHOUT the closing vertex + closePath."""
    def zz(v: int) -> int:
        return ((v << 1) ^ (v >> 63)) & 0xFFFFFFFF

    cx, cy = cursor
    out: list[int] = []
    if geom_type == GEOM_POINT:
        pts = parts[0]
        out.append((len(pts) << 3) | CMD_MOVE)
        for x, y in pts:
            out += [zz(x - cx), zz(y - cy)]
            cx, cy = x, y
        return out
    for part in parts:
        pts = part[:-1] if (geom_type == GEOM_POLYGON and len(part) > 1
                            and part[0] == part[-1]) else part
        out.append((1 << 3) | CMD_MOVE)
        x, y = pts[0]
        out += [zz(x - cx), zz(y - cy)]
        cx, cy = x, y
        out.append(((len(pts) - 1) << 3) | CMD_LINE)
        for x, y in pts[1:]:
            out += [zz(x - cx), zz(y - cy)]
            cx, cy = x, y
        if geom_type == GEOM_POLYGON:
            out.append((1 << 3) | CMD_CLOSE)
    return out


# ---------------------------------------------------------------------------
# tile decode -> feature rows
# ---------------------------------------------------------------------------

class GeometryError(ValueError):
    pass


class _Reader:
    """Cursor over the packed command stream (mvt.cpp:200-260)."""

    def __init__(self, geom: np.ndarray, sx, sy, shx, shy):
        self.g = geom
        self.pos = 0
        self.cx = 0
        self.cy = 0
        self.sx, self.sy, self.shx, self.shy = sx, sy, shx, shy

    def __bool__(self):
        return self.pos < len(self.g)

    def command(self, expect: int) -> int:
        if self.pos >= len(self.g):
            raise GeometryError("command past end of input")
        raw = int(self.g[self.pos])
        self.pos += 1
        t, c = raw & 7, raw >> 3
        if t != expect:
            raise GeometryError(f"unexpected command type {t} (expected {expect})")
        return c

    def shift(self):
        # two unzigzagged deltas, each end-checked (mvt.cpp:246-260)
        for attr in ("cx", "cy"):
            if self.pos >= len(self.g):
                raise GeometryError("shift past end of input")
            u = int(self.g[self.pos])
            self.pos += 1
            setattr(self, attr, getattr(self, attr) + ((u >> 1) ^ -(u & 1)))

    def point(self) -> tuple[float, float]:
        self.shift()
        return (self.cx * self.sx + self.shx, self.cy * self.sy + self.shy)


def _signed_area2(ring: list[tuple[float, float]]) -> float:
    s = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s


def decode_geometry(geom: np.ndarray, geom_type: int, trafo) -> list[list[tuple[float, float]]]:
    """-> parts: POINT -> [[pts...]]; LINESTRING -> one list per line;
    POLYGON -> rings in stream order (exterior starts a new polygon on CW —
    we keep flat ring order and mark polygons implicitly by winding, as the
    comparison goldens do)."""
    gr = _Reader(geom, *trafo)
    if geom_type == GEOM_POINT:
        n = gr.command(CMD_MOVE)
        if n == 0:
            raise GeometryError("expected nonzero count")
        return [[gr.point() for _ in range(n)]]
    if geom_type == GEOM_LINESTRING:
        parts = []
        while gr:
            if gr.command(CMD_MOVE) != 1:
                raise GeometryError("expected single count")
            pts = [gr.point()]
            n = gr.command(CMD_LINE)
            if n == 0:
                raise GeometryError("expected nonzero count")
            pts += [gr.point() for _ in range(n)]
            parts.append(pts)
        return parts
    if geom_type == GEOM_POLYGON:
        rings = []
        while gr:
            if gr.command(CMD_MOVE) != 1:
                raise GeometryError("expected single count")
            pts = [gr.point()]
            start = pts[0]
            n = gr.command(CMD_LINE)
            if n == 0:
                raise GeometryError("expected nonzero count")
            pts += [gr.point() for _ in range(n)]
            if gr.command(CMD_CLOSE) == 0:   # checkNonzero (mvt.cpp:342-344)
                raise GeometryError("expected nonzero count")
            pts.append(start)                # close ring (mvt.cpp:345-347)
            rings.append(pts)
        return rings
    raise GeometryError(f"bad geometry type {geom_type}")


def group_rings(rings: list[list[tuple[float, float]]]) -> list[list[list[tuple[float, float]]]]:
    """Polygon assembly (mvt.cpp:378-415): a CLOCKWISE ring starts a new
    polygon when one is already open; every ring joins the open polygon
    (so a leading CCW ring still opens an exterior-less polygon, exactly
    like the reference)."""
    polys: list[list[list[tuple[float, float]]]] = []
    cur: Optional[list[list[tuple[float, float]]]] = None
    for ring in rings:
        cw = _signed_area2(ring) < 0
        if cw and cur is not None:
            polys.append(cur)
            cur = None
        if cur is None:
            cur = []
        cur.append(ring)
    if cur is not None:
        polys.append(cur)
    return polys


def decode_tile(buf: bytes, extents: Optional[Extents] = None,
                no_fields: bool = False) -> list[dict]:
    """Full tile -> list of feature-row dicts (order = file order)."""
    rows: list[dict] = []
    layer_idx = -1
    for field, wt, v in _fields(buf):
        if field != 3:
            continue
        layer_idx += 1
        name = ""
        extent = 4096
        keys: list[str] = []
        values: list[tuple[int, Any]] = []
        feats: list[bytes] = []
        for f2, w2, v2 in _fields(v):
            if f2 == 1:
                name = v2.decode("utf-8")
            elif f2 == 2:
                feats.append(v2)
            elif f2 == 3:
                keys.append(v2.decode("utf-8"))
            elif f2 == 4:
                values.append(decode_value(v2))
            elif f2 == 5:
                extent = v2
        trafo = mvt_trafo(extent, extents)
        fidx = -1
        for fb in feats:
            fidx += 1
            fid_raw: Optional[int] = None
            tags = np.array([], dtype=np.uint32)
            gtype = GEOM_UNKNOWN
            geom = np.array([], dtype=np.uint32)
            for f3, w3, v3 in _fields(fb):
                if f3 == 1:
                    fid_raw = v3
                elif f3 == 2:
                    tags = _packed_u32(v3)
                elif f3 == 3:
                    gtype = v3
                elif f3 == 4:
                    geom = _packed_u32(v3)
            if gtype == GEOM_UNKNOWN:
                continue  # skip-unknown filter (mvt.cpp:527-532)

            fid: Optional[int] = None
            attrs: dict[str, Any] = {}
            if not no_fields:
                tc = len(tags) & ~1          # odd tag count truncated
                id_value: Optional[int] = None
                for i in range(0, tc, 2):
                    ki, vi = int(tags[i]), int(tags[i + 1])
                    if ki >= len(keys) or vi >= len(values):
                        continue             # OOB pair silently dropped
                    kind, val = values[vi]
                    attrs[keys[ki]] = val
                    if keys[ki] == "id":
                        # reference quirk (mvt.cpp:503-511): for int values
                        # FID := int slot; for uint/sint values the code
                        # reads the *unset* int slot -> 0; bools/strings
                        # never set FID
                        if kind == 4:
                            id_value = int(val)
                        elif kind in (5, 6):
                            id_value = 0
                if fid_raw is not None:
                    fid = fid_raw            # feature.id wins (mvt.cpp:573-577)
                elif id_value is not None:
                    fid = id_value
            elif fid_raw is not None:
                fid = fid_raw

            try:
                parts = decode_geometry(geom, gtype, trafo)
            except GeometryError:
                # abort this layer's stream (mvt.cpp:608-613)
                break
            if fid is not None and fid >= 1 << 63:
                # Feature.id is uint64 on the wire; the reference casts
                # to GIntBig (two's-complement wrap) — match that instead
                # of overflowing the int64 Arrow column later
                fid -= 1 << 64
            rows.append({
                "layer": name,
                "layer_idx": layer_idx,
                "feature_idx": fidx,
                "fid": fid,
                "geom_type": gtype,
                "geometry": parts,
                "attrs": json.dumps(attrs, sort_keys=True, default=str),
            })
    return rows


FEATURE_SCHEMA = pa.schema([
    ("layer", pa.string()),
    ("layer_idx", pa.int32()),
    ("feature_idx", pa.int32()),
    ("fid", pa.int64()),
    ("geom_type", pa.int8()),
    ("geometry", pa.list_(pa.list_(pa.struct([("x", pa.float64()),
                                              ("y", pa.float64())])))),
    ("attrs", pa.string()),
])


def rows_to_table(rows: list[dict], tile_id: Optional[str] = None) -> pa.Table:
    geo = [[[{"x": x, "y": y} for (x, y) in part] for part in r["geometry"]]
           for r in rows]
    t = pa.table({
        "layer": pa.array([r["layer"] for r in rows], pa.string()),
        "layer_idx": pa.array([r["layer_idx"] for r in rows], pa.int32()),
        "feature_idx": pa.array([r["feature_idx"] for r in rows], pa.int32()),
        "fid": pa.array([r["fid"] for r in rows], pa.int64()),
        "geom_type": pa.array([r["geom_type"] for r in rows], pa.int8()),
        "geometry": pa.array(geo, FEATURE_SCHEMA.field("geometry").type),
        "attrs": pa.array([r["attrs"] for r in rows], pa.string()),
    })
    if tile_id is not None:
        t = t.append_column("tile_id", pa.array([tile_id] * len(rows)))
    return t


def parse_tiles_batch(batch: pa.Table, extents: Optional[Extents] = None,
                      bytes_col: str = "bytes",
                      tile_id_col: str = "tile_id") -> pa.Table:
    """map_batches body: tile-bytes column -> exploded feature rows
    (the engine's flat_map of SURVEY.md §3.2).

    Robustness contract: NULL tile bytes (the lookup stages' not_found
    rows — this function is documented as the generic consumer of their
    output) and wire-corrupt tiles (truncated varints, short fixed
    fields, oversize geometry varints, zero extents) are SKIPPED, never
    allowed to kill the whole batch task — the per-tile analog of the
    reference's CPLError abort paths."""
    import struct as _struct
    tables = []
    for tid, buf in zip(batch[tile_id_col].to_pylist(),
                        batch[bytes_col].to_pylist()):
        if buf is None:
            continue
        try:
            rows = decode_tile(buf, extents)
        except (IndexError, OverflowError, ZeroDivisionError, ValueError,
                UnicodeDecodeError, _struct.error):
            continue        # corrupt tile: drop it, keep the batch
        if rows:
            tables.append(rows_to_table(rows, tid))
    if not tables:
        empty = rows_to_table([])
        return empty.append_column("tile_id", pa.array([], pa.string()))
    return pa.concat_tables(tables)


# ---------------------------------------------------------------------------
# S10: remote tile fetch with injectable transport (mvt.cpp:654-672, 699-730)
# ---------------------------------------------------------------------------

def is_remote_path(path: str) -> bool:
    """http:/https:/ftp: prefix, case-insensitive (mvt.cpp:654-659)."""
    p = path.lower()
    return p.startswith(("http:", "https:", "ftp:"))


def is_remote_mvt(path: str) -> bool:
    """Remote AND ('.mvt' or '.vector.pbf' anywhere, case-insensitive) —
    the reference's remote-mvt sniff (mvt.cpp:661-672)."""
    if not is_remote_path(path):
        return False
    p = path.lower()
    return ".mvt" in p or ".vector.pbf" in p


class RemoteFetchError(IOError):
    """Transport-level failure (the CPLError paths of mvt.cpp:699-730)."""


def load_from_remote(path: str, fetcher) -> bytes | None:
    """Fetch remote tile bytes through an INJECTED transport.

    ``fetcher(path) -> (status:int, data:bytes)``. Semantics mirror
    loadFromRemote (mvt.cpp:699-730): empty payloads and transport errors
    raise; status 404 returns None (missing tile — the driver-level
    open-failure branch); other non-zero statuses raise; status 0/200
    returns the payload for the protobuf parse to judge.

    There is deliberately NO default network transport: this container is
    network-free, and at pipeline scale tile payloads arrive through the
    data plane (a column of bytes), not per-tile HTTP — the fetcher seam
    exists so a deployment with egress can drop one in."""
    try:
        status, data = fetcher(path)
    except Exception as e:      # transport exploded = CPLGetLastErrorNo path
        raise RemoteFetchError(f"fetch failed for {path!r}: {e}") from e
    if status == 404:
        return None
    if status not in (0, 200):
        raise RemoteFetchError(f"fetch error {status} for {path!r}")
    if not data:
        raise RemoteFetchError(f"empty payload for {path!r}")
    return data
