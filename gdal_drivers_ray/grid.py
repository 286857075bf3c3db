"""Pure tile-grid + geometry kernels — the semantic core of the engine.

Everything here is plain Python / NumPy (no Ray): these functions define the
*meaning* of tiles, cells, geo-transforms and blend windows; the Ray Data
stages compose them inside ``map_batches``.

Semantics mirror the reference (`/root/reference/gdal-drivers`, cited per
function as file:line) but the implementation is original and vectorized.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np

TILE = 256  # uniform block size (ref: blender.cpp:536-537, solid.hpp:92, mask.cpp:131)

EPS = 1e-4  # float-compare epsilon (ref: blender.cpp:120)


# ---------------------------------------------------------------------------
# extents / geotransform (ref: detail/geotransform.hpp, detail/extents.hpp)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Extents:
    """World-coordinate bounding box, lower-left / upper-right.

    Mirrors math::Extents2 as used by the reference drivers
    (detail/extents.hpp:37-46).
    """

    llx: float
    lly: float
    urx: float
    ury: float

    @property
    def width(self) -> float:
        return self.urx - self.llx

    @property
    def height(self) -> float:
        return self.ury - self.lly

    def as_tuple(self) -> tuple[float, float, float, float]:
        return (self.llx, self.lly, self.urx, self.ury)


def extents_to_gt(extents: Extents, nx: int, ny: int) -> tuple[float, ...]:
    """Extents + raster size -> 6-coeff affine geotransform.

    GT = [llx, w/nx, 0, ury, 0, -h/ny] — north-up, origin at upper-left
    (ref: solid.cpp:334-347, mask.cpp:177-190, blender.cpp:431-447).
    """
    return (
        extents.llx,
        extents.width / nx,
        0.0,
        extents.ury,
        0.0,
        -extents.height / ny,
    )


def gt_to_extents(gt: tuple[float, ...], nx: int, ny: int) -> Extents:
    """Inverse of :func:`extents_to_gt` for orthogonal north-up transforms."""
    return Extents(gt[0], gt[3] + gt[5] * ny, gt[0] + gt[1] * nx, gt[3])


def gt_resolution(gt: tuple[float, ...]) -> tuple[float, float]:
    """Pixel resolution = column/row vector lengths (ref: blender.cpp:141-151)."""
    return (math.hypot(gt[1], gt[4]), math.hypot(gt[2], gt[5]))


def is_orthogonal(gt: tuple[float, ...], eps: float = EPS) -> bool:
    """Reject rotated/skewed rasters (ref: blender.cpp:120-139)."""
    return abs(gt[2]) < eps and abs(gt[4]) < eps


def almost_same(a: float, b: float, eps: float = EPS) -> bool:
    """epsilon float compare (ref: blender.cpp:120-131)."""
    return abs(a - b) < eps


def raster_extents(gt: tuple[float, ...], nx: int, ny: int) -> Extents:
    """World extents of a raster = min/max of its 4 transformed corners
    (ref: blender.cpp:187-221). Handles rotated transforms too."""
    xs, ys = [], []
    for px, py in ((0, 0), (nx, 0), (0, ny), (nx, ny)):
        xs.append(gt[0] + gt[1] * px + gt[2] * py)
        ys.append(gt[3] + gt[4] * px + gt[5] * py)
    return Extents(min(xs), min(ys), max(xs), max(ys))


def align_extents(extents: Extents, origin: tuple[float, float],
                  res: tuple[float, float]) -> Extents:
    """Snap extents outward to the pixel grid anchored at ``origin``:
    shift by origin, floor ll / ceil ur to resolution multiples, shift back
    (ref: blender.cpp:416-429)."""
    llx = math.floor((extents.llx - origin[0]) / res[0]) * res[0] + origin[0]
    lly = math.floor((extents.lly - origin[1]) / res[1]) * res[1] + origin[1]
    urx = math.ceil((extents.urx - origin[0]) / res[0]) * res[0] + origin[0]
    ury = math.ceil((extents.ury - origin[1]) / res[1]) * res[1] + origin[1]
    return Extents(llx, lly, urx, ury)


def round_half_away(v: float) -> int:
    """std::round semantics: round half away from zero (ref: blender.cpp:452-454
    uses std::round; numpy's default is half-to-even, which would diverge)."""
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def point_to_pixel(px: float, py: float, ul: tuple[float, float],
                   res: tuple[float, float]) -> tuple[int, int]:
    """World point -> integer pixel coordinate, rounded half-away
    (ref: blender.cpp:449-456 ``point2pixel``). ``ul`` is the dataset's
    upper-left world corner; y grows downward in pixel space."""
    return (round_half_away((px - ul[0]) / res[0]),
            round_half_away(-(py - ul[1]) / res[1]))


def point_to_pixel_f(px: float, py: float, ul: tuple[float, float],
                     res: tuple[float, float]) -> tuple[float, float]:
    """Float variant (ref: blender.cpp:465-470 ``point2pixeld``)."""
    return ((px - ul[0]) / res[0], -(py - ul[1]) / res[1])


def pixel_rect(e: Extents, size: tuple[int, int], ul: tuple[float, float],
               res: tuple[float, float]) -> tuple[int, int, int, int]:
    """Integer pixel placement rect (x, y, w, h) of a source raster inside the
    output grid (ref: blender.cpp:457-463 ``pixelExtents``)."""
    x, y = point_to_pixel(e.llx, e.ury, ul, res)
    return (x, y, size[0], size[1])


def pixel_valid(e: Extents, ul: tuple[float, float],
                res: tuple[float, float]) -> tuple[float, float, float, float]:
    """Float pixel rect of a source's *valid* world area
    (ref: blender.cpp:472-478 ``pixelValid``)."""
    lx, ly = point_to_pixel_f(e.llx, e.ury, ul, res)
    rx, ry = point_to_pixel_f(e.urx, e.lly, ul, res)
    return (lx, ly, rx - lx, ry - ly)


# ---------------------------------------------------------------------------
# rect algebra + Locator (ref: blender.cpp:226-238)
# ---------------------------------------------------------------------------

def rect_intersect(a: tuple, b: tuple) -> tuple:
    """Intersection of two (x, y, w, h) rects; empty -> zero-size rect at the
    clipped origin (mirrors cv::Rect operator&, ref: blender.cpp:232)."""
    x = max(a[0], b[0])
    y = max(a[1], b[1])
    w = min(a[0] + a[2], b[0] + b[2]) - x
    h = min(a[1] + a[3], b[1] + b[3]) - y
    if w <= 0 or h <= 0:
        return (x, y, 0, 0)
    return (x, y, w, h)


def rect_area(r: tuple) -> float:
    return max(r[2], 0) * max(r[3], 0)


@dataclass(frozen=True)
class Locator:
    """Block <-> source window mapping (ref: blender.cpp:226-238):
    ``roi``   = block ∩ source placement (output pixel coords),
    ``local`` = roi relative to the source's top-left (read window),
    ``view``  = roi relative to the block's top-left (write window).
    """

    roi: tuple[int, int, int, int]
    local: tuple[int, int, int, int]
    view: tuple[int, int, int, int]


def locate(block: tuple[int, int, int, int],
           src: tuple[int, int, int, int]) -> Optional[Locator]:
    """Returns None when the block does not touch the source (the join-skip
    of blender.cpp:570-573)."""
    roi = rect_intersect(block, src)
    if roi[2] <= 0 or roi[3] <= 0:
        return None
    local = (roi[0] - src[0], roi[1] - src[1], roi[2], roi[3])
    view = (roi[0] - block[0], roi[1] - block[1], roi[2], roi[3])
    return Locator(roi, local, view)


# ---------------------------------------------------------------------------
# LOD pyramid math (ref: solid.cpp:352-369, mask.cpp:199-211)
# ---------------------------------------------------------------------------

def overview_sizes(w: int, h: int, tile_w: int = TILE,
                   tile_h: int = TILE) -> list[tuple[int, int]]:
    """Solid's overview pyramid: halve (round-half-away) until both dims are
    below the tile size (ref: solid.cpp:352-369)."""
    out = []
    w = round_half_away(w / 2.0)
    h = round_half_away(h / 2.0)
    while w >= tile_w or h >= tile_h:
        out.append((w, h))
        w = round_half_away(w / 2.0)
        h = round_half_away(h / 2.0)
    return out


def level_size(full_w: int, full_h: int, depth: int,
               max_depth: int) -> tuple[int, int]:
    """QuadtreeMask overview: level ``depth`` raster is full size >> tail
    (ref: mask.cpp:199-211)."""
    tail = max_depth - depth
    return (full_w >> tail, full_h >> tail)


def tile_pixel_window(tile_x: int, tile_y: int, tail: int,
                      tile_w: int = TILE, tile_h: int = TILE) -> tuple:
    """Full-resolution pixel window covered by tile (tile_x, tile_y) at a level
    with ``tail`` levels below it (ref: mask.cpp:225-233 constraint setup)."""
    x0 = (tile_x * tile_w) << tail
    y0 = (tile_y * tile_h) << tail
    return (x0, y0, tile_w << tail, tile_h << tail)


def num_tiles(w: int, h: int, tile_w: int = TILE, tile_h: int = TILE) -> tuple[int, int]:
    """Grid dimensions in tiles (GDAL convention: ceil division)."""
    return ((w + tile_w - 1) // tile_w, (h + tile_h - 1) // tile_h)


# ---------------------------------------------------------------------------
# tile / cell ids (engine-side: Morton quadkey mirrors the reference's
# quadtree traversal order, mask.cpp forEachQuad; packing mirrors the
# (zoom, col, row) key of detail/mbtiles.cpp:128-225)
# ---------------------------------------------------------------------------

_B = [0x5555555555555555, 0x3333333333333333, 0x0F0F0F0F0F0F0F0F,
      0x00FF00FF00FF00FF, 0x0000FFFF0000FFFF]


_U = np.uint64  # numpy disallows mixing uint64 arrays with python-int shifts


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread 32-bit lanes to even bit positions (classic Morton dilation)."""
    x = x.astype(np.uint64)
    x = (x | (x << _U(16))) & _U(0x0000FFFF0000FFFF)
    x = (x | (x << _U(8))) & _U(0x00FF00FF00FF00FF)
    x = (x | (x << _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << _U(2))) & _U(0x3333333333333333)
    x = (x | (x << _U(1))) & _U(0x5555555555555555)
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & _U(0x5555555555555555)
    x = (x | (x >> _U(1))) & _U(0x3333333333333333)
    x = (x | (x >> _U(2))) & _U(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> _U(4))) & _U(0x00FF00FF00FF00FF)
    x = (x | (x >> _U(8))) & _U(0x0000FFFF0000FFFF)
    x = (x | (x >> _U(16))) & _U(0x00000000FFFFFFFF)
    return x


def morton2(x, y):
    """Interleave x/y bits -> Morton code. Vectorized (accepts ndarrays).
    Spatial-locality key mirroring the reference quadtree traversal order
    (mask.cpp forEachQuad)."""
    return _part1by1(np.asarray(x)) | (_part1by1(np.asarray(y)) << np.uint64(1))


def unmorton2(m):
    m = np.asarray(m).astype(np.uint64)
    return _compact1by1(m), _compact1by1(m >> np.uint64(1))


def cell_id(z, x, y):
    """Hierarchical cell id: (lod << 58) | morton(x, y). Sorting by cell_id
    groups spatially-near tiles (the engine's H3/S2 stand-in; the hierarchy
    matches the reference LOD math of mask.cpp:199-211)."""
    z = np.asarray(z, dtype=np.uint64)
    return ((z << np.uint64(58)) | morton2(x, y)).astype(np.int64)


def cell_parent(cid):
    """Parent cell = one LOD up, Morton code >> 2."""
    cid = np.asarray(cid).astype(np.uint64)
    z = cid >> np.uint64(58)
    m = cid & np.uint64((1 << 58) - 1)
    return (((z - np.uint64(1)) << np.uint64(58)) | (m >> np.uint64(2))).astype(np.int64)


def pack_zxy(z, x, y):
    """Simple packed key (z<<58)|(y<<29)|x — SQL-expressible variant used by
    the DuckDB oracles (no bit interleaving)."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (z << 58) | (y << 29) | x


def unpack_zxy(key):
    """Inverse of pack_zxy. NOTE the return order is (z, y, x): the pack
    layout is (z<<58)|(y<<29)|x, so the middle word is y."""
    key = np.asarray(key, dtype=np.int64)
    return key >> 58, (key >> 29) & ((1 << 29) - 1), key & ((1 << 29) - 1)


def tile_of_points(xs, ys, extents: Extents, lod) -> tuple[np.ndarray, np.ndarray]:
    """World point -> containing tile (col, row) at ``lod`` where the extents
    are divided into 2^lod × 2^lod tiles, row 0 at the TOP (north-up raster
    convention of the geotransform, solid.cpp:334-347). Points on the far
    edge clamp into the last tile."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    lod = np.asarray(lod, dtype=np.int64)
    n = np.left_shift(np.int64(1), lod).astype(np.float64)
    tx = np.floor((xs - extents.llx) / extents.width * n)
    ty = np.floor((extents.ury - ys) / extents.height * n)
    tx = np.clip(tx, 0, n - 1).astype(np.int64)
    ty = np.clip(ty, 0, n - 1).astype(np.int64)
    return tx, ty


# ---------------------------------------------------------------------------
# TMS flip + strict tile-key parsing (ref: detail/mbtiles.cpp:63-155)
# ---------------------------------------------------------------------------

def tms_flip(zoom, row):
    """mbtiles stores rows bottom-up; lookups are top-down:
    row' = (2^zoom - 1) - row (ref: detail/mbtiles.cpp:146-155)."""
    zoom = np.asarray(zoom, dtype=np.int64)
    row = np.asarray(row, dtype=np.int64)
    return ((np.int64(1) << zoom) - 1) - row


def _parse_part(s: str) -> Optional[int]:
    """Strict unsigned parse (ref: detail/mbtiles.cpp:63-90): no sign chars,
    at least one digit, and a leading '0' is only legal when the number is
    exactly one digit wide (minWidth=1 -> '0' ok, '01' rejected)."""
    # isascii() first: Unicode isdigit() accepts superscripts (which then
    # crash int()) and non-ASCII digit scripts the strict reference
    # parser rejects
    if not s or not s.isascii() or s[0] in "+-" or not s.isdigit():
        return None
    if s[0] == "0" and len(s) > 1:
        return None
    return int(s)


def parse_tile_key(key: str) -> Optional[tuple[int, int, int]]:
    """Parse strict 'zoom-col-row' (ref: detail/mbtiles.cpp:92-110).
    Returns None on any violation."""
    parts = key.split("-")
    if len(parts) != 3:
        return None
    vals = [_parse_part(p) for p in parts]
    if any(v is None for v in vals):
        return None
    return tuple(vals)  # type: ignore[return-value]


def tile_key_in_bounds(z: int, x: int, y: int) -> bool:
    """Bounds check vs 2^zoom - 1 (ref: detail/mbtiles.cpp:146-151)."""
    m = (1 << z) - 1
    return 0 <= x <= m and 0 <= y <= m


# ---------------------------------------------------------------------------
# zigzag + MVT command codec (ref: mvt.cpp:171-179, 241-244)
# ---------------------------------------------------------------------------

def zigzag(v):
    """int32 -> uint32 zigzag (inverse of mvt.cpp:241-244)."""
    v = np.asarray(v, dtype=np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint32)


def unzigzag(u):
    """uint32 -> int32 (ref: mvt.cpp:241-244 ``(v >> 1) ^ (-(v & 1))``)."""
    u = np.asarray(u, dtype=np.uint32).astype(np.int64)
    return ((u >> 1) ^ -(u & 1)).astype(np.int32)


CMD_MOVE_TO = 1
CMD_LINE_TO = 2
CMD_CLOSE_PATH = 7


def command_pack(cmd_type: int, count: int) -> int:
    """(count << 3) | type (ref: mvt.cpp:171-179)."""
    return (count << 3) | cmd_type


def command_unpack(raw):
    raw = np.asarray(raw, dtype=np.uint32)
    return raw & np.uint32(0x7), raw >> np.uint32(3)


# ---------------------------------------------------------------------------
# MVT local->world transform (ref: mvt.cpp:62-93)
# ---------------------------------------------------------------------------

def mvt_trafo(extent: float, extents: Optional[Extents]) -> tuple[float, float, float, float]:
    """Returns (sx, sy, shift_x, shift_y): world = local * s + shift.
    Y scale is negative (tile y-down -> world y-up); with no extents the
    output normalizes to [0,1] with shift_y=1 (ref: mvt.cpp:66-79)."""
    if extents is not None:
        return (extents.width / extent, extents.height / -extent,
                extents.llx, extents.ury)
    return (1.0 / extent, -1.0 / extent, 0.0, 1.0)


def is_clockwise(xs, ys) -> bool:
    """Ring winding via shoelace: clockwise <=> signed area < 0 (the OGR
    ``isClockwise`` rule used at mvt.cpp:388 to start a new exterior ring)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    return float(np.dot(xs, np.roll(ys, -1)) - np.dot(np.roll(xs, -1), ys)) < 0.0


# ---------------------------------------------------------------------------
# blend weight kernel (ref: blender.cpp:590-624) — separable form
# ---------------------------------------------------------------------------

def blend_weights(roi: tuple[int, int, int, int],
                  valid: tuple[float, float, float, float],
                  overlap: tuple[int, int]) -> np.ndarray:
    """Per-pixel blend weight for a source window.

    No overlap (ref: blender.cpp:590-600): weight 1 where the pixel center
    (x+0.5, y+0.5) lies inside the source's float ``valid`` rect, else 0.

    With overlap (ref: blender.cpp:601-624): weight = area(valid ∩ K)/area(K)
    where K is the 2w×2h kernel centered on the pixel center. Both rects are
    axis-aligned so the clipped area separates into an x-ramp × y-ramp —
    O(W+H) instead of the reference's O(W·H) rect intersections.
    """
    x0, y0, w, h = roi
    vx, vy, vw, vh = valid
    cx = x0 + 0.5 + np.arange(w)   # pixel center xs
    cy = y0 + 0.5 + np.arange(h)
    ow, oh = overlap
    if ow == 0 and oh == 0:
        # contains() is half-open: tl <= p < br
        inx = (cx >= vx) & (cx < vx + vw)
        iny = (cy >= vy) & (cy < vy + vh)
        return (iny[:, None] & inx[None, :]).astype(np.float64)
    # per-axis: ramp where the kernel has extent, membership where it
    # collapsed to 0 (anisotropic resolution can round ONE axis's
    # overlap_px to 0 — dividing by the joint 4*ow*oh would emit
    # NaN/inf weights and silently corrupt every blended tile)
    if ow == 0:
        wx = ((cx >= vx) & (cx < vx + vw)).astype(np.float64)
    else:
        wx = np.clip(np.minimum(vx + vw, cx + ow)
                     - np.maximum(vx, cx - ow), 0.0, None) / (2.0 * ow)
    if oh == 0:
        wy = ((cy >= vy) & (cy < vy + vh)).astype(np.float64)
    else:
        wy = np.clip(np.minimum(vy + vh, cy + oh)
                     - np.maximum(vy, cy - oh), 0.0, None) / (2.0 * oh)
    return wy[:, None] * wx[None, :]
