"""QuadtreeMask: binary mask raster backed by a serialized quadtree,
rendered per 256x256 tile at any depth level.

Re-expression of the reference Mask driver
(/root/reference/gdal-drivers/mask.{hpp,cpp}). The binary container mirrors
the reference header layout (mask.cpp:266-308 / 95-160): magic, 2 reserved
bytes, u32-length SRS string, 4 x f64 extents, then the quadtree — but the
quadtree body is our own flat node list (the reference's mmapped
imgproc::mappedqtree is a private format), stored as sorted
(level, x, y, value) runs.

Rendering (mask.cpp:219-264): a tile at depth `d` with tail = max_depth - d
covers full-res window [x*256<<tail, y*256<<tail) + (256<<tail)^2; each
quad node shifts into the level grid (node >> tail... reference shifts the
node by `tail` toward the level grid), clips to the tile and rect-fills
white (value true) / gray (indeterminate) over black.

Extents squaring (mask.cpp:286-297): ur.x grows right, ll.y grows down so
the raster becomes the square 2^depth grid, keeping the UL corner fixed.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray.data

from functools import lru_cache

from ..grid import Extents, level_size, num_tiles

MAGIC = b"GRQTMK"
VAL_BLACK, VAL_WHITE, VAL_GRAY = 0, 1, 2
COLOR = {VAL_WHITE: 0xFF, VAL_GRAY: 0x80}  # mask.cpp color::white/gray


@dataclass
class QuadMask:
    """depth: full-res grid is (2^depth * 256)? No — full-res PIXEL grid is
    2^depth x 2^depth quad cells of 1 px: mask size = 2^depth (mask.cpp
    mask_.size()). Nodes: (level, x, y, value) where a node at `level`
    covers a square of side 2^(depth-level) full-res pixels anchored at
    (x, y) in full-res pixel coords."""

    depth: int
    srs: str
    extents: Extents
    nodes: np.ndarray  # structured or (n,4) int64 array: level, x, y, value

    @property
    def size(self) -> int:
        return 1 << self.depth


def square_extents(extents: Extents, mask_w: int, mask_h: int,
                   depth: int) -> Extents:
    """mask.cpp:286-297: grow right/down to the 2^depth square."""
    s = 1 << depth
    es_w = extents.width
    es_h = extents.height
    return Extents(extents.llx,
                   extents.ury - (es_h * s) / mask_h,
                   extents.llx + (es_w * s) / mask_w,
                   extents.ury)


def serialize(mask: QuadMask) -> bytes:
    srs = mask.srs.encode()
    head = MAGIC + b"\x00\x00" + struct.pack("<I", len(srs)) + srs
    e = mask.extents
    head += struct.pack("<4d", e.llx, e.lly, e.urx, e.ury)
    nodes = np.ascontiguousarray(mask.nodes, dtype=np.int64)
    head += struct.pack("<II", mask.depth, len(nodes))
    return head + nodes.tobytes()


def deserialize(buf: bytes) -> QuadMask:
    if buf[:6] != MAGIC:  # magic sniff, mask.cpp:100-108
        raise ValueError("not a quadtree mask (bad magic)")
    try:
        return _deserialize(buf)
    except (struct.error, ValueError) as e:
        raise ValueError(f"corrupt quadtree mask: {e}") from e


def _deserialize(buf: bytes) -> QuadMask:
    off = 8  # magic + 2 reserved
    (nsrs,) = struct.unpack_from("<I", buf, off)
    off += 4
    srs = buf[off:off + nsrs].decode()
    off += nsrs
    llx, lly, urx, ury = struct.unpack_from("<4d", buf, off)
    off += 32
    depth, n = struct.unpack_from("<II", buf, off)
    off += 8
    nodes = np.frombuffer(buf, dtype=np.int64, count=n * 4,
                          offset=off).reshape(n, 4)
    return QuadMask(depth=depth, srs=srs,
                    extents=Extents(llx, lly, urx, ury), nodes=nodes)


def mask_from_array(arr: np.ndarray, srs: str, extents: Extents) -> QuadMask:
    """Build a merged quadtree from a square 2^depth boolean array
    (bottom-up merge of uniform quads — the writer-side counterpart of the
    reference's RasterMask)."""
    size = arr.shape[0]
    assert arr.shape == (size, size) and (size & (size - 1)) == 0
    depth = int(size).bit_length() - 1
    ext = square_extents(extents, size, size, depth)

    nodes: list[tuple[int, int, int, int]] = []

    def rec(level: int, x: int, y: int, side: int):
        sub = arr[y:y + side, x:x + side]
        if not sub.any():
            return  # black is the background — emit nothing (mask.cpp draw)
        if sub.all():
            nodes.append((level, x, y, VAL_WHITE))
            return
        if side == 1:
            return
        h = side // 2
        for dy in (0, h):
            for dx in (0, h):
                rec(level + 1, x + dx, y + dy, h)

    rec(0, 0, 0, size)
    return QuadMask(depth=depth, srs=srs, extents=ext,
                    nodes=np.asarray(nodes, dtype=np.int64).reshape(-1, 4))


def render_tile(mask: QuadMask, depth_level: int, tile_x: int, tile_y: int,
                tile: int = 256) -> np.ndarray:
    """Rasterize one tile at overview level `depth_level`
    (mask.cpp:219-264), vectorized rect-fill over the intersecting nodes."""
    if not 0 <= depth_level <= mask.depth:
        raise ValueError(f"depth_level {depth_level} out of range "
                         f"0..{mask.depth}")
    tail = mask.depth - depth_level
    x_shift = tile_x * tile
    y_shift = tile_y * tile
    img = np.zeros((tile, tile), dtype=np.uint8)
    if len(mask.nodes) == 0:
        return img
    lvl = mask.nodes[:, 0]
    nx = mask.nodes[:, 1]
    ny = mask.nodes[:, 2]
    val = mask.nodes[:, 3]
    # node side in full-res px, then shift node into the level grid
    # (mask.cpp:240-249: node.shift(tail); node.x -= xShift)
    side_full = np.int64(1) << (mask.depth - lvl)
    gx = (nx >> tail) - x_shift
    gy = (ny >> tail) - y_shift
    gside = np.maximum(side_full >> tail, 1)
    # a node finer than one level pixel is a *partial* cell at this level:
    # the reference's depth-constrained traversal yields tribool
    # indeterminate there -> gray (mask.cpp:243-258 draw with color::gray)
    val = np.where((side_full >> tail) == 0, VAL_GRAY, val)
    # clip to tile bounds, skip empties
    x0 = np.clip(gx, 0, tile)
    y0 = np.clip(gy, 0, tile)
    x1 = np.clip(gx + gside, 0, tile)
    y1 = np.clip(gy + gside, 0, tile)
    keep = (x1 > x0) & (y1 > y0)
    for a, b, c, d, v in zip(x0[keep], y0[keep], x1[keep], y1[keep], val[keep]):
        img[b:d, a:c] = COLOR.get(int(v), 0)
    return img


@lru_cache(maxsize=4)
def _warm_mask(buf: bytes) -> "QuadMask":
    """Per-worker-process deserialize cache: hashing the buffer is far
    cheaper than re-parsing the node table every 32-row batch."""
    return deserialize(buf)


def mask_tiles(buf: bytes, depth_level: int | None = None,
               tile: int = 256) -> ray.data.Dataset:
    """Dataset of rendered mask tiles at one level (default: all levels —
    one overview per depth, mask.cpp:168-174). The serialized mask is
    broadcast once via ray.put; render tasks share it (the actor-state
    pattern of SURVEY.md T2)."""
    import ray

    mask = deserialize(buf)
    if depth_level is not None and not 0 <= depth_level <= mask.depth:
        raise ValueError(f"depth_level {depth_level} out of range "
                         f"0..{mask.depth}")
    levels = ([depth_level] if depth_level is not None
              else list(range(mask.depth + 1)))
    # ARITHMETIC row locate (the solid.py:188 discipline): the closure
    # carries only O(n_levels) arrays — a materialized (lv, tx, ty)
    # list is O(total tiles), gigabytes pickled into every task at
    # depth 20
    ntxs, counts = [], []
    for lv in levels:
        w, h = level_size(mask.size, mask.size, lv, mask.depth)
        ntx, nty = num_tiles(max(w, 1), max(h, 1), tile, tile)
        ntxs.append(ntx)
        counts.append(ntx * nty)
    offs = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    lv_arr = np.asarray(levels, dtype=np.int64)
    ntx_arr = np.asarray(ntxs, dtype=np.int64)
    total = int(offs[-1])
    mref = ray.put(buf)

    def gen(batch: dict) -> pa.Table:
        m = _warm_mask(ray.get(mref))
        out = {"lod": [], "tile_x": [], "tile_y": [], "px": []}
        for rid in batch["id"]:
            rid = int(rid)
            li = int(np.searchsorted(offs, rid, side="right")) - 1
            k = rid - int(offs[li])
            lv = int(lv_arr[li])
            tx = k % int(ntx_arr[li])
            ty = k // int(ntx_arr[li])
            img = render_tile(m, lv, tx, ty, tile)
            out["lod"].append(lv)
            out["tile_x"].append(tx)
            out["tile_y"].append(ty)
            out["px"].append(img.tobytes())
        return pa.table({"lod": pa.array(out["lod"], pa.int32()),
                         "tile_x": pa.array(out["tile_x"], pa.int32()),
                         "tile_y": pa.array(out["tile_y"], pa.int32()),
                         "px": pa.array(out["px"], pa.large_binary())})

    return ray.data.range(total).map_batches(gen, batch_format="numpy",
                                                  batch_size=32)
