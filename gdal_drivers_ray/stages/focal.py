"""Focal (neighborhood) raster ops over a tiled raster — the halo
exchange pattern.

A 3x3 stencil at a tile's edge needs pixels from the neighboring tile,
so a distributed focal op is a HALO EXCHANGE: every tile ships its
1-px border strips to the 8 neighbors that need them, each destination
group assembles a (TILE+2)^2 padded array, and the stencil runs fully
vectorized inside the group. Payload moved per tile is O(TILE) strips,
not O(TILE^2) tile copies — the strips are the entire exchange.

No single counterpart exists in the reference (its block reads are
single-dataset), but this is the canonical distributed-raster kernel
(slope/hillshade/convolution) a tiling engine must carry; the cover
join of stages/warp.py handles resampling reach the same way at
kernel-pad granularity.

Semantics (pinned by the whole-raster oracle): ``focal_sum3`` —
out[y, x] = sum of the 3x3 neighborhood; valid iff ALL 9 cells are
inside the raster and present (so the raster's outer ring and any ring
around missing tiles is nodata). Integer-exact for integer rasters,
hence hash-stable through any tiling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..grid import TILE
# ONE dtype-tag mapping for the whole engine (stages/warp.py owns it):
# a second copy silently goes stale when a new GDAL tag is added
from .warp import _GDAL_DTYPES, _np_dtype  # noqa: F401  (re-export for cc)


def focal_sum3_oracle(src: np.ndarray, nodata: float = -1.0) -> np.ndarray:
    """Whole-raster 3x3 focal sum: the parity oracle. Border ring (any
    cell whose 3x3 window leaves the raster) is nodata. NaN input pixels
    are rejected — the distributed plan uses NaN as its missing-halo
    sentinel, so the shared contract is NaN-free input."""
    if src.dtype.kind == "f" and np.isnan(src).any():
        raise ValueError("focal_sum3: NaN pixels are not supported; "
                         "use a nodata value")
    ny, nx = src.shape
    out = np.full((ny, nx), nodata, dtype=np.float64)
    if ny < 3 or nx < 3:
        return out
    s = src.astype(np.float64)
    acc = np.zeros((ny - 2, nx - 2), dtype=np.float64)
    for dy in range(3):
        for dx in range(3):
            acc += s[dy:dy + ny - 2, dx:dx + nx - 2]
    out[1:-1, 1:-1] = acc
    return out


def _strips_of(block: np.ndarray, vw: int, vh: int):
    """(ddx, ddy) -> the strip of THIS tile a neighbor in that direction
    needs: its facing 1-px edge (or corner pixel). Keys are the OFFSET
    from this tile to the destination tile."""
    v = block[:vh, :vw]
    return {
        (-1, 0): v[:, :1], (1, 0): v[:, -1:],
        (0, -1): v[:1, :], (0, 1): v[-1:, :],
        (-1, -1): v[:1, :1], (1, -1): v[:1, -1:],
        (-1, 1): v[-1:, :1], (1, 1): v[-1:, -1:],
    }


def focal_sum3(tiles: ray.data.Dataset, *, nx: int, ny: int,
               nodata: float = -1.0) -> ray.data.Dataset:
    """TILE_SCHEMA tiles of an (ny, nx) raster -> TILE_SCHEMA float64
    tiles of the 3x3 focal sum. One halo exchange: per tile, 8 border
    strips + the tile itself move to their destination groups."""
    ntx, nty = -(-nx // TILE), -(-ny // TILE)

    def emit(b: pa.Table) -> pa.Table:
        dtx, dty, kind = [], [], []
        px, vws, vhs, srcdx, srcdy = [], [], [], [], []
        lods, bands = [], []
        for i in range(b.num_rows):
            lod = int(b["lod"][i].as_py())
            band = int(b["band"][i].as_py())
            tx = int(b["tile_x"][i].as_py())
            ty = int(b["tile_y"][i].as_py())
            vw = int(b["valid_w"][i].as_py())
            vh = int(b["valid_h"][i].as_py())
            blk = np.frombuffer(b["px"][i].as_py(),
                                dtype=_np_dtype(b["dtype"][i].as_py())) \
                .reshape(TILE, TILE)
            if blk.dtype.kind == "f" and np.isnan(blk[:vh, :vw]).any():
                # NaN is this plan's missing-halo SENTINEL: a NaN data
                # pixel would silently rewrite to nodata while the
                # whole-raster oracle propagates NaN — refuse instead
                # (encode missing data as a nodata VALUE upstream)
                raise ValueError("focal_sum3: NaN pixels are not "
                                 "supported; use a nodata value")
            # the tile itself
            dtx.append(tx); dty.append(ty); kind.append(0)
            lods.append(lod); bands.append(band)
            px.append(blk[:vh, :vw].astype(np.float64).tobytes())
            vws.append(vw); vhs.append(vh); srcdx.append(0); srcdy.append(0)
            # border strips to the 8 neighbors that exist
            for (ddx, ddy), strip in _strips_of(blk, vw, vh).items():
                qx, qy = tx + ddx, ty + ddy
                if 0 <= qx < ntx and 0 <= qy < nty:
                    dtx.append(qx); dty.append(qy); kind.append(1)
                    lods.append(lod); bands.append(band)
                    px.append(np.ascontiguousarray(
                        strip.astype(np.float64)).tobytes())
                    vws.append(strip.shape[1]); vhs.append(strip.shape[0])
                    srcdx.append(-ddx)   # where the strip sits, seen
                    srcdy.append(-ddy)   # from the DESTINATION tile
        return pa.table({
            "lod": pa.array(lods, pa.int32()),
            "band": pa.array(bands, pa.int32()),
            "dst_tx": pa.array(dtx, pa.int32()),
            "dst_ty": pa.array(dty, pa.int32()),
            "kind": pa.array(kind, pa.int8()),
            "sdx": pa.array(srcdx, pa.int8()),
            "sdy": pa.array(srcdy, pa.int8()),
            "vw": pa.array(vws, pa.int32()),
            "vh": pa.array(vhs, pa.int32()),
            "px": pa.array(px, pa.large_binary()),
        })

    _EMPTY = pa.table({
        "lod": pa.array([], pa.int32()), "band": pa.array([], pa.int32()),
        "tile_x": pa.array([], pa.int32()),
        "tile_y": pa.array([], pa.int32()),
        "valid_w": pa.array([], pa.int32()),
        "valid_h": pa.array([], pa.int32()),
        "dtype": pa.array([], pa.string()),
        "px": pa.array([], pa.large_binary()),
    })

    def assemble(g: pa.Table) -> pa.Table:
        kinds = g["kind"].to_numpy()
        if not (kinds == 0).any():
            # a sparse tileset: neighbor strips alone must NOT conjure a
            # phantom output tile the input never had
            return _EMPTY
        tx = int(g["dst_tx"][0].as_py())
        ty = int(g["dst_ty"][0].as_py())
        vw = min(TILE, nx - tx * TILE)
        vh = min(TILE, ny - ty * TILE)
        halo = np.full((vh + 2, vw + 2), np.nan, dtype=np.float64)
        for i in range(g.num_rows):
            a = np.frombuffer(g["px"][i].as_py(), dtype=np.float64) \
                .reshape(int(g["vh"][i].as_py()), int(g["vw"][i].as_py()))
            if int(g["kind"][i].as_py()) == 0:
                halo[1:1 + a.shape[0], 1:1 + a.shape[1]] = a
                continue
            sdx = int(g["sdx"][i].as_py())
            sdy = int(g["sdy"][i].as_py())
            # strip placement in halo coords, relative to this tile:
            # sdx=-1 -> left halo column, sdx=+1 -> right; same for y
            y0 = 0 if sdy < 0 else (vh + 1 if sdy > 0 else 1)
            x0 = 0 if sdx < 0 else (vw + 1 if sdx > 0 else 1)
            # edge strips run the full facing edge; clip to this tile's
            # valid span (neighbor edge tiles can be shorter)
            hh = min(a.shape[0], halo.shape[0] - y0)
            ww = min(a.shape[1], halo.shape[1] - x0)
            halo[y0:y0 + hh, x0:x0 + ww] = a[:hh, :ww]
        acc = np.zeros((vh, vw), dtype=np.float64)
        for dy in range(3):
            for dx in range(3):
                acc += halo[dy:dy + vh, dx:dx + vw]
        out = np.where(np.isnan(acc), nodata, acc)
        block = np.full((TILE, TILE), nodata, dtype=np.float64)
        block[:vh, :vw] = out
        return pa.table({
            "lod": pa.array([int(g["lod"][0].as_py())], pa.int32()),
            "band": pa.array([int(g["band"][0].as_py())], pa.int32()),
            "tile_x": pa.array([tx], pa.int32()),
            "tile_y": pa.array([ty], pa.int32()),
            "valid_w": pa.array([vw], pa.int32()),
            "valid_h": pa.array([vh], pa.int32()),
            "dtype": pa.array(["float64"]),
            "px": pa.array([block.tobytes()], pa.large_binary()),
        })

    return tiles.map_batches(emit, batch_format="pyarrow") \
        .groupby(["lod", "band", "dst_tx", "dst_ty"]) \
        .map_groups(assemble, batch_format="pyarrow")
