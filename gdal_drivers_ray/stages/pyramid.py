"""LOD pyramid builder over real pixel tiles — M2 as a shuffle op.

The reference serves overviews by re-generating blocks from the same source
(solid.cpp:120-145) or by reading the quadtree at a shallower depth
(mask.cpp:168-211). For real payloads, a coarser LOD is BUILT from its four
children: `groupby(parent_cell).map_groups(assemble 2x2 -> box downsample)`
(SURVEY §2.2 M2 mapping), iterated level by level.

Shuffle economics: each level moves every tile's pixels exactly once, keyed
on the parent Morton cell; level ℓ-1 has 1/4 the tiles of level ℓ, so the
whole pyramid costs ~4/3 of one level's exchange. Missing children (sparse
coverage) fill with `fill` — matching the solid/blend nodata convention.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..grid import TILE, cell_id, cell_parent, unmorton2

# ONE dtype-tag mapping for the whole engine (stages/warp.py owns it) —
# _np_dtype also falls through to np.dtype(tag) for plain numpy names,
# which the old inline table here rejected with KeyError
from .warp import _np_dtype


def downsample2(arr: np.ndarray) -> np.ndarray:
    """2x2 box filter; truncates to the accumulator dtype like the
    reference's convertTo (blender.cpp:648-654)."""
    h, w = arr.shape
    a = arr[:h // 2 * 2, :w // 2 * 2].astype(np.float64)
    return a.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)).astype(arr.dtype)


def _parent_level(level_tiles: ray.data.Dataset, lod: int, fill: float,
                  num_partitions: int = 64) -> ray.data.Dataset:
    """Tiles at `lod` -> tiles at `lod-1`, keyed on the parent Morton cell.

    Shuffle shape: groupby a HASH PARTITION of the parent cell (one Python
    call per partition, not per parent — the per-group map_groups overhead
    was the round-1 scale finding); inside a partition all parents
    assemble into one (n_parents, 512, 512) stack and downsample in a
    single reshape-mean per dtype group."""

    def add_parent(b: pa.Table) -> pa.Table:
        cells = cell_id(np.full(b.num_rows, lod, dtype=np.int64),
                        b["tile_x"].to_numpy().astype(np.int64),
                        b["tile_y"].to_numpy().astype(np.int64))
        par = cell_parent(cells)
        part = (par % np.int64(num_partitions)).astype(np.int32)
        return b.append_column("parent_cell", pa.array(par)) \
                .append_column("_part", pa.array(part))

    def assemble_part(g: pa.Table) -> pa.Table:
        par_raw = g["parent_cell"].to_numpy()
        band_raw = (g["band"].to_numpy().astype(np.int64)
                    if "band" in g.column_names
                    else np.zeros(len(par_raw), dtype=np.int64))
        # group key is (parent_cell, BAND): a multi-band tileset has one
        # child row per band at the same coords, and unifying them by
        # cell alone splatted all bands into one parent (last writer
        # wins) and emitted a single band — the warp/focal band rule
        order = np.lexsort((band_raw, par_raw))
        par = par_raw[order]
        band = band_raw[order]
        tx = g["tile_x"].to_numpy().astype(np.int64)[order]
        ty = g["tile_y"].to_numpy().astype(np.int64)[order]
        vw = g["valid_w"].to_numpy().astype(np.int64)[order]
        vh = g["valid_h"].to_numpy().astype(np.int64)[order]
        dts = [g["dtype"][int(i)].as_py() for i in order.tolist()]
        pxs = g["px"].to_pylist()

        newgrp = np.concatenate(([True], (par[1:] != par[:-1])
                                 | (band[1:] != band[:-1])))
        starts = np.nonzero(newgrp)[0]
        n_par = len(starts)
        pidx = np.cumsum(newgrp) - 1
        ptx = tx // 2
        pty = ty // 2
        big = np.full((n_par, 2 * TILE, 2 * TILE), fill, dtype=np.float64)
        for i in range(len(par)):           # numpy slice copy per child;
            dt = _np_dtype(dts[i])          # the 512^2 math is batched below
            a = np.frombuffer(pxs[order[i]], dtype=dt).reshape(TILE, TILE)
            ox = int((tx[i] - 2 * ptx[i]) * TILE)
            oy = int((ty[i] - 2 * pty[i]) * TILE)
            big[pidx[i], oy:oy + vh[i], ox:ox + vw[i]] = a[:vh[i], :vw[i]]

        # parent valid extents: reduceat max over each parent's children
        wext = (tx - 2 * ptx) * TILE + vw
        hext = (ty - 2 * pty) * TILE + vh
        vw_p = np.minimum(TILE, (np.maximum.reduceat(wext, starts) + 1) // 2)
        vh_p = np.minimum(TILE, (np.maximum.reduceat(hext, starts) + 1) // 2)

        # batch-downsample per dtype group (cast-first like convertTo)
        first = starts                       # first child row per parent
        out_px: list[bytes] = [b""] * n_par
        pdts = [dts[int(i)] for i in first.tolist()]
        for dt_name in set(pdts):
            dt = _np_dtype(dt_name)
            sel = np.asarray([j for j, d in enumerate(pdts)
                              if d == dt_name])
            stack = big[sel].astype(dt).astype(np.float64)
            small = stack.reshape(len(sel), TILE, 2, TILE, 2) \
                .mean(axis=(2, 4)).astype(dt)
            for j, s in zip(sel.tolist(), small):
                out_px[j] = s.tobytes()

        return pa.table({
            "lod": pa.array(np.full(n_par, lod - 1, dtype=np.int32)),
            "band": pa.array(band[first].astype(np.int32)),
            "tile_x": pa.array(ptx[first].astype(np.int32)),
            "tile_y": pa.array(pty[first].astype(np.int32)),
            "valid_w": pa.array(vw_p.astype(np.int32)),
            "valid_h": pa.array(vh_p.astype(np.int32)),
            "dtype": pa.array(pdts),
            "px": pa.array(out_px, type=pa.large_binary()),
        })

    return level_tiles.map_batches(add_parent, batch_format="pyarrow",
                                   batch_size=None) \
        .groupby("_part").map_groups(assemble_part, batch_format="pyarrow")


def build_pyramid(tiles: ray.data.Dataset, base_lod: int, top_lod: int = 0,
                  fill: float = 0.0) -> ray.data.Dataset:
    """TILE_SCHEMA tiles at base_lod -> union of all levels top_lod..base_lod.

    Each level is built from the one below and MATERIALIZED before feeding
    the next (it is consumed twice: once as output, once as next input);
    level sizes shrink 4x per step so the pinned footprint is bounded by
    ~1/3 of the base level."""
    out = tiles
    level = tiles
    for lod in range(base_lod, top_lod, -1):
        level = _parent_level(level, lod, fill).materialize()
        out = out.union(level)
    return out


def pyramid_oracle(base: np.ndarray, levels: int) -> list[np.ndarray]:
    """NumPy reference: repeated 2x2 box downsample of the full raster."""
    out = [base]
    for _ in range(levels):
        out.append(downsample2(out[-1]))
    return out
