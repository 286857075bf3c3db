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

_DTYPES = {"uint8": np.uint8, "uint16": np.uint16, "int16": np.int16,
           "uint32": np.uint32, "int32": np.int32,
           "float32": np.float32, "float64": np.float64,
           # GDAL names (solid.cpp:408-440)
           "Byte": np.uint8, "UInt16": np.uint16, "Int16": np.int16,
           "UInt32": np.uint32, "Int32": np.int32,
           "Float32": np.float32, "Float64": np.float64}


def downsample2(arr: np.ndarray) -> np.ndarray:
    """2x2 box filter; truncates to the accumulator dtype like the
    reference's convertTo (blender.cpp:648-654)."""
    h, w = arr.shape
    a = arr[:h // 2 * 2, :w // 2 * 2].astype(np.float64)
    return a.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)).astype(arr.dtype)


def _parent_level(level_tiles: ray.data.Dataset, lod: int,
                  fill: float) -> ray.data.Dataset:
    """Tiles at `lod` -> tiles at `lod-1` via groupby(parent cell)."""

    def add_parent(b: pa.Table) -> pa.Table:
        cells = cell_id(np.full(b.num_rows, lod, dtype=np.int64),
                        b["tile_x"].to_numpy().astype(np.int64),
                        b["tile_y"].to_numpy().astype(np.int64))
        return b.append_column("parent_cell", pa.array(cell_parent(cells)))

    def assemble(g: pa.Table) -> pa.Table:
        dt = _DTYPES[g["dtype"][0].as_py()]
        big = np.full((2 * TILE, 2 * TILE), fill, dtype=np.float64)
        ptx = int(g["tile_x"][0].as_py()) // 2
        pty = int(g["tile_y"][0].as_py()) // 2
        for i in range(g.num_rows):
            tx = int(g["tile_x"][i].as_py())
            ty = int(g["tile_y"][i].as_py())
            vw = int(g["valid_w"][i].as_py())
            vh = int(g["valid_h"][i].as_py())
            a = np.frombuffer(g["px"][i].as_py(), dtype=dt).reshape(TILE, TILE)
            ox = (tx - 2 * ptx) * TILE
            oy = (ty - 2 * pty) * TILE
            big[oy:oy + vh, ox:ox + vw] = a[:vh, :vw]
        small = downsample2(big.astype(dt))
        # parent valid extent = ceil(child extents / 2) over present children
        vw_p = min(TILE, (max((int(g["tile_x"][i].as_py()) - 2 * ptx) * TILE
                              + int(g["valid_w"][i].as_py())
                              for i in range(g.num_rows)) + 1) // 2)
        vh_p = min(TILE, (max((int(g["tile_y"][i].as_py()) - 2 * pty) * TILE
                              + int(g["valid_h"][i].as_py())
                              for i in range(g.num_rows)) + 1) // 2)
        return pa.table({
            "lod": pa.array([lod - 1], type=pa.int32()),
            "band": pa.array([int(g["band"][0].as_py())
                              if "band" in g.column_names else 0],
                             type=pa.int32()),
            "tile_x": pa.array([ptx], type=pa.int32()),
            "tile_y": pa.array([pty], type=pa.int32()),
            "valid_w": pa.array([vw_p], type=pa.int32()),
            "valid_h": pa.array([vh_p], type=pa.int32()),
            "dtype": pa.array([g["dtype"][0].as_py()]),
            "px": pa.array([small.tobytes()], type=pa.large_binary()),
        })

    return level_tiles.map_batches(add_parent, batch_format="pyarrow") \
        .groupby("parent_cell").map_groups(assemble, batch_format="pyarrow")


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
