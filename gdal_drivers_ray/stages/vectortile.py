"""Vector tiling: feature rows -> encoded MVT tiles, keyed by (z, x, y).

The reference only READS vector tiles (mvt.cpp); a complete engine also
builds them. Shape: features flat_map to every tile their bbox touches
(cover join on the tile grid — same key discipline as the raster side),
`groupby(tile).map_groups(encode)` quantizes world coords to tile-local
integers (inverse of the decode Trafo, mvt.cpp:62-93, y-flip included) and
emits one `tile_data` blob per tile in the keyed-store row layout
(zoom/col/row TMS, detail/mbtiles.cpp:128-225) — so built tiles feed
straight back through `tilestore.lookup` + `decode_tile`.

No geometric clipping: MVT permits coordinates outside [0, extent) (the
buffer convention); a feature lands whole in every covered tile. Feature
order inside a tile is (layer, fid) — deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..grid import TILE, Extents, tms_flip
from ..sources import mvt


def tile_world_extents(world: Extents, lod: int, tx: int, ty: int) -> Extents:
    side = 1 << lod
    tw = world.width / side
    th = world.height / side
    x0 = world.llx + tx * tw
    y1 = world.ury - ty * th
    return Extents(x0, y1 - th, x0 + tw, y1)


def world_to_local(xs, ys, te: Extents, extent: int):
    """World -> tile-local int coords (y-down, quantized to `extent`)."""
    lx = np.round((np.asarray(xs) - te.llx) / te.width * extent).astype(np.int64)
    ly = np.round((te.ury - np.asarray(ys)) / te.height * extent).astype(np.int64)
    return lx, ly


def _covering_tiles(gx0, gy0, gx1, gy1, world: Extents, lod: int):
    side = 1 << lod
    tw = world.width / side
    th = world.height / side
    tx0 = max(0, int(np.floor((gx0 - world.llx) / tw)))
    tx1 = min(side - 1, int(np.floor((gx1 - world.llx) / tw)))
    ty0 = max(0, int(np.floor((world.ury - gy1) / th)))
    ty1 = min(side - 1, int(np.floor((world.ury - gy0) / th)))
    return [(x, y) for y in range(ty0, ty1 + 1) for x in range(tx0, tx1 + 1)]


def build_tiles(features: ray.data.Dataset, world: Extents, lod: int,
                extent: int = 4096,
                num_partitions: int = 64) -> ray.data.Dataset:
    """Feature rows {fid, layer, geom_type, geometry(list<list<struct x,y>>),
    attrs:str} -> store rows {zoom, col, row (TMS), tile_data}."""

    def cover(b: pa.Table) -> pa.Table:
        idx, txs, tys = [], [], []
        geos = b["geometry"].to_pylist()
        for i, parts in enumerate(geos):
            pts = [(p["x"], p["y"]) for part in parts for p in part]
            xs = np.array([p[0] for p in pts])
            ys = np.array([p[1] for p in pts])
            for (tx, ty) in _covering_tiles(xs.min(), ys.min(),
                                            xs.max(), ys.max(), world, lod):
                idx.append(i)
                txs.append(tx)
                tys.append(ty)
        t = b.take(pa.array(idx, type=pa.int64()))
        return t.append_column("tile_x", pa.array(txs, pa.int32())) \
                .append_column("tile_y", pa.array(tys, pa.int32()))

    def encode(g: pd.DataFrame, tx: int, ty: int) -> pd.DataFrame:
        te = tile_world_extents(world, lod, tx, ty)
        g = g.sort_values(["layer", "fid"], kind="stable")
        layers = []
        for lname, lg in g.groupby("layer", sort=True):
            keys = ["attrs"]
            values = []
            feats = []
            for _, row in lg.iterrows():
                parts_local = []
                for part in row["geometry"]:
                    xs = np.array([p["x"] for p in part])
                    ys = np.array([p["y"] for p in part])
                    lx, ly = world_to_local(xs, ys, te, extent)
                    parts_local.append(list(zip(lx.tolist(), ly.tolist())))
                stream = mvt.geometry_stream(parts_local,
                                             int(row["geom_type"]))
                vi = len(values)
                values.append((1, str(row["attrs"])))
                feats.append({"id": int(row["fid"]),
                              "type": int(row["geom_type"]),
                              "tags": [0, vi], "geometry": stream})
            layers.append({"name": lname, "extent": extent,
                           "keys": keys, "values": values,
                           "features": feats})
        blob = mvt.encode_tile(layers)
        return pd.DataFrame({
            "zoom": [np.int32(lod)],
            "col": [np.int32(tx)],
            "row": [np.int32(tms_flip(lod, ty))],
            "tile_data": [blob],
        })

    def encode_part(g: pd.DataFrame) -> pd.DataFrame:
        # one Ray dispatch per hash PARTITION; tiles iterate in-process
        out = [encode(tg, int(tx), int(ty))
               for (tx, ty), tg in g.groupby(["tile_x", "tile_y"],
                                             sort=True)]
        if not out:
            return pd.DataFrame({"zoom": pd.Series([], dtype=np.int32),
                                 "col": pd.Series([], dtype=np.int32),
                                 "row": pd.Series([], dtype=np.int32),
                                 "tile_data": pd.Series([], dtype=object)})
        return pd.concat(out, ignore_index=True)

    from .joins import partitioned_groups
    covered = features.map_batches(cover, batch_format="pyarrow")
    return partitioned_groups(covered, ["tile_x", "tile_y"],
                              num_partitions) \
        .map_groups(encode_part, batch_format="pandas")
