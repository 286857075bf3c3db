"""Vector tiling: feature rows -> encoded MVT tiles, keyed by (z, x, y).

The reference only READS vector tiles (mvt.cpp); a complete engine also
builds them. Shape: features flat_map to every tile their bbox touches
(cover join on the tile grid — same key discipline as the raster side),
`groupby(tile).map_groups(encode)` quantizes world coords to tile-local
integers (inverse of the decode Trafo, mvt.cpp:62-93, y-flip included) and
emits one `tile_data` blob per tile in the keyed-store row layout
(zoom/col/row TMS, detail/mbtiles.cpp:128-225) — so built tiles feed
straight back through `tilestore.lookup` + `decode_tile`.

Encoder shape (the shuffle CONSUMER, so it must be vectorized): per
layer, geometry is flattened zero-copy via Arrow list offsets, ALL
coordinates quantize/delta/zigzag in whole-layer NumPy ops, and the
command stream is written by computed-index scatter into one int64
array — no per-feature or per-vertex Python. Attribute key/value tables
are real dictionaries: keys and typed values dedup per layer with the
7-way `Value` variant mirrored from the decoder (mvt.cpp:457-520), so
re-encoded tiles keep attribute types and don't bloat.

No geometric clipping: MVT permits coordinates outside [0, extent) (the
buffer convention); a feature lands whole in every covered tile. Feature
order inside a tile is (layer, fid) — deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..grid import Extents, tms_flip
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


def typed_value(v):
    """Python value -> MVT `Value` (kind, value) with the decoder's 7-way
    mapping (decode_value, mvt.cpp:457-520). Explicit (kind, value) pairs
    pass through for the float/uint/sint slots the inference can't pick."""
    if isinstance(v, (tuple, list)) and len(v) == 2 \
            and isinstance(v[0], (int, float)) and float(v[0]).is_integer() \
            and 1 <= v[0] <= 7:
        # explicit pair; Arrow transit may turn (2, 0.25) into [2.0, 0.25]
        return (int(v[0]), v[1])
    if isinstance(v, (bool, np.bool_)):        # before int: bool ⊂ int
        return (7, bool(v))
    if isinstance(v, (int, np.integer)):
        return (4, int(v))
    if isinstance(v, (float, np.floating)):
        return (3, float(v))
    return (1, str(v))


def _flatten_geometry(col: pa.ChunkedArray | pa.Array):
    """list<list<struct{x,y}>> column -> (parts-per-feature,
    points-per-part, xs, ys) — Arrow offset flattening, slice-safe,
    no per-row Python."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # fill_null(0): a NULL geometry (or null part) is an EMPTY one —
    # list_value_length yields null -> NaN -> garbage int64 otherwise
    part_counts = pc.list_value_length(col).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    flat_parts = pc.list_flatten(col)
    pt_counts = pc.list_value_length(flat_parts).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    pts = pc.list_flatten(flat_parts)
    xs = pc.struct_field(pts, "x").to_numpy(zero_copy_only=False)
    ys = pc.struct_field(pts, "y").to_numpy(zero_copy_only=False)
    return part_counts, pt_counts, xs, ys


def _layer_streams(lt: pa.Table, te: Extents, extent: int):
    """All of a layer's features -> one scatter-built command array plus
    per-feature stream slices. Returns (stream:int64[], feat_bounds)."""
    gtypes = lt["geom_type"].to_numpy(zero_copy_only=False).astype(np.int64)
    part_counts, pt_counts, xs, ys = _flatten_geometry(lt["geometry"])
    lx, ly = world_to_local(xs, ys, te, extent)

    n_feat = len(gtypes)
    if len(lx) == 0:   # all geometries empty/null: every stream is empty
        return (np.zeros(0, dtype=np.int64),
                np.zeros((n_feat, 2), dtype=np.int64))
    part_feat = np.repeat(np.arange(n_feat), part_counts)
    part_gtype = gtypes[part_feat]
    part_idx_in_feat = np.arange(len(part_feat)) \
        - np.repeat(np.concatenate(([0], np.cumsum(part_counts)[:-1])),
                    part_counts)

    # point features take ONLY part 0 (geometry_stream semantics)
    keep_part = ~((part_gtype == mvt.GEOM_POINT) & (part_idx_in_feat > 0))
    # polygon rings drop a closing vertex identical to the first
    pt_start = np.concatenate(([0], np.cumsum(pt_counts)[:-1]))
    pt_end = pt_start + pt_counts - 1
    # clamp the probe indices: an EMPTY trailing part has
    # pt_start == len(lx); its closed-flag value is irrelevant (kept_n
    # filters it) but the eager fancy index must stay in bounds
    ps = np.minimum(pt_start, len(lx) - 1)
    closed = (part_gtype == mvt.GEOM_POLYGON) & (pt_counts > 1) \
        & (lx[ps] == lx[np.maximum(np.minimum(pt_end, len(lx) - 1), 0)]) \
        & (ly[ps] == ly[np.maximum(np.minimum(pt_end, len(lx) - 1), 0)])
    kept_n = np.where(closed, pt_counts - 1, pt_counts)

    # point keep-mask: drop tails of closed rings + all points of dropped
    # parts, via per-part CSR ranges. Non-point parts additionally need
    # >= 2 kept points: a 1-point line/ring would emit a ZERO-count
    # LineTo, which the decoder rejects by aborting the WHOLE layer —
    # one degenerate part must not discard its neighbors.
    keep_pt = np.zeros(len(lx), dtype=bool)
    kp = keep_part & np.where(part_gtype == mvt.GEOM_POINT,
                              kept_n > 0, kept_n >= 2)
    if kp.any():
        s, n = pt_start[kp], kept_n[kp]
        idx = np.repeat(s - np.concatenate(([0], np.cumsum(n)[:-1])), n) \
            + np.arange(int(n.sum()))
        keep_pt[idx] = True
    lx, ly = lx[keep_pt], ly[keep_pt]
    pt_feat = part_feat[np.repeat(np.arange(len(part_feat)), pt_counts)]
    pt_feat = pt_feat[keep_pt]

    part_counts_k = kept_n[kp]
    part_gtype_k = part_gtype[kp]
    part_feat_k = part_feat[kp]

    # cursor chain per FEATURE over its kept points, zero-start
    prev_x = np.concatenate(([0], lx[:-1]))
    prev_y = np.concatenate(([0], ly[:-1]))
    fstart = np.concatenate(([True], pt_feat[1:] != pt_feat[:-1]))
    dx = lx - np.where(fstart, 0, prev_x)
    dy = ly - np.where(fstart, 0, prev_y)
    if len(dx) and max(int(np.abs(dx).max()),
                       int(np.abs(dy).max())) >= 1 << 31:
        # no clipping happens upstream (a feature lands whole in every
        # covered tile), so tile-local deltas grow as 2^lod * extent; a
        # wrap here would silently corrupt geometry AND stay under the
        # encoder's uvarint overflow guard — refuse instead
        raise ValueError(
            "tile-local coordinate delta exceeds the 32-bit MVT wire "
            "range; clip the feature or lower lod/extent")
    zx = ((dx << 1) ^ (dx >> 63)) & 0xFFFFFFFF
    zy = ((dy << 1) ^ (dy >> 63)) & 0xFFFFFFFF

    # segment layout per kept part:
    #   point:   [move(n), pairs...]                len 1+2n
    #   line:    [move(1), pair, line(n-1), pairs]  len 2+2n
    #   polygon: same + close                       len 3+2n
    is_pt = part_gtype_k == mvt.GEOM_POINT
    is_poly = part_gtype_k == mvt.GEOM_POLYGON
    seg_len = 2 + 2 * part_counts_k + is_poly.astype(np.int64)
    seg_len[is_pt] = 1 + 2 * part_counts_k[is_pt]
    seg_start = np.concatenate(([0], np.cumsum(seg_len)[:-1]))
    out = np.zeros(int(seg_len.sum()), dtype=np.int64)

    move_n = np.where(is_pt, part_counts_k, 1)
    out[seg_start] = (move_n << 3) | mvt.CMD_MOVE
    nl = ~is_pt
    out[seg_start[nl] + 3] = ((part_counts_k[nl] - 1) << 3) | mvt.CMD_LINE
    out[seg_start[is_poly] + 2 + 2 * part_counts_k[is_poly]] = \
        (1 << 3) | mvt.CMD_CLOSE

    # zz pair positions: j-th point of its part
    s_rep = np.repeat(seg_start, part_counts_k)
    is_pt_rep = np.repeat(is_pt, part_counts_k)
    j = np.arange(len(lx)) \
        - np.repeat(np.concatenate(([0], np.cumsum(part_counts_k)[:-1])),
                    part_counts_k)
    xpos = np.where(is_pt_rep, s_rep + 1 + 2 * j,
                    np.where(j == 0, s_rep + 1, s_rep + 2 * j + 2))
    out[xpos] = zx
    out[xpos + 1] = zy

    # per-feature stream bounds (features with no kept parts -> empty)
    feat_len = np.bincount(part_feat_k, weights=seg_len,
                           minlength=n_feat).astype(np.int64)
    feat_end = np.cumsum(feat_len)
    feat_bounds = np.stack([feat_end - feat_len, feat_end], axis=1)
    return out, feat_bounds


def build_tiles(features: ray.data.Dataset, world: Extents, lod: int,
                extent: int = 4096,
                num_partitions: int = 64) -> ray.data.Dataset:
    """Feature rows {fid, layer, geom_type, geometry(list<list<struct x,y>>),
    attrs} -> store rows {zoom, col, row (TMS), tile_data}.

    `attrs` may be a string (encoded under the single key 'attrs' — the
    legacy shape) or a dict of typed values (each key/value dedup'd into
    the layer dictionaries with the 7-way typed mapping)."""

    def cover(b: pa.Table) -> pa.Table:
        """Bbox -> covered-tile expansion, fully vectorized: per-feature
        min/max via reduceat, tile ranges by floor arithmetic, and the
        (feature x tile) fan-out by repeat + modular arithmetic."""
        part_counts, pt_counts, xs, ys = _flatten_geometry(b["geometry"])
        n_feat = b.num_rows
        pts_per_feat = np.bincount(
            np.repeat(np.arange(len(part_counts)), part_counts),
            weights=pt_counts, minlength=n_feat).astype(np.int64)
        f_start = np.concatenate(([0], np.cumsum(pts_per_feat)[:-1]))
        # reduceat only over features that HAVE points: an empty/null
        # geometry's start equals the next feature's (reduceat would
        # steal that feature's first vertex — or IndexError when the
        # empty feature is last). Point-less features get an inverted
        # bbox -> cnt = 0 -> dropped, the per-feature loop's semantics.
        has = pts_per_feat > 0
        gx0 = np.zeros(n_feat)
        gx1 = np.zeros(n_feat)
        gy0 = np.zeros(n_feat)
        gy1 = np.zeros(n_feat)
        if has.any():
            sub = f_start[has]
            gx0[has] = np.minimum.reduceat(xs, sub)
            gx1[has] = np.maximum.reduceat(xs, sub)
            gy0[has] = np.minimum.reduceat(ys, sub)
            gy1[has] = np.maximum.reduceat(ys, sub)
        side = 1 << lod
        tw = world.width / side
        th = world.height / side
        tx0 = np.maximum(0, np.floor((gx0 - world.llx) / tw)).astype(np.int64)
        tx1 = np.minimum(side - 1,
                         np.floor((gx1 - world.llx) / tw)).astype(np.int64)
        ty0 = np.maximum(0, np.floor((world.ury - gy1) / th)).astype(np.int64)
        ty1 = np.minimum(side - 1,
                         np.floor((world.ury - gy0) / th)).astype(np.int64)
        # A bbox entirely outside the world extents clamps to tx0>tx1 (or
        # ty0>ty1); clamp the counts to 0 so such features are dropped —
        # the per-feature loop's empty-range semantics — instead of a
        # negative repeat count crashing the whole job.
        nx = np.maximum(tx1 - tx0 + 1, 0)
        ny = np.maximum(ty1 - ty0 + 1, 0)
        cnt = np.where(has, nx * ny, 0)
        idx = np.repeat(np.arange(n_feat), cnt)
        k = np.arange(int(cnt.sum())) \
            - np.repeat(np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt)
        # row-major over the range: y outer, x inner (original tile order)
        txs = tx0[idx] + k % nx[idx]
        tys = ty0[idx] + k // nx[idx]
        t = b.take(pa.array(idx, type=pa.int64()))
        return t.append_column("tile_x",
                               pa.array(txs.astype(np.int32))) \
                .append_column("tile_y",
                               pa.array(tys.astype(np.int32)))

    def encode_tile_table(g: pa.Table, tx: int, ty: int) -> dict:
        te = tile_world_extents(world, lod, tx, ty)
        order = pc.sort_indices(g, sort_keys=[("layer", "ascending"),
                                              ("fid", "ascending")])
        g = g.take(order)
        layers = []
        lay_names = g["layer"].to_numpy(zero_copy_only=False)
        bounds = np.concatenate(
            ([0], np.nonzero(lay_names[1:] != lay_names[:-1])[0] + 1,
             [len(lay_names)]))
        for li in range(len(bounds) - 1):
            lt = g.slice(int(bounds[li]), int(bounds[li + 1] - bounds[li]))
            stream, fb = _layer_streams(lt, te, extent)
            fids = lt["fid"].to_numpy(zero_copy_only=False)
            gts = lt["geom_type"].to_numpy(zero_copy_only=False)
            attrs_col = lt["attrs"].to_pylist() \
                if "attrs" in lt.column_names else [None] * lt.num_rows
            keys: list[str] = []
            key_ix: dict[str, int] = {}
            values: list[tuple[int, object]] = []
            val_ix: dict[tuple, int] = {}
            feats = []
            for i in range(lt.num_rows):
                if fb[i, 1] == fb[i, 0]:
                    # every part degenerate (or geometry empty): the MVT
                    # spec requires features to carry geometry — skip
                    continue
                a = attrs_col[i]
                items = (a.items() if isinstance(a, dict)
                         else [] if a is None else [("attrs", str(a))])
                tags: list[int] = []
                for k, v in items:
                    if v is None:   # MVT has no null Value; also dicts
                        continue    # arrive struct-unified + null-filled
                    ki = key_ix.setdefault(k, len(keys))
                    if ki == len(keys):
                        keys.append(k)
                    kind, vv = typed_value(v)
                    vk = (kind, vv)
                    vi = val_ix.setdefault(vk, len(values))
                    if vi == len(values):
                        values.append(vk)
                    tags += [ki, vi]
                feat = {"type": int(gts[i]), "tags": tags,
                        "geometry": stream[fb[i, 0]:fb[i, 1]]}
                # nullable int64 -> float64 with NaN; a null fid encodes
                # as a feature WITHOUT an id (decode_tile's fid=None)
                if fids[i] == fids[i]:
                    feat["id"] = int(fids[i])
                feats.append(feat)
            layers.append({"name": str(lay_names[bounds[li]]),
                           "extent": extent,
                           "keys": keys, "values": values,
                           "features": feats})
        return {"zoom": np.int32(lod), "col": np.int32(tx),
                "row": np.int32(tms_flip(lod, ty)),
                "tile_data": mvt.encode_tile(layers)}

    def encode_part(g: pa.Table) -> pa.Table:
        empty = pa.table({"zoom": pa.array([], pa.int32()),
                          "col": pa.array([], pa.int32()),
                          "row": pa.array([], pa.int32()),
                          "tile_data": pa.array([], pa.large_binary())})
        if g.num_rows == 0 or "tile_x" not in g.column_names:
            return empty
        # one Ray dispatch per hash PARTITION; tiles iterate in-process
        txs = g["tile_x"].to_numpy().astype(np.int64)
        tys = g["tile_y"].to_numpy().astype(np.int64)
        key = (txs << 32) | tys
        order = np.argsort(key, kind="stable")
        uk, starts = np.unique(key[order], return_index=True)
        rows = []
        gs = g.take(pa.array(order))
        starts = np.append(starts, len(key))
        for i in range(len(uk)):
            sub = gs.slice(int(starts[i]), int(starts[i + 1] - starts[i]))
            rows.append(encode_tile_table(
                sub, int(uk[i] >> 32), int(uk[i] & 0xFFFFFFFF)))
        return pa.table({
            "zoom": pa.array([r["zoom"] for r in rows], pa.int32()),
            "col": pa.array([r["col"] for r in rows], pa.int32()),
            "row": pa.array([r["row"] for r in rows], pa.int32()),
            "tile_data": pa.array([r["tile_data"] for r in rows],
                                  pa.large_binary()),
        })

    from .joins import partitioned_groups
    covered = features.map_batches(cover, batch_format="pyarrow",
                                   batch_size=None)
    return partitioned_groups(covered, ["tile_x", "tile_y"],
                              num_partitions) \
        .map_groups(encode_part, batch_format="pyarrow")
