"""Spatial join operators: point-in-polygon and kNN (north-rule extensions,
SURVEY.md §2.4 J-extensions).

Both follow the reference's prefilter-then-refine shape (the quadtree
constraint of mask.cpp:229-233: cheap spatial key prunes, exact math
refines):

- PIP: polygons (small side) -> covering grid cells at a fixed lod ->
  broadcast {cell: [poly]} index; points stream through map_batches,
  candidate polygons come from the point's cell, an even-odd ray cast
  (the winding math family of mvt.cpp:378-415) decides.
- kNN: points bucketed by grid cell; per query, expand k-rings of cells
  (ring r = Chebyshev distance r in tile space) until k hits are found AND
  the next ring cannot beat the current k-th distance — then exact.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..grid import Extents, tile_of_points


# ---------------------------------------------------------------------------
# ray casting
# ---------------------------------------------------------------------------

def points_in_ring(xs: np.ndarray, ys: np.ndarray,
                   ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test, vectorized over points. ring: (n, 2), open or
    closed. Edges half-open in y to count boundary crossings once."""
    rx = ring[:, 0]
    ry = ring[:, 1]
    if rx[0] == rx[-1] and ry[0] == ry[-1]:
        rx, ry = rx[:-1], ry[:-1]
    x1, y1 = rx, ry
    x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
    inside = np.zeros(len(xs), dtype=bool)
    for i in range(len(x1)):
        cond = ((y1[i] > ys) != (y2[i] > ys))
        if not cond.any():
            continue
        t = (ys - y1[i]) / (y2[i] - y1[i])
        xint = x1[i] + t * (x2[i] - x1[i])
        inside ^= cond & (xs < xint)
    return inside


def point_in_polygon(xs: np.ndarray, ys: np.ndarray,
                     rings: list[np.ndarray]) -> np.ndarray:
    """Polygon with holes: even-odd over all rings (exterior + holes),
    matching the MVT ring model (CW exterior / CCW holes, mvt.cpp:378-415
    — even-odd is winding-agnostic)."""
    inside = np.zeros(len(xs), dtype=bool)
    for ring in rings:
        inside ^= points_in_ring(xs, ys, ring)
    return inside


# ---------------------------------------------------------------------------
# PIP with cell prefilter
# ---------------------------------------------------------------------------

def polygon_cells(rings: list[np.ndarray], world: Extents,
                  lod: int) -> set[tuple[int, int]]:
    """Covering cells of the polygon's bbox at `lod` (coarse prefilter —
    refinement rejects bbox-only hits)."""
    allpts = np.vstack(rings)
    tx0, ty1 = tile_of_points([allpts[:, 0].min()], [allpts[:, 1].min()],
                              world, lod)
    tx1, ty0 = tile_of_points([allpts[:, 0].max()], [allpts[:, 1].max()],
                              world, lod)
    return {(x, y) for x in range(int(tx0[0]), int(tx1[0]) + 1)
            for y in range(int(ty0[0]), int(ty1[0]) + 1)}


def pip_join(points: ray.data.Dataset, polygons: list[tuple[int, list[np.ndarray]]],
             world: Extents, lod: int = 4,
             x_col: str = "x", y_col: str = "y",
             id_col: str = "point_id") -> ray.data.Dataset:
    """points ⋈ polygons -> (point_id, poly_id) matches. Polygons are the
    small side: cell index built driver-side, broadcast via ray.put once."""
    cell_index: dict[tuple[int, int], list[int]] = {}
    for pid, rings in polygons:
        for c in polygon_cells(rings, world, lod):
            cell_index.setdefault(c, []).append(pid)
    polys = {pid: [np.asarray(r, dtype=np.float64) for r in rings]
             for pid, rings in polygons}
    ref = ray.put((cell_index, polys))

    def refine(batch: pa.Table) -> pa.Table:
        idx, pls = ray.get(ref)
        xs = batch[x_col].to_numpy().astype(np.float64)
        ys = batch[y_col].to_numpy().astype(np.float64)
        ids = batch[id_col].to_numpy()
        tx, ty = tile_of_points(xs, ys, world, lod)
        out_pt, out_poly = [], []
        # group points by candidate polygon, refine vectorized per polygon
        cand: dict[int, list[int]] = {}
        for i, c in enumerate(zip(tx.tolist(), ty.tolist())):
            for pid in idx.get(c, ()):
                cand.setdefault(pid, []).append(i)
        for pid, rows in cand.items():
            rows = np.asarray(rows)
            hit = point_in_polygon(xs[rows], ys[rows], pls[pid])
            out_pt.append(ids[rows[hit]])
            out_poly.append(np.full(int(hit.sum()), pid, dtype=np.int64))
        if not out_pt:
            return pa.table({"point_id": pa.array([], pa.int64()),
                             "poly_id": pa.array([], pa.int64())})
        return pa.table({"point_id": pa.array(np.concatenate(out_pt)),
                         "poly_id": pa.array(np.concatenate(out_poly))})

    return points.map_batches(refine, batch_format="pyarrow",
                              batch_size=None)


def pack_rings(rings: list[np.ndarray]) -> bytes:
    """[(n,2) float64 arrays] -> bytes (ring-count, per-ring point-count
    prefixes). The wire form polygons take through a shuffle."""
    parts = [np.array([len(rings)], dtype=np.int64).tobytes()]
    for r in rings:
        r = np.ascontiguousarray(np.asarray(r, dtype=np.float64))
        parts.append(np.array([len(r)], dtype=np.int64).tobytes())
        parts.append(r.tobytes())
    return b"".join(parts)


def unpack_rings(blob: bytes) -> list[np.ndarray]:
    buf = np.frombuffer(blob, dtype=np.float64)
    hdr = np.frombuffer(blob, dtype=np.int64)
    n = int(hdr[0])
    out = []
    off = 1  # in 8-byte words
    for _ in range(n):
        m = int(hdr[off])
        off += 1
        out.append(buf[off:off + 2 * m].reshape(m, 2).copy())
        off += 2 * m
    return out


def salted_cell_keys(cells: np.ndarray, hot_cells: np.ndarray,
                     n_salts: int) -> np.ndarray:
    """Fold a per-row salt into the cell key: rows of HOT cells spread
    round-robin over `n_salts` sub-keys (bounding any one reducer group to
    ~|hot cell| / n_salts rows), cold cells keep salt 0. Key space is
    cell * n_salts + salt, so downstream cogroup logic is unchanged."""
    salt = np.zeros(len(cells), dtype=np.int64)
    if len(hot_cells):
        m = np.isin(cells, hot_cells)
        salt[m] = np.arange(int(m.sum()), dtype=np.int64) % n_salts
    return cells * n_salts + salt


_HOT_CAP = 4096  # driver hot-cell table bound, independent of 4^lod


def _hot_cells_of(counts: ray.data.Dataset, num_partitions: int,
                  hot_threshold: Optional[int], what: str,
                  cap: int = _HOT_CAP) -> np.ndarray:
    """Partition-size accounting -> hot cell ids, DISTRIBUTED (stages/
    skew.py pattern, but the per-cell histogram never lands on the driver:
    at lod >= 13 over a dense corpus it holds tens of millions of rows).
    total -> threshold -> distributed filter(n > thr) -> per-block top-cap
    partials -> single-task final top-cap -> take_all of <= cap rows.
    With the default threshold (4x the mean partition share) at most
    num_partitions/4 cells can exceed it, so the cap only bites on
    user-supplied thresholds; the DRIVER receives O(cap) rows in every
    case (the per-block partials funnel into one reduce task off the
    driver). Salting is a partitioning optimization, so dropping
    over-cap hot cells never changes results."""
    import sys
    counts = counts.materialize()   # metadata-scale; reused for sum+filter
    total = int(counts.sum("n") or 0)
    thr = hot_threshold if hot_threshold is not None \
        else max((4 * total) // max(num_partitions, 1), 1024)
    hot_ds = counts.filter(expr=f"n > {thr}")

    def topcap(b: pa.Table) -> pa.Table:
        if b.num_rows <= cap:
            return b
        idx = np.argpartition(b["n"].to_numpy(), -cap)[-cap:]
        return b.take(pa.array(idx, type=pa.int64()))

    rows = hot_ds.map_batches(topcap, batch_format="pyarrow",
                              batch_size=None) \
        .repartition(1) \
        .map_batches(topcap, batch_format="pyarrow", batch_size=None) \
        .take_all()
    hot = np.array([r["cell"] for r in rows], dtype=np.int64)
    if len(hot):
        print(f"[skew] {what}: {len(hot)} hot cells (> {thr} rows)",
              file=sys.stderr)
    return hot


def pip_join_shuffle(points: ray.data.Dataset, polygons: ray.data.Dataset,
                     world: Extents, lod: int = 4,
                     x_col: str = "x", y_col: str = "y",
                     id_col: str = "point_id",
                     num_partitions: int = 64,
                     n_salts: int = 8,
                     hot_threshold: Optional[int] = None) -> ray.data.Dataset:
    """Both-sides-large PIP: polygons are a DATASET {poly_id:int64,
    rings:large_binary (pack_rings)}, not a broadcast list. Each polygon
    flat_maps to its covering cells (the quad-constraint prefilter), points
    key by their cell, and the two sides cogroup per hash partition of the
    cell — one vectorized ray-cast per (cell, polygon) against that cell's
    points. Every row moves once; no side needs to fit anywhere whole.

    Skew: a column-pruned accounting pass counts points per cell; cells
    over `hot_threshold` (default ~4x the mean partition share) SALT the
    point side across `n_salts` sub-keys and REPLICATE the covering
    polygon rows to every salt — each point still lives in exactly one
    sub-key, so matches stay exact and disjoint while no reducer sees a
    whole hot cell."""
    from ray.data.aggregate import Sum

    from .joins import partitioned_groups

    side_n = 1 << lod

    def cell_counts(b: pa.Table) -> pa.Table:
        tx, ty = tile_of_points(b[x_col].to_numpy(), b[y_col].to_numpy(),
                                world, lod)
        key, cnt = np.unique(tx * side_n + ty, return_counts=True)
        return pa.table({"cell": pa.array(key),
                         "n": pa.array(cnt.astype(np.int64))})

    counts = (points.map_batches(cell_counts, batch_format="pyarrow")
              .groupby("cell").aggregate(Sum("n", alias_name="n")))
    hot = _hot_cells_of(counts, num_partitions, hot_threshold, "pip points")
    hot_ref = ray.put(hot)

    def poly_cells_rows(b: pa.Table) -> pa.Table:
        hot_arr = ray.get(hot_ref)
        hot_set = set(hot_arr.tolist())
        pids, cells, blobs = [], [], []
        ids = b["poly_id"].to_numpy()
        rb = b["rings"].to_pylist()
        for i in range(len(ids)):
            rings = unpack_rings(rb[i])
            for (cx, cy) in polygon_cells(rings, world, lod):
                cell = cx * side_n + cy
                reps = range(n_salts) if cell in hot_set else (0,)
                for s in reps:
                    pids.append(int(ids[i]))
                    cells.append(cell * n_salts + s)
                    blobs.append(rb[i])
        n = len(pids)
        return pa.table({
            "cell": pa.array(cells, pa.int64()),
            "_kind": pa.array(np.ones(n, dtype=np.int8)),
            "poly_id": pa.array(pids, pa.int64()),
            "rings": pa.array(blobs, pa.large_binary()),
            "point_id": pa.nulls(n, pa.int64()),
            "x": pa.nulls(n, pa.float64()),
            "y": pa.nulls(n, pa.float64()),
        })

    def point_rows(b: pa.Table) -> pa.Table:
        hot_arr = ray.get(hot_ref)
        xs = b[x_col].to_numpy().astype(np.float64)
        ys = b[y_col].to_numpy().astype(np.float64)
        tx, ty = tile_of_points(xs, ys, world, lod)
        n = len(xs)
        return pa.table({
            "cell": pa.array(salted_cell_keys(tx * side_n + ty, hot_arr,
                                              n_salts)),
            "_kind": pa.array(np.zeros(n, dtype=np.int8)),
            "poly_id": pa.nulls(n, pa.int64()),
            "rings": pa.nulls(n, pa.large_binary()),
            "point_id": b[id_col].cast(pa.int64()),
            "x": pa.array(xs),
            "y": pa.array(ys),
        })

    both = polygons.map_batches(poly_cells_rows, batch_format="pyarrow") \
        .union(points.map_batches(point_rows, batch_format="pyarrow"))

    def refine_part(g: pa.Table) -> pa.Table:
        cells = g["cell"].to_numpy()
        kind = g["_kind"].to_numpy()
        order = np.argsort(cells, kind="stable")
        cells = cells[order]
        kind = kind[order]
        pid = g["poly_id"].to_numpy()[order]
        qid = g["point_id"].to_numpy()[order]
        xs = g["x"].to_numpy()[order]
        ys = g["y"].to_numpy()[order]
        rb = g["rings"].to_pylist()
        rb = [rb[int(i)] for i in order]
        out_pt, out_poly = [], []
        _, starts, counts = np.unique(cells, return_index=True,
                                      return_counts=True)
        for s, c in zip(starts, counts):
            sl = slice(s, s + c)
            isp = kind[sl] == 0
            if not isp.any() or isp.all():
                continue
            pxs = xs[sl][isp]
            pys = ys[sl][isp]
            pids_here = qid[sl][isp]
            for j in np.nonzero(~isp)[0]:
                rings = unpack_rings(rb[s + int(j)])
                hit = point_in_polygon(pxs, pys, rings)
                if hit.any():
                    out_pt.append(pids_here[hit])
                    out_poly.append(np.full(int(hit.sum()),
                                            int(pid[s + int(j)]),
                                            dtype=np.int64))
        if not out_pt:
            return pa.table({"point_id": pa.array([], pa.int64()),
                             "poly_id": pa.array([], pa.int64())})
        return pa.table({"point_id": pa.array(np.concatenate(out_pt)),
                         "poly_id": pa.array(np.concatenate(out_poly))})

    matched = partitioned_groups(both, ["cell"], num_partitions) \
        .map_groups(refine_part, batch_format="pyarrow")

    # a polygon spanning k cells reports a point once per covering cell of
    # that point's cell — each point lives in ONE cell, so each (point,
    # poly) pair appears at most once already; no distinct pass needed.
    return matched


# ---------------------------------------------------------------------------
# kNN via k-ring expansion over grid cells — distributed plan
# ---------------------------------------------------------------------------

def _csr_expand(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat gather indices for CSR ranges: concat(arange(s, s+l))."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    shift = np.repeat(starts - np.concatenate(([0], np.cumsum(lens)[:-1])),
                      lens)
    return shift + np.arange(total, dtype=np.int64)


_KNN_MAX_HIST_LOD = 10  # 4^10 cells x 16 B ~= 16 MiB driver-side index


def knn_kring(points: ray.data.Dataset, queries: pd.DataFrame, *, k: int,
              world: Extents, lod: int = 5,
              x_col: str = "x", y_col: str = "y", id_col: str = "point_id",
              qx_col: str = "x", qy_col: str = "y",
              qid_col: str = "query_id") -> pd.DataFrame:
    """-> (query_id, neighbor_id, rank, dist). Exact kNN, distributed.

    The point payload NEVER lands on the driver (the sorted-key range-scan
    shape of the reference quadtree, mask.cpp:229-258, re-expressed as two
    Dataset passes):

    1. cell-count pass: groupby(cell).count over the points — the only
       shuffle, and it moves one (cell, n) row per NON-EMPTY cell (<= 4^lod
       rows, metadata-scale: the same compression a quadtree index gives
       the reference). The count table is the broadcast index.
    2. per query (vectorized over the count table): find the smallest
       Chebyshev ring radius r0 whose cells already hold >= k points. Any
       point in those cells is within D = hypot((r0+1)·cw, (r0+1)·ch) of
       the query (both endpoints inside cells <= r0 apart), so the true
       k-th distance <= D (+ the query's clamp offset if it lies outside
       the world). Every cell whose nearest corner could be <= D away is
       accepted: r_max = ceil(D / min(cw, ch)) + 1 — a PROVEN superset of
       the k nearest.
    3. streaming refine: one map_batches over the points; each batch looks
       up its cells in the broadcast (cell -> queries) CSR index, computes
       all candidate distances vectorized, and emits a per-batch partial
       top-k per query (k rows per query per batch, never the batch).
    4. finalize: groupby(query_id) top-k reduce of the partials — the
       exchange carries <= n_queries x k rows per block and the driver
       receives exactly n_queries x k rows (ties on (dist, neighbor_id));
       no stage materializes anything that grows with block count.
    """
    from ray.data.aggregate import Sum

    # The pruning grid is an optimization knob: pass 3/4 compute true
    # distances, so ANY lod yields exact kNN — finer only prunes harder.
    # Cap it so the driver-side index (one row per non-empty cell, plus
    # O(B x n_cells) accept work per query block) stays bounded no matter
    # the requested LOD; at lod <= the cap behavior is bit-identical.
    lod = min(lod, _KNN_MAX_HIST_LOD)
    side = 1 << lod
    cw = world.width / side
    ch = world.height / side
    min_cell = min(cw, ch)

    # -- pass 1: per-cell point counts (narrow: key column only) ----------
    def cell_counts(b: pa.Table) -> pa.Table:
        tx, ty = tile_of_points(b[x_col].to_numpy(), b[y_col].to_numpy(),
                                world, lod)
        key, cnt = np.unique(tx * side + ty, return_counts=True)
        return pa.table({"cell": pa.array(key),
                         "n": pa.array(cnt.astype(np.int64))})

    counts = (points.map_batches(cell_counts, batch_format="pyarrow")
              .groupby("cell").aggregate(Sum("n", alias_name="n"))
              .to_pandas())
    ckey = counts["cell"].to_numpy().astype(np.int64)
    cn = counts["n"].to_numpy().astype(np.int64)
    ccx, ccy = ckey // side, ckey % side

    # -- pass 2: per-query radius bound + accept index (driver; O(n_cells)
    #    vectorized per query — the index table, not the data) ------------
    qx = queries[qx_col].to_numpy().astype(np.float64)
    qy = queries[qy_col].to_numpy().astype(np.float64)
    qid = queries[qid_col].to_numpy().astype(np.int64)
    qtx, qty = tile_of_points(qx, qy, world, lod)
    # clamp offset: distance from the query point to its (clamped) cell
    cell_x0 = world.llx + qtx * cw
    cell_y1 = world.ury - qty * ch
    dxc = np.maximum.reduce([cell_x0 - qx, qx - (cell_x0 + cw),
                             np.zeros(len(qx))])
    dyc = np.maximum.reduce([(cell_y1 - ch) - qy, qy - cell_y1,
                             np.zeros(len(qy))])
    clamp_off = np.hypot(dxc, dyc)

    # Block-vectorized over queries (no per-query Python, no per-query
    # argsort): for a block of B queries the radius bound r0 comes from a
    # per-RADIUS count histogram — one bincount over (query, cheb) pairs,
    # O(B x n_cells) NumPy with ~B*C*8-byte peak, so a 10^6-query batch
    # streams through in bounded blocks. cum(r) only increases at radii
    # that hold cells, so the first radius with cum >= k equals the
    # sorted-scan r0 of the scalar formulation exactly.
    acc_cells: list[np.ndarray] = []
    acc_qidx: list[np.ndarray] = []
    dmax = np.zeros(len(qx), dtype=np.float64)
    # adapt the query block to the occupied-cell count: the accept pass
    # allocates (blk x n_cells) int64 scratch, so a FIXED blk=1024 at a
    # dense lod-10 grid (4^10 cells) would be an 8 GiB driver array —
    # cap the scratch at ~16M elements (~128 MiB) instead. Results are
    # per-query independent, so block size cannot change them.
    blk = int(np.clip(16_000_000 // max(len(ckey), 1), 16, 1024))
    for s in range(0, len(qx) if len(ckey) else 0, blk):
        e = min(s + blk, len(qx))
        nb = e - s
        cheb = np.maximum(np.abs(ccx[None, :] - qtx[s:e, None]),
                          np.abs(ccy[None, :] - qty[s:e, None]))
        flat = (np.arange(nb)[:, None] * side + cheb).ravel()
        hist = np.bincount(flat,
                           weights=np.broadcast_to(
                               cn, (nb, len(cn))).ravel().astype(np.float64),
                           minlength=nb * side).reshape(nb, side)
        cum = np.cumsum(hist, axis=1)
        # first radius whose cumulative count reaches k; if the whole
        # world holds < k points, fall back to the max radius (superset
        # stays correct, just unpruned — the degenerate n_points < k case)
        r0 = np.minimum((cum < k).sum(axis=1), side - 1)
        d = np.hypot((r0 + 1) * cw, (r0 + 1) * ch) + clamp_off[s:e]
        dmax[s:e] = d
        r_max = np.ceil(d / min_cell).astype(np.int64) + 1
        bi, ci = np.nonzero(cheb <= r_max[:, None])
        acc_cells.append(ckey[ci])
        acc_qidx.append(bi.astype(np.int64) + s)

    if not acc_cells:
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             "neighbor_id": pd.Series([], dtype=np.int64),
                             "rank": pd.Series([], dtype=np.int64),
                             "dist": pd.Series([], dtype=np.float64)})

    flat_cells = np.concatenate(acc_cells)
    flat_qidx = np.concatenate(acc_qidx)
    order = np.argsort(flat_cells, kind="stable")
    flat_cells = flat_cells[order]
    flat_qidx = flat_qidx[order]
    uc, ustart = np.unique(flat_cells, return_index=True)
    ulen = np.diff(np.concatenate((ustart, [len(flat_cells)])))
    iref = ray.put((uc, ustart.astype(np.int64), ulen.astype(np.int64),
                    flat_qidx, qx, qy, qid, dmax))

    # -- pass 3: stream points once, vectorized candidate refine ----------
    def partial(b: pa.Table) -> pa.Table:
        cells, starts, lens, qof, qxs, qys, qids, dm = ray.get(iref)
        xs = b[x_col].to_numpy().astype(np.float64)
        ys = b[y_col].to_numpy().astype(np.float64)
        ids = b[id_col].to_numpy().astype(np.int64)
        tx, ty = tile_of_points(xs, ys, world, lod)
        keys = tx * side + ty
        pos = np.searchsorted(cells, keys)
        ok = (pos < len(cells))
        pos_c = np.where(ok, pos, 0)
        ok &= cells[pos_c] == keys
        rows = np.nonzero(ok)[0]
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.float64())})
        if len(rows) == 0:
            return empty
        st = starts[pos[rows]]
        ln = lens[pos[rows]]
        pi = np.repeat(rows, ln)                       # point row per pair
        qi = qof[_csr_expand(st, ln)]                  # query idx per pair
        d = np.hypot(xs[pi] - qxs[qi], ys[pi] - qys[qi])
        keep = d <= dm[qi] + 1e-9
        if not keep.any():
            return empty
        qi, pi, d = qi[keep], pi[keep], d[keep]
        # partial top-k per query within this batch
        o = np.lexsort((ids[pi], d, qi))
        qi, pi, d = qi[o], pi[o], d[o]
        _, gstart, gcnt = np.unique(qi, return_index=True,
                                    return_counts=True)
        rank_in = np.arange(len(qi)) - np.repeat(gstart, gcnt)
        sel = rank_in < k
        return pa.table({"query_id": pa.array(qids[qi[sel]]),
                         "neighbor_id": pa.array(ids[pi[sel]]),
                         "dist": pa.array(d[sel])})

    parts_ds = points.map_batches(partial, batch_format="pyarrow")

    # -- pass 4: DISTRIBUTED finalize: per-query top-k reduce (the
    #    group_topk funnel). Each block contributes <= n_queries x k
    #    partial rows; the groupby reduces them off the driver, so the
    #    driver receives exactly n_queries x k result rows — never a
    #    table that grows with block count (at 100 TB ~10^6 blocks the
    #    old driver concat was the scale killer). -----------------------
    def topk_group(g: pa.Table) -> pa.Table:
        d = g["dist"].to_numpy()
        nid = g["neighbor_id"].to_numpy()
        o = np.lexsort((nid, d))[:k]
        t = g.take(pa.array(o, type=pa.int64()))
        return t.append_column(
            "rank", pa.array(np.arange(1, len(o) + 1, dtype=np.int64)))

    final = parts_ds.groupby("query_id").map_groups(
        topk_group, batch_format="pyarrow").to_pandas()
    if final.empty:
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             "neighbor_id": pd.Series([], dtype=np.int64),
                             "rank": pd.Series([], dtype=np.int64),
                             "dist": pd.Series([], dtype=np.float64)})
    final = final.sort_values(["query_id", "rank"], kind="stable")
    return final[["query_id", "neighbor_id", "rank", "dist"]] \
        .reset_index(drop=True)


# ---------------------------------------------------------------------------
# zonal statistics — the raster<->vector join (north_star: "raster<->vector
# joins as groupby-aggregate-sort shuffles keyed on cell id")
# ---------------------------------------------------------------------------

_KNOWN_PX_DTYPES = {"uint8", "uint16", "int16", "uint32", "int32",
                    "float32", "float64"}


def _tile_pixels_world(px_blob: bytes, dtype: str, tx: int, ty: int,
                       vw: int, vh: int, world: Extents,
                       rx: float, ry: float):
    """Decode one tile -> (flat pixel-center world xs, ys, float64 values).
    Shared by both zonal physical plans."""
    dt = np.dtype(dtype) if dtype in _KNOWN_PX_DTYPES else np.uint8
    arr = np.frombuffer(px_blob, dtype=dt).reshape(256, 256)[:vh, :vw]
    centers = np.arange(256, dtype=np.float64) + 0.5
    wx = world.llx + (tx * 256 + centers[:vw]) * rx
    wy = world.ury - (ty * 256 + centers[:vh]) * ry
    return np.tile(wx, vh), np.repeat(wy, vw), arr.astype(np.float64).ravel()


def _poly_tile_partial(wxf, wyf, vals, rings):
    """(n, sum, min, max) of the pixels inside `rings`, or None."""
    m = point_in_polygon(wxf, wyf, rings)
    if not m.any():
        return None
    v = vals[m]
    return int(m.sum()), float(v.sum()), float(v.min()), float(v.max())


def zonal_stats(tiles: ray.data.Dataset,
                polygons: list[tuple[int, list[np.ndarray]]],
                world: Extents, lod: int) -> ray.data.Dataset:
    """Per-polygon statistics of raster pixels inside the polygon.

    tiles: TILE_SCHEMA rows at `lod` over `world` (tile (x,y) grid of
    2^lod). polygons: [(poly_id, rings)] in world coordinates (small side —
    broadcast once via ray.put; the reference's T7 pattern).

    Shape: each tile batch tests ONLY the polygons whose bbox covers that
    tile (the quad-constraint prefilter, mask.cpp:229-233), ray-casts the
    tile's pixel centers, emits per-(poly, tile) partial (n, sum, min, max)
    -> groupby(poly_id) reduce. Pixels never shuffle; partials are 4
    numbers per polygon-tile pair.
    """
    import ray

    from ray.data.aggregate import Max, Min, Sum

    # poly -> covering cells at lod, inverted to cell -> [poly ids]
    cell_polys: dict[tuple[int, int], list[int]] = {}
    for pid, rings in polygons:
        for cell in polygon_cells(rings, world, lod):
            cell_polys.setdefault(cell, []).append(pid)
    pref = ray.put((cell_polys, dict(polygons)))

    side = 1 << lod
    rx = world.width / (side * 256)
    ry = world.height / (side * 256)

    def partial(b: pa.Table) -> pa.Table:
        cp, polys = ray.get(pref)
        out = {"poly_id": [], "n": [], "s": [], "mn": [], "mx": []}
        # bulk column extraction once per batch (no per-row .as_py())
        txs = b["tile_x"].to_numpy().astype(np.int64)
        tys = b["tile_y"].to_numpy().astype(np.int64)
        vws = b["valid_w"].to_numpy().astype(np.int64)
        vhs = b["valid_h"].to_numpy().astype(np.int64)
        dts = b["dtype"].to_pylist()
        pxs = b["px"].to_pylist()
        for i in range(len(txs)):
            pids = cp.get((int(txs[i]), int(tys[i])))
            if not pids:
                continue
            wxf, wyf, vals = _tile_pixels_world(
                pxs[i], dts[i], int(txs[i]), int(tys[i]),
                int(vws[i]), int(vhs[i]), world, rx, ry)
            for pid in pids:
                st = _poly_tile_partial(wxf, wyf, vals, polys[pid])
                if st is None:
                    continue
                out["poly_id"].append(pid)
                out["n"].append(st[0])
                out["s"].append(st[1])
                out["mn"].append(st[2])
                out["mx"].append(st[3])
        return pa.table({"poly_id": pa.array(out["poly_id"], pa.int64()),
                         "n": pa.array(out["n"], pa.int64()),
                         "s": pa.array(out["s"], pa.float64()),
                         "mn": pa.array(out["mn"], pa.float64()),
                         "mx": pa.array(out["mx"], pa.float64())})

    partials = tiles.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("poly_id").aggregate(
        Sum("n", alias_name="n_px"),
        Sum("s", alias_name="px_sum"),
        Min("mn", alias_name="px_min"),
        Max("mx", alias_name="px_max"))


def zonal_stats_shuffle(tiles: ray.data.Dataset, polygons: ray.data.Dataset,
                        world: Extents, lod: int,
                        num_partitions: int = 64,
                        n_salts: int = 8,
                        hot_threshold: Optional[int] = None) -> ray.data.Dataset:
    """Both-sides-large raster<->vector join: polygons are a DATASET
    {poly_id, rings (pack_rings)} instead of a broadcast list. Polygons
    flat_map to covering cells; tiles already ARE their (tile_x, tile_y)
    cell; one hash-cogroup partition pass computes the per-(tile, polygon)
    partials (each tile's pixels move exactly once), then the same tiny
    groupby(poly_id) reduce. Same kernel, same results as zonal_stats.

    Skew: here the unbounded side of a hot cell is the POLYGON cover
    (urban-core density — every cell has at most a few tile rows but may
    have thousands of covering polygons). The accounting pass counts
    polygon-cover rows per cell; hot cells salt the polygon side and
    replicate the tile rows to every salt. Each (poly, tile) partial is
    still computed exactly once (a poly row lives in one sub-key) and the
    existing groupby(poly_id) reduce is unchanged."""
    from ray.data.aggregate import Max, Min, Sum

    from .joins import partitioned_groups

    side = 1 << lod
    rx = world.width / (side * 256)
    ry = world.height / (side * 256)

    def cover_counts(b: pa.Table) -> pa.Table:
        cells = []
        for blob in b["rings"].to_pylist():
            for (cx, cy) in polygon_cells(unpack_rings(blob), world, lod):
                cells.append(cx * side + cy)
        key, cnt = np.unique(np.asarray(cells, np.int64),
                             return_counts=True)
        return pa.table({"cell": pa.array(key),
                         "n": pa.array(cnt.astype(np.int64))})

    counts = (polygons.map_batches(cover_counts, batch_format="pyarrow")
              .groupby("cell").aggregate(Sum("n", alias_name="n")))
    hot = _hot_cells_of(counts, num_partitions, hot_threshold,
                        "zonal polygon cover")
    hot_ref = ray.put(hot)

    def poly_rows(b: pa.Table) -> pa.Table:
        hot_arr = ray.get(hot_ref)
        pids, cells, blobs = [], [], []
        ids = b["poly_id"].to_numpy()
        rb = b["rings"].to_pylist()
        for i in range(len(ids)):
            for (cx, cy) in polygon_cells(unpack_rings(rb[i]), world, lod):
                pids.append(int(ids[i]))
                cells.append(cx * side + cy)
                blobs.append(rb[i])
        n = len(pids)
        return pa.table({
            "cell": pa.array(salted_cell_keys(
                np.asarray(cells, np.int64), hot_arr, n_salts)),
            "_kind": pa.array(np.ones(n, dtype=np.int8)),
            "poly_id": pa.array(pids, pa.int64()),
            "rings": pa.array(blobs, pa.large_binary()),
            "tile_x": pa.nulls(n, pa.int64()),
            "tile_y": pa.nulls(n, pa.int64()),
            "valid_w": pa.nulls(n, pa.int64()),
            "valid_h": pa.nulls(n, pa.int64()),
            "dtype": pa.nulls(n, pa.string()),
            "px": pa.nulls(n, pa.large_binary()),
        })

    def tile_rows(b: pa.Table) -> pa.Table:
        hot_arr = ray.get(hot_ref)
        tx = b["tile_x"].to_numpy().astype(np.int64)
        ty = b["tile_y"].to_numpy().astype(np.int64)
        cell = tx * side + ty
        # replicate tiles of HOT cells to every salt sub-key
        reps = np.where(np.isin(cell, hot_arr), n_salts, 1)
        ridx = np.repeat(np.arange(len(cell)), reps)
        salt = np.arange(len(ridx)) \
            - np.repeat(np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        b = b.take(pa.array(ridx, pa.int64()))
        tx, ty, cell = tx[ridx], ty[ridx], cell[ridx]
        n = len(tx)
        return pa.table({
            "cell": pa.array(cell * n_salts + salt),
            "_kind": pa.array(np.zeros(n, dtype=np.int8)),
            "poly_id": pa.nulls(n, pa.int64()),
            "rings": pa.nulls(n, pa.large_binary()),
            "tile_x": pa.array(tx),
            "tile_y": pa.array(ty),
            "valid_w": b["valid_w"].cast(pa.int64()),
            "valid_h": b["valid_h"].cast(pa.int64()),
            "dtype": b["dtype"],
            "px": b["px"].cast(pa.large_binary()),
        })

    both = polygons.map_batches(poly_rows, batch_format="pyarrow") \
        .union(tiles.map_batches(tile_rows, batch_format="pyarrow"))

    def refine_part(g: pa.Table) -> pa.Table:
        cells = g["cell"].to_numpy()
        order = np.argsort(cells, kind="stable")
        kind = g["_kind"].to_numpy()[order]
        cells = cells[order]
        out = {"poly_id": [], "n": [], "s": [], "mn": [], "mx": []}
        pid = g["poly_id"].to_numpy()[order]
        txs = g["tile_x"].to_numpy()[order]
        tys = g["tile_y"].to_numpy()[order]
        vws = g["valid_w"].to_numpy()[order]
        vhs = g["valid_h"].to_numpy()[order]
        dts = g["dtype"].to_pylist()
        pxs = g["px"].to_pylist()
        _, starts, counts = np.unique(cells, return_index=True,
                                      return_counts=True)
        for s, c in zip(starts, counts):
            sl = np.arange(s, s + c)
            tile_rows_ = sl[kind[sl] == 0]
            poly_rows_ = sl[kind[sl] == 1]
            if len(tile_rows_) == 0 or len(poly_rows_) == 0:
                continue
            # unpack each polygon ONCE per cell, not once per (tile, poly)
            # pair — a hot cell with T tiles x P polys was doing T*P
            # decodes of the same P blobs
            unpacked = {int(j): unpack_rings(g["rings"][int(order[j])].as_py())
                        for j in poly_rows_}
            for i in tile_rows_:
                wxf, wyf, vals = _tile_pixels_world(
                    pxs[int(order[i])], dts[int(order[i])],
                    int(txs[i]), int(tys[i]), int(vws[i]), int(vhs[i]),
                    world, rx, ry)
                for j in poly_rows_:
                    st = _poly_tile_partial(wxf, wyf, vals, unpacked[int(j)])
                    if st is None:
                        continue
                    out["poly_id"].append(int(pid[j]))
                    out["n"].append(st[0])
                    out["s"].append(st[1])
                    out["mn"].append(st[2])
                    out["mx"].append(st[3])
        return pa.table({"poly_id": pa.array(out["poly_id"], pa.int64()),
                         "n": pa.array(out["n"], pa.int64()),
                         "s": pa.array(out["s"], pa.float64()),
                         "mn": pa.array(out["mn"], pa.float64()),
                         "mx": pa.array(out["mx"], pa.float64())})

    partials = partitioned_groups(both, ["cell"], num_partitions) \
        .map_groups(refine_part, batch_format="pyarrow")
    return partials.groupby("poly_id").aggregate(
        Sum("n", alias_name="n_px"),
        Sum("s", alias_name="px_sum"),
        Min("mn", alias_name="px_min"),
        Max("mx", alias_name="px_max"))


# ---------------------------------------------------------------------------
# hexagonal cell binning — the H3-style index of the north rule, built
# exactly: dual-lattice nearest-center assignment (two interleaved
# rectangular lattices of hex centers; a point belongs to the nearer
# center under the anisotropic metric). With integer coordinates and
# integer half-pitches the comparison is pure int64 arithmetic, so the
# SQL twin reproduces every cell id bit-for-bit — no sqrt(3), no float
# rounding at cell borders.
# ---------------------------------------------------------------------------

def hex_bin(x: np.ndarray, y: np.ndarray, *, dx: int,
            dy: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (lattice, i, j): the hex cell of each integer point. Lattice A
    centers sit at (2*dx*i, 2*dy*j), lattice B at the half-offset
    (2*dx*i + dx, 2*dy*j + dy); the induced nearest-center tessellation
    (squared distance weighted by the opposite pitch: (Δx*dy)^2 +
    (Δy*dx)^2) is a (stretched) hexagonal grid — the matplotlib-hexbin
    construction, kept in int64 end-to-end. Ties go to lattice A
    (d1 <= d2), pinned in both engines."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    # nearest multiple of the full pitch, half-up rounding via floor
    # division (matches SQL's (v + p) // (2p) on integers for v >= -p)
    i1 = (x + dx) // (2 * dx)
    j1 = (y + dy) // (2 * dy)
    # nearest B center: shift by the half-offset, same rounding
    i2 = x // (2 * dx)
    j2 = y // (2 * dy)
    cx1, cy1 = 2 * dx * i1, 2 * dy * j1
    cx2, cy2 = 2 * dx * i2 + dx, 2 * dy * j2 + dy
    d1 = ((x - cx1) * dy) ** 2 + ((y - cy1) * dx) ** 2
    d2 = ((x - cx2) * dy) ** 2 + ((y - cy2) * dx) ** 2
    a = d1 <= d2
    lattice = np.where(a, 0, 1).astype(np.int64)
    return lattice, np.where(a, i1, i2).astype(np.int64), \
        np.where(a, j1, j2).astype(np.int64)
