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

    return points.map_batches(refine, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# kNN via k-ring expansion over grid cells
# ---------------------------------------------------------------------------

def knn_kring(points: ray.data.Dataset, queries: pd.DataFrame, *, k: int,
              world: Extents, lod: int = 5,
              x_col: str = "x", y_col: str = "y", id_col: str = "point_id",
              qx_col: str = "x", qy_col: str = "y",
              qid_col: str = "query_id") -> pd.DataFrame:
    """-> (query_id, neighbor_id, rank, dist). The point set is bucketed by
    grid cell ONCE (the sorted-cell layout of the north rule — here a dict
    because the test corpus fits; at scale the buckets are a cell-sorted
    dataset and a ring lookup is a range scan per cell). Ring expansion
    stops when the k-th best distance <= the minimum possible distance of
    the next unexplored ring. Ties break on neighbor id."""
    buckets: dict[tuple[int, int], list[tuple[float, float, int]]] = {}
    for b in points.iter_batches(batch_size=8192, batch_format="pyarrow"):
        xs = b[x_col].to_numpy()
        ys = b[y_col].to_numpy()
        ids = b[id_col].to_numpy()
        tx, ty = tile_of_points(xs, ys, world, lod)
        for x, y, i, cx, cy in zip(xs, ys, ids, tx.tolist(), ty.tolist()):
            buckets.setdefault((cx, cy), []).append((float(x), float(y), int(i)))
    bref = ray.put(buckets)
    side = 1 << lod
    cell_w = world.width / side
    cell_h = world.height / side

    qds = ray.data.from_pandas(queries)

    def solve(batch: pa.Table) -> pa.Table:
        bk = ray.get(bref)
        out_q, out_n, out_r, out_d = [], [], [], []
        qx = batch[qx_col].to_numpy().astype(np.float64)
        qy = batch[qy_col].to_numpy().astype(np.float64)
        qid = batch[qid_col].to_numpy()
        tx, ty = tile_of_points(qx, qy, world, lod)
        for x, y, qi, cx, cy in zip(qx, qy, qid, tx.tolist(), ty.tolist()):
            best: list[tuple[float, int]] = []
            r = 0
            while True:
                # cells at Chebyshev ring r around (cx, cy)
                cells = []
                if r == 0:
                    cells = [(cx, cy)]
                else:
                    for dx in range(-r, r + 1):
                        cells.append((cx + dx, cy - r))
                        cells.append((cx + dx, cy + r))
                    for dy in range(-r + 1, r):
                        cells.append((cx - r, cy + dy))
                        cells.append((cx + r, cy + dy))
                for c in cells:
                    for (px, py, pid) in bk.get(c, ()):
                        d = float(np.hypot(px - x, py - y))
                        best.append((d, pid))
                best.sort()
                best = best[:k]
                # minimum possible distance from the NEXT ring's cells
                ring_min = r * min(cell_w, cell_h)
                if len(best) >= k and best[k - 1][0] <= ring_min:
                    break
                if r > side:          # searched everything
                    break
                r += 1
            for rank, (d, pid) in enumerate(
                    sorted(best, key=lambda t: (t[0], t[1]))[:k], 1):
                out_q.append(qi)
                out_n.append(pid)
                out_r.append(rank)
                out_d.append(d)
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "rank": pa.array(out_r, pa.int64()),
                         "dist": pa.array(out_d, pa.float64())})

    return qds.map_batches(solve, batch_format="pyarrow").to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# zonal statistics — the raster<->vector join (north_star: "raster<->vector
# joins as groupby-aggregate-sort shuffles keyed on cell id")
# ---------------------------------------------------------------------------

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

    def partial(b) -> "pa.Table":
        import pyarrow as pa
        cp, polys = ray.get(pref)
        out = {"poly_id": [], "n": [], "s": [], "mn": [], "mx": []}
        for i in range(b.num_rows):
            tx = int(b["tile_x"][i].as_py())
            ty = int(b["tile_y"][i].as_py())
            pids = cp.get((tx, ty))
            if not pids:
                continue
            vw = int(b["valid_w"][i].as_py())
            vh = int(b["valid_h"][i].as_py())
            dt = b["dtype"][i].as_py()
            import numpy as _np
            arr = _np.frombuffer(b["px"][i].as_py(),
                                 dtype=_np.dtype(dt) if dt in
                                 ("uint8", "uint16", "int16", "uint32",
                                  "int32", "float32", "float64")
                                 else _np.uint8).reshape(256, 256)[:vh, :vw]
            # pixel-center world coordinates of this tile
            jy, jx = _np.mgrid[0:vh, 0:vw]
            wx = world.llx + ((tx * 256 + jx) + 0.5) * rx
            wy = world.ury - ((ty * 256 + jy) + 0.5) * ry
            wxf = wx.ravel()
            wyf = wy.ravel()
            vals = arr.astype(_np.float64).ravel()
            for pid in pids:
                m = point_in_polygon(wxf, wyf, polys[pid])
                if not m.any():
                    continue
                v = vals[m]
                out["poly_id"].append(pid)
                out["n"].append(int(m.sum()))
                out["s"].append(float(v.sum()))
                out["mn"].append(float(v.min()))
                out["mx"].append(float(v.max()))
        import pyarrow as pa
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
