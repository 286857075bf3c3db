"""Connected components over a tiled raster mask — local label,
boundary stitch, distributed relabel.

The distributed-raster classic (region labeling / zonal segmentation):
a component can span any number of tiles, so no per-tile pass can name
it alone. Three-phase plan, nothing driver-side grows with the raster:

1. LOCAL: each tile labels its own mask (4-connectivity) with the MIN
   GLOBAL PIXEL ID of the component-within-tile — deterministic,
   collision-free across tiles by construction. Emitted per tile:
   narrow (label, n_pixels) partial counts and the label sequence along
   each tile edge (the seam data, O(TILE) per tile).
2. STITCH: seam groups (one per shared tile edge) align the two sides'
   edge pixels positionally; where both are masked, the two local
   labels are one component -> an equivalence edge. Edges are bounded
   by border pixels (~1/TILE of the raster).
3. RELABEL: the existing distributed min-label propagation
   (stages/dedup.propagate_min_labels — pointer-jumping label graph,
   driver O(1)) resolves every local label to its component-global min;
   a left cogroup join folds the per-tile counts onto the final labels
   and a groupby sums component sizes.

The local labeler is a run-based min propagation (row-run minima and
column-run minima alternate until fixpoint — vectorized
np.minimum.reduceat over run starts, no per-pixel Python); the same
kernel labels the whole raster in the test/oracle path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..grid import TILE

_SENT = np.iinfo(np.int64).max


def _run_min_rows(lab: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Per-row run minima: every masked pixel takes the min label of its
    contiguous masked run. Vectorized via minimum.reduceat over run
    starts (gaps hold the +inf sentinel, so reduceat segments spanning
    them are harmless)."""
    h, w = mask.shape
    flat = np.where(mask, lab, _SENT).ravel()
    mf = mask.ravel()
    prev = np.concatenate(([False], mf[:-1]))
    prev[::w] = False                       # runs never cross row ends
    starts = mf & ~prev
    idx = np.flatnonzero(starts)
    if idx.size == 0:
        return lab
    mins = np.minimum.reduceat(flat, idx)
    seg = np.cumsum(starts) - 1
    out = flat.copy()
    out[mf] = mins[seg[mf]]
    return out.reshape(h, w)


def label_mask(mask: np.ndarray, gids: np.ndarray) -> np.ndarray:
    """4-connected components of `mask`; every masked pixel gets the MIN
    of `gids` over its component (unmasked pixels get the sentinel).
    Alternating row/column run-min passes to fixpoint."""
    lab = np.where(mask, gids, _SENT)
    while True:
        new = _run_min_rows(lab, mask)
        new = _run_min_rows(new.T, mask.T).T
        if np.array_equal(new, lab):
            return lab
        lab = new


def raster_cc(tiles: ray.data.Dataset, *, nx: int, ny: int,
              threshold: float,
              num_partitions: int = 16) -> ray.data.Dataset:
    """-> (component, n_px): one row per 4-connected component of the
    mask (pixel >= threshold), labeled by its minimum global pixel id
    (y * nx + x), with its exact pixel count."""
    from .dedup import propagate_min_labels
    from .joins import cogroup_join
    from ..stages.focal import _np_dtype

    def local(b: pa.Table) -> pa.Table:
        lbl_out, n_out = [], []
        seam_out, pos_out, side_lab = [], [], []
        for i in range(b.num_rows):
            band = int(b["band"][i].as_py()) if "band" in b.column_names \
                else 0
            tx = int(b["tile_x"][i].as_py())
            ty = int(b["tile_y"][i].as_py())
            vw = int(b["valid_w"][i].as_py())
            vh = int(b["valid_h"][i].as_py())
            blk = np.frombuffer(b["px"][i].as_py(),
                                dtype=_np_dtype(b["dtype"][i].as_py())) \
                .reshape(TILE, TILE)[:vh, :vw]
            mask = blk.astype(np.float64) >= threshold
            yy, xx = np.mgrid[0:vh, 0:vw]
            # gids namespace by BAND: components of different bands must
            # never share labels (band b pixel (x, y) -> b*nx*ny + ...)
            gids = (np.int64(band) * nx * ny
                    + (yy + ty * TILE).astype(np.int64) * nx
                    + (xx + tx * TILE))
            lab = label_mask(mask, gids)
            # per-tile partial counts
            vals, cnts = np.unique(lab[mask], return_counts=True)
            lbl_out.append(vals)
            n_out.append(cnts.astype(np.int64))
            # seam rows: vertical seam right of this tile (key packs the
            # seam's grid line), horizontal seam below; plus this tile's
            # LEFT/TOP contributions to the neighbor's seams
            edges = []
            gx0, gy0 = tx * TILE, ty * TILE
            bk = np.int64(band) << 40   # seams never cross bands
            if gx0 + vw < nx:                       # right edge -> seam x
                edges.append((bk | (2 * (gx0 + vw)),
                              gy0 + yy[:, -1][mask[:, -1]],
                              lab[:, -1][mask[:, -1]]))
            if gx0 > 0:                             # left edge -> seam x
                edges.append((bk | (2 * gx0), gy0 + yy[:, 0][mask[:, 0]],
                              lab[:, 0][mask[:, 0]]))
            if gy0 + vh < ny:                       # bottom edge -> seam y
                edges.append((bk | (2 * (gy0 + vh) + 1),
                              gx0 + xx[-1, :][mask[-1, :]],
                              lab[-1, :][mask[-1, :]]))
            if gy0 > 0:                             # top edge -> seam y
                edges.append((bk | (2 * gy0 + 1),
                              gx0 + xx[0, :][mask[0, :]],
                              lab[0, :][mask[0, :]]))
            for key, pos, lb in edges:
                seam_out.append(np.full(len(pos), key, dtype=np.int64))
                pos_out.append(pos.astype(np.int64))
                side_lab.append(lb)
        counts = pa.table({
            "lbl": pa.array(np.concatenate(lbl_out)
                            if lbl_out else np.empty(0, np.int64)),
            "n": pa.array(np.concatenate(n_out)
                          if n_out else np.empty(0, np.int64)),
            "seam": pa.array(np.full(sum(map(len, lbl_out)) if lbl_out
                                     else 0, -1, dtype=np.int64)),
            "pos": pa.array(np.zeros(sum(map(len, lbl_out)) if lbl_out
                                     else 0, dtype=np.int64)),
        })
        seams = pa.table({
            "lbl": pa.array(np.concatenate(side_lab)
                            if side_lab else np.empty(0, np.int64)),
            "n": pa.array(np.zeros(sum(map(len, seam_out)) if seam_out
                                   else 0, dtype=np.int64)),
            "seam": pa.array(np.concatenate(seam_out)
                             if seam_out else np.empty(0, np.int64)),
            "pos": pa.array(np.concatenate(pos_out)
                            if pos_out else np.empty(0, np.int64)),
        })
        return pa.concat_tables([counts, seams])

    rows = tiles.map_batches(local, batch_format="pyarrow").materialize()

    def keep_counts(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b["seam"].to_numpy() < 0))

    def keep_seams(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b["seam"].to_numpy() >= 0))

    counts = rows.map_batches(keep_counts, batch_format="pyarrow",
                              batch_size=None)

    def seam_edges(g: pa.Table) -> pa.Table:
        pos = g["pos"].to_numpy()
        lab = g["lbl"].to_numpy()
        order = np.argsort(pos, kind="stable")
        pos, lab = pos[order], lab[order]
        # both sides masked at the same position -> consecutive equal pos
        same = pos[1:] == pos[:-1]
        return pa.table({"a": pa.array(lab[:-1][same]),
                         "b": pa.array(lab[1:][same])})

    edges = rows.map_batches(keep_seams, batch_format="pyarrow",
                             batch_size=None) \
        .groupby("seam").map_groups(seam_edges, batch_format="pyarrow")

    labels = propagate_min_labels(edges, num_partitions=num_partitions)
    counts_n = counts.select_columns(["lbl", "n"])
    if labels is None:
        joined = counts_n.map_batches(
            lambda b: b.append_column("lab", b["lbl"]),
            batch_format="pyarrow", batch_size=None)
    else:
        lab_t = labels.map_batches(
            lambda b: pa.table({"lbl": b["node"], "lab": b["lab"]}),
            batch_format="pyarrow", batch_size=None)
        joined = cogroup_join(counts_n, lab_t, on="lbl", how="left",
                              num_partitions=num_partitions)

        def fill(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            col = b["lab"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            # Arrow validity bitmap, NOT a float64 round-trip: labels
            # past 2^53 would round in the float cast
            miss = pc.is_null(col).to_numpy(zero_copy_only=False)
            own = b["lbl"].to_numpy()
            lab = np.where(miss, own,
                           pc.fill_null(col, 0)
                           .to_numpy(zero_copy_only=False)).astype(np.int64)
            return pa.table({"lbl": b["lbl"], "n": b["n"],
                             "lab": pa.array(lab)})

        joined = joined.map_batches(fill, batch_format="pyarrow",
                                    batch_size=None)

    from ray.data.aggregate import Sum

    agg = joined.groupby("lab").aggregate(Sum("n", alias_name="n_px"))
    return agg.map_batches(
        lambda b: pa.table({"component": b["lab"], "n_px": b["n_px"]}),
        batch_format="pyarrow", batch_size=None)


def raster_cc_oracle(src: np.ndarray, threshold: float) -> dict[int, int]:
    """Whole-raster CC with the same labeling kernel: component min
    global pixel id -> pixel count."""
    ny, nx = src.shape
    mask = src.astype(np.float64) >= threshold
    yy, xx = np.mgrid[0:ny, 0:nx]
    gids = yy.astype(np.int64) * nx + xx
    lab = label_mask(mask, gids)
    vals, cnts = np.unique(lab[mask], return_counts=True)
    return dict(zip(vals.tolist(), cnts.tolist()))
