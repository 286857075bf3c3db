"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
arXiv:2303.09540 — public paper): k-means-partition the embedding
space, then prune WITHIN each cluster the pairs whose cosine similarity
clears a threshold; keeper = min id per within-cluster similarity
component. The expensive pairwise step is bounded per cluster, never
global — the property that makes semantic dedup feasible at corpus
scale (all-pairs over 10^9 vectors is off the table; all-pairs inside a
k-means cell of a few thousand is a single vectorized kernel).

Distributed plan (Ray-Data-first):
  1. `kmeans_fit` (stages/kmeans.py) — fully distributed Lloyd, driver
     holds k x (dim+1) only.
  2. one map_batches assigns every vector to its cell against the
     broadcast centroids (same quantized kernel as training — exact).
  3. groupby(cell).map_groups runs the within-cluster kernel: a
     fixed-dimension-order cosine matrix (no BLAS — reduction order is
     pinned so the score is bit-identical on any layout), threshold to
     an adjacency, then min-label propagation to its fixed point.
     Clusters over `max_cluster` rows are split into id-ordered chunks
     (the max_bucket discipline from stages/dedup.py): a documented
     approximation that bounds every kernel invocation's memory at
     O(max_cluster^2) while keeping results deterministic.

Hash-stable by construction: vectors quantize once to int64, every
float op is IEEE-defined with a fixed association order, and rows sort
by id before the kernel — so the straight-line oracle
(`semantic_dedup_oracle`) reproduces the distributed output
bit-for-bit on any block layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .kmeans import _neg_dist2, _quantize, kmeans_fit, kmeans_fit_oracle

MAX_CLUSTER = 2048       # pairwise kernel bound: 2048^2 f64 ~= 33 MiB


def _component_labels(ids: np.ndarray, vq: np.ndarray,
                      threshold: float) -> np.ndarray:
    """Min id of each row's similarity component within ONE cluster
    chunk. `ids` MUST be sorted ascending and row-aligned with `vq`
    (int64 quantized vectors). Cosine accumulates dimension-by-dimension
    in a fixed order (never a BLAS matmul) so the adjacency — and hence
    the labels — is bit-identical however the caller gathered the rows.
    Zero vectors have undefined cosine and join nothing."""
    n, dim = vq.shape
    v = vq.astype(np.float64)
    cross = np.zeros((n, n), dtype=np.float64)
    nrm2 = np.zeros(n, dtype=np.float64)
    for j in range(dim):
        cross += v[:, j:j + 1] * v[None, :, j]
        nrm2 += v[:, j] * v[:, j]
    denom = np.sqrt(nrm2[:, None] * nrm2[None, :])
    adj = (denom > 0.0) & (cross >= threshold * denom)
    np.fill_diagonal(adj, True)
    # min-label propagation WITH pointer jumping: the neighbor-min step
    # moves labels one hop, then the label-chase compresses paths
    # exponentially (labels[searchsorted(ids, label)] follows label ->
    # label-of-label), so a diameter-D chain converges in O(log D)
    # n^2 passes instead of D (one-hop alone is O(n^3) on a similarity
    # chain). The fixed point — the component min — is scheme-invariant,
    # so results (and hashes) are unchanged.
    labels = ids.astype(np.int64).copy()
    sentinel = np.iinfo(np.int64).max
    while True:
        new = np.where(adj, labels[None, :], sentinel).min(axis=1)
        while True:
            hop = new[np.searchsorted(ids, new)]
            if (hop >= new).all():
                break
            new = np.minimum(new, hop)
        if np.array_equal(new, labels):
            return labels
        labels = new


def _chunked_labels(ids: np.ndarray, vq: np.ndarray, threshold: float,
                    max_cluster: int) -> np.ndarray:
    """id-sorted chunking of one (possibly oversized) k-means cell."""
    labels = np.empty(len(ids), dtype=np.int64)
    for s in range(0, len(ids), max_cluster):
        e = min(s + max_cluster, len(ids))
        labels[s:e] = _component_labels(ids[s:e], vq[s:e], threshold)
    return labels


def semantic_dedup(emb: ray.data.Dataset, *, k: int = 8, n_iter: int = 4,
                   threshold: float = 0.8, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   max_cluster: int = MAX_CLUSTER) -> ray.data.Dataset:
    """-> Dataset {vec_id, cell, sem_cluster_id, is_keeper}: one row per
    input vector; sem_cluster_id = min vec_id of its within-cell cosine
    component at `threshold`; keepers are the component minima (the
    deduped corpus = filter is_keeper)."""
    emb = emb.materialize()   # consumed twice: k-means training + assign
    if emb.count() == 0:
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "cell": pa.array([], pa.int64()),
            "sem_cluster_id": pa.array([], pa.int64()),
            "is_keeper": pa.array([], pa.bool_())}))
    cent, _ = kmeans_fit(emb, k=k, n_iter=n_iter, id_col=id_col,
                         vec_col=vec_col)
    cref = ray.put(cent)

    def assign(b: pa.Table) -> pa.Table:
        vq = _quantize(np.stack(
            b[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64))
        cell = np.argmax(_neg_dist2(vq, ray.get(cref)), axis=1)
        return pa.table({
            "vec_id": b[id_col].cast(pa.int64()),
            "cell": pa.array(cell.astype(np.int64)),
            "vq": pa.array([x.tobytes() for x in vq], pa.large_binary()),
        })

    rows = emb.map_batches(assign, batch_format="pyarrow",
                           batch_size=None)

    def prune(g: pa.Table) -> pa.Table:
        ids = g["vec_id"].to_numpy().astype(np.int64)
        vq = np.stack([np.frombuffer(x, dtype=np.int64)
                       for x in g["vq"].to_pylist()])
        order = np.argsort(ids)
        ids, vq = ids[order], vq[order]
        labels = _chunked_labels(ids, vq, threshold, max_cluster)
        return pa.table({
            "vec_id": pa.array(ids),
            "cell": pa.array(np.full(len(ids), int(g["cell"][0].as_py()),
                                     dtype=np.int64)),
            "sem_cluster_id": pa.array(labels),
            "is_keeper": pa.array(ids == labels),
        })

    return rows.groupby("cell").map_groups(prune, batch_format="pyarrow")


def semantic_dedup_oracle(ids: np.ndarray, vecs: np.ndarray, *,
                          k: int = 8, n_iter: int = 4,
                          threshold: float = 0.8,
                          max_cluster: int = MAX_CLUSTER):
    """Straight-line in-memory twin (`ids` sorted ascending, rows
    aligned; id == row index for the fixture's dense id space, matching
    kmeans_fit's seed rule). Shares only the pure kernels — the
    distributed assign/shuffle/map_groups machinery plays no part.
    -> (vec_id, cell, sem_cluster_id, is_keeper) arrays in
    (cell, vec_id) order, mirroring the groupby output blocks."""
    ids = np.asarray(ids, dtype=np.int64)
    vecs = np.asarray(vecs, dtype=np.float64)
    cent, _ = kmeans_fit_oracle(vecs, k=k, n_iter=n_iter)
    vq = _quantize(vecs)
    assign = np.argmax(_neg_dist2(vq, cent), axis=1)
    out_id, out_cell, out_lab = [], [], []
    for c in range(k):
        m = np.nonzero(assign == c)[0]
        if len(m) == 0:
            continue
        o = m[np.argsort(ids[m])]
        labels = _chunked_labels(ids[o], vq[o], threshold, max_cluster)
        out_id.append(ids[o])
        out_cell.append(np.full(len(o), c, dtype=np.int64))
        out_lab.append(labels)
    vec_id = np.concatenate(out_id)
    cell = np.concatenate(out_cell)
    lab = np.concatenate(out_lab)
    return vec_id, cell, lab, vec_id == lab
