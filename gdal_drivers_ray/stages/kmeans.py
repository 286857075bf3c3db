"""Fully distributed Lloyd k-means — the iterative-refinement pattern.

stages/ann.py trains IVF centroids from a driver-side SAMPLE (the
standard IVF recipe); this op is the full-data path: every iteration is
a distributed pass (assign in map_batches against broadcast centroids,
reduce exact per-cell sums), the driver touches only the k x (dim + 1)
statistics table between iterations. That makes the per-iteration driver
state O(k * dim) regardless of corpus size — the shape a 10^12-vector
run needs.

Hash-stable by construction (every arithmetic step is reproducible on
any block layout and in a straight-line re-derivation):
- vectors quantize ONCE to int64 (round(v * 2^20)), so per-cell
  accumulation is exact integer math in any association order;
- centroids are exact-int sums divided by (count * 2^20) in float64 —
  one deterministic division per coordinate;
- assignment uses negated squared Euclidean distance (2 v.c - c.c; the
  per-row ||v||^2 constant drops out of the argmax) accumulated
  dimension-by-dimension in a FIXED-order loop (never a BLAS matmul,
  whose reduction order can vary with operand shape), so a row's score
  is bit-identical whether its block holds 10 rows or 10^6;
- ties break to the lowest cell id (argmax on the score matrix).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_Q = 1 << 20          # quantization scale: exact int64 sums


def _quantize(vecs: np.ndarray) -> np.ndarray:
    return np.round(vecs.astype(np.float64) * _Q).astype(np.int64)


def _neg_dist2(vq: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """(n, k) NEGATED squared-Euclidean scores (argmax == nearest
    centroid): -||v - c||^2 + ||v||^2 = 2 v.c - c.c — the per-row
    constant ||v||^2 drops out of the argmax, so it is never computed.
    A raw dot-product argmax would only be nearest-centroid for
    normalized vectors (the IVF/cosine path); Lloyd centroids are means
    and NOT unit vectors, so the metric must be Euclidean. vq carries
    the quantization scale (vq = Q*v), so the c.c term scales by Q to
    stay commensurate: argmax_c (2*vq.c - Q*c.c) = argmax_c
    (2Q*(v.c) - Q*(c.c)) = argmin_c ||v - c||^2. Fixed dimension-order
    accumulation — deterministic for any batch size (never a BLAS
    matmul, whose reduction order can vary with operand shape)."""
    n, dim = vq.shape
    cross = np.zeros((n, cent.shape[0]), dtype=np.float64)
    cc = np.zeros(cent.shape[0], dtype=np.float64)
    for j in range(dim):
        cross += vq[:, j:j + 1].astype(np.float64) * cent[None, :, j]
        cc += cent[:, j] * cent[:, j]
    return 2.0 * cross - float(_Q) * cc[None, :]


def kmeans_fit(emb: ray.data.Dataset, *, k: int = 8, n_iter: int = 5,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """-> (centroids float64 (k, dim), counts int64 (k,)) after n_iter
    Lloyd iterations. Init: the k vectors with the smallest ids (fetched
    via a bounded vectorized filter — ids are dense in the fixture; pass
    a different init upstream for sparse id spaces).

    The quantized vectors MATERIALIZE once up front (int64 blobs in the
    object store, spillable); the iteration loop re-reads that narrow
    dataset, never the source parquet — n_iter passes over cached
    blocks, one pass over the input."""

    def quant_rows(b: pa.Table) -> pa.Table:
        vq = _quantize(np.stack(
            b[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64))
        return pa.table({
            "vec_id": b[id_col],
            "vq": pa.array([v.tobytes() for v in vq], pa.large_binary()),
        })

    narrow = emb.map_batches(quant_rows, batch_format="pyarrow",
                             batch_size=None).materialize()

    def keep_seeds(b: pa.Table) -> pa.Table:
        return b.filter(pa.array(b["vec_id"].to_numpy() < k))

    seed_rows = narrow.map_batches(keep_seeds, batch_format="pyarrow",
                                   batch_size=None).take_all()
    if not seed_rows:
        raise ValueError(
            "kmeans_fit: no seed vectors with id < k found — the input "
            "is empty or its id space does not start at 0 (pass a dense-"
            "id projection or re-key upstream)")
    seed_rows.sort(key=lambda r: r["vec_id"])
    cent = np.stack([np.frombuffer(r["vq"], dtype=np.int64)
                     for r in seed_rows]).astype(np.float64) / _Q
    dim = cent.shape[1]

    for _ in range(n_iter):
        cref = ray.put(cent)

        def partial(b: pa.Table) -> pa.Table:
            c = ray.get(cref)
            vq = np.stack([np.frombuffer(x, dtype=np.int64)
                           for x in b["vq"].to_pylist()])
            assign = np.argmax(_neg_dist2(vq, c), axis=1)
            cells, cnts = np.unique(assign, return_counts=True)
            sums = np.zeros((len(cells), vq.shape[1]), dtype=np.int64)
            for i, cell in enumerate(cells):
                sums[i] = vq[assign == cell].sum(axis=0)
            return pa.table({
                "cell": pa.array(cells.astype(np.int64)),
                "n": pa.array(cnts.astype(np.int64)),
                "sums": pa.array([s.tobytes() for s in sums],
                                 pa.large_binary()),
            })

        def merge(g: pa.Table) -> pa.Table:
            acc = np.zeros(dim, dtype=np.int64)
            for blob in g["sums"].to_pylist():
                acc += np.frombuffer(blob, dtype=np.int64)
            return pa.table({
                "cell": pa.array([int(g["cell"][0].as_py())]),
                "n": pa.array([int(np.sum(g["n"].to_numpy()))]),
                "sums": pa.array([acc.tobytes()], pa.large_binary()),
            })

        stats = narrow.map_batches(partial, batch_format="pyarrow") \
            .groupby("cell").map_groups(merge, batch_format="pyarrow") \
            .take_all()                      # k rows, bounded
        counts = np.zeros(k, dtype=np.int64)
        new = cent.copy()                    # empty cells keep position
        for r in stats:
            cell = int(r["cell"])
            n = int(r["n"])
            counts[cell] = n
            if n:
                s = np.frombuffer(r["sums"], dtype=np.int64)
                new[cell] = s.astype(np.float64) / (n * _Q)
        cent = new
    return cent, counts


def kmeans_fit_oracle(vecs: np.ndarray, *, k: int = 8,
                      n_iter: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Straight-line re-derivation over the in-memory matrix (rows in
    id order; row index == id for the fixture). Must agree bit-for-bit
    with kmeans_fit on any block layout."""
    vq = _quantize(np.asarray(vecs, dtype=np.float64))
    cent = vq[:k].astype(np.float64) / _Q
    counts = np.zeros(k, dtype=np.int64)
    for _ in range(n_iter):
        assign = np.argmax(_neg_dist2(vq, cent), axis=1)
        new = cent.copy()
        counts = np.zeros(k, dtype=np.int64)
        for c in range(k):
            m = assign == c
            counts[c] = int(m.sum())
            if counts[c]:
                new[c] = vq[m].sum(axis=0).astype(np.float64) \
                    / (counts[c] * _Q)
        cent = new
    return cent, counts
