"""Distributed dense linear algebra over embedding columns.

The reference has no embedding ops; this is the engine-side addition a
100 TB multimodal corpus needs between "embeddings" and "PCA/whitening/
decorrelation": the d x d Gram matrix G = X^T X (and from it the
covariance), computed as one streaming pass of per-block partials that
tree-sum through a fixed-fan-in funnel — the bloom-bitmap OR-funnel
shape (stages/joins.py bloom_semi_join) applied to integer matrices.

Exactness discipline: coordinates quantize to integers FIRST
(q = floor(x * quant), both numpy and DuckDB floor the same double),
so every partial sum is exact int64 arithmetic and the result is
bit-identical on any block layout — the kmeans/_Q lesson. Int64 bound:
|q| <= quant * max|x|, so a gram entry's magnitude is bounded by
rows * (quant * max|x|)^2; at quant=1e5 and |x| <= 1 the surrogate is
safe through ~9e8 rows — past that, lower quant (the measured
embedding fixtures sit at |x| < 0.6, giving ~3e9 rows of headroom).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

GRAM_QUANT = 100_000


def gram_matrix(emb: ray.data.Dataset, *, vec_col: str = "embedding",
                quant: int = GRAM_QUANT,
                fan_in: int = 64) -> ray.data.Dataset:
    """-> Dataset of (i, j, gram) rows, the UPPER triangle (i <= j) of
    G = Q^T Q where Q = floor(X * quant) int64 — one row per dimension
    pair, d*(d+1)/2 rows total (d=64 -> 2080 rows).

    Shape (nothing vector-sized ever lands on the driver): each block
    reduces to ONE d x d int64 partial (d=64 -> 32 KiB blob); partials
    sum through a two-level fixed-fan-in funnel (<= fan_in blobs per
    task), and only the final 2080 narrow rows leave the funnel. The
    embedding column is read once; no shuffle moves any vector."""

    def partial(b: pa.Table) -> pa.Table:
        vecs = np.stack(
            b[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        q = np.floor(vecs * quant).astype(np.int64)
        g = q.T @ q  # integer matmul: exact, d x d
        return pa.table({
            "g": pa.array([g.tobytes()], pa.large_binary()),
            "d": pa.array([g.shape[0]], pa.int64())})

    def sum_blobs(b: pa.Table) -> pa.Table:
        ds_ = b["d"].to_numpy()
        d = int(ds_[0])
        if (ds_ != d).any():
            raise ValueError(
                f"gram_matrix: mixed embedding dims {sorted(set(ds_.tolist()))}")
        acc = np.zeros((d, d), dtype=np.int64)
        for blob in b["g"].to_pylist():
            acc += np.frombuffer(blob, dtype=np.int64).reshape(d, d)
        return pa.table({"g": pa.array([acc.tobytes()], pa.large_binary()),
                         "d": pa.array([d], pa.int64())})

    final = emb.map_batches(partial, batch_format="pyarrow",
                            batch_size=None) \
        .repartition(fan_in) \
        .map_batches(sum_blobs, batch_format="pyarrow", batch_size=None) \
        .repartition(1) \
        .map_batches(sum_blobs, batch_format="pyarrow", batch_size=None) \
        .take_all()
    if not final:
        # empty input (Ray skips map UDFs on empty blocks): an empty
        # typed result, the engine-wide empty-schema discipline
        return ray.data.from_arrow(pa.table({
            "i": pa.array([], pa.int64()),
            "j": pa.array([], pa.int64()),
            "gram": pa.array([], pa.int64())}))
    d = int(final[0]["d"])
    g = np.frombuffer(final[0]["g"], dtype=np.int64).reshape(d, d)
    iu, ju = np.triu_indices(d)
    return ray.data.from_arrow(pa.table({
        "i": pa.array(iu.astype(np.int64)),
        "j": pa.array(ju.astype(np.int64)),
        "gram": pa.array(g[iu, ju])}))


def gram_matrix_oracle(vecs: np.ndarray, *, quant: int = GRAM_QUANT):
    """Straight-line NumPy twin (tests compare the funnel against this)."""
    q = np.floor(vecs.astype(np.float64) * quant).astype(np.int64)
    g = q.T @ q
    iu, ju = np.triu_indices(g.shape[0])
    return iu.astype(np.int64), ju.astype(np.int64), g[iu, ju]
