"""Approximate nearest neighbor over an embedding column.

Baseline: brute-force cosine top-k (pipelines.queries.q_knn_brute — numpy
matmul per batch against a broadcast query matrix; exact, SQL-checked).

Scale path here: random-hyperplane LSH bucketing (the same 'cell
prefilter' shape as the reference's quadtree constraint, mask.cpp:229-233
— prune the search space by a cheap spatial key, then refine exactly):

  index:  embedding -> n_bits sign bucket (EmbeddingBucketer actor stage)
  query:  bucket(q) + multiprobe (flip each single bit) -> candidate set
  refine: exact cosine on candidates only, per-batch partial top-k,
          one tiny groupby finalize

Recall is tunable via n_bits / multiprobe depth; tests measure it against
the brute-force oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .dedup import EmbeddingBucketer, hyperplanes


def _bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0
    out = np.zeros(len(vecs), dtype=np.int64)
    for i in range(planes.shape[0]):
        out |= bits[:, i].astype(np.int64) << i
    return out


def ann_lsh_topk(emb: ray.data.Dataset, query_ids: np.ndarray,
                 query_mat: np.ndarray, *, k: int = 10, n_bits: int = 8,
                 dim: int = 64, multiprobe: int = 1) -> pd.DataFrame:
    """-> (query_id, neighbor_id, rank) over LSH-pruned candidates.

    query_mat rows need not be normalized. Queries are broadcast once; the
    candidate stream is pruned per batch by bucket membership before any
    dot product happens."""
    planes = hyperplanes(dim, n_bits)
    q = query_mat / np.linalg.norm(query_mat, axis=1, keepdims=True)
    qb = _bucket_of(q, planes)
    # multiprobe: each query accepts its bucket plus single-bit flips
    accept: list[set[int]] = []
    for b in qb:
        s = {int(b)}
        if multiprobe >= 1:
            s |= {int(b) ^ (1 << i) for i in range(n_bits)}
        if multiprobe >= 2:
            s |= {int(b) ^ (1 << i) ^ (1 << j)
                  for i in range(n_bits) for j in range(i + 1, n_bits)}
        accept.append(s)
    per_bucket: dict[int, list[int]] = {}
    for qi, s in enumerate(accept):
        for b in s:
            per_bucket.setdefault(b, []).append(qi)
    bref = ray.put((query_ids, q, per_bucket))

    bucketed = emb.map_batches(EmbeddingBucketer(dim, n_bits),
                               batch_format="pyarrow", batch_size=1024)

    def partial(b: pa.Table) -> pa.Table:
        ids_q, mat_q, pb = ray.get(bref)
        buckets = b["bucket"].to_numpy()
        wanted = np.fromiter((int(x) in pb for x in buckets), bool,
                             count=len(buckets))
        if not wanted.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        vid = b["vec_id"].to_numpy()[wanted]
        vecs = np.stack([np.frombuffer(v, np.float64)
                         for v in b["vec"].to_pylist()])[wanted]
        bks = buckets[wanted]
        out_q, out_n, out_s = [], [], []
        # group candidate rows by which queries probe their bucket
        for qi in range(len(ids_q)):
            m = np.fromiter((qi in pb.get(int(x), ()) for x in bks), bool,
                            count=len(bks))
            if not m.any():
                continue
            sims = vecs[m] @ mat_q[qi]
            kk = min(k, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(kk, ids_q[qi]))
            out_n.append(vid[m][top])
            out_s.append(sims[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "neighbor_id": pa.array(np.concatenate(out_n)),
                         "sim": pa.array(np.concatenate(out_s))})

    partials = bucketed.map_batches(partial, batch_format="pyarrow",
                                    batch_size=2048)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(
        finalize, batch_format="pandas").to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
