"""Sequence packing for LLM training — a distributed prefix sum.

Concatenate documents in doc_id order and split at fixed context-window
boundaries (the GPT-style concat-and-chunk packing discipline; documents
may span pack boundaries). Per document the stage reports its token
count, global start offset, and the first/last pack (context window) it
lands in.

No counterpart exists in the reference (no text ops); this is the
engine-side addition a training-data pipeline needs between "documents"
and "token batches". The interesting part at 100 TB is the GLOBAL
OFFSET, a prefix sum over the whole ordered corpus:

  features : one narrow (doc_id, bucket, n_tok) row per doc, computed in
             one streaming map over the text and MATERIALIZED (3 int64
             per doc — bounded, object-store resident, spillable; the
             text is read exactly once);
  pass 1   : groupby(bucket).sum -> per-bucket token totals, a
             metadata-scale table (one row per bucket);
  driver   : exclusive prefix over the ordered bucket totals
             (O(n_buckets), broadcast via ray.put);
  pass 2   : per-bucket groups sort by doc_id and add local cumsum to
             the bucket's offset — vectorized, no cross-bucket traffic.

Bucket = doc_id // bucket_width, a deterministic RANGE key (execution
block boundaries are not stable across passes, so block-based prefix
sums would be wrong by construction — the bucket key is what makes the
two passes agree).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray
import ray.data

# identical token definition to q_token_count / its DuckDB twin
_TOKEN_RE = re.compile(r"\S+")


def pack_sequences(docs: ray.data.Dataset, *, ctx: int = 2048,
                   bucket_width: int | None = None,
                   doc_col: str = "doc_id",
                   text_col: str = "text") -> ray.data.Dataset:
    """-> (doc_id, n_tok, start_off, first_pack, last_pack, n_packs).

    `start_off` is the document's first-token global offset in the
    doc_id-ordered token stream; packs are [k*ctx, (k+1)*ctx). A
    zero-token document occupies no tokens but is assigned the pack its
    offset falls in (n_packs = 1), so every doc is addressable.

    ``bucket_width`` defaults to a DERIVED value sized so the driver's
    prefix table stays ~max(64, 8x parallelism) rows no matter how big
    the corpus is (a fixed width would grow the driver table linearly
    with max doc_id — the anti-pattern this stage exists to avoid)."""
    from ray.data.aggregate import Sum

    def features(b: pa.Table) -> pa.Table:
        ids = b[doc_col].to_numpy().astype(np.int64)
        # null text = zero tokens (the poison-row discipline: one bad row
        # must never kill the task on every retry)
        toks = np.fromiter((0 if t is None else len(_TOKEN_RE.findall(t))
                            for t in b[text_col].to_pylist()),
                           dtype=np.int64, count=b.num_rows)
        return pa.table({"doc_id": pa.array(ids), "n_tok": pa.array(toks)})

    narrow0 = docs.map_batches(features, batch_format="pyarrow") \
        .materialize()   # 2 int64/doc: bounded + spillable; text read once

    max_id = narrow0.max("doc_id")   # cheap: the materialized narrow
    if max_id is None:   # empty corpus packs to an empty result —
        # regardless of bucket_width (Ray skips map UDFs on empty
        # blocks, so the typed empty table must be built explicitly)
        return ray.data.from_arrow(pa.table({
            c: pa.array([], pa.int64())
            for c in ("doc_id", "n_tok", "start_off", "first_pack",
                      "last_pack", "n_packs")}))
    if bucket_width is None:
        from ..config import cluster_parallelism
        n_buckets = max(64, 8 * cluster_parallelism())
        bucket_width = max(1, (int(max_id) + n_buckets) // n_buckets)

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        return b.append_column("bucket", pa.array(ids // bucket_width))

    narrow = narrow0.map_batches(add_bucket, batch_format="pyarrow",
                                 batch_size=None)

    totals = narrow.groupby("bucket").aggregate(
        Sum("n_tok", alias_name="btok")).to_pandas()   # one row per bucket
    totals = totals.sort_values("bucket")
    excl = np.concatenate(([0], np.cumsum(
        totals["btok"].to_numpy(dtype=np.int64))[:-1]))
    offsets = dict(zip(totals["bucket"].to_numpy(dtype=np.int64).tolist(),
                       excl.tolist()))
    oref = ray.put(offsets)

    def finish(g: pa.Table) -> pa.Table:
        offs = ray.get(oref)
        ids = g["doc_id"].to_numpy().astype(np.int64)
        toks = g["n_tok"].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, toks = ids[order], toks[order]
        base = offs[int(g["bucket"][0].as_py())]
        cum = np.cumsum(toks)
        start = base + cum - toks
        first = start // ctx
        last = (start + np.maximum(toks, 1) - 1) // ctx
        return pa.table({
            "doc_id": pa.array(ids),
            "n_tok": pa.array(toks),
            "start_off": pa.array(start),
            "first_pack": pa.array(first),
            "last_pack": pa.array(last),
            "n_packs": pa.array(last - first + 1),
        })

    return narrow.groupby("bucket").map_groups(finish,
                                               batch_format="pyarrow")
