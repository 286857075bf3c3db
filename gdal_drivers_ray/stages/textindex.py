"""Persisted inverted text index — build once, query many.

The text-domain twin of stages/ann.build_ivf_index (same 100 TB
pattern): the index is a directory of term-hash-partitioned parquet
shards of postings (term, doc_id, tf); a query hashes its terms and
opens ONLY the shards those terms land in — partition pruning at the
read, the full corpus never streams for a query.

Build shape: one tokenize map emits per-doc distinct (term, tf)
postings, hash-partitioned by term (the same process-stable siphash the
string cogroup uses, so build and query agree), one single-writer
reducer per shard writes `shard-K.parquet` sorted by (term, doc_id)
atomically (tmp + rename). Query shape: read the probed shards with a
parquet-level term filter, then a doc-keyed groupby counts matched
terms — conjunctive (AND) retrieval keeps docs matching every query
term, ranked by summed tf.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .joins import _part_of_str


def build_text_index(docs: ray.data.Dataset, out_dir: str, *,
                     num_shards: int = 32, doc_col: str = "doc_id",
                     text_col: str = "text") -> pd.DataFrame:
    """-> manifest (shard, path, n_postings), the posting counts READ
    BACK from the persisted shard files (parquet footers) — a resume
    run that keeps stale shards reports what is actually on disk, never
    what this run would have written. A `_SUCCESS` marker lands after
    every shard exists: callers skip the whole build when it is present
    (delete the directory for a clean rebuild)."""
    os.makedirs(out_dir, exist_ok=True)

    def postings(b: pa.Table) -> pa.Table:
        # vectorized (doc, term) -> tf: one split kernel, one
        # dictionary-encode, one np.unique over integer pair keys —
        # no Python per token (the same kernel family as the fused
        # term-statistics pass in stages/text.py)
        import pyarrow.compute as pc
        ids = b[doc_col].to_numpy().astype(np.int64)
        texts = b[text_col].combine_chunks() \
            if isinstance(b[text_col], pa.ChunkedArray) else b[text_col]
        lst = pc.split_pattern(texts, " ")
        n_tok = pc.list_value_length(lst).to_numpy().astype(np.int64)
        flat = lst.flatten()
        if len(flat) == 0:
            t = pa.table({"term": pa.array([], pa.string()),
                          "doc_id": pa.array([], pa.int64()),
                          "tf": pa.array([], pa.int64())})
            return t.append_column("_part", pa.array([], pa.int32()))
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy().astype(np.int64)
        m = len(enc.dictionary)
        parent = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        uk, tf = np.unique(parent * m + codes, return_counts=True)
        t = pa.table({
            "term": pc.take(enc.dictionary,
                            pa.array(uk % m)).cast(pa.string()),
            "doc_id": pa.array(ids[uk // m]),
            "tf": pa.array(tf.astype(np.int64)),
        })
        part = _part_of_str(t["term"].to_numpy(zero_copy_only=False),
                            num_shards)
        return t.append_column("_part", pa.array(part))

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        shard = int(g["_part"].iloc[0])
        path = os.path.join(out_dir, f"shard-{shard:05d}.parquet")
        if not os.path.exists(path):
            g = g.sort_values(["term", "doc_id"], kind="stable")
            tbl = pa.table({
                "term": pa.array(g["term"].tolist(), pa.string()),
                "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
                "tf": pa.array(g["tf"].to_numpy(np.int64)),
            })
            tmp = path + f".tmp{os.getpid()}"
            pq.write_table(tbl, tmp)
            os.replace(tmp, path)
        # manifest from the FILE, not this run's rows: on resume the
        # kept shard may hold different (stale) postings
        n = pq.read_metadata(path).num_rows
        return pd.DataFrame({"shard": [shard], "path": [path],
                             "n_postings": [n]})

    man = docs.map_batches(postings, batch_format="pyarrow",
                           batch_size=None) \
        .groupby("_part").map_groups(write_shard, batch_format="pandas") \
        .to_pandas()
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("")
    return man.sort_values("shard").reset_index(drop=True)


def search_text_index(index_dir: str, terms: list[str], *,
                      num_shards: int = 32) -> ray.data.Dataset:
    """Conjunctive (AND) retrieval: docs containing EVERY query term,
    with relevance = summed tf over the query terms. Opens only the
    shards the query terms hash to."""
    terms = sorted(set(terms))
    shards = sorted(set(
        int(s) for s in _part_of_str(np.asarray(terms, dtype=object),
                                     num_shards)))
    paths = [os.path.join(index_dir, f"shard-{s:05d}.parquet")
             for s in shards]
    paths = [p for p in paths if os.path.exists(p)]
    tset = frozenset(terms)
    n_terms = len(terms)
    if not paths:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "relevance": pa.array([], pa.int64())}))

    ds = ray.data.read_parquet(paths, columns=["term", "doc_id", "tf"])

    def match(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        m = b.filter(pc.is_in(b["term"],
                              value_set=pa.array(sorted(tset))))
        return pa.table({"doc_id": m["doc_id"],
                         "tf": m["tf"],
                         "one": pa.array(np.ones(m.num_rows,
                                                 dtype=np.int64))})

    from ray.data.aggregate import Sum

    agg = ds.map_batches(match, batch_format="pyarrow",
                         batch_size=None) \
        .groupby("doc_id").aggregate(Sum("one", alias_name="n_matched"),
                                     Sum("tf", alias_name="relevance"))

    def conj(b: pa.Table) -> pa.Table:
        keep = b["n_matched"].to_numpy() == n_terms
        m = b.filter(pa.array(keep))
        return pa.table({"doc_id": m["doc_id"],
                         "relevance": m["relevance"]})

    return agg.map_batches(conj, batch_format="pyarrow", batch_size=None)
