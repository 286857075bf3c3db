"""Query entries for the dedup suite + ANN over documents/embeddings."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..stages import ann, dedup


def _docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def q_minhash_dedup(sf_dir: str):
    """MinHash+LSH near-dup clustering of documents. SQL-checked: the
    oracle (oracle_derive.sql_minhash_dedup) re-derives the cluster table
    with plain dict buckets + in-memory union-find from the pure per-doc
    signature kernel; recall vs planted dups in tests/test_dedup.py."""
    return dedup.minhash_lsh_dedup(_docs(sf_dir), threshold=0.7)


def q_simhash_dedup(sf_dir: str):
    """SimHash near-dup clustering, SQL-checked against the in-memory
    re-derivation (oracle_derive.sql_simhash_dedup)."""
    return dedup.simhash_dedup(_docs(sf_dir), max_hamming=3)


def q_embed_near_dup(sf_dir: str) -> ray.data.Dataset:
    """EXACT all-pairs cosine >= 0.45 (brute force, SQL-checked): the query
    matrix is broadcast once; each batch computes its rows against the full
    normalized matrix and keeps a < b pairs. The LSH-bucketed variant
    (stages.dedup.embedding_near_dup) is the scale path; this exact one is
    the oracle-checkable surface."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    mat = np.stack([np.asarray(e, np.float64) for e in t["embedding"].to_pylist()])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((ids, mat))

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])

    def pairs(b: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        vid = b["vec_id"].to_numpy()
        vecs = np.stack(b["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = vecs @ all_mat.T
        rows_a, rows_b = [], []
        for i in range(len(vid)):
            hit = (sims[i] >= 0.45) & (all_ids > vid[i])
            if hit.any():
                rows_a.append(np.full(hit.sum(), vid[i]))
                rows_b.append(all_ids[hit])
        if not rows_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        return pa.table({"a": pa.array(np.concatenate(rows_a)),
                         "b": pa.array(np.concatenate(rows_b))})

    return emb.map_batches(pairs, batch_format="pyarrow", batch_size=512)


SQL_EMBED_NEAR_DUP = """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
"""


def q_ann_lsh(sf_dir: str):
    """LSH-bucketed top-10, SQL-checked against a plain-loop re-derivation
    (oracle_derive.sql_ann_lsh); recall vs brute force measured in tests.
    Same queries as knn_brute: vec_id < 5."""
    import pyarrow.parquet as pq
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", 5)]).sort_by("vec_id")
    qids = qt["vec_id"].to_numpy()
    qmat = np.stack([np.asarray(e, np.float64) for e in qt["embedding"].to_pylist()])
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"]) \
        .filter(expr="vec_id >= 5")
    return ann.ann_lsh_topk(emb, qids, qmat, k=10, n_bits=4, multiprobe=2)


def _rank_form(df):
    """(query_id, neighbor_id, sim) already sorted by (query_id, sim desc,
    neighbor_id) -> (query_id, neighbor_id, rank): integer output the
    independent re-derivation oracle (oracle_derive.sql_ann_ivf) can
    hash-match without float bytes in the hash."""
    df = df.copy()
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df[["query_id", "neighbor_id", "rank"]]


def q_ann_ivf(sf_dir: str):
    """IVF ANN top-10, SQL-checked against a plain-loop re-derivation
    (oracle_derive.sql_ann_ivf); recall + probe-all exactness vs brute
    force in tests/test_ann.py. Same query set as knn_brute/ann_lsh."""
    import pyarrow.parquet as pq
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", 5)]).sort_by("vec_id")
    qids = qt["vec_id"].to_numpy()
    qmat = np.stack([np.asarray(e, np.float64) for e in qt["embedding"].to_pylist()])
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"]) \
        .filter(expr="vec_id >= 5")
    return _rank_form(ann.ann_ivf_topk(emb, qids, qmat, k=10, n_cells=8,
                                       n_probe=4))


def q_ann_ivf_indexed(sf_dir: str):
    """The SAME search as q_ann_ivf but through the PERSISTED index:
    build once per sf under /tmp (one parquet file per cell + centroids),
    then query by opening only the probed cells' files. Row-identical to
    q_ann_ivf by construction (shared deterministic training) —
    parity-asserted in tests/test_ann.py."""
    import hashlib
    import os

    import pyarrow.parquet as pq

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", 5)]).sort_by("vec_id")
    qids = qt["vec_id"].to_numpy()
    qmat = np.stack([np.asarray(e, np.float64)
                     for e in qt["embedding"].to_pylist()])
    tag = hashlib.blake2b(sf_dir.encode(), digest_size=6).hexdigest()
    idx_dir = f"/tmp/graft_out/ivf_index_{tag}"
    # centroids.npy is written LAST by build_ivf_index — its presence
    # means the cell files are all in place (interrupted builds rebuild)
    if not os.path.exists(os.path.join(idx_dir, "centroids.npy")):
        emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                    columns=["vec_id", "embedding"]) \
            .filter(expr="vec_id >= 5")
        ann.build_ivf_index(emb, idx_dir, n_cells=8)
    return _rank_form(ann.query_ivf_index(idx_dir, qids, qmat, k=10,
                                          n_probe=4))


def q_cluster_labels(sf_dir: str) -> ray.data.Dataset:
    """Distributed min-label propagation (the dedup cluster-assembly
    engine) on a deterministic chain graph over documents: edge
    (doc_id, doc_id - 1) whenever doc_id % 8 != 0 -> chains of 8, so the
    transitive closure has the closed form cluster_id = doc_id - doc_id % 8
    (SQL-checkable) while the Ray side must actually propagate labels
    through multiple groupby/join rounds to reach it."""
    from ..stages.dedup import cluster_assign

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def chain_edges(b: pa.Table) -> pa.Table:
        d = b["doc_id"].to_numpy().astype(np.int64)
        keep = (d % 8 != 0) & (d > 0)
        return pa.table({"a": pa.array(d[keep]),
                         "b": pa.array(d[keep] - 1)})

    edges = docs.map_batches(chain_edges, batch_format="pyarrow")
    return cluster_assign(docs, edges)


SQL_CLUSTER_LABELS = """
SELECT doc_id,
       doc_id - (doc_id % 8) AS cluster_id,
       (doc_id % 8 = 0) AS is_keeper
FROM documents
"""


def q_phash_dedup(sf_dir: str):
    """Exact dedup on the image phash column (the north-star rule: exact
    dedup by phash = hash-partition + first-per-group over the input_hint
    table). Narrow: only (image_id, phash) is read and shuffled; the
    fixture plants a duplicate every 97th row. SQL-oracled: the Ray side
    materializes the fixture first, then DuckDB reads the same parquet
    directory (SQL_PHASH_DEDUP)."""
    from ray.data.aggregate import Count, Min

    from .. import fixtures

    path = fixtures.images_path_for(sf_dir)
    ds = ray.data.read_parquet(path, columns=["image_id", "phash"])

    def key(b: pa.Table) -> pa.Table:
        idx = np.asarray([int(s.rsplit("-", 1)[1])
                          for s in b["image_id"].to_pylist()], dtype=np.int64)
        return pa.table({"phash": b["phash"], "idx": pa.array(idx)})

    agg = ds.map_batches(key, batch_format="pyarrow") \
            .groupby("phash").aggregate(Min("idx", alias_name="keeper_idx"),
                                        Count(alias_name="n_copies"))
    import pyarrow.compute as pc
    return agg.map_batches(
        lambda b: b.filter(pc.greater(b["n_copies"], 1)),
        batch_format="pyarrow")


# The correctness gate runs the Ray side first, which builds the fixture
# directory; the oracle then reads the identical files. Path is the
# deterministic images_path_for() location for the gate's sf0.01 input.
SQL_PHASH_DEDUP = """
SELECT phash,
       min(CAST(substring(image_id, 5) AS BIGINT)) AS keeper_idx,
       CAST(count(*) AS BIGINT) AS n_copies
FROM read_parquet('/tmp/graft_fixtures/sf0.01/images_4000/part-*.parquet')
GROUP BY phash
HAVING count(*) > 1
"""


def q_semantic_dedup(sf_dir: str) -> ray.data.Dataset:
    """SemDeDup-style semantic dedup over the embeddings table
    (stages/semdedup.py): distributed Lloyd k-means partitions the
    space, a map_groups kernel prunes within-cluster cosine >= 0.4
    components, keeper = min vec_id per component. SQL-checked against
    the straight-line in-memory twin (oracle_derive.sql_semantic_dedup);
    planted-paraphrase recall in tests/test_semdedup.py. Threshold 0.4
    picked so the fixture (no planted near-dups; max within-cell cosine
    ~0.51) yields real multi-member components."""
    from ..stages.semdedup import semantic_dedup

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return semantic_dedup(emb, k=8, n_iter=4, threshold=0.4)


def q_kmeans_fit(sf_dir: str):
    """Fully distributed Lloyd k-means over the embeddings table
    (stages/kmeans.py): per-iteration driver state is the k x (dim+1)
    statistics table only. Output: per-cell final counts + an exact
    integer centroid checksum (quantized coordinates), bit-identical to
    the straight-line oracle on any block layout."""
    import numpy as np
    import pandas as pd
    import ray.data

    from ..stages.kmeans import _Q, kmeans_fit

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    cent, counts = kmeans_fit(emb, k=8, n_iter=4)
    cq = np.round(cent * _Q).astype(np.int64).sum(axis=1)
    return pd.DataFrame({
        "cell": np.arange(8, dtype=np.int64),
        "n_vecs": counts.astype(np.int64),
        "cent_q_sum": cq,
    })


def q_gram_matrix(sf_dir: str):
    """Distributed d x d Gram matrix over the embeddings table
    (stages/linalg.py): per-block integer partials tree-sum through the
    fixed-fan-in funnel; only 2080 (i, j, gram) rows leave it. The pure
    SQL twin (SQL_GRAM_MATRIX) recomputes every entry from unnested
    coordinates — both sides quantize with floor(x * 1e5) on doubles, so
    the integers match bit-for-bit at any sf."""
    from ..stages.linalg import gram_matrix

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["embedding"])
    return gram_matrix(emb).sort(["i", "j"])


SQL_GRAM_MATRIX = """
WITH q AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 100000) AS BIGINT)
             AS qv
  FROM embeddings
)
SELECT a.i AS i, b.i AS j, CAST(SUM(a.qv * b.qv) AS BIGINT) AS gram
FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY a.i, b.i
ORDER BY i, j
"""
