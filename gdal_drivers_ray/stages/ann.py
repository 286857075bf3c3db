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

from .dedup import EmbeddingBucketer, bucket_of, hyperplanes


def _vec_matrix(col, dim: int) -> np.ndarray:
    """(n, dim) float64 matrix from a column of packed-float64 binary
    blobs, zero-copy when the Arrow data buffer is contiguous and every
    blob is exactly dim*8 bytes (always true for our writers); falls back
    to a per-row frombuffer loop otherwise."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, dim), np.float64)
    try:
        width = 8 if pa.types.is_large_binary(col.type) else 4
        odt = np.int64 if width == 8 else np.int32
        offs = np.frombuffer(col.buffers()[1], dtype=odt, count=n + 1,
                             offset=col.offset * width)
        if int(offs[-1] - offs[0]) == n * dim * 8:
            flat = np.frombuffer(col.buffers()[2], dtype=np.float64,
                                 count=n * dim, offset=int(offs[0]))
            return flat.reshape(n, dim)
    except (ValueError, TypeError):
        pass
    return np.stack([np.frombuffer(v, np.float64) for v in col.to_pylist()])


def _cell_csr(probe: np.ndarray):
    """(nq, n_probe) probed cell ids -> sorted-key CSR cell->queries
    (keys, starts, lens, qidx) — the same shape ann_lsh_topk uses for
    bucket membership, so refine cost is O(matched pairs), never
    O(n_queries x batch)."""
    nq, npb = probe.shape
    flat = probe.ravel().astype(np.int64)
    qidx = np.repeat(np.arange(nq, dtype=np.int64), npb)
    o = np.argsort(flat, kind="stable")
    flat, qidx = flat[o], qidx[o]
    keys, starts, lens = np.unique(flat, return_index=True,
                                   return_counts=True)
    return keys, starts.astype(np.int64), lens.astype(np.int64), qidx


def _make_cell_refine(qref, k: int):
    """Shared exact-refine stage for BOTH IVF paths (inline + persisted
    index): CSR-expand (candidate row x probing query) pairs, one einsum,
    vectorized per-query partial top-k. No per-query Python loop."""
    from .spatial import _csr_expand

    def refine(b: pa.Table) -> pa.Table:
        qids, qm, keys, starts, lens, qidx = ray.get(qref)
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        cells = b["cell"].to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, cells)
        ok = pos < len(keys)
        pos_c = np.where(ok, pos, 0)
        ok &= keys[pos_c] == cells
        rows = np.nonzero(ok)[0]
        if len(rows) == 0:
            return empty
        vids = b["vec_id"].to_numpy()
        vecs = _vec_matrix(b["vec"], qm.shape[1])[rows]
        ln = lens[pos[rows]]
        local = np.repeat(np.arange(len(rows)), ln)
        qi = qidx[_csr_expand(starts[pos[rows]], ln)]
        nid = vids[rows][local]
        keep = nid != qids[qi]          # self-exclusion
        local, qi, nid = local[keep], qi[keep], nid[keep]
        if len(qi) == 0:
            return empty
        sims = np.einsum("ij,ij->i", vecs[local], qm[qi])
        o = np.lexsort((nid, -sims, qi))
        qi, nid, sims = qi[o], nid[o], sims[o]
        _, gstart, gcnt = np.unique(qi, return_index=True,
                                    return_counts=True)
        rank_in = np.arange(len(qi)) - np.repeat(gstart, gcnt)
        sel = rank_in < k
        return pa.table({"query_id": pa.array(qids[qi[sel]]),
                         "neighbor_id": pa.array(nid[sel]),
                         "sim": pa.array(sims[sel])})

    return refine


def _finalize_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Global per-query top-k over the (tiny) partial stream."""
    partials = partials.sort_values(
        ["query_id", "sim", "neighbor_id"],
        ascending=[True, False, True], kind="stable")
    return partials.groupby("query_id", as_index=False).head(k) \
        .reset_index(drop=True)


def ann_lsh_topk(emb: ray.data.Dataset, query_ids: np.ndarray,
                 query_mat: np.ndarray, *, k: int = 10, n_bits: int = 8,
                 dim: int = 64, multiprobe: int = 1) -> pd.DataFrame:
    """-> (query_id, neighbor_id, rank) over LSH-pruned candidates, with
    a query's own row excluded (the same self-exclusion contract as
    ann_ivf_topk, so the two paths are swappable on in-corpus queries).

    query_mat rows need not be normalized. Queries are broadcast once; the
    candidate stream is pruned per batch by bucket membership before any
    dot product happens."""
    planes = hyperplanes(dim, n_bits)
    q = query_mat / np.linalg.norm(query_mat, axis=1, keepdims=True)
    qb = bucket_of(q, planes)
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
    # bucket -> probing queries as a sorted-key CSR index (vectorizable
    # membership via searchsorted, no per-row Python `in`)
    per_bucket: dict[int, list[int]] = {}
    for qi, s in enumerate(accept):
        for b in s:
            per_bucket.setdefault(b, []).append(qi)
    bkeys = np.asarray(sorted(per_bucket), dtype=np.int64)
    blens = np.asarray([len(per_bucket[int(x)]) for x in bkeys],
                       dtype=np.int64)
    bstarts = np.concatenate(([0], np.cumsum(blens)[:-1])).astype(np.int64)
    bqidx = np.concatenate([per_bucket[int(x)] for x in bkeys]) \
        .astype(np.int64) if len(bkeys) else np.empty(0, np.int64)
    bref = ray.put((np.asarray(query_ids, dtype=np.int64), q,
                    bkeys, bstarts, blens, bqidx))

    bucketed = emb.map_batches(EmbeddingBucketer(dim, n_bits),
                               batch_format="pyarrow", batch_size=1024)

    def partial(b: pa.Table) -> pa.Table:
        from .spatial import _csr_expand
        ids_q, mat_q, keys, starts, lens, qidx = ray.get(bref)
        buckets = b["bucket"].to_numpy()
        pos = np.searchsorted(keys, buckets)
        ok = pos < len(keys)
        pos_c = np.where(ok, pos, 0)
        ok &= keys[pos_c] == buckets
        rows = np.nonzero(ok)[0]
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if len(rows) == 0:
            return empty
        vid = b["vec_id"].to_numpy()
        vecs = _vec_matrix(b["vec"], mat_q.shape[1])[rows]
        ln = lens[pos[rows]]
        local = np.repeat(np.arange(len(rows)), ln)   # candidate row index
        qi = qidx[_csr_expand(starts[pos[rows]], ln)]  # query per pair
        nid = vid[rows][local]
        keep = nid != ids_q[qi]   # self-exclusion — the ann_ivf contract
        local, qi, nid = local[keep], qi[keep], nid[keep]
        if len(qi) == 0:
            return empty
        sims = np.einsum("ij,ij->i", vecs[local], mat_q[qi])
        # per-query partial top-k within this batch (vectorized rank trick)
        o = np.lexsort((nid, -sims, qi))
        qi, nid, sims = qi[o], nid[o], sims[o]
        _, gstart, gcnt = np.unique(qi, return_index=True,
                                    return_counts=True)
        rank_in = np.arange(len(qi)) - np.repeat(gstart, gcnt)
        sel = rank_in < k
        return pa.table({"query_id": pa.array(ids_q[qi[sel]]),
                         "neighbor_id": pa.array(nid[sel]),
                         "sim": pa.array(sims[sel])})

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


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — coarse k-means cells + probed exact refine
# ---------------------------------------------------------------------------

def train_centroids(sample: np.ndarray, n_cells: int, n_iter: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means on a (normalized) sample.

    At 100 TB the sample is a tiny `ds.random_sample` pulled to the driver;
    the trained centroid matrix is the broadcast state — standard IVF
    (Jégou et al., "Product quantization for nearest neighbor search",
    TPAMI 2011, public method)."""
    if len(sample) == 0:
        raise ValueError("train_centroids: empty training sample — the "
                         "input dataset has no vectors")
    # fewer sample rows than requested cells: clamp (every vector still
    # gets a cell; pruning is just weaker) instead of the opaque
    # rng.choice 'larger sample than population' crash
    n_cells = min(n_cells, len(sample))
    rng = np.random.default_rng(seed)
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cent = sample[rng.choice(len(sample), size=n_cells, replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


class IvfAssign:
    """Embedding -> nearest-centroid cell id + normalized vector bytes.
    Centroids are broadcast once via the object store, not re-shipped per
    batch; ``ray.get`` inside the task is a local zero-copy plasma read.
    Runs as a TASK pool (``_ivf_assign_fn``): the state is one broadcast
    array, and an actor pool's cold fork+import per actor was the
    measured dominant cost of the ann_ivf pipelines (same finding as
    sources/mbtiles._warm_lookup)."""

    def __init__(self, cent_ref):
        self.cent = ray.get(cent_ref) if hasattr(cent_ref, "hex") \
            else np.asarray(cent_ref)

    def __call__(self, b: pa.Table) -> pa.Table:
        vecs = np.stack(b["embedding"].to_numpy(zero_copy_only=False)) \
            .astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        cell = np.argmax(vecs @ self.cent.T, axis=1).astype(np.int32)
        return pa.table({
            "vec_id": b["vec_id"],
            "cell": pa.array(cell),
            "vec": pa.array([v.tobytes() for v in vecs], pa.large_binary()),
        })


def _ivf_assign_fn(cent_ref):
    def fn(b: pa.Table) -> pa.Table:
        return IvfAssign(cent_ref)(b)
    return fn


def _train_from_dataset(emb: ray.data.Dataset, n_cells: int,
                        sample_n: int) -> np.ndarray:
    """Deterministic hash-mod sample -> centroids (driver-side; tiny).
    A prefix (limit) would bias k-means on id-sorted or clustered input;
    the multiplicative-hash filter picks a uniform, reproducible subset."""
    n_total = max(emb.count(), 1)
    rate = min(1.0, (2.0 * sample_n) / n_total)
    mod = max(int(round(1.0 / rate)), 1)

    def keep_sample(b: pa.Table) -> pa.Table:
        v = b["vec_id"].to_numpy().astype(np.int64)
        with np.errstate(over="ignore"):
            h = (v * np.int64(2654435761)) % np.int64(mod)
        return b.filter(pa.array(h == 0))

    # NO .limit() here: with preserve_order=False (the default) a limit
    # keeps whichever blocks finish first, so two training runs over the
    # same data saw different samples (flaky persisted-vs-inline parity).
    # The hash filter alone bounds the pull to ~2*sample_n expected rows;
    # sorting by vec_id makes the final truncation order-independent.
    samp = emb.map_batches(keep_sample, batch_format="pyarrow").to_pandas()
    if "embedding" not in samp.columns or not len(samp):
        raise ValueError("IVF training: the embeddings dataset is empty")
    samp = samp.sort_values("vec_id", kind="stable").head(sample_n)
    mat = np.stack([np.asarray(e, np.float64)
                    for e in samp["embedding"]])
    return train_centroids(mat, n_cells)


def ann_ivf_topk(emb: ray.data.Dataset, query_ids: np.ndarray,
                 qmat: np.ndarray, k: int = 10, n_cells: int = 16,
                 n_probe: int = 4, sample_n: int = 2048) -> pd.DataFrame:
    """IVF ANN: train coarse cells on a sample, assign every vector to its
    cell, then for each query search only the `n_probe` nearest cells with
    exact cosine; per-batch partial top-k, tiny driver-side finalize.

    -> DataFrame (query_id, neighbor_id, sim) with per-query top-k
    (self excluded), ties broken by neighbor_id.
    """
    cent = _train_from_dataset(emb, n_cells, sample_n)
    cent_ref = ray.put(cent)

    # 2. assign cells (actor pool holding centroids)
    assigned = emb.map_batches(_ivf_assign_fn(cent_ref),
                               batch_format="pyarrow", batch_size=1024)

    # 3. queries -> probed cells (driver-side: query set is small), shipped
    # as a cell->queries CSR so refine never loops per query
    qmat = np.asarray(qmat, dtype=np.float64)
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True),
                             1e-12)
    probe = np.argsort(-(qmat @ cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat)
                   + _cell_csr(probe))

    # 4. per-batch exact refine within probed cells + partial top-k
    partials = assigned.map_batches(_make_cell_refine(qref, k),
                                    batch_format="pyarrow").to_pandas()
    # 5. finalize: global top-k per query (tiny: nq * k * n_batches rows)
    return _finalize_topk(partials, k)


# ---------------------------------------------------------------------------
# Persisted IVF index — build once, query many. The index is a directory of
# per-CELL parquet files; queries open ONLY the probed cells' files
# (partition pruning at the read — the 100 TB pattern: the full vector set
# never streams for a query batch).
# ---------------------------------------------------------------------------

def build_ivf_index(emb: ray.data.Dataset, out_dir: str, *,
                    n_cells: int = 16, sample_n: int = 2048,
                    max_rows_per_file: int = 65536) -> pd.DataFrame:
    """Train centroids, assign every vector, and persist each cell as
    `cell=K/part-N.parquet` files of at most `max_rows_per_file` rows
    (single writer per cell, tmp + atomic rename — a hot cell from a
    skewed embedding space becomes MANY bounded files, never one
    unbounded writer buffer), plus `manifest.parquet` and centroids.npy.
    Returns the manifest (cell, part, n_vecs, path); the query path
    prunes on it."""
    import os
    import shutil

    import pyarrow.parquet as pq

    from .joins import partitioned_groups

    # a COMPLETED index in out_dir means this call is a REBUILD (the
    # build-once consumers gate on centroids.npy and never get here):
    # wipe it, or run-1's centroids/manifest would mark a half-rebuilt
    # dir complete and stale part files (a cell shrinking from 3 parts
    # to 2) would survive for the glob fallback to read. A dir with cell
    # files but NO centroids is an interrupted build of the SAME input —
    # that resumes (per-part atomic writes are kept).
    if os.path.exists(os.path.join(out_dir, "centroids.npy")):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    cent = _train_from_dataset(emb, n_cells, sample_n)
    cent_ref = ray.put(cent)

    assigned = emb.map_batches(_ivf_assign_fn(cent_ref),
                               batch_format="pyarrow", batch_size=1024)

    def write_cells(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"cell": pd.Series([], dtype=np.int64),
                              "part": pd.Series([], dtype=np.int64),
                              "n_vecs": pd.Series([], dtype=np.int64),
                              "path": pd.Series([], dtype=object)})
        if "cell" not in g.columns or not len(g):
            return empty
        out = []
        for cell, df in g.groupby("cell"):
            df = df.sort_values("vec_id", kind="stable")
            d = os.path.join(out_dir, f"cell={int(cell)}")
            os.makedirs(d, exist_ok=True)
            for pi, start in enumerate(range(0, len(df),
                                             max_rows_per_file)):
                ch = df.iloc[start:start + max_rows_per_file]
                path = os.path.join(d, f"part-{pi}.parquet")
                tmp = path + ".tmp"
                pq.write_table(
                    pa.table({"vec_id": pa.array(ch["vec_id"].to_numpy(),
                                                 pa.int64()),
                              "cell": pa.array(ch["cell"].to_numpy(),
                                               pa.int32()),
                              "vec": pa.array(list(ch["vec"]),
                                              pa.large_binary())}), tmp)
                os.replace(tmp, path)
                out.append((int(cell), pi, len(ch), path))
        return pd.DataFrame({"cell": [o[0] for o in out],
                             "part": [o[1] for o in out],
                             "n_vecs": [o[2] for o in out],
                             "path": [o[3] for o in out]})

    manifest = partitioned_groups(assigned, ["cell"],
                                  num_partitions=min(n_cells, 16)) \
        .map_groups(write_cells, batch_format="pandas").to_pandas()
    pq.write_table(pa.Table.from_pandas(manifest, preserve_index=False),
                   os.path.join(out_dir, "manifest.parquet"))
    # centroids are written LAST: their presence is the build-complete
    # marker (an interrupted build must never be mistaken for an index —
    # query_ivf_index silently skips missing cell files by design)
    np.save(os.path.join(out_dir, "centroids.npy"), cent)
    return manifest


def query_ivf_index(index_dir: str, query_ids: np.ndarray, qmat: np.ndarray,
                    *, k: int = 10, n_probe: int = 4) -> pd.DataFrame:
    """Query a persisted IVF index: load the (tiny) centroids, pick each
    query's n_probe nearest cells, and read ONLY those cells' parquet
    files (selected via manifest.parquet when present, glob fallback for
    pre-manifest indexes); shared exact-cosine CSR refine with per-batch
    partial top-k. Same output contract as ann_ivf_topk."""
    import glob
    import os

    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    qmat = np.asarray(qmat, dtype=np.float64)
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True),
                             1e-12)
    probe = np.argsort(-(qmat @ cent.T), axis=1)[:, :n_probe]
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat)
                   + _cell_csr(probe))

    # partition pruning: open only probed cells' files
    probed = sorted({int(c) for c in probe.ravel()})
    man_path = os.path.join(index_dir, "manifest.parquet")
    if os.path.exists(man_path):
        import pyarrow.parquet as pq
        man = pq.read_table(man_path, columns=["cell", "path"]).to_pandas()
        paths = sorted(man.loc[man["cell"].isin(probed), "path"].tolist())
    else:
        paths = sorted(p for c in probed for p in
                       glob.glob(os.path.join(index_dir, f"cell={c}",
                                              "part*.parquet")))
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        return pd.DataFrame({"query_id": pd.Series([], dtype=np.int64),
                             "neighbor_id": pd.Series([], dtype=np.int64),
                             "sim": pd.Series([], dtype=np.float64)})
    assigned = ray.data.read_parquet(paths)

    partials = assigned.map_batches(_make_cell_refine(qref, k),
                                    batch_format="pyarrow").to_pandas()
    return _finalize_topk(partials, k)
