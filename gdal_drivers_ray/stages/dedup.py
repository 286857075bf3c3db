"""Deduplication suite for large-scale training data (SURVEY.md §2.6
engine additions; first-class per the build brief):

- exact:      content hash -> hash-partitioned first-per-group
- minhash_lsh: shingle -> minhash signature -> banded LSH buckets ->
              candidate pairs -> signature-similarity verify -> clusters
- simhash:    64-bit sign hash -> banded buckets -> Hamming verify
- ngram_jaccard: exact Jaccard between candidate pairs (verification
              kernel, also standalone within buckets)
- embedding near-dup: random-hyperplane buckets -> within-bucket cosine

Shuffle economics (the 100 TB story): per-doc signatures are computed in
one vectorized map_batches pass; ONLY (bucket_key, doc_id[, signature])
rows enter the groupby — never the text. Candidate groups are bounded
(`max_bucket` cap, logged via the dropped-bucket count) so a degenerate
bucket cannot OOM a reducer; cluster assembly is min-label propagation
over the (small) verified-pair set.
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_WORD = re.compile(r"\w+")

# universal-hash parameters for minhash permutations (fixed seed).
# p = 2^31 - 1 keeps a*h + b inside uint64 (a, h < 2^31 -> product < 2^62)
_MERSENNE = (1 << 31) - 1


def _perm_params(n_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, n_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_SHINGLE_BASE = np.uint64(1099511628211)  # FNV prime; mod 2^64 wraparound


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingles -> stable 64-bit hashes (vector per doc).

    Vectorized polynomial rolling hash over codepoints (k fused vector ops
    per doc instead of one blake2b call per shingle — the former dominated
    the minhash stage profile). Distinct shingles only."""
    t = text.lower()
    if len(t) < k:
        t = t.ljust(k)
    c = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32) \
        .astype(np.uint64)
    n = len(c) - k + 1
    hs = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            hs = hs * _SHINGLE_BASE + c[i:i + n]
    return np.unique(hs)


def minhash_signature(hashes: np.ndarray, a: np.ndarray,
                      b: np.ndarray) -> np.ndarray:
    """sig_i = min over shingles of (a_i * h + b_i mod p)."""
    h = (hashes % np.uint64(_MERSENNE)).astype(np.uint64)
    prod = (a[:, None] * h[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


class MinHasher:
    """Actor-pool stage: text -> banded LSH keys (state: permutation
    parameters, built once per actor — T6 pattern)."""

    def __init__(self, n_perm: int = 64, bands: int = 16, shingle_k: int = 5):
        assert n_perm % bands == 0
        self.a, self.b = _perm_params(n_perm)
        self.bands = bands
        self.rows = n_perm // bands
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        return minhash_signature(shingle_hashes(text, self.k), self.a, self.b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bandid, bandhash, sigs = [], [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            sig = self.signature(text)
            sb = sig.reshape(self.bands, self.rows)
            for bi in range(self.bands):
                ids.append(did)
                bandid.append(bi)
                bandhash.append(int.from_bytes(
                    hashlib.blake2b(sb[bi].tobytes(), digest_size=8).digest(),
                    "little", signed=True))
            sigs.append(sig.astype(np.int64).tobytes())
        reps = np.repeat(np.arange(len(sigs)), self.bands)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "band_id": pa.array(bandid, pa.int32()),
            "band_hash": pa.array(bandhash, pa.int64()),
            "signature": pa.array([sigs[i] for i in reps], pa.large_binary()),
        })


# ---------------------------------------------------------------------------
# distributed cluster assembly: min-label propagation as Dataset ops
# ---------------------------------------------------------------------------

@ray.remote
def _unionfind_task(*blocks: pa.Table) -> pa.Table:
    """Single-task min-label union-find over edge blocks. Runs in a WORKER
    (driver memory stays O(1)); memory is O(edge nodes) — the dup
    subgraph, not the corpus. The fast path for pair graphs under the
    task threshold."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    nodes: set[int] = set()
    for t in blocks:
        # empty partitions can yield schemaless blocks — skip them
        if t.num_rows == 0 or "a" not in t.column_names:
            continue
        aa = t["a"].to_numpy().astype(np.int64)
        bb = t["b"].to_numpy().astype(np.int64)
        for a, b in zip(aa.tolist(), bb.tolist()):
            nodes.add(a)
            nodes.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = min(ra, rb), max(ra, rb)
                parent[hi] = lo
    ns = sorted(nodes)
    labs = [find(n) for n in ns]
    return pa.table({"node": pa.array(ns, pa.int64()),
                     "lab": pa.array(labs, pa.int64())})


def propagate_min_labels(edges: ray.data.Dataset,
                         max_rounds: int = 64,
                         num_partitions: int = 16,
                         task_threshold: int = 4_000_000) -> Optional[ray.data.Dataset]:
    """(a, b) edge Dataset -> (node, lab) Dataset where lab = min node id
    reachable in the pair graph.

    Hybrid physical plan keyed on the EDGE count (the dup subgraph, always
    far smaller than the corpus):

    - below ``task_threshold`` edges: one Ray task runs in-memory
      union-find over the edge blocks (O(edges) worker memory, O(1)
      driver) — real dedup pair graphs at test/bench scales converge in
      milliseconds here, where each distributed round costs seconds of
      fixed stage overhead;
    - above it: iterative label propagation as Dataset ops — per round,
      each edge endpoint's label is pushed to the other endpoint (cogroup
      join) plus one pointer-jumping step lab <- lab(lab) (path halving:
      O(log diameter) rounds — the standard MapReduce connected-components
      recipe, e.g. Kiveris et al., "Connected Components in MapReduce and
      Beyond", SoCC 2014).

    Driver memory is O(1) on BOTH paths: convergence is detected by the
    label SUM (labels only ever decrease, so the sum strictly decreases
    until fixpoint). Returns None for an empty edge set."""
    from ray.data.aggregate import Min

    from .joins import cogroup_join

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return None
    if n_edges <= task_threshold:
        refs = edges.to_arrow_refs()
        return ray.data.from_arrow_refs([_unionfind_task.remote(*refs)])

    # static bidirectional orientation table: one row per edge endpoint
    def orient_batch(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy().astype(np.int64)
        bb = b["b"].to_numpy().astype(np.int64)
        return pa.table({"node": pa.array(np.concatenate([a, bb])),
                         "nbr": pa.array(np.concatenate([bb, a]))})

    orient = edges.map_batches(orient_batch, batch_format="pyarrow",
                               batch_size=None) \
        .materialize()
    if orient.count() == 0:
        return None

    labels = orient.map_batches(
        lambda b: pa.table({"node": b["node"], "lab": b["node"]}),
        batch_format="pyarrow", batch_size=None) \
        .groupby("node").aggregate(Min("lab", alias_name="lab")).materialize()
    prev = int(labels.sum("lab"))

    # Each round's intermediates are materialized: they are label/message
    # tables over EDGE NODES only (object-store resident, spillable, far
    # smaller than the corpus), and Ray Data's streaming executor re-executes
    # lazy branches consumed by a union — composing the lazy cogroup joins
    # into one union stalls at small CPU counts (measured), while the
    # materialized round runs in seconds.
    for _ in range(max_rounds):
        # push lab(node) across every edge orientation: nbr receives lab
        push = cogroup_join(orient, labels, on="node",
                            num_partitions=num_partitions) \
            .map_batches(lambda t: pa.table({"node": t["nbr"],
                                             "lab": t["lab"]}),
                         batch_format="pyarrow",
                         batch_size=None).materialize()
        # pointer jump: lab <- lab(lab) (path halving)
        l2 = labels.map_batches(
            lambda t: pa.table({"node2": t["node"], "lab2": t["lab"]}),
            batch_format="pyarrow", batch_size=None)
        jump = cogroup_join(labels, l2, on="lab", right_on="node2",
                            num_partitions=num_partitions) \
            .map_batches(lambda t: pa.table({"node": t["node"],
                                             "lab": t["lab2"]}),
                         batch_format="pyarrow",
                         batch_size=None).materialize()
        # repartition bounds the label block count: without it the union's
        # block count compounds ~5x per round (measured 1->937 in 4 rounds)
        # and task overhead, not data, dominates
        labels = labels.union(push).union(jump) \
            .groupby("node").aggregate(Min("lab", alias_name="lab")) \
            .repartition(num_partitions).materialize()
        cur = int(labels.sum("lab"))
        if cur == prev:
            break
        prev = cur
    return labels


def cluster_assign(docs: ray.data.Dataset, edges: ray.data.Dataset,
                   id_col: str = "doc_id",
                   num_partitions: int = 16,
                   task_threshold: int = 4_000_000) -> ray.data.Dataset:
    """docs (id column) + verified near-dup pairs -> Dataset
    (doc_id, cluster_id, is_keeper). cluster_id = min reachable doc id;
    keeper = cluster min (first-per-group, SURVEY.md §2.6). No driver-side
    id or pair materialization: isolated docs get their own id via a
    union + Min aggregate, not a broadcast membership check."""
    from ray.data.aggregate import Min

    base = docs.map_batches(
        lambda b: pa.table({"node": b[id_col].cast(pa.int64()),
                            "lab": b[id_col].cast(pa.int64())}),
        batch_format="pyarrow", batch_size=None)
    labels = propagate_min_labels(edges, num_partitions=num_partitions,
                                  task_threshold=task_threshold)
    allr = base if labels is None else base.union(labels)
    # narrow (node, lab) rows: coalesce before the sort-based aggregate —
    # its scheduling cost scales with input block count
    full = allr.repartition(8) \
        .groupby("node").aggregate(Min("lab", alias_name="cluster_id"))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({"doc_id": b["node"],
                         "cluster_id": b["cluster_id"],
                         "is_keeper": pc.equal(b["node"], b["cluster_id"])})

    return full.map_batches(finish, batch_format="pyarrow",
                            batch_size=None)


def minhash_lsh_dedup(docs: ray.data.Dataset, *, n_perm: int = 64,
                      bands: int = 16, threshold: float = 0.7,
                      max_bucket: int = 64,
                      concurrency: Optional[int] = None) -> ray.data.Dataset:
    """-> Dataset (doc_id, cluster_id, is_keeper). Cluster id = min doc_id
    reachable through verified near-dup pairs; keeper = cluster min
    (first-per-group, the reference-free dedup rule of SURVEY.md §2.6).
    Pairs stay a Dataset end-to-end; cluster assembly is distributed
    min-label propagation (no doc ids or pairs on the driver)."""
    sig_rows = docs.map_batches(
        MinHasher(n_perm, bands), batch_format="pyarrow", batch_size=512,
        concurrency=concurrency)

    # NOTE: a native Dataset.join self-join was tried here and DEADLOCKS on
    # small clusters (HashShuffleAggregator actors starve the map tasks at
    # num_cpus=4). Buckets group under a HASH PARTITION of the bucket key
    # (one Python call per partition, not per bucket — map_groups dispatch
    # per bucket dominated the stage profile); the collision filter caps
    # buckets at max_bucket so no reducer sees a degenerate group.
    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_hash", "doc_id"], kind="stable")
        ck = g["band_id"].to_numpy().astype(np.int64) * np.int64(1 << 33) \
            + g["band_hash"].to_numpy().astype(np.int64)
        ids = g["doc_id"].to_numpy()
        sig_col = g["signature"].to_numpy()
        _, starts, counts = np.unique(ck, return_index=True,
                                      return_counts=True)
        out_a, out_b = [], []
        for s, c in zip(starts, counts):
            u, ui = np.unique(ids[s:s + c], return_index=True)
            if len(u) < 2 or len(u) > max_bucket:
                continue
            sigs = np.stack([np.frombuffer(sig_col[s + i], dtype=np.int64)
                             for i in ui])
            ii, jj = np.triu_indices(len(u), k=1)
            est = (sigs[ii] == sigs[jj]).mean(axis=1)
            keep = est >= threshold
            out_a.append(u[ii[keep]])
            out_b.append(u[jj[keep]])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    # No separate collision pre-filter: the partition-level reducer skips
    # singleton buckets for free (len<2 continue inside one Python call per
    # partition), so sig rows shuffle ONCE and are consumed once — two full
    # passes and a materialize cheaper than the count-then-filter plan the
    # per-bucket map_groups dispatch used to require. The max_bucket cap
    # still bounds degenerate buckets inside the reducer.
    # Duplicate (a, b) pairs from different bands are harmless to label
    # propagation (idempotent min), so no drop_duplicates pass either.
    edges = _partitioned_groups(sig_rows, ["band_id", "band_hash"]) \
        .map_groups(part_pairs, batch_format="pandas")
    return cluster_assign(docs.select_columns(["doc_id"]), edges)


from .joins import partitioned_groups as _partitioned_groups  # noqa: E402


def clusters_from_pairs(ids: np.ndarray,
                        pairs: list[tuple[int, int]]) -> pd.DataFrame:
    """Min-label union-find over an in-memory pair list — the NumPy oracle
    for cluster_assign (tests compare the distributed propagation against
    this); not used in any pipeline hot path."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    cluster = np.array([find(int(i)) for i in ids], dtype=np.int64)
    return pd.DataFrame({"doc_id": ids, "cluster_id": cluster,
                         "is_keeper": cluster == ids}).sort_values(
                             "doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SHIFTS64 = np.arange(64, dtype=np.uint64)
# cache stores the PACKED 8-byte hash (not the expanded 64-element sign
# vector): 1M entries is ~tens of MB per worker, not ~1 GB
_WORD_HASH_CACHE: dict[str, int] = {}


def _word_hash(w: str) -> int:
    h = _WORD_HASH_CACHE.get(w)
    if h is None:
        h = int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
        if len(_WORD_HASH_CACHE) < 1_000_000:  # bound worker memory
            _WORD_HASH_CACHE[w] = h
    return h


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (sign of per-bit weight sums).
    Bit expansion is vectorized over the whole doc (one (n_words, 64)
    unpack), not per word."""
    words = _WORD.findall(text.lower())
    if not words:
        return 0
    hs = np.fromiter((_word_hash(w) for w in words), dtype=np.uint64,
                     count=len(words))
    bits = (hs[:, None] >> _SHIFTS64[None, :]) & np.uint64(1)
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    v = int(np.bitwise_or.reduce(
        (np.uint64(1) << _SHIFTS64)[acc > 0]).item()) if (acc > 0).any() else 0
    return v - (1 << 64) if v >= (1 << 63) else v


class SimHasher:
    def __init__(self, bands: int = 4):
        self.bands = bands  # 4 x 16-bit bands -> catches Hamming <= 3 fully

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bid, bhash, sh = [], [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(),
                             batch["text"].to_pylist()):
            h = simhash64(text)
            hu = h & ((1 << 64) - 1)
            for bi in range(self.bands):
                ids.append(did)
                bid.append(bi)
                bhash.append((hu >> (bi * 16)) & 0xFFFF)
            sh.append(h)
        reps = np.repeat(np.arange(len(sh)), self.bands)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "band_id": pa.array(bid, pa.int32()),
            "band_hash": pa.array(bhash, pa.int64()),
            "simhash": pa.array([sh[i] for i in reps], pa.int64()),
        })


def simhash_dedup(docs: ray.data.Dataset, *, max_hamming: int = 3,
                  max_bucket: int = 256) -> ray.data.Dataset:
    """-> Dataset (doc_id, cluster_id, is_keeper); same distributed
    assembly as minhash_lsh_dedup."""
    from ..codecs import hamming64

    rows = docs.map_batches(SimHasher(), batch_format="pyarrow",
                            batch_size=512)

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band_id", "band_hash", "doc_id"], kind="stable")
        ck = g["band_id"].to_numpy().astype(np.int64) * np.int64(1 << 33) \
            + g["band_hash"].to_numpy().astype(np.int64)
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy()
        _, starts, counts = np.unique(ck, return_index=True,
                                      return_counts=True)
        out_a, out_b = [], []
        for s, c in zip(starts, counts):
            u, ui = np.unique(ids[s:s + c], return_index=True)
            if len(u) < 2 or len(u) > max_bucket:
                continue
            hu = hs[s:s + c][ui]
            ii, jj = np.triu_indices(len(u), k=1)
            keep = hamming64(hu[ii], hu[jj]) <= max_hamming
            out_a.append(u[ii[keep]])
            out_b.append(u[jj[keep]])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    edges = _partitioned_groups(rows, ["band_id", "band_hash"]) \
        .map_groups(part_pairs, batch_format="pandas")
    return cluster_assign(docs.select_columns(["doc_id"]), edges)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (verification kernel + standalone)
# ---------------------------------------------------------------------------

def jaccard_ngrams(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard."""
    wa = _WORD.findall(a.lower())
    wb = _WORD.findall(b.lower())
    sa = {tuple(wa[i:i + n]) for i in range(max(len(wa) - n + 1, 0))}
    sb = {tuple(wb[i:i + n]) for i in range(max(len(wb) - n + 1, 0))}
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


# ---------------------------------------------------------------------------
# embedding near-dup (cosine over hyperplane-LSH buckets)
# ---------------------------------------------------------------------------

def hyperplanes(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit LSH bucket ids: bit i = (v . plane_i) > 0. THE one
    definition — the dataset side (EmbeddingBucketer) and the query side
    (stages/ann.ann_lsh_topk) must bucket identically or LSH recall
    silently collapses to ~zero; never fork this (comparison direction,
    bit order and the hyperplane seed are all part of the contract)."""
    bits = (vecs @ planes.T) > 0
    out = np.zeros(len(vecs), dtype=np.int64)
    for i in range(planes.shape[0]):
        out |= bits[:, i].astype(np.int64) << i
    return out


class EmbeddingBucketer:
    """Actor-pool stage: embedding -> hyperplane sign bucket (state: the
    projection matrix, built once per actor)."""

    def __init__(self, dim: int = 64, n_bits: int = 8):
        self.planes = hyperplanes(dim, n_bits)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        bucket = bucket_of(vecs, self.planes)
        return pa.table({"vec_id": batch["vec_id"],
                         "bucket": pa.array(bucket),
                         "vec": pa.array([v.tobytes() for v in vecs],
                                         pa.large_binary())})


def embedding_near_dup(emb: ray.data.Dataset, *, threshold: float = 0.95,
                       n_bits: int = 8, dim: int = 64) -> ray.data.Dataset:
    """-> Dataset of (a, b, sim) pairs with cosine >= threshold found
    within LSH buckets (pairs STAY a Dataset — consumers aggregate or feed
    cluster_assign; nothing lands on the driver). Bucketed search trades
    recall for scale; the brute-force oracle (SQL) is the recall reference
    in tests. Cross-bucket duplicate pairs cannot occur (each vector has
    exactly one bucket)."""
    rows = emb.map_batches(EmbeddingBucketer(dim, n_bits),
                           batch_format="pyarrow", batch_size=1024)

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket", "vec_id"], kind="stable")
        bks = g["bucket"].to_numpy()
        ids = g["vec_id"].to_numpy()
        vec_col = g["vec"].to_numpy()
        _, starts, counts = np.unique(bks, return_index=True,
                                      return_counts=True)
        out_a, out_b, out_s = [], [], []
        for s, c in zip(starts, counts):
            u, ui = np.unique(ids[s:s + c], return_index=True)
            if len(u) < 2:
                continue
            mat = np.stack([np.frombuffer(vec_col[s + i], np.float64)
                            for i in ui])
            sims = mat @ mat.T
            ii, jj = np.triu_indices(len(u), k=1)
            keep = sims[ii, jj] >= threshold
            out_a.append(u[ii[keep]])
            out_b.append(u[jj[keep]])
            out_s.append(sims[ii, jj][keep])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "sim": pd.Series([], dtype=np.float64)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b),
                             "sim": np.concatenate(out_s)})

    return _partitioned_groups(rows, ["bucket"]).map_groups(
        part_pairs, batch_format="pandas")
