"""Dedup suite: minhash-LSH, simhash, n-gram Jaccard, embedding near-dup —
recall/precision against planted duplicates and brute-force oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gdal_drivers_ray.stages import dedup


def corpus_with_dups(n=120, seed=7):
    """Docs with planted near-duplicate groups: every 10th doc is a light
    edit of its predecessor group head."""
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron"]
    texts = []
    truth = []  # cluster head per doc
    for i in range(n):
        if i % 10 == 3 and i >= 10:
            base = texts[i - 10]
            words = base.split()
            j = rng.integers(0, len(words))
            words[j] = "edited"
            texts.append(" ".join(words))
            truth.append(i - 10 if truth[i - 10] == i - 10 else truth[i - 10])
        else:
            words = rng.choice(vocab, 30).tolist()
            texts.append(" ".join(words))
            truth.append(i)
    return texts, truth


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data
    texts, truth = corpus_with_dups()
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    return ray.data.from_arrow(t), texts, truth


def test_minhash_signature_estimates_jaccard():
    a, b = dedup._perm_params(256)
    s1 = dedup.shingle_hashes("the quick brown fox jumps over the lazy dog")
    s2 = dedup.shingle_hashes("the quick brown fox jumped over the lazy dog")
    sig1 = dedup.minhash_signature(s1, a, b)
    sig2 = dedup.minhash_signature(s2, a, b)
    est = (sig1 == sig2).mean()
    inter = len(np.intersect1d(s1, s2))
    true_j = inter / (len(s1) + len(s2) - inter)
    assert abs(est - true_j) < 0.15


def test_minhash_lsh_finds_planted_dups(docs_ds):
    ds, texts, truth = docs_ds
    out = dedup.minhash_lsh_dedup(ds, threshold=0.6).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    planted = [(i, truth[i]) for i in range(len(truth)) if truth[i] != i]
    assert planted
    found = sum(1 for i, h in planted if got[i] == got[h])
    assert found / len(planted) >= 0.9          # recall
    # precision: distinct random docs stay separate
    solo = [i for i in range(len(truth)) if truth[i] == i
            and all(t != i for t in truth[:i] + truth[i + 1:])]
    wrong = sum(1 for i in solo if got[i] != i and got[i] not in
                [j for j, h in planted if h == i])
    assert wrong <= len(solo) * 0.05


def test_simhash_dedup_exact_dup_and_threshold(ray_session):
    import ray.data
    base = "spark stream batch window join shuffle sort merge " * 4
    texts = [base, base, base + " extra", "completely different words here " * 5]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()), "text": pa.array(texts)}))
    out = dedup.simhash_dedup(ds, max_hamming=3).to_pandas()
    c = dict(zip(out["doc_id"], out["cluster_id"]))
    assert c[1] == c[0]            # exact dup (hamming 0)
    assert c[2] == 2               # " extra" flips 9 bits -> beyond 3, separate
    assert c[3] == 3               # distinct text stays alone
    # note: hamming-9 pairs are only found when a 16-bit band survives the
    # flips — banding guarantees recall for hamming <= bands-1 = 3 only


def test_simhash_is_deterministic():
    t = "hello world foo bar"
    assert dedup.simhash64(t) == dedup.simhash64(t)
    assert dedup.simhash64(t) != dedup.simhash64("entirely other content")


def test_jaccard_ngrams():
    assert dedup.jaccard_ngrams("a b c d e", "a b c d e") == 1.0
    assert dedup.jaccard_ngrams("a b c d e", "x y z w v") == 0.0
    j = dedup.jaccard_ngrams("a b c d e f", "a b c d e g")
    assert 0.3 < j < 0.9
    assert dedup.jaccard_ngrams("", "") == 1.0


def test_embedding_near_dup_vs_bruteforce(ray_session):
    import ray.data
    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 64))
    # plant near-dups: rows 40..49 are tiny perturbations of rows 0..9
    pert = base[:10] + 0.01 * rng.standard_normal((10, 64))
    mat = np.vstack([base, pert])
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in mat],
                              pa.list_(pa.float32())),
    }))
    got = dedup.embedding_near_dup(ds, threshold=0.95, n_bits=4).to_pandas()
    # brute-force oracle
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    m32 = m.astype(np.float32).astype(np.float64)  # storage round-trip
    m32 = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    sims = m32 @ m32.T
    ii, jj = np.triu_indices(50, k=1)
    want = {(int(a), int(b)) for a, b in zip(ii[sims[ii, jj] >= 0.95],
                                             jj[sims[ii, jj] >= 0.95])}
    got_pairs = {(int(a), int(b)) for a, b in zip(got["a"], got["b"])}
    assert got_pairs <= want                     # no false positives
    assert len(got_pairs) >= 0.8 * len(want)     # LSH recall
    assert len(want) >= 10


def test_clusters_from_pairs_transitive():
    out = dedup.clusters_from_pairs(np.arange(6),
                                    [(0, 1), (1, 2), (4, 5)])
    c = dict(zip(out["doc_id"], out["cluster_id"]))
    assert c[0] == c[1] == c[2] == 0
    assert c[3] == 3
    assert c[4] == c[5] == 4
    assert list(out[out["is_keeper"]]["doc_id"]) == [0, 3, 4]


def test_cluster_assign_matches_unionfind_oracle(ray_session):
    """Distributed min-label propagation == in-memory union-find on a graph
    with long chains (forces multiple propagation + pointer-jump rounds),
    a star, duplicate edges, and isolated nodes."""
    import ray.data
    n = 400
    ids = np.arange(n, dtype=np.int64)
    pairs = [(i, i + 1) for i in range(0, 16)]            # chain of 17
    pairs += [(100, j) for j in range(101, 120)]          # star
    pairs += [(200, 201), (201, 202), (200, 201)]         # duplicate edge
    pairs += [(300, 350), (350, 320), (320, 310)]         # zigzag
    docs = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array([a for a, _ in pairs], pa.int64()),
        "b": pa.array([b for _, b in pairs], pa.int64())}))
    want = dedup.clusters_from_pairs(ids, pairs)
    # both physical plans: single-task union-find (default threshold) and
    # the iterative dataset propagation (threshold 0 forces it)
    for threshold in (4_000_000, 0):
        got = dedup.cluster_assign(docs, edges,
                                   task_threshold=threshold).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        assert got["cluster_id"].tolist() == want["cluster_id"].tolist()
        assert got["is_keeper"].tolist() == want["is_keeper"].tolist()


def test_cluster_assign_no_edges(ray_session):
    import ray.data
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([5, 7, 9], pa.int64())}))
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))
    got = dedup.cluster_assign(docs, edges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["cluster_id"].tolist() == [5, 7, 9]
    assert got["is_keeper"].all()


def test_phash_dedup_finds_planted_duplicates(ray_session):
    """The fixture plants pixel duplicates every 97th row; exact phash
    dedup must group each with its source and keep the smaller index."""
    from gdal_drivers_ray.pipelines.dedup_queries import q_phash_dedup

    out = q_phash_dedup("/root/testdata/sf0.001").to_pandas()
    assert (out["n_copies"] > 1).all()
    # planted: img-97 duplicates img-0's pixels -> keeper idx 0 group holds
    # at least 2 copies
    keepers = set(out["keeper_idx"])
    assert 0 in keepers
