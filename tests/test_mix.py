"""Data-mixing ops: distributed rank, weighted interleave, stratified
sampling."""

import numpy as np
import pyarrow as pa
import ray.data

from gdal_drivers_ray.stages import mix as M


def _table(n=300, n_parts=4, seed=5):
    rng = np.random.default_rng(seed)
    ids = rng.permutation(n).astype(np.int64)  # unique, shuffled order col
    parts = np.array([f"p{int(i) % n_parts}" for i in rng.integers(
        0, n_parts * 3, n)])
    return pa.table({"id": pa.array(ids), "part": pa.array(parts)})


def test_distributed_rank_matches_argsort(ray_session):
    t = _table()
    ds = ray.data.from_arrow(t).repartition(6)
    out = M.distributed_rank(ds, part_col="part", order_col="id",
                             n_range_buckets=5).to_pandas()
    for part, g in out.groupby("part"):
        g = g.sort_values("id")
        assert (g["rank"].to_numpy() == np.arange(len(g))).all()
    assert len(out) == t.num_rows
    assert "_rb" not in out.columns


def test_interleave_exact_virtual_time(ray_session):
    """3 sources at weights 1/2/3: the schedule head must follow the WFQ
    virtual-finish order ((2r+1)/2w), verified against an explicit merge."""
    rows = []
    for s, n in (("a", 30), ("b", 30), ("c", 30)):
        for r in range(n):
            rows.append({"part": s, "id": len(rows)})
    ds = ray.data.from_items(rows).repartition(4)
    W = {"a": 1, "b": 2, "c": 3}
    sched = M.interleave_schedule(
        ds, part_col="part", order_col="id",
        weight_of=lambda ps: np.array([W[p] for p in ps]),
        weight_lcm=6, n_range_buckets=3).to_pandas() \
        .sort_values(["vpos", "part", "id"]).reset_index(drop=True)
    # explicit in-memory schedule
    want = []
    for s, n in (("a", 30), ("b", 30), ("c", 30)):
        for r in range(n):
            want.append(((2 * r + 1) * (6 // W[s]), s))
    want.sort()
    got = list(zip(sched["vpos"].tolist(), sched["part"].tolist()))
    assert got == want
    # weights realized in any long prefix: c appears 3x as often as a
    head = sched.head(60)["part"].value_counts()
    assert head["c"] == 3 * head["a"]
    assert head["b"] == 2 * head["a"]


def test_interleave_rejects_bad_lcm(ray_session):
    ds = ray.data.from_items([{"part": "a", "id": 1}])
    import pytest
    with pytest.raises(Exception, match="weight_lcm"):
        M.interleave_schedule(
            ds, part_col="part", order_col="id",
            weight_of=lambda ps: np.array([5] * len(ps)),
            weight_lcm=12).materialize()


def test_stratified_sample_deterministic(ray_session):
    ids = np.arange(2000, dtype=np.int64)
    strata = np.where(ids % 2 == 0, "hi", "lo")
    t = pa.table({"id": pa.array(ids), "s": pa.array(strata)})
    ds = ray.data.from_arrow(t).repartition(5)
    out = M.stratified_sample(ds, stratum_col="s", id_col="id",
                              rates_permille={"hi": 800, "lo": 100}) \
        .to_pandas()
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(1 << 32) % np.uint64(1000)
    keep = np.where(strata == "hi", h < 800, h < 100)
    assert sorted(out["id"]) == sorted(ids[keep].tolist())
    # unknown strata drop by default
    out2 = M.stratified_sample(ds, stratum_col="s", id_col="id",
                               rates_permille={"hi": 800}).to_pandas()
    assert (out2["s"] == "hi").all()
    # rates are rate-accurate within binomial noise
    frac_hi = (out["s"] == "hi").sum() / (strata == "hi").sum()
    assert 0.74 < frac_hi < 0.86


def test_tfidf_terms_matches_in_memory(ray_session):
    """Distributed tf x df join + integer idf == straight-line pandas."""
    import pandas as pd
    from gdal_drivers_ray.stages.text import tfidf_terms

    docs = [
        ("s1", "the cat sat on the mat"),
        ("s1", "the dog sat"),
        ("s2", "a cat and a dog"),
        ("s2", "the mat"),
        ("s2", "unique words only here"),
    ]
    ds = ray.data.from_items(
        [{"doc_id": i, "source": s, "text": t}
         for i, (s, t) in enumerate(docs)]).repartition(3)
    got = tfidf_terms(ds, k=3).to_pandas() \
        .sort_values(["source", "rank"]).reset_index(drop=True)

    n = len(docs)
    tf = {}
    df = {}
    for _, (s, t) in enumerate(docs):
        ws = t.split(" ")
        for w in ws:
            tf[(s, w)] = tf.get((s, w), 0) + 1
        for w in set(ws):
            df[w] = df.get(w, 0) + 1
    rows = [{"source": s, "term": w, "tf": c, "df": df[w],
             "score": c * ((n * 1000) // df[w])}
            for (s, w), c in tf.items()]
    want = pd.DataFrame(rows)
    want = want.sort_values(["source", "score", "term"],
                            ascending=[True, False, True], kind="stable") \
        .groupby("source").head(3).reset_index(drop=True)
    want["rank"] = want.groupby("source").cumcount() + 1
    want = want[["source", "rank", "term", "tf", "df", "score"]]
    pd.testing.assert_frame_equal(
        got.astype({"tf": "int64", "df": "int64", "score": "int64"}),
        want.astype({"tf": "int64", "df": "int64", "score": "int64"}))


def test_quantile_cut_matches_quantile_disc(ray_session):
    """Two-phase adaptive cut == DuckDB quantile_disc semantics
    (sorted[floor(q*(n-1))]) per stratum, verified in-memory."""
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 50, 400).astype(np.int64)
    strata = np.array(["x", "y", "z"])[rng.integers(0, 3, 400)]
    t = pa.table({"id": pa.array(np.arange(400, dtype=np.int64)),
                  "s": pa.array(strata), "v": pa.array(vals)})
    out = M.quantile_cut(ray.data.from_arrow(t).repartition(6),
                         stratum_col="s", value_col="v", q=0.25) \
        .to_pandas()
    for s in ("x", "y", "z"):
        sv = np.sort(vals[strata == s])
        thr = sv[int(np.floor(0.25 * (len(sv) - 1)))]
        got = out[out["s"] == s]
        assert (got["threshold"] == thr).all()
        want_ids = set(np.arange(400)[(strata == s) & (vals >= thr)])
        assert set(got["id"]) == want_ids


def test_epoch_shuffle_deterministic_and_epoch_dependent(ray_session):
    t = pa.table({"id": pa.array(np.arange(100, dtype=np.int64))})
    a = M.epoch_shuffle(ray.data.from_arrow(t).repartition(4),
                        id_col="id", epoch=1).to_pandas()["id"].tolist()
    b = M.epoch_shuffle(ray.data.from_arrow(t).repartition(7),
                        id_col="id", epoch=1).to_pandas()["id"].tolist()
    c = M.epoch_shuffle(ray.data.from_arrow(t),
                        id_col="id", epoch=2).to_pandas()["id"].tolist()
    assert a == b            # block layout cannot change the order
    assert a != c            # a different epoch reshuffles
    assert sorted(a) == list(range(100))


def test_bloom_semi_join_exact_and_prefilter_effective(ray_session):
    """Result equals the exact semi-join; the bloom prefilter really
    prunes (measured on a disjoint-key majority)."""
    from gdal_drivers_ray.stages.joins import (_bloom_positions,
                                               bloom_semi_join)

    rng = np.random.default_rng(8)
    left = pa.table({"k": pa.array(rng.integers(0, 10000, 5000)
                                   .astype(np.int64)),
                     "v": pa.array(np.arange(5000, dtype=np.int64))})
    right = pa.table({"k": pa.array(
        np.repeat(rng.choice(10000, 300, replace=False).astype(np.int64),
                  2))})   # duplicated right keys must NOT duplicate left
    # tiny bitmap: false-positive-heavy AND same-byte-collision-heavy —
    # the exact verify must absorb the FPs and the bitmap build must not
    # produce false negatives
    out = bloom_semi_join(ray.data.from_arrow(left).repartition(4),
                          ray.data.from_arrow(right).repartition(3),
                          on="k", m_bits=1 << 10).to_pandas()
    rset = set(right["k"].to_pylist())
    want = left.to_pandas()[[k in rset for k in left["k"].to_pylist()]]
    got = out.sort_values(["k", "v"]).reset_index(drop=True)
    want = want.sort_values(["k", "v"]).reset_index(drop=True)
    assert got["k"].tolist() == want["k"].tolist()
    assert got["v"].tolist() == want["v"].tolist()
    # bitmap math: a key set in the filter always probes positive —
    # use a SMALL bitmap so same-byte collisions are guaranteed (the
    # fancy-index |= construction this pins against silently dropped
    # duplicate byte writes, i.e. bloom false negatives)
    m, k = 1 << 10, 4
    bm = np.zeros(m // 8, dtype=np.uint8)
    keys = np.arange(7000, dtype=np.int64)
    for pos in _bloom_positions(keys, m, k):
        np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    probe = np.ones(len(keys), dtype=bool)
    for pos in _bloom_positions(keys, m, k):
        probe &= (bm[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    assert probe.all()    # no false negatives, ever


def test_bloom_semi_join_empty_right(ray_session):
    """A semi-join against an empty right side (here: emptied by an
    upstream filter, so Ray skips the bitmap UDFs on every block) returns
    an empty dataset with the left schema instead of crashing."""
    from gdal_drivers_ray.stages.joins import bloom_semi_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(100, dtype=np.int64)),
        "v": pa.array(np.arange(100, dtype=np.int64))}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(50, dtype=np.int64))})) \
        .filter(lambda r: False)
    out = bloom_semi_join(left, right, on="k")
    assert out.count() == 0
    assert set(out.schema().names) == {"k", "v"}


def test_bloom_semi_join_reads_right_once(ray_session):
    """The round-5 single-pass build: the right input's blocks are scanned
    exactly once (the bitmap funnel and the distinct-key side both derive
    from the same materialized narrow key stream)."""
    from gdal_drivers_ray.stages.joins import bloom_semi_join

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def bump(self, k: int) -> None:
            self.n += k

        def get(self) -> int:
            return self.n

    c = Counter.remote()

    def spy(b: pa.Table) -> pa.Table:
        ray.get(c.bump.remote(b.num_rows))
        return b

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(200, dtype=np.int64))})).repartition(4)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(0, 400, 2, dtype=np.int64))})) \
        .repartition(4) \
        .map_batches(spy, batch_format="pyarrow", batch_size=None)
    out = bloom_semi_join(left, right, on="k").to_pandas()
    assert sorted(out["k"].tolist()) == list(range(0, 200, 2))
    assert ray.get(c.get.remote()) == 200   # 200 right rows, seen once


def test_distributed_rank_empty_input(ray_session):
    """Empty input short-circuits (ds.max() is None) to an empty ranked
    output instead of a TypeError."""
    from gdal_drivers_ray.stages.mix import distributed_rank

    ds = ray.data.from_arrow(pa.table({
        "p": pa.array([], pa.string()),
        "o": pa.array([], pa.int64())}))
    out = distributed_rank(ds, part_col="p", order_col="o")
    assert out.count() == 0


def test_pack_sequences_empty_corpus(ray_session):
    """An empty corpus packs to an empty result (derived bucket width has
    no max doc_id to derive from)."""
    from gdal_drivers_ray.stages.pack import pack_sequences

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    out = pack_sequences(ds, ctx=16)
    assert out.count() == 0
    assert "n_packs" in out.schema().names


def test_stratified_sample_null_stratum(ray_session):
    """A null stratum samples at the default rate instead of crashing."""
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.stages.mix import stratified_sample

    t = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                  "source": pa.array(
                      [None if i % 2 else "a" for i in range(100)])})
    out = stratified_sample(ray.data.from_arrow(t), stratum_col="source",
                            id_col="doc_id",
                            rates_permille={"a": 1000},
                            default_permille=0).to_pandas()
    # all kept rows are stratum 'a' (nulls got the 0 default)
    assert (out["source"] == "a").all()
    assert len(out) == 50


def test_distributed_rank_empty_schema(ray_session):
    """Empty input returns an empty dataset WITH the rank column (Ray
    skips map UDFs on empty blocks, so this must be built explicitly)."""
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.stages.mix import distributed_rank

    empty = ray.data.from_arrow(pa.table({
        "source": pa.array([], pa.string()),
        "doc_id": pa.array([], pa.int64())}))
    out = distributed_rank(empty, part_col="source", order_col="doc_id")
    assert out.count() == 0
    assert "rank" in out.schema().names
    # downstream ops on the rank column work on the empty result
    assert out.sort("rank").count() == 0


def test_quantile_cut_null_stratum_raises(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from gdal_drivers_ray.stages.mix import quantile_cut

    t = pa.table({"source": pa.array(["a", None, "a", "a"]),
                  "v": pa.array([1, 2, 3, 4], pa.int64())})
    with pytest.raises(Exception, match="null stratum|threshold"):
        quantile_cut(ray.data.from_arrow(t), stratum_col="source",
                     value_col="v", q=0.5).take_all()
