"""Text-analysis kernels: language ID, fingerprint, n-gram Jaccard."""

import numpy as np
import pytest

from gdal_drivers_ray.stages import text as T


def test_lang_id_real_sentences():
    assert T.lang_id("The cat sat on the mat and looked out of the window")[0] == "en"
    assert T.lang_id("Der Hund und die Katze sind nicht da, das ist gut")[0] == "de"
    assert T.lang_id("Le chat et les chiens sont dans une maison, c'est bon")[0] == "fr"
    assert T.lang_id("El perro y los gatos viven en una casa, es bonito")[0] == "es"


def test_lang_id_tie_breaks_lexicographically():
    # no marker words at all: every score 0 -> smallest code wins
    assert T.lang_id("xyzzy plugh")[0] == "de"


def test_lang_marker_count_non_overlapping():
    # ' a a a ' counts 2 under non-overlapping scan (matches SQL replace())
    assert T._count_word(" a a a ", "a") == 2
    # consecutive repeats share their delimiter space -> 2, same in SQL
    assert T._count_word(T.normalize_text("the the, THE"), "the") == 2
    # non-adjacent occurrences all count
    assert T._count_word(T.normalize_text("the cat the dog the"), "the") == 3


def test_fingerprint_deterministic_and_rolling():
    assert T.fingerprint("") == 0
    assert T.fingerprint("A") == 65
    assert T.fingerprint("AB") == 65 * 31 + 66
    # mod applied: long strings stay bounded
    big = T.fingerprint("x" * 10000)
    assert 0 <= big < T.FP_MOD
    assert T.fingerprint("hello world") != T.fingerprint("hello worlds")


def test_word_ngrams_and_jaccard():
    assert T.word_ngrams("a b c d", 3) == {"a b c", "b c d"}
    assert T.jaccard_ngrams_str("a b c d", "a b c d") == 1.0
    assert T.jaccard_ngrams_str("a b c", "x y z") == 0.0
    assert T.jaccard_ngrams_str("", "") == 1.0
    # punctuation/case normalization
    assert T.jaccard_ngrams_str("A, b! c", "a b c") == 1.0


def test_lang_id_batch_shape():
    import pandas as pd
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["the cat and the dog",
                                                  "der hund und die katze"]})
    out = T.lang_id_batch(df)
    assert list(out.columns) == ["doc_id", "pred_lang", "score"]
    assert out["pred_lang"].tolist() == ["en", "de"]
    assert out["score"].dtype == np.int64


def test_kmv_sketch_estimate_accuracy(ray_session):
    """KMV distinct estimate within ~15% of truth at k=256."""
    import duckdb

    from gdal_drivers_ray.pipelines.queries import q_distinct_sketch

    sf = "/root/testdata/sf0.01"
    est = q_distinct_sketch(sf).take_all()[0]["estimate"]
    true = duckdb.connect().execute(
        f"SELECT count(DISTINCT l_partkey) FROM "
        f"read_parquet('{sf}/lineitem.parquet')").fetchone()[0]
    assert abs(est - true) / true < 0.15, (est, true)


def test_broadcast_semi_anti_join_partition(ray_session):
    import numpy as np
    import ray.data

    from gdal_drivers_ray.stages.joins import broadcast_semi_join

    ds = ray.data.from_items([{"k": i, "v": i * 10} for i in range(100)])
    keys = np.array([3, 7, 7, 50, 99, 1000])   # dup + absent keys
    semi = broadcast_semi_join(ds, keys, "k").to_pandas()
    anti = broadcast_semi_join(ds, keys, "k", anti=True).to_pandas()
    assert sorted(semi["k"]) == [3, 7, 50, 99]
    # semi + anti partition the input exactly
    assert len(semi) + len(anti) == 100
    assert set(semi["k"]).isdisjoint(set(anti["k"]))
    # empty key set: semi empty, anti = everything
    assert broadcast_semi_join(ds, np.array([], np.int64), "k").count() == 0
    assert broadcast_semi_join(ds, np.array([], np.int64), "k",
                               anti=True).count() == 100


def test_decontaminate_planted_overlap(ray_session):
    import ray.data

    from gdal_drivers_ray.stages.text import decontaminate

    bench_text = "a b c d e f g h i j k l"        # doc 0: benchmark (0%97)
    rows = [
        {"doc_id": 0, "text": bench_text},
        # doc 1 embeds an 8-token window of the benchmark -> contaminated
        {"doc_id": 1, "text": "x y " + "c d e f g h i j" + " z"},
        # doc 2 shares only a 7-gram -> clean at n=8
        {"doc_id": 2, "text": "c d e f g h i q r s t u v w"},
        # doc 3 shares two distinct 8-gram windows
        {"doc_id": 3, "text": "a b c d e f g h i j"},
        # doc 4 too short for any 8-gram
        {"doc_id": 4, "text": "a b c"},
    ]
    out = decontaminate(ray.data.from_items(rows), bench_mod=97,
                        n=8).to_pandas().set_index("doc_id")
    assert 0 not in out.index                      # benchmark rows excluded
    assert out.loc[1, "n_shared"] == 1 and out.loc[1, "contaminated"]
    assert out.loc[2, "n_shared"] == 0 and not out.loc[2, "contaminated"]
    assert out.loc[3, "n_shared"] == 3             # windows at offsets 0,1,2
    assert out.loc[4, "n_shared"] == 0


def test_dup_window_counts_planted(ray_session):
    import ray.data

    from gdal_drivers_ray.stages.text import dup_window_counts

    shared = "p q r s t u v w"                      # one shared 8-gram
    rows = [
        {"doc_id": 10, "text": "a b c " + shared},  # 4 windows, 1 shared
        {"doc_id": 11, "text": shared + " z z2 z3"},  # 4 windows, 1 shared
        {"doc_id": 12, "text": "k l m n o k2 l2 m2 n2"},  # 2 windows, clean
        {"doc_id": 13, "text": "too short"},        # 0 windows
        # exact full duplicate pair: every window shared
        {"doc_id": 14, "text": "d1 d2 d3 d4 d5 d6 d7 d8 d9"},
        {"doc_id": 15, "text": "d1 d2 d3 d4 d5 d6 d7 d8 d9"},
    ]
    out = dup_window_counts(ray.data.from_items(rows), n=8) \
        .to_pandas().set_index("doc_id").sort_index()
    assert out.loc[10, "total_windows"] == 4
    assert out.loc[10, "dup_windows"] == 1
    assert out.loc[11, "dup_windows"] == 1
    assert out.loc[12, "dup_windows"] == 0
    assert out.loc[13, "total_windows"] == 0
    assert out.loc[14, "dup_windows"] == 2          # 9 tokens -> 2 windows
    assert out.loc[14, "total_windows"] == 2
    assert out.loc[15, "dup_windows"] == 2
    assert len(out) == 6                             # every doc keeps a row


def test_top_terms_planted(ray_session):
    import ray.data

    from gdal_drivers_ray.stages.text import top_terms

    rows = [
        {"doc_id": 0, "source": "s1", "text": "x x x y z"},
        {"doc_id": 1, "source": "s1", "text": "y y z"},
        {"doc_id": 2, "source": "s2", "text": "z z z y"},
    ]
    out = top_terms(ray.data.from_items(rows), k=2).to_pandas()
    s1 = out[out["source"] == "s1"].set_index("rank")
    # s1: tf(x)=3, tf(y)=3 -> tie breaks lexicographically: x then y
    assert s1.loc[1, "term"] == "x" and s1.loc[1, "tf"] == 3
    assert s1.loc[2, "term"] == "y" and s1.loc[2, "tf"] == 3
    # df is corpus-wide distinct-doc count
    assert s1.loc[1, "df"] == 1      # x appears only in doc 0
    assert s1.loc[2, "df"] == 3      # y appears in all three docs
    s2 = out[out["source"] == "s2"].set_index("rank")
    assert s2.loc[1, "term"] == "z" and s2.loc[1, "tf"] == 3
    assert s2.loc[1, "df"] == 3


def test_decontaminate_empty_benchmark(ray_session):
    import ray.data

    from gdal_drivers_ray.stages.text import decontaminate

    # no doc_id % 97 == 0 present -> empty gram set -> everything clean
    rows = [{"doc_id": i, "text": "a b c d e f g h i j"} for i in (1, 2, 3)]
    out = decontaminate(ray.data.from_items(rows), bench_mod=97,
                        n=8).to_pandas()
    assert len(out) == 3
    assert (out["n_shared"] == 0).all()
    assert (~out["contaminated"]).all()


def test_dup_window_counts_single_doc(ray_session):
    import ray.data

    from gdal_drivers_ray.stages.text import dup_window_counts

    out = dup_window_counts(
        ray.data.from_items([{"doc_id": 5,
                              "text": "a b c d e f g h i"}]),
        n=8).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["dup_windows"] == 0      # nothing to share with
    assert out.iloc[0]["total_windows"] == 2


def test_repetition_stats_planted(ray_session):
    import pyarrow as pa
    import ray.data

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "a b\na b\nc",      # dup line, dup-free tokens except a b
            "",                  # empty: one empty line, zero tokens
            "x\n\n\nx",          # empty lines are lines; dup x + dup ''
            "one two three",     # no newline: single line, unique tokens
        ]),
    }))
    out = {r["doc_id"]: r for r in
           T.repetition_stats(docs).take_all()}
    assert (out[1]["n_lines"], out[1]["n_uniq_lines"]) == (3, 2)
    assert (out[1]["n_tok"], out[1]["n_uniq_tok"]) == (5, 3)
    assert (out[2]["n_lines"], out[2]["n_uniq_lines"]) == (1, 1)
    assert (out[2]["n_tok"], out[2]["n_uniq_tok"]) == (0, 0)
    assert (out[3]["n_lines"], out[3]["n_uniq_lines"]) == (4, 2)
    assert (out[3]["n_tok"], out[3]["n_uniq_tok"]) == (2, 1)
    assert (out[4]["n_lines"], out[4]["n_tok"]) == (1, 3)


def test_pack_sequences_prefix_sum(ray_session):
    """Distributed bucket prefix sum == serial cumsum, across bucket
    boundaries, pack-spanning docs, and zero-token docs."""
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.stages.pack import pack_sequences

    rng = np.random.default_rng(3)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    texts = []
    for i in ids:
        if i % 97 == 0:
            texts.append("")                       # zero-token doc
        else:
            texts.append(" ".join("t" for _ in range(rng.integers(1, 40))))
    docs = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(ids), "text": pa.array(texts)})) \
        .repartition(7)   # block boundaries must not matter
    ctx = 64
    out = pack_sequences(docs, ctx=ctx, bucket_width=32) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    toks = np.array([len(t.split()) if t else 0 for t in texts])
    start = np.concatenate(([0], np.cumsum(toks)[:-1]))
    assert (out["n_tok"].to_numpy() == toks).all()
    assert (out["start_off"].to_numpy() == start).all()
    first = start // ctx
    last = (start + np.maximum(toks, 1) - 1) // ctx
    assert (out["first_pack"].to_numpy() == first).all()
    assert (out["last_pack"].to_numpy() == last).all()
    assert (out["n_packs"].to_numpy() == last - first + 1).all()
    # at least one doc genuinely spans a pack boundary in this fixture
    assert (out["n_packs"] > 1).any()


def test_pack_sequences_derived_bucket_width(ray_session):
    """Default bucket_width derives from max doc_id; result is identical
    to an explicit width (the prefix sum is width-invariant)."""
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.stages.pack import pack_sequences

    ids = np.arange(200, dtype=np.int64) * 7  # sparse, non-contiguous ids
    texts = [" ".join("w" for _ in range((int(i) % 13) + 1)) for i in ids]
    docs = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(ids), "text": pa.array(texts)}))
    a = pack_sequences(docs, ctx=32).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = pack_sequences(docs, ctx=32, bucket_width=11).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_term_topk_rejects_empty_source(ray_session):
    """An actually-empty source value collides with the df-partial
    sentinel and must be rejected up front, not silently merged."""
    import pyarrow as pa
    import pytest
    import ray.data

    from gdal_drivers_ray.stages.text import top_terms

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "source": pa.array(["web", ""], pa.string()),
        "text": pa.array(["a b", "c d"], pa.string())}))
    with pytest.raises(Exception, match="empty string"):
        top_terms(docs, k=2).to_pandas()


def test_dup_span_merge_planted(ray_session):
    """Closed-form planted spans (n=4): a shared 12-token run merges its
    9 duplicated windows into ONE span covering 12 tokens; two separated
    shared runs stay two spans; clean docs report (0, 0)."""
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.stages.text import dup_span_merge

    span_a = [f"A{i}" for i in range(12)]          # shared by docs 0, 1
    span_b = [f"B{i}" for i in range(6)]           # shared by docs 2, 3
    span_c = [f"C{i}" for i in range(5)]           # shared by docs 2, 3

    def filler(doc, lo, n):
        return [f"f{doc}_{lo + i}" for i in range(n)]

    docs = {
        0: filler(0, 0, 5) + span_a + filler(0, 5, 4),
        1: filler(1, 0, 3) + span_a + filler(1, 3, 6),
        # doc 2: two shared runs separated by >4 unique tokens -> 2 spans
        2: span_b + filler(2, 0, 7) + span_c + filler(2, 7, 2),
        3: filler(3, 0, 2) + span_b + filler(3, 2, 8) + span_c,
        4: filler(4, 0, 20),                       # clean
    }
    t = pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([" ".join(docs[d]) for d in sorted(docs)]),
    })
    out = dup_span_merge(ray.data.from_arrow(t).repartition(3), n=4,
                         num_partitions=4).to_pandas() \
        .sort_values("doc_id").set_index("doc_id")
    # docs 0/1: one maximal span of the full 12 shared tokens
    for d in (0, 1):
        assert out.loc[d, "n_spans"] == 1
        assert out.loc[d, "dup_tokens"] == 12
    # docs 2/3: span_b (6 tokens) and span_c (5 tokens), never merged
    for d in (2, 3):
        assert out.loc[d, "n_spans"] == 2
        assert out.loc[d, "dup_tokens"] == 11
    assert out.loc[4, "n_spans"] == 0 and out.loc[4, "dup_tokens"] == 0


def test_pii_scrub_planted(ray_session):
    """Planted PII closed forms: each kind redacts to its placeholder,
    counts are measured on the original text, and clean text passes
    through byte-identical."""
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.stages.text import pii_scrub

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "write to alice.smith+x@mail.example.org or bob@ex.io now",
            "call 415-555-0100 or +1 650.555.0199 today",
            "server at 10.0.0.1 and 192.168.100.200 are up",
            "nothing sensitive here at all",
        ]),
    })
    out = pii_scrub(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").set_index("doc_id")
    assert out.loc[0, "text_scrubbed"] == \
        "write to <EMAIL> or <EMAIL> now"
    assert out.loc[0, "n_emails"] == 2
    # "+1 650.555.0199": the +1 prefix is not part of the 3-3-4 shape,
    # so the match starts at 650
    assert out.loc[1, "text_scrubbed"] == "call <PHONE> or +1 <PHONE> today"
    assert out.loc[1, "n_phones"] == 2
    assert out.loc[2, "text_scrubbed"] == "server at <IP> and <IP> are up"
    assert out.loc[2, "n_ips"] == 2
    assert out.loc[3, "text_scrubbed"] == "nothing sensitive here at all"
    assert (out.loc[3, ["n_emails", "n_phones", "n_ips"]] == 0).all()


def test_unigram_surprisal_planted(ray_session):
    """Closed form on a planted corpus: rare tokens score T*1000//1 per
    occurrence, common ones T*1000//c — rare-vocab docs rank above
    common-vocab docs, and totals match exact integer arithmetic."""
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.stages.text import unigram_surprisal

    # corpus: 'the' x 6 (doc0: 3, doc1: 3), 'qux' x 1 (doc1), total T=7
    t = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["the the the", "the the qux the"]),
    })
    out = unigram_surprisal(ray.data.from_arrow(t).repartition(2)) \
        .to_pandas().sort_values("doc_id").set_index("doc_id")
    T = 7
    the = (T * 1000) // 6
    qux = (T * 1000) // 1
    assert out.loc[0, "n_tok"] == 3
    assert out.loc[0, "surprise"] == 3 * the
    assert out.loc[1, "n_tok"] == 4
    assert out.loc[1, "surprise"] == 3 * the + qux
    assert out.loc[1, "surprise"] > out.loc[0, "surprise"]


def test_cooccurrence_topk_planted(ray_session):
    """Closed form: 'a b a b' with window 2 -> pairs
    (a,b)x2 [offsets 1], (b,a)x1, (a,a)x1, (b,b)x1 [offset 2].
    Doc boundaries never pair; ranks tie-break lexicographically."""
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.stages.text import cooccurrence_topk

    docs = ray.data.from_arrow(pa.table({
        "text": pa.array(["a b a b", "z z"])}))
    out = cooccurrence_topk(docs, window=2, k=10).to_pandas()
    got = {(r.t1, r.t2): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("a", "a"): 1, ("b", "a"): 1,
                   ("b", "b"): 1, ("z", "z"): 1}
    # rank 1 = highest count; ties lexicographic
    assert out.iloc[0][["t1", "t2", "n"]].tolist() == ["a", "b", 2]
    assert list(out["rank"]) == list(range(1, len(out) + 1))


def test_cooccurrence_topk_block_invariant(ray_session):
    """Same corpus split across 1 vs 4 blocks -> identical top-k (the
    per-block partials must sum, not truncate, before selection)."""
    import pyarrow as pa
    import ray.data

    from gdal_drivers_ray.stages.text import cooccurrence_topk

    texts = [f"w{i % 5} w{(i + 1) % 5} w{i % 3} end" for i in range(40)]
    one = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    four = ray.data.from_arrow([
        pa.table({"text": pa.array(texts[i::4])}) for i in range(4)])
    a = cooccurrence_topk(one, window=3, k=7).to_pandas()
    b = cooccurrence_topk(four, window=3, k=7).to_pandas()
    assert a.values.tolist() == b.values.tolist()
