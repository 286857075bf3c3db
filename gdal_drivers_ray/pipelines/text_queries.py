"""Text-analysis queries over the documents table (SQL-checked).

Engine-side additions for training-data pipelines (no reference counterpart
— the reference has no text ops): language ID, document fingerprinting,
exact n-gram Jaccard. Each Ray pipeline has a DuckDB twin computing the
identical deterministic kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..stages import text as T


def _docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])


def q_lang_id(sf_dir: str) -> ray.data.Dataset:
    """Stopword-marker language ID per document: score each language's
    marker-word occurrence count, predict argmax (tie -> smallest code)."""
    return _docs(sf_dir).map_batches(T.lang_id_batch, batch_format="pandas")


def _sql_count(lang: str, w: str) -> str:
    n = f"' {w} '"
    return (f"CAST((length(p) - length(replace(p, {n}, ''))) "
            f"/ length({n}) AS BIGINT)")


def _sql_lang_score(lang: str) -> str:
    return " + ".join(_sql_count(lang, w) for w in T.LANG_MARKERS[lang])


SQL_LANG_ID = f"""
WITH norm AS (
  SELECT doc_id,
         ' ' || trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
             || ' ' AS p
  FROM documents
), scores AS (
  SELECT doc_id, lang, score FROM (
    {" UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS lang, {_sql_lang_score(lang)} AS score "
        "FROM norm"
        for lang in sorted(T.LANG_MARKERS))}
  )
), ranked AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang ASC) AS rn
  FROM scores
)
SELECT doc_id, lang AS pred_lang, score
FROM ranked WHERE rn = 1
"""


def q_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Polynomial rolling-hash fingerprint of each document's raw text."""
    return _docs(sf_dir).map_batches(T.fingerprint_batch,
                                     batch_format="pandas")


SQL_FINGERPRINT = f"""
SELECT doc_id,
       CASE WHEN length(text) = 0 THEN 0
            ELSE list_reduce(
                   list_transform(string_split(text, ''),
                                  c -> CAST(ord(c) AS BIGINT)),
                   (a, b) -> (a * {T.FP_BASE} + b) % {T.FP_MOD})
       END AS fp
FROM documents
"""


def q_jaccard_pairs(sf_dir: str) -> ray.data.Dataset:
    """Exact word-3-gram Jaccard on the deterministic candidate pair set
    (doc_id, doc_id+1) — the verification kernel the LSH dedup paths use
    (stages/dedup.py), surfaced SQL-checkably. Similarity in integer 1e-6
    units so the hash compare is exact."""
    docs = _docs(sf_dir)

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "grams": [sorted(T.word_ngrams(t, 3)) for t in df["text"]],
        })

    g = docs.map_batches(grams, batch_format="pandas")

    # self-join on consecutive ids: key each row to its pair id (a = even
    # anchor: pair (a, a+1) keyed by a). Every doc participates as left of
    # (id, id+1) and right of (id-1, id).
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        out_key = np.concatenate([ids, ids - 1])
        out_side = np.concatenate([np.zeros(len(ids), dtype=np.int8),
                                   np.ones(len(ids), dtype=np.int8)])
        out_grams = list(df["grams"]) * 2
        keep = out_key >= 0
        return pd.DataFrame({"pair_id": out_key[keep],
                             "side": out_side[keep],
                             "grams": [g for g, k in zip(out_grams, keep) if k]})

    def pair_jaccard(gr: pd.DataFrame) -> pd.DataFrame:
        if len(gr) != 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64),
                                 "sim_micro": pd.Series([], dtype=np.int64)})
        gr = gr.sort_values("side")
        sa = set(gr["grams"].iloc[0])
        sb = set(gr["grams"].iloc[1])
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        sim = 1.0 if union == 0 else inter / union
        pid = int(gr["pair_id"].iloc[0])
        return pd.DataFrame({"a": [pid], "b": [pid + 1],
                             "sim_micro": [int(np.floor(sim * 1_000_000))]})

    return g.map_batches(explode, batch_format="pandas") \
            .groupby("pair_id") \
            .map_groups(pair_jaccard, batch_format="pandas")


SQL_JACCARD_PAIRS = """
WITH toks AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents
), grams AS (
  SELECT doc_id,
         CASE WHEN length(w) < 3 THEN []
              ELSE list_distinct(list_transform(
                     range(1, length(w) - 1),
                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         END AS g
  FROM toks
)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(floor(CASE
         WHEN length(a.g) = 0 AND length(b.g) = 0 THEN 1.0
         ELSE CAST(length(list_intersect(a.g, b.g)) AS DOUBLE)
              / (length(a.g) + length(b.g)
                 - length(list_intersect(a.g, b.g)))
       END * 1000000) AS BIGINT) AS sim_micro
FROM grams a JOIN grams b ON b.doc_id = a.doc_id + 1
"""


def q_decontaminate(sf_dir: str) -> ray.data.Dataset:
    """Benchmark decontamination: distinct shared 8-gram counts of every
    non-benchmark document vs the benchmark slice (doc_id % 97 == 0)."""
    return T.decontaminate(_docs(sf_dir), bench_mod=97, n=8)


# The DuckDB twin re-derives the n-grams relationally: UNNEST a
# generate_series over each token list, slice 8-token windows, distinct
# the benchmark grams, and count distinct shared grams per document.
# string_split(text, ' ') == Python str.split(' ') including empty tokens.
SQL_DECONTAMINATE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, array_to_string(t[i.x:i.x + 7], ' ') AS g
  FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS i(x)
  WHERE len(t) >= 8
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0
), hits AS (
  SELECT gr.doc_id, count(DISTINCT gr.g) AS n_shared
  FROM grams gr JOIN bench USING (g)
  WHERE gr.doc_id % 97 <> 0
  GROUP BY gr.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
       coalesce(h.n_shared, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 97 <> 0
"""


def q_dup_spans(sf_dir: str) -> ray.data.Dataset:
    """Exact window-duplication profile: per document, distinct 8-gram
    windows shared with >= 1 other document + its total distinct windows."""
    return T.dup_window_counts(_docs(sf_dir), n=8)


SQL_DUP_SPANS = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i.x:i.x + 7], ' ') AS g
  FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS i(x)
  WHERE len(t) >= 8
), nd AS (
  SELECT g, count(DISTINCT doc_id) AS c FROM grams GROUP BY g
), hits AS (
  SELECT doc_id, count(*) AS dup_windows
  FROM grams JOIN nd USING (g) WHERE c >= 2 GROUP BY doc_id
), tot AS (
  SELECT doc_id, count(*) AS total_windows FROM grams GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.dup_windows, 0) AS BIGINT) AS dup_windows,
       CAST(coalesce(t2.total_windows, 0) AS BIGINT) AS total_windows
FROM documents d
LEFT JOIN hits h USING (doc_id)
LEFT JOIN tot t2 USING (doc_id)
"""


def q_unigram_surprisal(sf_dir: str) -> ray.data.Dataset:
    """Corpus-adaptive unigram surprisal score per document — the
    CCNet-style rarity/quality signal with an integer surrogate
    (stages/text.unigram_surprisal): term counts stay partitioned by
    term hash, never broadcast, never on the driver."""
    return T.unigram_surprisal(_docs(sf_dir))


SQL_UNIGRAM_SURPRISAL = """
WITH words AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
), cnt AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c FROM words GROUP BY term
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS t FROM words
)
SELECT w.doc_id,
       CAST(count(*) AS BIGINT) AS n_tok,
       CAST(sum((t.t * 1000) // c.c) AS BIGINT) AS surprise
FROM words w JOIN cnt c USING (term) CROSS JOIN tot t
GROUP BY w.doc_id
"""


def q_pii_scrub(sf_dir: str) -> ray.data.Dataset:
    """PII redaction over documents: emails/phones/IPv4 -> typed
    placeholders, with per-kind counts on the original text. Both sides
    are RE2 (Arrow kernels / DuckDB regexp_*), so every replacement
    boundary is pinned; planted-PII closed forms in tests/test_text.py."""
    return T.pii_scrub(_docs(sf_dir))


SQL_PII_SCRUB = f"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(
           text, '{T.PII_EMAIL}', '<EMAIL>', 'g'),
                 '{T.PII_PHONE}', '<PHONE>', 'g'),
                 '{T.PII_IP}', '<IP>', 'g') AS text_scrubbed,
       CAST(length(regexp_extract_all(text, '{T.PII_EMAIL}')) AS BIGINT)
           AS n_emails,
       CAST(length(regexp_extract_all(text, '{T.PII_PHONE}')) AS BIGINT)
           AS n_phones,
       CAST(length(regexp_extract_all(text, '{T.PII_IP}')) AS BIGINT)
           AS n_ips
FROM documents
"""


def q_dup_spans_merged(sf_dir: str) -> ray.data.Dataset:
    """Span-merged exact-substring profile (Lee et al. semantics): per
    document, the count of MAXIMAL duplicated token runs (8-gram windows
    shared with >= 1 other doc, merged when start gaps <= 8) and the
    total tokens those runs cover. Planted-span closed forms in
    tests/test_text.py::test_dup_span_merge_planted."""
    return T.dup_span_merge(_docs(sf_dir), n=8)


# Positional grams this time (no DISTINCT — every window position can be
# duplicated); islands via the gaps-and-islands window pattern: a new
# span starts when the gap between consecutive duplicated positions
# exceeds 8. Coverage of an island [first, last] is last - first + 8.
SQL_DUP_SPANS_MERGED = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, i.x AS pos, array_to_string(t[i.x:i.x + 7], ' ') AS g
  FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS i(x)
  WHERE len(t) >= 8
), nd AS (
  SELECT g, count(DISTINCT doc_id) AS c FROM grams GROUP BY g
), dupw AS (
  SELECT doc_id, pos FROM grams JOIN nd USING (g) WHERE c >= 2
), marked AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER w <= 8 THEN 0 ELSE 1 END AS brk
  FROM dupw WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), islands AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS isl
  FROM marked
), spans AS (
  SELECT doc_id, isl, max(pos) - min(pos) + 8 AS cover
  FROM islands GROUP BY doc_id, isl
), per_doc AS (
  SELECT doc_id, count(*) AS n_spans, sum(cover) AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def q_top_terms(sf_dir: str) -> ray.data.Dataset:
    """Vocabulary statistics: per-source top-5 terms by term frequency
    (tie -> lexicographic) with corpus-wide document frequencies."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "source"])
    return T.top_terms(docs, k=5)


SQL_TOP_TERMS = """
WITH words AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS tf
  FROM words GROUP BY source, term
), ranked AS (
  SELECT source, term, tf,
         row_number() OVER (PARTITION BY source
                            ORDER BY tf DESC, term ASC) AS rank
  FROM tf
), dfreq AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents)
  GROUP BY term
)
SELECT r.source, CAST(r.rank AS BIGINT) AS rank, r.term, r.tf,
       coalesce(d.df, 0) AS df
FROM ranked r LEFT JOIN dfreq d USING (term)
WHERE r.rank <= 5
"""


def q_repetition_stats(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style repetition signals: duplicate-line / duplicate-token
    counts per document as exact integers (stages.text.repetition_stats)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return T.repetition_stats(docs)


SQL_REPETITION_STATS = r"""
SELECT doc_id,
       CAST(length(string_split(text, chr(10))) AS BIGINT) AS n_lines,
       CAST(length(list_distinct(string_split(text, chr(10)))) AS BIGINT)
           AS n_uniq_lines,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
       CAST(length(list_distinct(regexp_extract_all(text, '\S+')))
           AS BIGINT) AS n_uniq_tok
FROM documents
"""


def q_pack_sequences(sf_dir: str) -> ray.data.Dataset:
    """LLM sequence packing (concat-and-chunk at ctx=2048): per doc the
    global token offset (distributed prefix sum over doc_id-range
    buckets) and the context windows it spans — the DuckDB twin
    recomputes the offsets with one window cumsum, so any drift in the
    bucket totals, the exclusive prefix, or the per-bucket cumsum
    hash-fails."""
    from ..stages.pack import pack_sequences

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return pack_sequences(docs, ctx=2048)


SQL_PACK_SEQUENCES = r"""
WITH t AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
  FROM documents
), c AS (
  SELECT doc_id, n_tok,
         CAST(coalesce(SUM(n_tok) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS start_off
  FROM t
)
SELECT doc_id, n_tok, start_off,
       start_off // 2048 AS first_pack,
       (start_off + greatest(n_tok, 1) - 1) // 2048 AS last_pack,
       (start_off + greatest(n_tok, 1) - 1) // 2048
           - start_off // 2048 + 1 AS n_packs
FROM c
"""


# ---------------------------------------------------------------------------
# data mixing: weighted source interleave + stratified sampling
# ---------------------------------------------------------------------------

_MIX_LCM = 12          # lcm of the weights 1..4 below
_MIX_HEAD = 1000


def _mix_weight_of(sources: list) -> np.ndarray:
    """Deterministic per-source mixing weight 1..4 (src<k> -> 1 + k%4):
    a stand-in for the published mixture table an LLM run ships."""
    return np.array([1 + int(s[3:]) % 4 for s in sources], dtype=np.int64)


def q_interleave_sources(sf_dir: str):
    """Weighted source interleaving (stride scheduling / WFQ virtual
    time): source src<k> at weight 1+k%4 emits its r-th document at
    virtual position (2r+1)/(2w). Ranks come from the distributed
    two-pass prefix sum (stages/mix.py); the schedule head is the only
    driver-side table (bounded at _MIX_HEAD rows)."""
    from ..stages.mix import interleave_schedule

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])
    sched = interleave_schedule(docs, part_col="source",
                                order_col="doc_id",
                                weight_of=_mix_weight_of,
                                weight_lcm=_MIX_LCM)

    def local_head(b: pa.Table) -> pa.Table:
        df = b.select(["doc_id", "source", "vpos"]).to_pandas()
        df = df.sort_values(["vpos", "source", "doc_id"],
                            kind="stable").head(_MIX_HEAD)
        return pa.Table.from_pandas(df, preserve_index=False)

    # head-N funnel instead of a global sort: <= N rows per BLOCK
    # (batch_size=None — the default 1024-row batches would keep ~98%
    # of every batch and defeat the funnel) merge in ONE reducer task
    # (the topk_orders pattern); the driver receives exactly N rows
    # regardless of corpus or block count
    head = sched.map_batches(local_head, batch_format="pyarrow",
                             batch_size=None) \
        .repartition(1) \
        .map_batches(local_head, batch_format="pyarrow",
                     batch_size=None).to_pandas()
    head["seq"] = np.arange(len(head), dtype=np.int64)
    return head[["seq", "doc_id", "source", "vpos"]]


SQL_INTERLEAVE_SOURCES = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS r,
         1 + (CAST(substring(source, 4) AS BIGINT) % 4) AS w
  FROM documents
), sched AS (
  SELECT doc_id, source, (2 * r + 1) * ({_MIX_LCM} // w) AS vpos
  FROM ranked
), head AS (
  SELECT doc_id, source, CAST(vpos AS BIGINT) AS vpos
  FROM sched ORDER BY vpos, source, doc_id LIMIT {_MIX_HEAD}
)
SELECT row_number() OVER (ORDER BY vpos, source, doc_id) - 1 AS seq,
       doc_id, source, vpos
FROM head
"""

_STRATA_PERMILLE = {"en": 100, "de": 300, "es": 500, "fr": 700, "zh": 900}


def q_stratified_sample(sf_dir: str) -> ray.data.Dataset:
    """Per-language deterministic down-sampling at published per-mille
    rates (the ablation-run discipline): keep iff
    (doc_id * 2654435761 mod 2^32) mod 1000 < rate(lang). Streaming
    filter, no shuffle."""
    from ..stages.mix import stratified_sample

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "source"])
    return stratified_sample(docs, stratum_col="lang", id_col="doc_id",
                             rates_permille=_STRATA_PERMILLE)


def _sql_stratified_sample() -> str:
    rates = " ".join(f"WHEN '{k}' THEN {v}"
                     for k, v in sorted(_STRATA_PERMILLE.items()))
    return f"""
SELECT doc_id, lang, source
FROM documents
WHERE (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 % 1000
      < CASE lang {rates} ELSE 0 END
"""


SQL_STRATIFIED_SAMPLE = _sql_stratified_sample()


def q_tfidf_top(sf_dir: str) -> ray.data.Dataset:
    """Per-source top-5 terms by the integer-exact tf-idf surrogate
    (score = tf * ((N*1000) // df)); the idf weighting forces a genuine
    vocabulary-sized tf x df equi-join on term (stages/text.tfidf_terms)
    before the per-source top-k."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "source"])
    return T.tfidf_terms(docs, k=5)


SQL_TFIDF_TOP = """
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
words AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT source, term, CAST(count(*) AS BIGINT) AS tf
  FROM words GROUP BY source, term
), dfreq AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents)
  GROUP BY term
), scored AS (
  SELECT tf.source, tf.term, tf.tf, d.df,
         tf.tf * ((n.n * 1000) // greatest(d.df, 1)) AS score
  FROM tf JOIN dfreq d USING (term) CROSS JOIN n
), ranked AS (
  SELECT source, term, tf, df, score,
         row_number() OVER (PARTITION BY source
                            ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT source, CAST(rank AS BIGINT) AS rank, term, tf, df,
       CAST(score AS BIGINT) AS score
FROM ranked WHERE rank <= 5
"""


_EPOCH = 3
_SHUF_HEAD = 500


def q_epoch_shuffle(sf_dir: str):
    """Deterministic epoch-3 global shuffle of orders (stages/mix.py
    epoch_shuffle): the schedule head pins the distributed sort's exact
    order against the SQL twin; only _SHUF_HEAD rows reach the driver."""
    from ..stages.mix import epoch_shuffle

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey"])
    head = epoch_shuffle(orders, id_col="o_orderkey", epoch=_EPOCH) \
        .limit(_SHUF_HEAD).to_pandas()
    head["seq"] = np.arange(len(head), dtype=np.int64)
    return head[["seq", "o_orderkey", "shuffle_key"]]


SQL_EPOCH_SHUFFLE = f"""
WITH h AS (
  SELECT o_orderkey,
         CAST((CAST(o_orderkey AS HUGEINT)
               * ((2654435761 * (2 * {_EPOCH} + 1)) % 4294967296))
              % 4294967296 AS BIGINT) AS shuffle_key
  FROM orders
), head AS (
  SELECT * FROM h ORDER BY shuffle_key, o_orderkey LIMIT {_SHUF_HEAD}
)
SELECT row_number() OVER (ORDER BY shuffle_key, o_orderkey) - 1 AS seq,
       o_orderkey, shuffle_key
FROM head
"""


def q_gopher_filter(sf_dir: str) -> ray.data.Dataset:
    """Gopher-rule quality filter (stages/text.gopher_filter): per-doc
    integer signals, per-rule booleans, composite keep verdict."""
    return T.gopher_filter(_docs(sf_dir))


SQL_GOPHER_FILTER = f"""
WITH sig AS (
  SELECT doc_id,
         CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(length(list_distinct(string_split(text, ' '))) AS BIGINT)
             AS n_uniq,
         CAST(strlen(text) - (length(string_split(text, ' ')) - 1)
              AS BIGINT) AS wchars
  FROM documents
), m AS (
  SELECT doc_id, n_tok,
         1000 * wchars // greatest(n_tok, 1) AS mean_wl_milli,
         1000 * n_uniq // greatest(n_tok, 1) AS uniq_permille
  FROM sig
)
SELECT doc_id, n_tok, mean_wl_milli, uniq_permille,
       (n_tok >= {T.GOPHER_MIN_TOK} AND n_tok <= {T.GOPHER_MAX_TOK})
           AS ok_len,
       (mean_wl_milli >= {T.GOPHER_MIN_MEAN_WL_MILLI}
        AND mean_wl_milli <= {T.GOPHER_MAX_MEAN_WL_MILLI}) AS ok_word_len,
       (uniq_permille >= {T.GOPHER_MIN_UNIQ_PERMILLE}) AS ok_uniq,
       ((n_tok >= {T.GOPHER_MIN_TOK} AND n_tok <= {T.GOPHER_MAX_TOK})
        AND (mean_wl_milli >= {T.GOPHER_MIN_MEAN_WL_MILLI}
             AND mean_wl_milli <= {T.GOPHER_MAX_MEAN_WL_MILLI})
        AND (uniq_permille >= {T.GOPHER_MIN_UNIQ_PERMILLE})) AS keep
FROM m
"""


def q_adaptive_cut(sf_dir: str) -> ray.data.Dataset:
    """Corpus-adaptive per-language median cut on document length
    (stages/mix.quantile_cut): phase 1 reduces to a bounded
    (lang, n_chars) count table, the driver derives each language's
    exact discrete median, phase 2 is one broadcast-threshold filter."""
    from ..stages.mix import quantile_cut

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])
    return quantile_cut(docs, stratum_col="lang", value_col="n_chars",
                        q=0.5)


SQL_ADAPTIVE_CUT = """
WITH thr AS (
  SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS threshold
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang, d.n_chars, t.threshold
FROM documents d JOIN thr t USING (lang)
WHERE d.n_chars >= t.threshold
"""


_SEARCH_TERMS = ["spark", "window"]


def q_text_search_indexed(sf_dir: str) -> ray.data.Dataset:
    """Persisted inverted-index retrieval (stages/textindex.py): build
    the term-hash-sharded postings index once next to the fixture cache
    (resume keeps shards), then answer a conjunctive query opening ONLY
    the shards the query terms hash to — partition pruning at the read,
    the ann_ivf_indexed discipline in the text domain. The SQL twin
    recomputes membership + relevance from the raw documents, so a stale
    or corrupt shard hash-fails."""
    import os

    from ..stages.textindex import build_text_index, search_text_index

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    idx_dir = f"/tmp/graft_fixtures/{sf_tag}/textindex_v1"
    # build ONCE: the _SUCCESS marker short-circuits the whole build
    # pipeline (otherwise every query run would pay the full corpus
    # tokenize + vocabulary exchange just to skip the file writes)
    if not os.path.exists(os.path.join(idx_dir, "_SUCCESS")):
        build_text_index(_docs(sf_dir), idx_dir, num_shards=32)
    return search_text_index(idx_dir, _SEARCH_TERMS, num_shards=32)


def _sql_text_search() -> str:
    conds = " AND ".join(
        f"list_contains(string_split(text, ' '), '{t}')"
        for t in sorted(set(_SEARCH_TERMS)))
    rel = " + ".join(
        f"length(list_filter(string_split(text, ' '), x -> x = '{t}'))"
        for t in sorted(set(_SEARCH_TERMS)))
    return f"""
SELECT doc_id, CAST({rel} AS BIGINT) AS relevance
FROM documents
WHERE {conds}
"""


SQL_TEXT_SEARCH_INDEXED = _sql_text_search()


_DOMAIN_CAP = 15


def q_domain_cap(sf_dir: str) -> ray.data.Dataset:
    """Per-domain document cap (the dataset-curation step that stops a
    single crawl domain from dominating the corpus): keep each source's
    first _DOMAIN_CAP documents by doc_id. Rank comes from the shared
    distributed prefix-sum primitive; the filter is a streaming map."""
    from ..stages.mix import distributed_rank

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "source"])
    ranked = distributed_rank(docs, part_col="source", order_col="doc_id")

    def cap(b: pa.Table) -> pa.Table:
        keep = b["rank"].to_numpy() < _DOMAIN_CAP
        return b.filter(pa.array(keep))

    return ranked.map_batches(cap, batch_format="pyarrow",
                              batch_size=None)


SQL_DOMAIN_CAP = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1
             AS rank
  FROM documents
)
SELECT doc_id, source, rank FROM ranked WHERE rank < {_DOMAIN_CAP}
"""


def q_curation_pipeline(sf_dir: str) -> ray.data.Dataset:
    """End-to-end corpus curation — the composition showcase: Gopher
    quality filter -> exact dedup (keep min doc_id per 40-char content
    key) -> per-language stratified sample -> per-source corpus stats.
    Every stage is the engine's own op (stages/text.gopher_filter,
    groupby-Min keeper semantics of dedup_exact, stages/mix.
    stratified_sample); the SQL twin composes the same four stages, so
    a drift in ANY stage or in how they chain hash-fails."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    from ..stages.mix import stratified_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"])

    # stage 1: quality filter — the same integer signals and thresholds
    # as stages/text.gopher_filter (the shared vectorized kernel), fused
    # with the projection so text is read exactly once
    def quality(b: pa.Table) -> pa.Table:
        n_tok, n_uniq, wchars = T.token_signals(b["text"])
        mean_wl = 1000 * wchars // np.maximum(n_tok, 1)
        uniq_pm = 1000 * n_uniq // np.maximum(n_tok, 1)
        keep = (n_tok >= T.GOPHER_MIN_TOK) & (n_tok <= T.GOPHER_MAX_TOK) \
            & (mean_wl >= T.GOPHER_MIN_MEAN_WL_MILLI) \
            & (mean_wl <= T.GOPHER_MAX_MEAN_WL_MILLI) \
            & (uniq_pm >= T.GOPHER_MIN_UNIQ_PERMILLE)
        out = b.filter(pa.array(keep))
        return pa.table({
            "doc_id": out["doc_id"],
            "lang": out["lang"],
            "source": out["source"],
            "content_key": pc.utf8_slice_codeunits(out["text"], 0, 40),
        })

    kept = docs.map_batches(quality, batch_format="pyarrow",
                            batch_size=None)

    # stage 2: exact dedup — keeper = min doc_id per content key; carry
    # lang/source via a keyed reduce (Min doc_id picks the keeper row)
    keepers = kept.groupby("content_key").aggregate(
        Min("doc_id", alias_name="doc_id"))
    # rejoin the keeper's attributes (semi-join on keeper ids — the key
    # set is corpus-bounded but the gate corpus is small; at scale this
    # is the cogroup path)
    # rejoin keeper attributes through the cogroup exchange — the keeper
    # id set is distinct-content-key-sized (grows with the corpus), so it
    # must NEVER collect to the driver; keeper ids are unique by
    # construction (one Min per content key), so the inner merge is a
    # semi-join
    from ..stages.joins import cogroup_join

    surv = cogroup_join(
        kept.map_batches(lambda b: b.drop_columns(["content_key"]),
                         batch_format="pyarrow", batch_size=None),
        keepers.select_columns(["doc_id"]), on="doc_id", how="inner")

    # stage 3: per-language stratified sample (shared rates table)
    samp = stratified_sample(surv, stratum_col="lang", id_col="doc_id",
                             rates_permille=_STRATA_PERMILLE)

    # stage 4: per-source corpus stats
    def ones(b: pa.Table) -> pa.Table:
        return pa.table({"source": b["source"],
                         "n": pa.array(np.ones(b.num_rows, np.int64)),
                         "id_sum": b["doc_id"]})

    return samp.map_batches(ones, batch_format="pyarrow",
                            batch_size=None) \
        .groupby("source").aggregate(Sum("n", alias_name="n_docs"),
                                     Sum("id_sum", alias_name="id_sum"))


def _sql_curation_pipeline() -> str:
    rates = " ".join(f"WHEN '{k}' THEN {v}"
                     for k, v in sorted(_STRATA_PERMILLE.items()))
    return f"""
WITH sig AS (
  SELECT doc_id, lang, source, substring(text, 1, 40) AS content_key,
         CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tok,
         CAST(length(list_distinct(string_split(text, ' '))) AS BIGINT)
             AS n_uniq,
         CAST(strlen(text) - (length(string_split(text, ' ')) - 1)
              AS BIGINT) AS wchars
  FROM documents
), kept AS (
  SELECT doc_id, lang, source, content_key
  FROM sig
  WHERE n_tok BETWEEN {T.GOPHER_MIN_TOK} AND {T.GOPHER_MAX_TOK}
    AND (1000 * wchars // greatest(n_tok, 1))
        BETWEEN {T.GOPHER_MIN_MEAN_WL_MILLI} AND {T.GOPHER_MAX_MEAN_WL_MILLI}
    AND (1000 * n_uniq // greatest(n_tok, 1))
        >= {T.GOPHER_MIN_UNIQ_PERMILLE}
), dedup AS (
  SELECT doc_id, lang, source FROM (
    SELECT *, row_number() OVER (PARTITION BY content_key
                                 ORDER BY doc_id) AS rn
    FROM kept) WHERE rn = 1
), samp AS (
  SELECT * FROM dedup
  WHERE (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296 % 1000
        < CASE lang {rates} ELSE 0 END
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM samp GROUP BY source
"""


SQL_CURATION_PIPELINE = _sql_curation_pipeline()


def q_cooc_top(sf_dir: str):
    """Global top-50 windowed token co-occurrence pairs (stages/text.py
    cooccurrence_topk — the GloVe/PMI corpus-statistics pass): one
    pair-vocabulary exchange of per-block pre-aggregated counts, then a
    local-head funnel; the driver receives exactly k rows."""
    from ..stages.text import cooccurrence_topk

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["text"])
    return cooccurrence_topk(docs, window=3, k=50)


SQL_COOC_TOP = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS t,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), pairs AS (
  SELECT a.t AS t1, b.t AS t2, count(*) AS n
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 3
  GROUP BY 1, 2
), ranked AS (
  SELECT t1, t2, CAST(n AS BIGINT) AS n,
         row_number() OVER (ORDER BY n DESC, t1, t2) AS rank
  FROM pairs)
SELECT CAST(rank AS BIGINT) AS rank, t1, t2, n
FROM ranked WHERE rank <= 50 ORDER BY rank
"""
