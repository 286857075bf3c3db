"""Text-analysis kernels for training-data pipelines.

No counterpart exists in the reference (it has no text ops); these are the
engine-side additions a 100 TB training-data pipeline needs (brief: language
ID, quality scoring, token counting, fingerprinting). All kernels are
deterministic and SQL-expressible so the DuckDB oracle can verify them
row-for-row.

Scale notes: every kernel is per-row pure (no shuffle); they run inside
`map_batches` with compiled regexes held at module level (compiled once per
worker process import — the T6 warm-state pattern). Language markers are a
tiny constant table, baked into the task closure (broadcast-equivalent).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# classic stopword-marker language ID: score(lang) = total occurrences of the
# lang's marker words (surrounded by non-word chars); predict argmax, ties ->
# lexicographically smallest language code. Deterministic; mirrors the SQL
# oracle exactly.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "und", "die", "nicht", "ist"),
    "en": ("the", "and", "of", "is", "a"),
    "es": ("el", "que", "los", "una", "es"),
    "fr": ("le", "et", "les", "une", "est"),
}

FP_MOD = 2147483647  # 2^31 - 1
FP_BASE = 31


def token_signals(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized per-doc token signals over the engine-wide single-space
    split: ``(n_tok, n_uniq, wchars)`` as int64 arrays. Semantics are
    bit-identical to the former per-row loop (``t.split(" ")`` — Arrow's
    split_pattern produces the same empty-token behavior on consecutive
    separators, and utf8_length counts code points like Python len):
    the whole batch is one split kernel + one dictionary-encode (C++
    hashing) + one np.unique over (doc, token-code) pairs — no Python
    per row. At text-corpus scale this family is the dominant CPU, so
    the per-batch cost being three vectorized kernels (not a Python
    loop) is the difference between compute-bound and interpreter-bound
    workers."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lst = pc.split_pattern(texts, " ")
    n_tok = pc.list_value_length(lst).to_numpy().astype(np.int64)
    wchars = pc.utf8_length(texts).to_numpy().astype(np.int64) \
        - (n_tok - 1)
    n_uniq = _uniq_per_parent(lst.flatten(), n_tok)
    return n_tok, n_uniq, wchars


def _uniq_per_parent(flat, counts: np.ndarray) -> np.ndarray:
    """Distinct-element count per parent list, vectorized: one
    dictionary-encode (C++ hashing) + one np.unique over (parent,
    element-code) integer pairs. `flat` is the flattened element array,
    `counts` the per-parent lengths."""
    import pyarrow.compute as pc

    if len(flat) == 0:
        return np.zeros(len(counts), np.int64)
    codes = pc.dictionary_encode(flat).indices.to_numpy().astype(np.int64)
    parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    m = codes.max() + 1
    pairs = np.unique(parent * m + codes)
    return np.bincount(pairs // m, minlength=len(counts)).astype(np.int64)


def _count_word(padded: str, w: str) -> int:
    """Occurrences of ` w ` in an already space-padded, lowercased,
    non-word-collapsed string. str.count is non-overlapping left-to-right,
    which is exactly the replace()-based count the SQL twin computes —
    adjacent repeats like ` a a a ` count 2 in both."""
    return padded.count(f" {w} ")


_NONWORD = re.compile(r"[^a-z0-9]+")


def normalize_text(text: str) -> str:
    """lowercase, collapse all non-alphanumeric runs to single spaces, pad."""
    return " " + _NONWORD.sub(" ", text.lower()).strip() + " "


def lang_scores(text: str) -> dict[str, int]:
    padded = normalize_text(text)
    return {lang: sum(_count_word(padded, w) for w in ws)
            for lang, ws in LANG_MARKERS.items()}


def lang_id(text: str) -> tuple[str, int]:
    """-> (predicted language, score). Argmax, tie -> smallest code."""
    scores = lang_scores(text)
    best = max(sorted(scores), key=lambda k: scores[k])
    return best, scores[best]


def fingerprint(text: str) -> int:
    """Polynomial rolling hash of the raw character codepoints.

    h = c0; h = (h*31 + ci) % (2^31-1). Empty text -> 0. Matches the DuckDB
    list_reduce twin exactly."""
    h = 0
    first = True
    for ch in text:
        c = ord(ch)
        h = c if first else (h * FP_BASE + c) % FP_MOD
        first = False
    return h


_WORD = re.compile(r"[a-z0-9]+")


def word_ngrams(text: str, n: int = 3) -> set[str]:
    """Distinct space-joined word n-grams of the normalized text."""
    ws = _WORD.findall(text.lower())
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def jaccard_ngrams_str(a: str, b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard on string grams (SQL-twin form)."""
    sa, sb = word_ngrams(a, n), word_ngrams(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def lang_id_batch(df: pd.DataFrame) -> pd.DataFrame:
    preds, scores = [], []
    for t in df["text"]:
        p, s = lang_id(t)
        preds.append(p)
        scores.append(s)
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(),
        "pred_lang": preds,
        "score": np.asarray(scores, dtype=np.int64),
    })


def fingerprint_batch(df: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "doc_id": df["doc_id"].to_numpy(),
        "fp": np.asarray([fingerprint(t) for t in df["text"]], dtype=np.int64),
    })


def split_ngrams(text: str, n: int = 8) -> set:
    """Distinct space-joined word n-grams under RAW single-space
    tokenization (str.split(' ') — exact parity with DuckDB's
    string_split(text, ' '), including empty tokens on repeated spaces)."""
    ws = text.split(" ")
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


def decontaminate(docs, *, bench_mod: int = 97, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text"):
    """Benchmark decontamination: for every non-benchmark document, count
    the distinct word n-grams it shares with the benchmark ("eval") set —
    the overlap filter LLM training pipelines run before training so eval
    data does not leak into the corpus.

    The benchmark membership rule here is deterministic (doc_id %
    bench_mod == 0) so the fixture needs no second table; a real pipeline
    passes its eval set instead. Shape: the benchmark grams are built
    DISTRIBUTED (map over the corpus, distinct per block), collected once
    — eval sets are small by construction, this is the broadcast-side
    regime — and shipped via ray.put; the scoring pass is one map over
    the corpus probing the frozen gram set per document. No shuffle.
    """
    import pyarrow as pa
    import ray
    import ray.data

    def bench_grams(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        texts = b[text_col].to_pylist()
        out: set = set()
        for i in np.nonzero(ids % bench_mod == 0)[0]:
            out |= split_ngrams(texts[int(i)], n)
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    gdf = docs.map_batches(bench_grams, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    # an all-empty gram table renders schemaless (Ray's empty-block quirk,
    # see joins.cogroup_join): no benchmark docs -> empty set, all clean
    gset = frozenset(gdf["g"]) if "g" in gdf.columns else frozenset()
    ref = ray.put(gset)

    def score(b: pa.Table) -> pa.Table:
        s = ray.get(ref)
        ids = b[id_col].to_numpy()
        keep = ids % bench_mod != 0
        texts = b[text_col].to_pylist()
        out_id, out_n = [], []
        for i in np.nonzero(keep)[0]:
            shared = len(split_ngrams(texts[int(i)], n) & s)
            out_id.append(int(ids[i]))
            out_n.append(shared)
        nsh = np.asarray(out_n, dtype=np.int64)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "n_shared": pa.array(nsh),
                         "contaminated": pa.array(nsh > 0)})

    return docs.map_batches(score, batch_format="pyarrow", batch_size=None)


def _add_gkey(b: "pa.Table") -> "pa.Table":
    """Append the deterministic gram-hash key (pandas' C siphash —
    stable across processes, unlike Python's seeded hash()); the
    partitioner then keys on the int column. Shared by the gram-keyed
    exchanges (dup_window_counts, dup_span_merge)."""
    import pyarrow as pa
    h = pd.util.hash_array(
        b["g"].to_numpy(zero_copy_only=False)).astype(np.int64)
    return b.append_column("_gk", pa.array(h))


def dup_window_counts(docs, *, n: int = 8, id_col: str = "doc_id",
                      text_col: str = "text", num_partitions: int = 64):
    """Exact substring-duplication profile: for every document, how many
    of its distinct word n-gram windows also occur in at least one OTHER
    document — the exact-window dedup signal (cf. Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": exact
    duplicate spans, here at window granularity).

    Shape (both exchanges carry narrow rows, never documents):
      docs --flat_map--> (gram, doc_id) distinct per doc
           --groupby(hash-partition of gram)--> grams held by >= 2 docs
           emit (doc_id, 1) per qualifying (gram, doc) pair
           --groupby(doc_id) sum--> per-doc duplicated-window count,
      unioned with a (doc_id, 0, n_windows) base so clean docs keep a row.

    The gram STRING is the exchange key so the DuckDB twin can join on it
    exactly; at petabyte scale swap the string for a 16-byte hash (same
    plan, narrower rows) and accept the collision odds."""
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Max, Sum

    from .joins import partitioned_groups

    def gram_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        texts = b[text_col].to_pylist()
        out_g: list = []
        out_d: list = []
        for i in range(len(ids)):
            gs = split_ngrams(texts[i], n)
            out_g.extend(gs)
            out_d.extend([int(ids[i])] * len(gs))
        return pa.table({"g": pa.array(out_g, pa.string()),
                         "d": pa.array(out_d, pa.int64())})

    def base_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        texts = b[text_col].to_pylist()
        nw = np.array([len(split_ngrams(t, n)) for t in texts], np.int64)
        return pa.table({id_col: pa.array(ids),
                         "dup_windows": pa.array(np.zeros(len(ids),
                                                          np.int64)),
                         "total_windows": pa.array(nw)})

    grams = docs.map_batches(gram_rows, batch_format="pyarrow",
                             batch_size=None)

    def shared_hits(t: pa.Table) -> pa.Table:
        import pandas as pd
        if "g" not in t.column_names or t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "dup_windows": pa.array([], pa.int64()),
                             "total_windows": pa.array([], pa.int64())})
        df = t.to_pandas()
        nd = df.groupby("g")["d"].transform("nunique")
        hit = df[nd >= 2].groupby("d", as_index=False).size() \
            .rename(columns={"d": id_col, "size": "dup_windows"})
        hit["dup_windows"] = hit["dup_windows"].astype(np.int64)
        hit["total_windows"] = np.int64(0)
        return pa.Table.from_pandas(hit, preserve_index=False)

    # gram strings hash-partition by a deterministic vectorized string
    # hash (pandas' C siphash — stable across processes, unlike Python's
    # seeded hash()); partitioned_groups then keys on the int column

    keyed = grams.map_batches(_add_gkey, batch_format="pyarrow",
                              batch_size=None)
    hits = partitioned_groups(keyed, ["_gk"],
                              num_partitions=num_partitions) \
        .map_groups(shared_hits, batch_format="pyarrow")

    base = docs.map_batches(base_rows, batch_format="pyarrow",
                            batch_size=None)
    return base.union(hits).groupby(id_col).aggregate(
        Sum("dup_windows", alias_name="dup_windows"),
        Max("total_windows", alias_name="total_windows"))


def dup_span_merge(docs, *, n: int = 8, id_col: str = "doc_id",
                   text_col: str = "text", num_partitions: int = 64):
    """Exact-substring duplication at SPAN granularity (Lee et al. 2022
    semantics): per document, the duplicated n-gram windows merge into
    MAXIMAL duplicated token runs — two windows join one span when their
    start gap is <= n (their token coverage overlaps or touches).
    -> (doc_id, n_spans, dup_tokens): count of maximal spans and total
    tokens they cover (0, 0 for clean docs). dup_window_counts reports
    the window-count signal; this is the span-level profile a
    cut-the-spans-out pipeline needs.

    Shape (two narrow exchanges, documents move once):
      docs --flat_map--> distinct (gram, doc) rows
           --groupby(gram-hash partition)--> grams in >= 2 docs emit the
             qualifying (doc, gram) pairs
           --cogroup by doc-hash partition with the docs themselves-->
             per doc: recompute positional windows, mark the qualifying
             ones, merge islands (gap <= n), emit the two integers.
    The rejoin routes through the cogroup — never the driver (the
    curation_pipeline keeper-rejoin discipline)."""
    import pyarrow as pa
    import ray.data

    from .joins import partitioned_groups

    def gram_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        texts = b[text_col].to_pylist()
        out_g: list = []
        out_d: list = []
        for i in range(len(ids)):
            gs = split_ngrams(texts[i], n)
            out_g.extend(gs)
            out_d.extend([int(ids[i])] * len(gs))
        return pa.table({"g": pa.array(out_g, pa.string()),
                         "d": pa.array(out_d, pa.int64())})


    keyed = docs.map_batches(gram_rows, batch_format="pyarrow",
                             batch_size=None) \
        .map_batches(_add_gkey, batch_format="pyarrow", batch_size=None)

    def shared_pairs(t: pa.Table) -> pa.Table:
        if "g" not in t.column_names or t.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "g": pa.array([], pa.string())})
        df = t.select(["g", "d"]).to_pandas()
        nd = df.groupby("g")["d"].transform("nunique")
        hit = df[nd >= 2]
        return pa.table({"d": pa.array(hit["d"].to_numpy(np.int64)),
                         "g": pa.array(hit["g"], pa.string())})

    dup_pairs = partitioned_groups(keyed, ["_gk"],
                                   num_partitions=num_partitions) \
        .map_groups(shared_pairs, batch_format="pyarrow")

    # cogroup: doc rows (kind 0) union qualifying-pair rows (kind 1),
    # hash-partitioned on the doc id
    def doc_side(b: pa.Table) -> pa.Table:
        m = b.num_rows
        return pa.table({
            "d": b[id_col].cast(pa.int64()),
            "_kind": pa.array(np.zeros(m, dtype=np.int8)),
            "text": b[text_col],
            "g": pa.nulls(m, pa.string()),
        })

    def pair_side(b: pa.Table) -> pa.Table:
        if "d" not in b.column_names or b.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "_kind": pa.array([], pa.int8()),
                             "text": pa.array([], pa.string()),
                             "g": pa.array([], pa.string())})
        m = b.num_rows
        return pa.table({
            "d": b["d"],
            "_kind": pa.array(np.ones(m, dtype=np.int8)),
            "text": pa.nulls(m, pa.string()),
            "g": b["g"],
        })

    both = docs.map_batches(doc_side, batch_format="pyarrow",
                            batch_size=None) \
        .union(dup_pairs.map_batches(pair_side, batch_format="pyarrow",
                                     batch_size=None))

    def span_part(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "n_spans": pa.array([], pa.int64()),
                          "dup_tokens": pa.array([], pa.int64())})
        if "_kind" not in t.column_names or t.num_rows == 0:
            return empty
        kind = t["_kind"].to_numpy()
        dset: dict[int, set] = {}
        pair_rows = np.nonzero(kind == 1)[0]
        if len(pair_rows):
            pd_ids = t["d"].to_numpy()
            pg = t["g"].to_pylist()
            for i in pair_rows:
                dset.setdefault(int(pd_ids[i]), set()).add(pg[i])
        out_d, out_s, out_t = [], [], []
        doc_rows = np.nonzero(kind == 0)[0]
        ids_all = t["d"].to_numpy()
        texts = t["text"].to_pylist()
        for i in doc_rows:
            did = int(ids_all[i])
            gs = dset.get(did)
            n_spans = 0
            dup_tokens = 0
            if gs:
                toks = texts[i].split(" ")
                pos = [p for p in range(len(toks) - n + 1)
                       if " ".join(toks[p:p + n]) in gs]
                if pos:
                    start = prev = pos[0]
                    for p in pos[1:]:
                        if p - prev > n:
                            n_spans += 1
                            dup_tokens += prev - start + n
                            start = p
                        prev = p
                    n_spans += 1
                    dup_tokens += prev - start + n
            out_d.append(did)
            out_s.append(n_spans)
            out_t.append(dup_tokens)
        return pa.table({id_col: pa.array(out_d, pa.int64()),
                         "n_spans": pa.array(out_s, pa.int64()),
                         "dup_tokens": pa.array(out_t, pa.int64())})

    return partitioned_groups(both, ["d"],
                              num_partitions=num_partitions) \
        .map_groups(span_part, batch_format="pyarrow")


def unigram_surprisal(docs, *, id_col: str = "doc_id",
                      text_col: str = "text",
                      num_partitions: int | None = None):
    """Corpus-adaptive unigram "surprisal" quality score (the CCNet-style
    LM-perplexity signal, reduced to its unigram core with an INTEGER
    surrogate so every verdict is bit-reproducible in SQL): each token
    occurrence contributes (T * 1000) // c(term) — T = corpus token
    count, c = the term's corpus count — monotone in -log p(term), no
    float log (libm would make the hash fragile, the tfidf idf_int
    lesson). Output (doc_id, n_tok, surprise); high surprise = rare
    vocabulary. Int64 bound: a doc's surprise <= n_tok * T * 1000, so
    the integer surrogate is safe through T ~ 10^12 tokens for 10^3-
    token docs; past that, drop the x1000 scale (ranking unchanged).

    FULLY DISTRIBUTED — no vocabulary broadcast (CCNet ships a pruned LM;
    an exact corpus unigram table at 100 TB is ~10^8 terms and must NOT
    land anywhere whole): one vectorized tokenize pass emits (term, doc,
    tf) partials hash-partitioned BY TERM, so each partition holds every
    copy of its terms and computes exact counts locally; per-doc partial
    sums leave each partition pre-aggregated, and one metadata-scale
    groupby(doc) folds them. Two narrow exchanges, documents move never.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    from ..config import cluster_parallelism
    from .joins import _part_of_str

    if num_partitions is None:
        num_partitions = 2 * cluster_parallelism()

    def tf_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy().astype(np.int64)
        texts = b[text_col].combine_chunks() \
            if isinstance(b[text_col], pa.ChunkedArray) else b[text_col]
        lst = pc.split_pattern(texts, " ")
        n_tok = pc.list_value_length(lst).to_numpy().astype(np.int64)
        flat = lst.flatten()
        if len(flat) == 0:
            t = pa.table({"term": pa.array([], pa.string()),
                          "d": pa.array([], pa.int64()),
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
            "d": pa.array(ids[uk // m]),
            "tf": pa.array(tf.astype(np.int64)),
        })
        part = _part_of_str(t["term"].to_numpy(zero_copy_only=False),
                            num_partitions)
        return t.append_column("_part", pa.array(part))

    partials = docs.map_batches(tf_rows, batch_format="pyarrow",
                                batch_size=None).materialize()
    total = int(partials.sum("tf") or 0)

    def part_contrib(g: pa.Table) -> pa.Table:
        empty = pa.table({"d": pa.array([], pa.int64()),
                          "n_tok": pa.array([], pa.int64()),
                          "surprise": pa.array([], pa.int64())})
        if "term" not in g.column_names or g.num_rows == 0:
            return empty
        df = g.select(["term", "d", "tf"]).to_pandas()
        c = df.groupby("term")["tf"].transform("sum") \
            .to_numpy().astype(np.int64)
        tf = df["tf"].to_numpy().astype(np.int64)
        contrib = tf * ((total * 1000) // c)
        out = pd.DataFrame({"d": df["d"].to_numpy(), "n_tok": tf,
                            "surprise": contrib}) \
            .groupby("d", as_index=False).sum()
        return pa.table({"d": pa.array(out["d"].to_numpy(np.int64)),
                         "n_tok": pa.array(out["n_tok"]
                                           .to_numpy(np.int64)),
                         "surprise": pa.array(out["surprise"]
                                              .to_numpy(np.int64))})

    agg = partials.groupby("_part") \
        .map_groups(part_contrib, batch_format="pyarrow") \
        .groupby("d").aggregate(Sum("n_tok", alias_name="n_tok"),
                                Sum("surprise", alias_name="surprise"))

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b["d"], "n_tok": b["n_tok"],
                         "surprise": b["surprise"]})

    return agg.map_batches(rename, batch_format="pyarrow",
                           batch_size=None)


# PII scrubbing patterns — RE2-safe (no lookarounds), evaluated by the
# SAME engine on both sides (Arrow's replace/count_substring_regex and
# DuckDB's regexp_* are both RE2), so the scrub is pinned once.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
PII_IP = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def pii_scrub(docs, *, id_col: str = "doc_id", text_col: str = "text"):
    """PII redaction — the scrub pass public LLM curation pipelines run
    before training (emails, phone numbers, IPv4 literals -> typed
    placeholder tokens). Counts are measured on the ORIGINAL text;
    replacements compose in a fixed order (email -> phone -> ip) so the
    output is deterministic and the DuckDB twin reproduces it exactly.
    Pure vectorized map (three RE2 kernels per batch) — no shuffle, no
    Python per row."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(b: pa.Table) -> pa.Table:
        t = b[text_col]
        n_em = pc.count_substring_regex(t, PII_EMAIL).cast(pa.int64())
        n_ph = pc.count_substring_regex(t, PII_PHONE).cast(pa.int64())
        n_ip = pc.count_substring_regex(t, PII_IP).cast(pa.int64())
        s = pc.replace_substring_regex(t, PII_EMAIL, "<EMAIL>")
        s = pc.replace_substring_regex(s, PII_PHONE, "<PHONE>")
        s = pc.replace_substring_regex(s, PII_IP, "<IP>")
        return pa.table({id_col: b[id_col],
                         "text_scrubbed": s,
                         "n_emails": n_em,
                         "n_phones": n_ph,
                         "n_ips": n_ip})

    return docs.map_batches(f, batch_format="pyarrow", batch_size=None)


def _fused_term_topk(docs, *, k: int, text_col: str, source_col: str,
                     score_of):
    """Shared single-exchange vocabulary plan for the term-statistics
    family (top_terms, tfidf_terms): tf partials (source, term, tf) and
    df partials (term, df) emit from ONE tokenize pass per block under a
    sentinel source, hash-partition by term once; each reducer sums both
    sides, merges, optionally scores (``score_of(tf, df) -> int64`` or
    None), and emits its LOCAL per-source top-k — so the final
    per-source selection exchanges only k x n_sources x n_partitions
    rows. Correctness rests on the partition key being the TERM: every
    (source, term) tf partial and every (term) df partial of a term land
    in the same reducer, so the sums the reducer ranks are complete, and
    per-source top-k is decomposable across term partitions. Documents
    never enter any exchange."""
    import pyarrow as pa
    import ray.data

    from ..config import cluster_parallelism
    from .joins import _part_of_str

    num_partitions = 2 * cluster_parallelism()
    rank_cols = ["score", "term"] if score_of is not None \
        else ["tf", "term"]
    out_cols = ["source", "term", "tf", "df"] \
        + (["score"] if score_of is not None else [])

    def tag_both(b: pa.Table) -> pa.Table:
        # ONE tokenize pass per block feeds both partial kinds: tf rows
        # carry the real source, df rows the "" sentinel — enforced below:
        # an actually-empty source value would merge its tf rows into the
        # df side and corrupt both counts. Fully vectorized (the text
        # family's dominant CPU at corpus scale): one split kernel, one
        # dictionary-encode (C++ hashing), then np.unique over integer
        # (source|doc, term-code) keys — no Python per token.
        import pyarrow.compute as pc
        src_arr = b[source_col].combine_chunks() \
            if isinstance(b[source_col], pa.ChunkedArray) else b[source_col]
        if bool(pc.any(pc.equal(src_arr, "")).as_py() or False):
            raise ValueError(
                "term-statistics source column contains an empty string, "
                "which collides with the df-partial sentinel; rename the "
                "empty source before calling top_terms/tfidf_terms")
        texts = b[text_col].combine_chunks() \
            if isinstance(b[text_col], pa.ChunkedArray) else b[text_col]
        lst = pc.split_pattern(texts, " ")
        n_tok = pc.list_value_length(lst).to_numpy().astype(np.int64)
        flat = lst.flatten()
        # explicit string types: an EMPTY batch would otherwise infer
        # null-typed columns and break downstream schema unification
        if len(flat) == 0:
            out = pa.table({"source": pa.array([], pa.string()),
                            "term": pa.array([], pa.string()),
                            "tf": pa.array([], pa.int64()),
                            "df": pa.array([], pa.int64())})
            return out.append_column("_part", pa.array([], pa.int32()))
        enc = pc.dictionary_encode(flat)
        tcode = enc.indices.to_numpy().astype(np.int64)
        terms = enc.dictionary
        m = len(terms)
        senc = pc.dictionary_encode(src_arr)
        srow = senc.indices.to_numpy().astype(np.int64)
        parent = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        # tf: exact counts per (source, term) within the block
        uk, tf_cnt = np.unique(srow[parent] * m + tcode,
                               return_counts=True)
        tf_src = pc.take(senc.dictionary, pa.array(uk // m))
        tf_term = pc.take(terms, pa.array(uk % m))
        # df: distinct (doc, term) pairs, then docs per term
        dterm, df_cnt = np.unique(np.unique(parent * m + tcode) % m,
                                  return_counts=True)
        df_term = pc.take(terms, pa.array(dterm))
        n_tf, n_df = len(uk), len(dterm)
        out = pa.table({
            "source": pa.concat_arrays([
                tf_src.cast(pa.string()),
                pa.array([""] * n_df, type=pa.string())]),
            "term": pa.concat_arrays([tf_term.cast(pa.string()),
                                      df_term.cast(pa.string())]),
            "tf": pa.array(np.concatenate([
                tf_cnt.astype(np.int64),
                np.zeros(n_df, dtype=np.int64)])),
            "df": pa.array(np.concatenate([
                np.zeros(n_tf, dtype=np.int64),
                df_cnt.astype(np.int64)])),
        })
        part = _part_of_str(out["term"].to_numpy(zero_copy_only=False),
                            num_partitions)
        return out.append_column("_part", pa.array(part))

    tagged = docs.map_batches(tag_both, batch_format="pyarrow",
                              batch_size=None)

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        is_df = g["source"] == ""
        tf_side = g[~is_df].groupby(["source", "term"], as_index=False) \
            .agg(tf=("tf", "sum"))
        df_side = g[is_df].groupby("term", as_index=False) \
            .agg(df=("df", "sum"))
        m = tf_side.merge(df_side, on="term", how="inner")
        if not len(m):
            return pd.DataFrame({c: pd.Series(
                [], dtype=object if c in ("source", "term") else np.int64)
                for c in out_cols})
        m["tf"] = m["tf"].astype(np.int64)
        m["df"] = m["df"].astype(np.int64)
        if score_of is not None:
            m["score"] = score_of(m["tf"].to_numpy(),
                                  m["df"].to_numpy()).astype(np.int64)
        # local per-source top-k: only k rows per (source, partition)
        # survive into the final exchange
        m = m.sort_values(rank_cols, ascending=[False, True],
                          kind="stable")
        return m.groupby("source", as_index=False).head(k)[out_cols]

    scored = tagged.groupby("_part").map_groups(reduce,
                                                batch_format="pandas")

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(rank_cols, ascending=[False, True],
                          kind="stable").head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        for c in out_cols[2:]:
            g[c] = g[c].astype(np.int64)
        return g[["source", "rank"] + out_cols[1:]]

    return scored.groupby("source").map_groups(topk, batch_format="pandas")


def top_terms(docs, *, k: int = 5, id_col: str = "doc_id",
              text_col: str = "text", source_col: str = "source"):
    """Corpus vocabulary statistics: per source, the top-k terms by term
    frequency (ties break lexicographically), each with its corpus-wide
    document frequency — the vocabulary/stats pass quality-filtering
    pipelines run before tokenizer training. One fused vocabulary-sized
    exchange (see _fused_term_topk); per-source top-k by tf is
    decomposable, so reducers pre-select locally."""
    return _fused_term_topk(docs, k=k, text_col=text_col,
                            source_col=source_col, score_of=None)


def repetition_stats(docs, *, doc_col: str = "doc_id",
                     text_col: str = "text"):
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    §A1.1 repetition filters): duplicate-line and duplicate-token counts,
    emitted as EXACT INTEGER numerators/denominators so the hash compare
    is float-free (dup_line_frac = 1 - n_uniq_lines/n_lines downstream).

    Lines split on bare newline with empties kept (Python str.split ==
    DuckDB string_split semantics: empty text -> one empty line); tokens
    are the engine-wide whitespace definition (RE2 \\S+, q_token_count's
    twin) — vectorized as split_pattern_regex(\\s+) with empty tokens
    dropped: Arrow's regex engine IS RE2, so the whitespace class is the
    SAME one the DuckDB oracle evaluates (utf8_split_whitespace would
    split on Unicode spaces RE2's \\s does not match). Per-row pure map
    — no shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(b: pa.Table) -> pa.Table:
        texts = b[text_col].combine_chunks() \
            if isinstance(b[text_col], pa.ChunkedArray) else b[text_col]
        lines = pc.split_pattern(texts, "\n")
        n_lines = pc.list_value_length(lines).to_numpy().astype(np.int64)
        u_lines = _uniq_per_parent(lines.flatten(), n_lines)
        toks = pc.split_pattern_regex(texts, r"\s+")
        flat = toks.flatten()
        raw_n = pc.list_value_length(toks).to_numpy().astype(np.int64)
        keep = pc.not_equal(flat, "")
        parent = np.repeat(np.arange(len(raw_n), dtype=np.int64), raw_n)
        parent = parent[keep.to_numpy(zero_copy_only=False)]
        n_tok = np.bincount(parent,
                            minlength=len(raw_n)).astype(np.int64)
        u_tok = _uniq_per_parent(flat.filter(keep), n_tok)
        return pa.table({
            "doc_id": b[doc_col],
            "n_lines": pa.array(n_lines),
            "n_uniq_lines": pa.array(u_lines),
            "n_tok": pa.array(n_tok),
            "n_uniq_tok": pa.array(u_tok),
        })

    return docs.map_batches(f, batch_format="pyarrow")


def tfidf_terms(docs, *, k: int = 5, text_col: str = "text",
                source_col: str = "source"):
    """Per-source top-k terms by an integer-exact tf-idf surrogate:
    score = tf * idf_int, idf_int = (N * 1000) // df (N = corpus doc
    count). Integer division keeps the score bit-reproducible in SQL
    (a float ln() idf could flip ranks across libm implementations);
    idf_int is monotone in the true idf, so the ranking discipline is
    the standard one. Ties -> lexicographic term.

    Unlike ``top_terms`` (df only decorates the winners), the idf must
    weight EVERY candidate term before selection — both run the shared
    single-exchange plan (_fused_term_topk), this one with the idf
    scoring hook. (First cut ran 3 vocabulary-sized exchanges —
    groupby-sum tf, groupby-sum df, then a join; the fused plan halves
    the measured wall time.)
    """
    n_docs = int(docs.count())

    def score_of(tf: np.ndarray, df: np.ndarray) -> np.ndarray:
        return tf * ((n_docs * 1000) // np.maximum(df, 1))

    return _fused_term_topk(docs, k=k, text_col=text_col,
                            source_col=source_col, score_of=score_of)


# Gopher quality-rule thresholds (Rae et al. 2021 §A1.1, adapted to this
# corpus's scale; ratios carried as exact integer per-mille so the SQL
# twin reproduces every verdict bit-for-bit)
GOPHER_MIN_TOK = 40
GOPHER_MAX_TOK = 90
GOPHER_MIN_MEAN_WL_MILLI = 3000    # mean word length in [3, 10] chars
GOPHER_MAX_MEAN_WL_MILLI = 10000
GOPHER_MIN_UNIQ_PERMILLE = 500     # distinct-token ratio >= 50%


def gopher_filter(docs, *, doc_col: str = "doc_id",
                  text_col: str = "text"):
    """Gopher-style document quality filter: per-doc exact-integer
    signals + one boolean per rule + the composite keep verdict. Tokens
    are the engine-wide single-space split (parity with DuckDB's
    string_split); mean word length is carried as
    1000 * sum(word chars) // n_tok, the distinct ratio as
    1000 * n_uniq // n_tok — integer division on both sides of the
    oracle, no floats. Per-row pure map, no shuffle."""
    import pyarrow as pa

    def f(b: pa.Table) -> pa.Table:
        n_tok, n_uniq, wchars = token_signals(b[text_col])
        mean_wl = 1000 * wchars // np.maximum(n_tok, 1)
        uniq_pm = 1000 * n_uniq // np.maximum(n_tok, 1)
        ok_len = (n_tok >= GOPHER_MIN_TOK) & (n_tok <= GOPHER_MAX_TOK)
        ok_wl = (mean_wl >= GOPHER_MIN_MEAN_WL_MILLI) \
            & (mean_wl <= GOPHER_MAX_MEAN_WL_MILLI)
        ok_uniq = uniq_pm >= GOPHER_MIN_UNIQ_PERMILLE
        return pa.table({
            doc_col: b[doc_col],
            "n_tok": pa.array(n_tok),
            "mean_wl_milli": pa.array(mean_wl),
            "uniq_permille": pa.array(uniq_pm),
            "ok_len": pa.array(ok_len),
            "ok_word_len": pa.array(ok_wl),
            "ok_uniq": pa.array(ok_uniq),
            "keep": pa.array(ok_len & ok_wl & ok_uniq),
        })

    return docs.map_batches(f, batch_format="pyarrow", batch_size=None)


def cooccurrence_topk(docs, *, window: int = 3, k: int = 50,
                      text_col: str = "text"):
    """Windowed token co-occurrence counts — the corpus statistics pass
    of GloVe/PMI-style embedding prep (Pennington et al. 2014): count
    ordered pairs (t1, t2) where t2 follows t1 within `window` tokens in
    a document; return the global top-k pairs by count (ties ->
    lexicographic (t1, t2)).

    Shape (the _fused_term_topk discipline — ONE pair-vocabulary-sized
    exchange, documents never move): each block tokenizes once
    (split_pattern + dictionary_encode, no Python per token), builds
    pair codes for offsets 1..window with w vectorized shifts, and
    PRE-AGGREGATES to one (t1, t2, n) row per distinct pair per block;
    the groupby sums partials; the top-k is a local-head funnel
    (<= k rows per block -> one reducer task), so the driver receives
    exactly k rows. Pair vocabulary is the exchange bound — the standard
    window cap keeps it O(corpus tokens x window), pre-aggregation
    collapses it per block."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data
    from ray.data.aggregate import Sum

    def pair_partials(b: pa.Table) -> pa.Table:
        texts = b[text_col].combine_chunks() \
            if isinstance(b[text_col], pa.ChunkedArray) else b[text_col]
        lst = pc.split_pattern(texts, " ")
        n_tok = pc.list_value_length(lst).to_numpy().astype(np.int64)
        flat = lst.flatten()
        if len(flat) == 0:
            return pa.table({"t1": pa.array([], pa.string()),
                             "t2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(flat)
        codes = enc.indices.to_numpy().astype(np.int64)
        m = len(enc.dictionary)
        parent = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        keys = []
        for d in range(1, window + 1):
            if d >= len(codes):
                break
            same = parent[:-d] == parent[d:]
            keys.append(codes[:-d][same] * m + codes[d:][same])
        if not keys:
            return pa.table({"t1": pa.array([], pa.string()),
                             "t2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uk, cnt = np.unique(np.concatenate(keys), return_counts=True)
        return pa.table({
            "t1": pc.take(enc.dictionary, pa.array(uk // m)).cast(pa.string()),
            "t2": pc.take(enc.dictionary, pa.array(uk % m)).cast(pa.string()),
            "n": pa.array(cnt.astype(np.int64))})

    sums = docs.map_batches(pair_partials, batch_format="pyarrow",
                            batch_size=None) \
        .groupby(["t1", "t2"]).aggregate(Sum("n", alias_name="n"))

    def local_head(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = b.to_pandas()
        df = df.sort_values(["n", "t1", "t2"],
                            ascending=[False, True, True],
                            kind="stable").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(b: pa.Table) -> pa.Table:
        t = local_head(b)
        return t.append_column(
            "rank", pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64)))

    # top-k funnel over the AGGREGATED pair table: <= k rows per block,
    # one reducer task, exactly k rows reach the caller
    return sums.map_batches(local_head, batch_format="pyarrow",
                            batch_size=None) \
        .repartition(1) \
        .map_batches(finish, batch_format="pyarrow", batch_size=None) \
        .select_columns(["rank", "t1", "t2", "n"])
