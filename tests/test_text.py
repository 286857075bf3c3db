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
    t = q_distinct_sketch(sf)
    est = t["estimate"][0].as_py()
    true = duckdb.connect().execute(
        f"SELECT count(DISTINCT l_partkey) FROM "
        f"read_parquet('{sf}/lineitem.parquet')").fetchone()[0]
    assert abs(est - true) / true < 0.15, (est, true)
