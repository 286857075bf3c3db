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
