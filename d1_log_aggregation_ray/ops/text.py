"""Text analysis over the `documents` table: token counting, quality
metrics, language ID, document fingerprinting.  All vectorized
pyarrow.compute / numpy inside map_batches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_lower64

# letter-frequency profiles for a tiny n-gram-free language-ID
# heuristic (public frequency tables, rounded): scores by common-word
# hits, falls back to "und" (undetermined)
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"},
    "fr": {"le", "la", "et", "les", "des", "est", "pas", "pour", "une", "dans"},
    "es": {"el", "la", "de", "que", "los", "por", "con", "una", "para", "es"},
    "it": {"il", "di", "che", "per", "con", "una", "del", "sono", "non", "gli"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens = count of ' '-separated pieces (== len(text.split(' '))
    == DuckDB len(string_split(text, ' ')))."""
    text = batch.column(text_col)
    parts = pc.split_pattern(text, " ")
    return batch.append_column(
        "n_tokens", pc.cast(pc.list_value_length(parts), pa.int64()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer quality metrics (exact-type columns so they are
    value-hash comparable with a SQL oracle): token count, char count,
    punctuation count, uppercase-letter count."""
    text = batch.column(text_col)
    batch = token_count_batch(batch, text_col)
    batch = batch.append_column(
        "n_chars_m", pc.cast(pc.utf8_length(text), pa.int64()))
    batch = batch.append_column(
        "n_punct", pc.cast(pc.count_substring_regex(text, r"[.!?,;:]"),
                           pa.int64()))
    batch = batch.append_column(
        "n_upper", pc.cast(pc.count_substring_regex(text, r"[A-Z]"),
                           pa.int64()))
    return batch


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-hit language ID (heuristic, not SQL-expressible)."""
    text = batch.column(text_col).to_pylist()
    out = []
    for t in text:
        if not t:
            out.append("und")
            continue
        words = set(t.lower().split()[:200])
        best, best_hits = "und", 0
        for lang, sw in _LANG_STOPWORDS.items():
            hits = len(words & sw)
            if hits > best_hits:
                best, best_hits = lang, hits
        out.append(best)
    return batch.append_column("lang_pred", pa.array(out, type=pa.string()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content fingerprints: md5-based (portable to DuckDB
    md5_number_lower) + a 61-bit rolling polynomial hash (rows-only)."""
    text = batch.column(text_col).to_pylist()
    MOD = (1 << 61) - 1
    BASE = 1_000_003
    fps, rolls = [], []
    for t in text:
        if t is None:
            fps.append(0)
            rolls.append(0)
            continue
        fps.append(md5_lower64(t))
        h = 0
        for b in t.encode("utf-8"):
            h = (h * BASE + b + 1) % MOD
        rolls.append(h)
    batch = batch.append_column("fingerprint",
                                pa.array(np.array(fps, dtype=np.uint64)))
    batch = batch.append_column("rolling_hash",
                                pa.array(np.array(rolls, dtype=np.uint64)))
    return batch
