"""PII detection + redaction over text columns: emails, IPv4
addresses, phone numbers.

The standard pre-training hygiene pass: personally identifying
strings must be counted (for corpus auditing) and replaced with
typed placeholder tokens (for training).  Reference analog: the
full/partial robot regex banks (`LogEntrySolrItem.java:388-442`) —
a fixed pattern bank applied to every record, vectorized here as
one RE2 scan per pattern per batch instead of a per-row loop.

Scale shape: pure map — no shuffle, no state, no side input.  Each
pattern runs as a single `pyarrow.compute` RE2 kernel over the
batch (count + replace), so the stage is embarrassingly parallel
and fuses with the read.

Oracle portability: the patterns use only RE2 syntax shared by
Arrow and DuckDB (character classes, bounded repeats, `\\b`,
non-capturing groups — no lookarounds), and the redaction is staged
(emails -> IPv4 -> phones) so the DuckDB mirror is the literal
nested `regexp_replace(..., 'g')` with byte-identical output.
Counts are defined per stage (each pattern counted on the text as
it enters that stage), so n_* always equals the number of
placeholders inserted by that stage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: (column suffix, pattern, placeholder) — applied IN ORDER; each
#: stage counts + replaces on the previous stage's output.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("emails",
     r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4",
     r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
     "<IP>"),
    ("phones",
     r"\+[0-9][0-9 -]{6,14}[0-9]",
     "<PHONE>"),
]


def pii_redact_batch(batch: pa.Table, text_col: str = "text",
                     out_col: str = "text_redacted") -> pa.Table:
    """Append n_emails / n_ipv4 / n_phones (int64 match counts) and
    `out_col` (the fully redacted text).  One count + one replace RE2
    kernel per pattern per batch — no per-row python."""
    cur = batch.column(text_col)
    for name, pat, token in PII_PATTERNS:
        batch = batch.append_column(
            "n_" + name,
            pc.cast(pc.count_substring_regex(cur, pat), pa.int64()))
        cur = pc.replace_substring_regex(cur, pat, token)
    return batch.append_column(out_col, cur)
