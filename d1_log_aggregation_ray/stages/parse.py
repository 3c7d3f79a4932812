"""R1-R3: the grok/regex parse stage — union-compiled regex banks over
the `text` byte column, vectorized per Arrow batch.

Reference analogs:
  - R1 gate: only events in eventsToCheck == {"read"} are flag-eligible
    (LogEntrySolrItem.java:346-350) -> role in cfg.gate_roles.
  - R2 partial robot UA bank: first-match-wins scan of 214 regexes
    (LogEntrySolrItem.java:352-366) -> ONE union-compiled RE2 pattern
    evaluated by pyarrow.compute.match_substring_regex over the whole
    column (first-match-wins over a bank == matches-any for boolean
    flags, so the union is semantically identical and ~100x faster than
    a per-pattern loop).
  - R3 full robot UA bank: 222 regexes (LogEntrySolrItem.java:368-382).
Null/blank text -> False (reference treats null/blank UA as no-match).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig, DEFAULT_CONFIG


def regex_flags(batch: pa.Table, partial_union: str, full_union: str,
                cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Append in_partial_list / in_full_list boolean columns."""
    gated = pc.is_in(batch.column("role"),
                     value_set=pa.array(list(cfg.gate_roles)))
    gated = pc.fill_null(gated, False)
    text = batch.column("text")
    pm = pc.fill_null(pc.match_substring_regex(text, partial_union), False)
    fm = pc.fill_null(pc.match_substring_regex(text, full_union), False)
    batch = batch.append_column("in_partial_list", pc.and_(gated, pm))
    batch = batch.append_column("in_full_list", pc.and_(gated, fm))
    return batch
