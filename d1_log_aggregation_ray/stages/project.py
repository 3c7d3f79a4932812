"""M1-M5: validity filter, projection, key assignment, version tagging.

Reference analogs:
  - M2 validity filter: drop null/blank pid (LogHarvesterTask.java:338-341)
  - M5 primary key: id = nodeId + "." + entryId (LogHarvesterTask.java:431-435)
    -> turn_id = conv_id + "." + turn_idx
  - M1 version tag: versionCompliance = "v1" iff event converts to the
    closed v1 enum (LogEntrySolrItem.java:202-206) -> role in V1_ROLES
All vectorized pyarrow.compute; runs as a stateless map_batches over
zero-copy Arrow batches BEFORE the groupby shuffle, so corrupt rows
never enter the exchange.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig, DEFAULT_CONFIG


def derived_columns(batch: pa.Table,
                    cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """M5 turn_id + M1 version tag — pure row-local derivations, split
    out so the harvest path can DEFER them to after the scan->slice
    object-store transit: carrying ~30 B/row of derivable strings
    through plasma costs bandwidth (the single-box scaling ceiling) for
    zero information.  The Enricher re-derives them when absent."""
    conv = batch.column("conv_id")
    turn_id = pc.binary_join_element_wise(
        conv, pc.cast(batch.column("turn_idx"), pa.string()), ".")
    vc = pc.if_else(
        pc.is_in(batch.column("role"), value_set=pa.array(list(cfg.v1_roles))),
        "v1", "v2")
    batch = batch.append_column("turn_id", turn_id)
    return batch.append_column("version_compliance", pc.cast(vc, pa.string()))


def clean_project(batch: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG,
                  defer_derived: bool = False) -> pa.Table:
    """Filter invalid rows; add turn_id + version_compliance (unless
    deferred to the post-shuffle enrich stage)."""
    conv = batch.column("conv_id")
    valid = pc.and_kleene(conv.is_valid(), pc.not_equal(conv, ""))
    valid = pc.fill_null(valid, False)
    batch = batch.filter(valid)
    if not defer_derived:
        batch = derived_columns(batch, cfg)
    return batch
