"""d1_log_aggregation_ray — a Ray-Data-native log/transcript aggregation engine.

A brand-new engine with the query/data-processing capabilities of
DataONE's CN log-aggregation service (DataONEorg/d1_log_aggregation,
surveyed in SURVEY.md), re-expressed over Parquet tables of multi-turn
conversation/agent transcripts:

    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp[us])

Pipeline shape (reference: LogHarvesterTask.harvest,
/root/reference/src/main/java/org/dataone/cn/batch/logging/tasks/LogHarvesterTask.java:129-525):

    read_parquet -> clean/project -> regex parse -> broadcast enrich
    -> groupby(conv_id) windowed repeat-visit scan -> hash fan-out route
    -> partitioned parquet sinks + lineage manifest

Everything is idiomatic Ray Data: `map_batches` over zero-copy Arrow
batches, actor pools for stateful enrichment, a single groupby shuffle
for the order-dependent window operator, and partition-atomic writes
with a resumable checkpoint manifest.
"""

__version__ = "0.1.0"
