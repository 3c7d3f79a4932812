"""Salted-key grouped aggregation — the skew-splitting pattern for hot
keys (S3 analog: the reference bisects hot date ranges,
v1/NodeCommunication.java:96-111; here hot conv_ids are split across
salt shards before the exchange so no single reducer owns a mega key).

    groupby((key, salt)) partial aggregate   [hot key spread over
                                              n_salt shards]
      -> groupby(key) merge of partials      [n_salt rows per key max]

Works for any decomposable aggregate (count/sum/min/max).  The
order-dependent window operator can NOT be salted (sequential state) —
that one relies on conv-local buckets instead (stages/window.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Max, Sum


def salted_count_max(ds: ray.data.Dataset, key: str, ts_col: str,
                     n_salt: int = 8,
                     out_count: str = "n_turns",
                     out_max: str = "max_ts") -> ray.data.Dataset:
    """Per-key (count, max(ts)) with salt-sharded partials.

    Equivalent to ds.groupby(key).aggregate(Count(), Max(ts)) but a key
    holding 4% of all rows contributes n_salt partial rows to the final
    exchange instead of 4% of the data.
    """

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # round-robin salt: deterministic-enough spread; the salt only
        # partitions the partial aggregate, never the result
        salt = pa.array((np.arange(n) % n_salt).astype(np.int32))
        t = pa.table({
            key: batch.column(key),
            "_salt": salt,
            ts_col: batch.column(ts_col),
        })
        agg = t.group_by([key, "_salt"]).aggregate(
            [([], "count_all"), (ts_col, "max")])
        name_map = {key: key, "_salt": "_salt",
                    "count_all": out_count, f"{ts_col}_max": out_max}
        return agg.rename_columns([name_map[c] for c in agg.column_names])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    merged = partials.groupby(key).aggregate(Sum(out_count), Max(out_max))

    def rename(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key),
                out_count: pc.cast(batch.column(f"sum({out_count})"),
                                   pa.int64()),
                out_max: batch.column(f"max({out_max})")}
        return pa.table(cols)

    return merged.map_batches(rename, batch_format="pyarrow")
