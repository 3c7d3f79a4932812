"""Relational operators Ray Data lacks natively, composed per the
SURVEY custom-operator rule (map_batches + groupby().map_groups +
explicit partitioning assumptions):

  - as-of join: per-key sort + merge_asof inside map_groups
  - tumbling-window aggregate: vectorized window-id column + groupby
  - per-group top-k: per-group sort + head
  - exact distinct count: per-batch pair dedup (combiner) + final
    per-key unique count

Partitioning assumption for asof/topk: groupby(key) delivers whole key
groups (Ray's sort-based groupby guarantees it); for skewed keys the
salted pattern in stages/aggregate.py applies to the aggregates but
NOT to asof (order-dependent within key, like the W1 window).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum


def asof_join_prior(ds: ray.data.Dataset, key: str, ts_col: str,
                    left_type: str, right_type: str,
                    type_col: str = "event_type",
                    value_col: str = "value",
                    id_col: str = "event_id") -> ray.data.Dataset:
    """For each left_type row, attach the value of the most recent
    STRICTLY prior right_type row with the same key (null when none).

    Matches DuckDB `ASOF JOIN ... ON l.key = r.key AND l.ts > r.ts`.
    """

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group[type_col] == left_type]
        right = group[group[type_col] == right_type]
        left = left.sort_values([ts_col, id_col], kind="mergesort")
        right = right.sort_values([ts_col, id_col], kind="mergesort")
        if len(left) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 "prior_value": pd.Series([], dtype="float64")})
        merged = pd.merge_asof(
            left[[id_col, ts_col]], right[[ts_col, value_col]],
            on=ts_col, allow_exact_matches=False)  # strictly prior
        return pd.DataFrame({id_col: merged[id_col],
                             "prior_value": merged[value_col]})

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def tumbling_counts(ds: ray.data.Dataset, key: str, ts_col: str,
                    window_s: int = 3600) -> ray.data.Dataset:
    """Per (key, tumbling window) event counts — vectorized window-id
    derivation + combiner pre-aggregation before the groupby."""
    win_us = window_s * 1_000_000

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).combine_chunks().cast(pa.int64())
        # numpy // FLOORS (matching DuckDB //); pc.divide truncates,
        # which would misbin pre-epoch timestamps
        ts_np = ts.to_numpy(zero_copy_only=False)
        win = pa.array((ts_np // win_us) * win_us, type=pa.int64())
        t = pa.table({key: batch.column(key),
                      "window_start": win})
        agg = t.group_by([key, "window_start"]).aggregate([([], "count_all")])
        # order-insensitive rename (pyarrow group_by column order is
        # keys-first only on recent releases)
        name_map = {key: key, "window_start": "window_start",
                    "count_all": "n"}
        return agg.rename_columns([name_map[c] for c in agg.column_names])

    partials = ds.map_batches(add_window, batch_format="pyarrow",
                              zero_copy_batch=True)
    agg = partials.groupby([key, "window_start"]).aggregate(Sum("n"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            key: batch.column(key),
            "window_start": batch.column("window_start").cast(
                pa.timestamp("us")),
            "n": pc.cast(batch.column("sum(n)"), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def topk_per_key(ds: ray.data.Dataset, key: str, order_col: str,
                 k: int = 2, tiebreak: str = "event_id") -> ray.data.Dataset:
    """Top-k rows per key by order_col desc (ties by tiebreak asc) —
    per-group sort + head; keys are whole under the groupby."""

    def per_key(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(order_col, "descending"),
                                                (tiebreak, "ascending")])
        return group.take(idx[:k])

    return ds.groupby(key).map_groups(per_key, batch_format="pyarrow")


def distinct_count(ds: ray.data.Dataset, key: str,
                   distinct_col: str) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT distinct_col) per key: per-batch pair dedup
    (combiner — the shuffle moves unique pairs, not rows), then a
    per-key unique count."""

    def pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch.column(key),
                      distinct_col: batch.column(distinct_col)})
        # COUNT(DISTINCT x) ignores NULLs — drop them before the dedup
        t = t.filter(t.column(distinct_col).combine_chunks().is_valid())
        return t.group_by([key, distinct_col]).aggregate([])

    uniq_pairs = ds.map_batches(pairs, batch_format="pyarrow",
                                zero_copy_batch=True)

    def count_unique(group: pa.Table) -> pa.Table:
        n = len(pc.unique(group.column(distinct_col)))
        return pa.table({key: group.column(key).slice(0, 1),
                         "n_distinct": pa.array([n], pa.int64())})

    return uniq_pairs.groupby(key).map_groups(count_unique,
                                              batch_format="pyarrow")
