"""Sessionization over the `events` stream table — the gaps-and-islands
cousin of the W1 repeat-visit window (same groupby-then-scan shape, but
expressible with a plain lag/cumsum, so it gets a SQL oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def sessionize(ds: ray.data.Dataset, gap_s: int = 1800,
               user_col: str = "user_id",
               ts_col: str = "ts") -> ray.data.Dataset:
    """Per-user session stats: a new session starts when the gap from
    the previous event exceeds gap_s.  Ties broken by event_id (total
    order, matching the SQL oracle's ORDER BY ts, event_id)."""
    gap_us = gap_s * 1_000_000

    def per_user(group: pa.Table) -> pa.Table:
        # null-ts events carry no ordering information: excluded here
        # AND in the SQL oracle (WHERE ts IS NOT NULL)
        group = group.filter(group.column(ts_col).combine_chunks().is_valid())
        group = group.sort_by([(ts_col, "ascending"), ("event_id", "ascending")])
        ts = group.column(ts_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n = len(ts)
        if n == 0:
            return pa.table({user_col: pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64())})
        new_sess = np.ones(n, dtype=np.int64)
        if n > 1:
            new_sess[1:] = (ts[1:] - ts[:-1] > gap_us).astype(np.int64)
        return pa.table({
            user_col: group.column(user_col).slice(0, 1),
            "n_events": pa.array([n], pa.int64()),
            "n_sessions": pa.array([int(new_sess.sum())], pa.int64()),
        })

    return ds.groupby(user_col).map_groups(per_user, batch_format="pyarrow")
