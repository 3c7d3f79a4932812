"""Sessionization over the `events` stream table — the gaps-and-islands
cousin of the W1 repeat-visit window (same groupby-then-scan shape, but
expressible with a plain lag/cumsum, so it gets a SQL oracle).

Scale shape: one python call per HASH PARTITION of users (manual
`part = user_hash % P` + groupby(part).map_groups), not one per user —
inside a partition every user's session count falls out of ONE
vectorized lexsort + diff over (user, ts) (a session boundary is a
row whose gap from the previous row exceeds gap_s OR whose user
differs), so many-small-users cost is O(n log n) per partition with
zero per-user python overhead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


from ..functions.parts import hash_parts as _parts
from ..functions.parts import key_parts as _key_parts


def sessionize(ds: ray.data.Dataset, gap_s: int = 1800,
               user_col: str = "user_id",
               ts_col: str = "ts") -> ray.data.Dataset:
    """Per-user session stats: a new session starts when the gap from
    the previous event exceeds gap_s.  Ties broken by event_id (total
    order, matching the SQL oracle's ORDER BY ts, event_id).

    Key-type generic: users are partitioned/segmented via the 64-bit
    _seg_keys hash (int identity, md5-low64 for strings — the same
    documented 2^-64 merge risk as topk_per_key), and the OUTPUT key
    column carries the original values (first row of each segment),
    never the hash encoding."""
    gap_us = gap_s * 1_000_000
    P = _parts()

    def add_part(batch: pa.Table) -> pa.Table:
        # null-ts events carry no ordering information: excluded here
        # AND in the SQL oracle (WHERE ts IS NOT NULL).  Null USERS are
        # kept as one sentinel-keyed group (SQL GROUP BY emits a NULL
        # group) — the seg-key hash also keeps non-null keys' partition
        # independent of whether the batch contains nulls.
        from .relational import _seg_keys
        batch = batch.filter(batch.column(ts_col).combine_chunks().is_valid())
        u = _seg_keys(batch.column(user_col))
        return pa.table({user_col: batch.column(user_col),
                         "event_id": batch.column("event_id"),
                         ts_col: batch.column(ts_col),
                         "part": pa.array(_key_parts(u, P))})

    def partition_scan(group: pa.Table) -> pa.Table:
        from .relational import _seg_keys
        n = group.num_rows
        users = group.column(user_col).combine_chunks()
        if n == 0:
            return pa.table({user_col: users,
                             "n_events": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64())})
        u = _seg_keys(users)
        ts = group.column(ts_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        us, tss = u[order], ts[order]
        new_user = np.r_[True, us[1:] != us[:-1]]
        new_sess = new_user | np.r_[False, tss[1:] - tss[:-1] > gap_us]
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.r_[starts, n])
        sess_cum = np.cumsum(new_sess)
        sess_per_user = np.diff(np.r_[sess_cum[starts] - 1, sess_cum[-1]])
        # original key values, first row per segment — NOT the hash
        out_users = users.take(pa.array(order[starts]))
        return pa.table({user_col: out_users,
                         "n_events": pa.array(counts.astype(np.int64)),
                         "n_sessions": pa.array(
                             sess_per_user.astype(np.int64))})

    parts = ds.map_batches(add_part, batch_format="pyarrow",
                           zero_copy_batch=True)
    return parts.groupby("part").map_groups(partition_scan,
                                            batch_format="pyarrow")
