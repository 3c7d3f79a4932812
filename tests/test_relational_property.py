"""Property-based parity for the partition-scan relational ops: on
arbitrary event tables (ts ties, null ts, singleton users, empty
sides), asof_join_prior / sessionize / topk_per_key must match a
DuckDB oracle evaluated on the identical in-memory table.  This guards
the rank-composite searchsorted and segment-scan math against the edge
cases the sf-corpus parity tests never generate."""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

import ray.data

US = 1_000_000

events = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 4)),    # user index or NULL
        st.sampled_from(["view", "click", "other"]),
        st.one_of(st.none(), st.integers(0, 50)),   # ts seconds or null
        st.integers(0, 9),                          # value
    ),
    min_size=1, max_size=50)


def _table(data):
    return pa.table({
        "event_id": pa.array(range(len(data)), pa.int64()),
        "user_id": pa.array([u for u, _, _, _ in data], pa.int64()),
        "event_type": pa.array([e for _, e, _, _ in data]),
        "ts": pa.array([None if s is None else s * US
                        for _, _, s, _ in data], pa.timestamp("us")),
        "value": pa.array([float(v) for _, _, _, v in data], pa.float64()),
    })


@given(events)
@settings(max_examples=40, deadline=None)
def test_asof_prior_matches_duckdb(data):
    from d1_log_aggregation_ray.ops.relational import asof_join_prior
    t = _table(data)
    got = {r["event_id"]: r["prior_value"] for r in
           asof_join_prior(ray.data.from_arrow(t), key="user_id",
                           ts_col="ts", left_type="click",
                           right_type="view").take_all()}
    con = duckdb.connect()
    con.register("events", t)
    want = {eid: val for eid, val in con.execute("""
        SELECT a.event_id, b.value
        FROM (SELECT * FROM events WHERE event_type = 'click') a
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') b
          ON a.user_id = b.user_id AND a.ts > b.ts""").fetchall()}
    assert set(got) == set(want)
    for eid in want:
        g, w = got[eid], want[eid]
        if w is None or g is None:
            # DuckDB ASOF is unspecified among equal-(key,ts) right
            # rows; only null-ness must agree
            assert (g is None) == (w is None), eid
        else:
            assert g == w, eid


@given(events)
@settings(max_examples=40, deadline=None)
def test_sessionize_matches_duckdb(data):
    from d1_log_aggregation_ray.ops.sessions import sessionize
    t = _table(data)
    got = {r["user_id"]: (r["n_events"], r["n_sessions"]) for r in
           sessionize(ray.data.from_arrow(t), gap_s=10).take_all()}
    con = duckdb.connect()
    con.register("events", t)
    want = {u: (ne, ns) for u, ne, ns in con.execute("""
        SELECT user_id, count(*),
               CAST(SUM(CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL 10 SECOND
                        THEN 1 ELSE 0 END) AS BIGINT)
        FROM (SELECT user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_ts
              FROM events WHERE ts IS NOT NULL)
        GROUP BY user_id""").fetchall()}
    assert got == want


def _table_str_keys(data):
    """Same events but with STRING user keys (round-2 review: the
    int64-only key encoding returned hashes / raised for strings)."""
    t = _table(data)
    users = pa.array([None if u is None else f"user-{u}"
                      for u, _, _, _ in data], pa.string())
    return t.set_column(t.schema.get_field_index("user_id"),
                        "user_id", users)


@given(events)
@settings(max_examples=30, deadline=None)
def test_asof_prior_string_keys_matches_duckdb(data):
    from d1_log_aggregation_ray.ops.relational import asof_join_prior
    t = _table_str_keys(data)
    got = {r["event_id"]: r["prior_value"] for r in
           asof_join_prior(ray.data.from_arrow(t), key="user_id",
                           ts_col="ts", left_type="click",
                           right_type="view").take_all()}
    con = duckdb.connect()
    con.register("events", t)
    want = {eid: val for eid, val in con.execute("""
        SELECT a.event_id, b.value
        FROM (SELECT * FROM events WHERE event_type = 'click') a
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') b
          ON a.user_id = b.user_id AND a.ts > b.ts""").fetchall()}
    assert set(got) == set(want)
    for eid in want:
        g, w = got[eid], want[eid]
        if w is None or g is None:
            assert (g is None) == (w is None), eid
        else:
            assert g == w, eid


@given(events)
@settings(max_examples=30, deadline=None)
def test_sessionize_string_keys_matches_duckdb(data):
    """Output user_id must be the ORIGINAL string values (not the
    internal 64-bit hash) and the session math must hold."""
    from d1_log_aggregation_ray.ops.sessions import sessionize
    t = _table_str_keys(data)
    got = {r["user_id"]: (r["n_events"], r["n_sessions"]) for r in
           sessionize(ray.data.from_arrow(t), gap_s=10).take_all()}
    con = duckdb.connect()
    con.register("events", t)
    want = {u: (ne, ns) for u, ne, ns in con.execute("""
        SELECT user_id, count(*),
               CAST(SUM(CASE WHEN prev_ts IS NULL
                        OR ts - prev_ts > INTERVAL 10 SECOND
                        THEN 1 ELSE 0 END) AS BIGINT)
        FROM (SELECT user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_ts
              FROM events WHERE ts IS NOT NULL)
        GROUP BY user_id""").fetchall()}
    assert got == want


@given(events)
@settings(max_examples=30, deadline=None)
def test_tumbling_counts_matches_duckdb(data):
    from d1_log_aggregation_ray.ops.relational import tumbling_counts
    t = _table(data)
    def _k(row):  # None user sorts separately (python can't < None)
        u, w, n_ = row
        return (u is None, -1 if u is None else u, w, n_)
    got = sorted(((r["user_id"], r["window_start"], r["n"]) for r in
                  tumbling_counts(ray.data.from_arrow(t), key="user_id",
                                  ts_col="ts", window_s=20).take_all()),
                 key=_k)
    con = duckdb.connect()
    con.register("events", t)
    want = sorted((tuple(r) for r in con.execute("""
        SELECT user_id,
               make_timestamp((epoch_us(ts) // 20000000) * 20000000),
               count(*)
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1, 2""").fetchall()), key=_k)
    assert got == want


@given(events)
@settings(max_examples=30, deadline=None)
def test_distinct_count_matches_duckdb(data):
    from d1_log_aggregation_ray.ops.relational import distinct_count
    t = _table(data)
    got = {r["event_type"]: r["n_distinct"] for r in
           distinct_count(ray.data.from_arrow(t), key="event_type",
                          distinct_col="value").take_all()}
    con = duckdb.connect()
    con.register("events", t)
    want = dict(con.execute("""
        SELECT event_type, count(DISTINCT value)
        FROM events GROUP BY event_type""").fetchall())
    assert got == want


@given(events)
@settings(max_examples=40, deadline=None)
def test_topk_matches_duckdb(data):
    from d1_log_aggregation_ray.ops.relational import topk_per_key
    t = _table(data)
    def _k(pair):  # None user sorts separately (python can't < None)
        u, e = pair
        return (u is None, -1 if u is None else u, e)
    got = sorted(((r["user_id"], r["event_id"]) for r in
                  topk_per_key(ray.data.from_arrow(t), key="user_id",
                               order_col="value", k=2).take_all()), key=_k)
    con = duckdb.connect()
    con.register("events", t)
    want = sorted(((u, e) for u, e in con.execute("""
        SELECT user_id, event_id FROM (
          SELECT user_id, event_id,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM events) WHERE rn <= 2""").fetchall()), key=_k)
    assert got == want


# intervals: (user|None, lo seconds|None, width seconds|None) — width
# varies so the bounded-max-width candidate window is actually exercised
# with mixed widths, including zero-width and negative (degenerate) ones
intervals = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 4)),
        st.one_of(st.none(), st.integers(0, 50)),
        st.one_of(st.none(), st.integers(-3, 20)),
    ),
    min_size=0, max_size=30)


@given(events, intervals)
@settings(max_examples=40, deadline=None)
def test_interval_join_matches_duckdb(data, ivls):
    from d1_log_aggregation_ray.ops.relational import interval_join
    pts = _table(data)
    it = pa.table({
        "anchor_id": pa.array(range(len(ivls)), pa.int64()),
        "user_id": pa.array([u for u, _, _ in ivls], pa.int64()),
        "lo": pa.array([None if s is None else s * US
                        for _, s, _ in ivls], pa.int64()),
        "hi": pa.array([None if (s is None or w is None)
                        else (s + w) * US
                        for _, s, w in ivls], pa.int64()),
    })
    got = sorted((r["event_id"], r["anchor_id"]) for r in interval_join(
        ray.data.from_arrow(pts), ray.data.from_arrow(it),
        key="user_id", ts_col="ts", lo_col="lo", hi_col="hi",
        pt_id_col="event_id", ivl_id_col="anchor_id").take_all())
    con = duckdb.connect()
    con.register("pts", pts)
    con.register("ivls", it)
    want = sorted(map(tuple, con.execute("""
        SELECT p.event_id, i.anchor_id
        FROM pts p JOIN ivls i
          ON p.user_id = i.user_id
         AND epoch_us(p.ts) BETWEEN i.lo AND i.hi""").fetchall()))
    assert got == want


vals = st.lists(
    st.one_of(st.none(),
              st.floats(-1e6, 1e6, allow_nan=False, width=64)),
    min_size=1, max_size=200)


@given(vals)
@settings(max_examples=25, deadline=None)
def test_sampled_quantiles_matches_duckdb(data):
    from d1_log_aggregation_ray.ops.relational import sampled_quantiles
    t = pa.table({"event_id": pa.array(range(len(data)), pa.int64()),
                  "value": pa.array(data, pa.float64())})
    qs = [0.0, 0.25, 0.5, 0.99, 1.0]
    # rate 1000 = keep-all so every hypothesis case has a sample; the
    # hash-threshold path itself is covered by the sf-corpus oracle
    got = sampled_quantiles(ray.data.from_arrow(t), "value", "event_id",
                            qs, rate_permille=1000)
    got_rows = sorted(zip(got.column("q").to_pylist(),
                          got.column("value").to_pylist()))
    con = duckdb.connect()
    con.register("events", t)
    n_valid = sum(v is not None for v in data)
    if n_valid == 0:
        assert got.num_rows == 0 or all(
            v is None for v in got.column("value").to_pylist())
        return
    want = sorted(map(tuple, con.execute(f"""
        WITH agg AS (SELECT quantile_disc(value, {qs}) AS vs
                     FROM events WHERE value IS NOT NULL)
        SELECT CAST({qs}[i] AS DOUBLE) AS q, vs[i] AS value
        FROM agg, UNNEST(range(1, {len(qs) + 1})) AS t(i)""").fetchall()))
    assert got_rows == want


@given(events)
@settings(max_examples=30, deadline=None)
def test_rolling_window_sum_matches_duckdb(data):
    from d1_log_aggregation_ray.ops.relational import rolling_window_sum
    t = _table(data)
    got = sorted((r["event_id"], r["roll_sum"], r["roll_mean"]) for r in
                 rolling_window_sum(ray.data.from_arrow(t), key="user_id",
                                    ts_col="ts", val_col="value",
                                    k=3).take_all())
    con = duckdb.connect()
    con.register("events", t)
    want = sorted(map(tuple, con.execute("""
        SELECT event_id,
               CAST(sum(cents) OVER w AS BIGINT),
               CAST(sum(cents) OVER w AS DOUBLE) /
                 CAST(count(*) OVER w AS DOUBLE)
        FROM (SELECT event_id, user_id, ts,
                     CAST(floor(value * 100) AS BIGINT) AS cents
              FROM events WHERE value IS NOT NULL)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""").fetchall()))
    assert got == want


@given(events)
@settings(max_examples=30, deadline=None)
def test_value_deltas_matches_duckdb(data):
    from d1_log_aggregation_ray.ops.relational import value_deltas
    t = _table(data)
    got = sorted((r["event_id"], r["delta_cents"]) for r in
                 value_deltas(ray.data.from_arrow(t), key="user_id",
                              ts_col="ts", val_col="value").take_all())
    con = duckdb.connect()
    con.register("events", t)
    want = sorted(map(tuple, con.execute("""
        SELECT event_id,
               cents - LAG(cents) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
        FROM (SELECT event_id, user_id, ts,
                     CAST(floor(value * 100) AS BIGINT) AS cents
              FROM events WHERE value IS NOT NULL)""").fetchall()))
    assert got == want


ewma_events = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 4)),    # user index or NULL
        st.sampled_from(["view", "click", "other"]),
        st.one_of(st.none(), st.integers(0, 50)),   # ts seconds or null
        st.one_of(st.none(),                        # null value or
                  st.integers(-9, 9)),              # NEGATIVE-capable
    ),
    min_size=1, max_size=50)


def _ewma_table(data):
    return pa.table({
        "event_id": pa.array(range(len(data)), pa.int64()),
        "user_id": pa.array([u for u, _, _, _ in data], pa.int64()),
        "event_type": pa.array([e for _, e, _, _ in data]),
        "ts": pa.array([None if s is None else s * US
                        for _, _, s, _ in data], pa.timestamp("us")),
        "value": pa.array([None if v is None else float(v)
                           for _, _, _, v in data], pa.float64()),
    })


@given(ewma_events)
@settings(max_examples=40, deadline=None)
def test_grouped_ewma_matches_python_recursion(data):
    """grouped_ewma's rank-synchronous vectorized recursion must equal
    the naive per-row integer recursion on arbitrary tables — ts ties
    broken by event_id, null user/ts/VALUE rows dropped, NEGATIVE
    values exercising the floor-vs-trunc division boundary."""
    from d1_log_aggregation_ray.ops.relational import grouped_ewma
    t = _ewma_table(data)
    got = {r["event_id"]: r["ewma_cents"] for r in
           grouped_ewma(ray.data.from_arrow(t), key="user_id",
                        ts_col="ts", val_col="value").take_all()}
    rows = [(i, u, s, int(np.floor(v * 100.0)))
            for i, (u, _, s, v) in enumerate(data)
            if u is not None and s is not None and v is not None]
    rows.sort(key=lambda r: (r[1], r[2], r[0]))
    want, last_u, y = {}, None, 0
    for eid, u, _, cents in rows:
        y = cents if u != last_u else (cents + 3 * y) // 4
        want[eid] = y
        last_u = u
    assert got == want


@given(events)
@settings(max_examples=40, deadline=None)
def test_mad_outliers_matches_duckdb(data):
    """mad_outliers' in-partition median/MAD composition must equal
    the nested quantile_disc SQL on arbitrary tables (ties, singleton
    users, null keys/values)."""
    from d1_log_aggregation_ray.ops.relational import mad_outliers
    t = _table(data)
    got = {r["event_id"]: r["is_outlier"] for r in
           mad_outliers(ray.data.from_arrow(t), key="user_id",
                        val_col="value", k_mad=5).take_all()}
    con = duckdb.connect()
    con.register("events", t)
    want = {eid: flag for eid, flag in con.execute("""
        WITH c AS (
          SELECT event_id, user_id,
                 CAST(FLOOR(value * 100.0) AS BIGINT) AS cents
          FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
        ), med AS (
          SELECT user_id, quantile_disc(cents, 0.5) AS m
          FROM c GROUP BY user_id
        ), dev AS (
          SELECT c.event_id, c.user_id, ABS(c.cents - med.m) AS d
          FROM c JOIN med USING (user_id)
        ), mad AS (
          SELECT user_id, quantile_disc(d, 0.5) AS md
          FROM dev GROUP BY user_id
        )
        SELECT dev.event_id, CAST(dev.d > 5 * mad.md AS BIGINT)
        FROM dev JOIN mad USING (user_id)""").fetchall()}
    assert got == want
