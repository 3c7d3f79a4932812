"""Property-based parity for the round-3 late ops: on arbitrary
generated inputs (empty groups, ties, singleton keys, degenerate
texts), zscore_per_key / anti_join_keys / entropy_batch / train_split
must match an independently-evaluated reference (DuckDB on the same
in-memory table, or pure python)."""

import math

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

import ray.data

from d1_log_aggregation_ray.functions.hashing import md5_lower64
from d1_log_aggregation_ray.ops.relational import (anti_join_keys,
                                                   zscore_per_key)
from d1_log_aggregation_ray.ops.split import train_split
from d1_log_aggregation_ray.ops.text import entropy_batch

_SETTINGS = dict(max_examples=25, deadline=None)


events = st.lists(
    st.tuples(st.integers(0, 4),                    # user
              st.integers(-50, 50)),                # value (int -> exact)
    min_size=1, max_size=60)


@settings(**_SETTINGS)
@given(events)
def test_zscore_matches_duckdb(data):
    t = pa.table({
        "event_id": pa.array(range(len(data)), pa.int64()),
        "user_id": pa.array([u for u, _ in data], pa.int64()),
        "value": pa.array([float(v) for _, v in data]),
    })
    got = {r["event_id"]: r["z"] for r in zscore_per_key(
        ray.data.from_arrow(t), "user_id", "value",
        "event_id").take_all()}
    con = duckdb.connect()
    con.register("events", t)
    want = dict(con.execute("""
        WITH m AS (SELECT user_id, count(*) n, SUM(value) s,
                          SUM(value*value) ss FROM events GROUP BY user_id)
        SELECT e.event_id,
               CASE WHEN (m.ss - m.s*m.s/m.n)/(m.n-1) > 0
                    THEN ROUND((e.value - m.s/m.n)
                         / SQRT((m.ss - m.s*m.s/m.n)/(m.n-1)), 6) END
        FROM events e JOIN m USING (user_id) WHERE m.n > 1""").fetchall())
    assert set(got) == set(want)
    for k in got:
        if want[k] is None:   # degenerate zero-variance group
            assert got[k] is None
        else:
            assert abs(got[k] - want[k]) <= 1e-6


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 30), min_size=0, max_size=40),
       st.lists(st.integers(0, 30), min_size=0, max_size=40))
def test_anti_join_matches_set_difference(lk, rk):
    left = ray.data.from_arrow(pa.table({"a": pa.array(lk, pa.int64())}))
    right = ray.data.from_arrow(pa.table({"b": pa.array(rk, pa.int64())}))
    got = sorted(r["a"] for r in anti_join_keys(
        left, right, "a", "b").take_all())
    assert got == sorted(x for x in lk if x not in set(rk))


@settings(**_SETTINGS)
@given(st.lists(st.lists(st.sampled_from("ab cd".split() + ["x"]),
                         min_size=1, max_size=20),
                min_size=1, max_size=20))
def test_entropy_matches_pure_python(docs):
    texts = [" ".join(ws) for ws in docs]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = {r["doc_id"]: r["entropy"]
           for r in ray.data.from_arrow(t).map_batches(
               entropy_batch, batch_format="pyarrow").take_all()}
    for i, txt in enumerate(texts):
        w = txt.split(" ")
        tf = {}
        for x in w:
            tf[x] = tf.get(x, 0) + 1
        h = math.log2(len(w)) - sum(
            c * math.log2(c) for c in tf.values()) / len(w)
        assert abs(out[i] - math.floor(h * 1e6 + 0.5) / 1e6) <= 1e-9


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=50,
                unique=True))
def test_train_split_matches_hash_rule(ids):
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    out = {r["doc_id"]: r["split"] for r in train_split(
        ray.data.from_arrow(t)).take_all()}
    for i in ids:
        h = md5_lower64(f"s42:{i}") % 100
        want = "train" if h < 80 else ("val" if h < 90 else "test")
        assert out[i] == want


# --- context_windows vs a naive per-row python reference -------------

_conv_rows = st.lists(
    st.tuples(st.sampled_from(["c1", "c2", "c3"]),          # conv_id
              st.sampled_from(["user", "assistant", "tool",
                               None]),                       # role
              st.one_of(st.none(),
                        st.text(st.characters(
                            whitelist_categories=("L", "N"),
                            whitelist_characters=" :\né"),
                            max_size=12))),                  # text
    min_size=0, max_size=40)


@settings(**_SETTINGS)
@given(_conv_rows, st.integers(1, 25))
def test_context_windows_matches_naive_reference(rows, budget):
    from d1_log_aggregation_ray.ops.pairs import context_windows_scan
    t = pa.table({
        "conv_id": pa.array([c for c, _, _ in rows], pa.string()),
        "turn_idx": pa.array(range(len(rows)), pa.int32()),
        "role": pa.array([r for _, r, _ in rows], pa.string()),
        "text": pa.array([x for _, _, x in rows], pa.string()),
    })
    got = {(r["conv_id"], r["turn_idx"]):
           (r["context"], r["response"])
           for r in context_windows_scan(t, max_chars=budget).to_pylist()}
    # naive reference: accumulate lines per conv in turn order
    want = {}
    hist: dict = {}
    order = sorted(range(len(rows)), key=lambda i: rows[i][0])
    for i in order:
        conv, role, text = rows[i]
        if role == "assistant":
            ctx = "\n".join(hist.get(conv, ())) or None
            want[(conv, i)] = (ctx if ctx is None else ctx[-budget:],
                               text)
        hist.setdefault(conv, []).append(
            f"{role or ''}: {text or ''}")
    assert got == want
