"""Unit tests for the per-conversation bucket-scan ops (ops/pairs.py):
SFT pair extraction, conversation stats, role-alternation violations.
Pure-function tests over hand-built Arrow tables — no Ray needed."""

import numpy as np
import pyarrow as pa

from d1_log_aggregation_ray.ops.pairs import (conv_fingerprint_scan,
                                              conv_stats_scan,
                                              conv_text_scan,
                                              role_violations_scan,
                                              sft_pairs_scan,
                                              tool_transitions_scan,
                                              turn_latency_scan)


def _t(rows):
    cols = list(zip(*rows))
    return pa.table({
        "conv_id": pa.array(cols[0], pa.string()),
        "turn_idx": pa.array(cols[1], pa.int32()),
        "role": pa.array(cols[2], pa.string()),
        "text": pa.array(cols[3], pa.string()),
        "tool": pa.array(cols[4], pa.string()),
        "ts": pa.array(cols[5], pa.timestamp("us")),
    })


BASE = _t([
    # conv a: user -> assistant -> user -> tool -> assistant
    ("a", 0, "user", "q1", None, 1_000_000),
    ("a", 1, "assistant", "r1", None, 2_000_000),
    ("a", 2, "user", "q2", None, 3_000_000),
    ("a", 3, "tool", "t", "search", 4_000_000),
    ("a", 4, "assistant", "r2", None, 9_000_000),
    # conv b: assistant first (no prior user -> dropped), then pair
    ("b", 0, "assistant", "orphan", None, None),
    ("b", 1, "user", "q3", None, 5_000_000),
    ("b", 2, "assistant", None, "calc", 5_500_000),
    # corrupt rows: filtered
    (None, 0, "user", "bad", None, 1),
    ("", 1, "user", "bad", None, 2),
])


def test_sft_pairs_semantics():
    # feed shuffled to prove the scan imposes its own order
    shuf = BASE.take(pa.array([7, 2, 9, 0, 5, 4, 8, 1, 6, 3]))
    out = sft_pairs_scan(shuf).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert out.column("conv_id").to_pylist() == ["a", "a", "b"]
    assert out.column("turn_idx").to_pylist() == [1, 4, 2]
    # r2 pairs with the NEAREST preceding user (q2), skipping the tool turn
    assert out.column("prompt").to_pylist() == ["q1", "q2", "q3"]
    assert out.column("response").to_pylist() == ["r1", "r2", None]


def test_conv_stats_semantics():
    out = conv_stats_scan(BASE).sort_by([("conv_id", "ascending")])
    assert out.column("conv_id").to_pylist() == ["a", "b"]
    assert out.column("n_turns").to_pylist() == [5, 3]
    assert out.column("n_assistant").to_pylist() == [2, 2]
    assert out.column("n_tool_calls").to_pylist() == [1, 1]
    # null text counts 0 chars
    assert out.column("n_chars").to_pylist() == [
        len("q1r1q2tr2"), len("orphanq3")]
    # duration over valid ts only (b's orphan row has null ts)
    assert out.column("dur_us").to_pylist() == [8_000_000, 500_000]


def test_conv_stats_null_duration():
    t = _t([("z", 0, "user", "x", None, None)])
    out = conv_stats_scan(t)
    assert out.column("dur_us").to_pylist() == [None]


def test_conv_text_assembly():
    # shuffled input: the scan imposes (conv_id, turn_idx) order;
    # NULL text joins as '' (conv b row 2)
    shuf = BASE.take(pa.array([7, 2, 9, 0, 5, 4, 8, 1, 6, 3]))
    out = conv_text_scan(shuf).sort_by([("conv_id", "ascending")])
    assert out.column("conv_id").to_pylist() == ["a", "b"]
    assert out.column("n_turns").to_pylist() == [5, 3]
    assert out.column("doc").to_pylist() == [
        "q1\nr1\nq2\nt\nr2", "orphan\nq3\n"]
    assert out.schema.field("doc").type == pa.large_string()
    # empty input is schema-stable
    empty = conv_text_scan(BASE.slice(0, 0))
    assert empty.num_rows == 0
    assert empty.schema.field("doc").type == pa.large_string()


def test_role_violations():
    t = _t([
        ("a", 0, "user", "x", None, 1),
        ("a", 1, "user", "x", None, 2),       # violation
        ("a", 2, "assistant", "x", None, 3),
        ("a", 3, "assistant", "x", None, 4),  # violation
        ("b", 0, "user", "x", None, 5),
        ("b", 1, "assistant", "x", None, 6),
        # boundary: b ends 'assistant', c starts 'assistant' -> NOT a violation
        ("c", 0, "assistant", "x", None, 7),
    ])
    out = role_violations_scan(t).sort_by([("conv_id", "ascending")])
    assert out.column("conv_id").to_pylist() == ["a", "b", "c"]
    assert out.column("n_violations").to_pylist() == [2, 0, 0]


def test_turn_latency():
    # shuffled input; latency is vs NEAREST preceding user turn
    shuf = BASE.take(pa.array([7, 2, 9, 0, 5, 4, 8, 1, 6, 3]))
    out = turn_latency_scan(shuf).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert out.column("conv_id").to_pylist() == ["a", "a", "b"]
    assert out.column("turn_idx").to_pylist() == [1, 4, 2]
    # a.4 pairs with q2 at ts=3s (skipping the tool turn): 9s - 3s
    assert out.column("latency_us").to_pylist() == [
        1_000_000, 6_000_000, 500_000]
    # b.0 (assistant with no prior user) is absent, not null


def test_turn_latency_null_ts():
    t = _t([
        ("z", 0, "user", "q", None, None),
        ("z", 1, "assistant", "r", None, 7),
    ])
    out = turn_latency_scan(t)
    assert out.column("latency_us").to_pylist() == [None]


def test_tool_transitions():
    t = _t([
        ("a", 0, "user", "x", None, 1),
        ("a", 1, "tool", "x", "search", 2),
        ("a", 2, "assistant", "x", "", 3),      # blank tool: skipped
        ("a", 3, "tool", "x", "calc", 4),       # search -> calc
        ("a", 4, "tool", "x", "calc", 5),       # calc -> calc
        ("b", 0, "tool", "x", "calc", 6),       # new conv: no bigram
        ("b", 1, "tool", "x", "search", 7),     # calc -> search
    ])
    out = tool_transitions_scan(t).sort_by(
        [("from_tool", "ascending"), ("to_tool", "ascending")])
    assert out.column("from_tool").to_pylist() == ["calc", "calc", "search"]
    assert out.column("to_tool").to_pylist() == ["calc", "search", "calc"]
    assert out.column("n").to_pylist() == [1, 1, 1]


def test_conv_fingerprint_order_invariant_and_distinct():
    shuf = BASE.take(pa.array([7, 2, 9, 0, 5, 4, 8, 1, 6, 3]))
    a = conv_fingerprint_scan(BASE).sort_by([("conv_id", "ascending")])
    b = conv_fingerprint_scan(shuf).sort_by([("conv_id", "ascending")])
    assert a.equals(b)
    assert a.column("conv_id").to_pylist() == ["a", "b"]
    fps = a.column("fp").to_pylist()
    assert fps[0] != fps[1] and all(len(f) == 16 for f in fps)
    # identical transcript content => identical fingerprint
    dup = BASE.filter(pa.compute.equal(BASE.column("conv_id"), "a"))
    dup = dup.set_column(0, "conv_id",
                         pa.array(["a2"] * dup.num_rows, pa.string()))
    both = conv_fingerprint_scan(pa.concat_tables([BASE, dup]))
    got = dict(zip(both.column("conv_id").to_pylist(),
                   both.column("fp").to_pylist()))
    assert got["a"] == got["a2"] != got["b"]


def test_empty_inputs_are_schema_stable():
    empty = BASE.slice(0, 0)
    for fn in (sft_pairs_scan, conv_stats_scan, role_violations_scan,
               turn_latency_scan, tool_transitions_scan,
               conv_fingerprint_scan):
        out = fn(empty)
        assert out.num_rows == 0
        assert len(out.schema) > 0
    # all-corrupt input also hits the typed-empty path
    bad = BASE.filter(pa.compute.is_null(BASE.column("conv_id")))
    assert sft_pairs_scan(bad).num_rows == 0


def test_context_windows_basic_and_truncation():
    from d1_log_aggregation_ray.ops.pairs import context_windows_scan
    out = context_windows_scan(BASE).to_pylist()
    by_key = {(r["conv_id"], r["turn_idx"]): r for r in out}
    # conv a, turn 1: one prior line, no truncation
    assert by_key[("a", 1)]["context"] == "user: q1"
    assert by_key[("a", 1)]["response"] == "r1"
    # conv a, turn 4: all four prior lines joined by \n
    assert by_key[("a", 4)]["context"] == (
        "user: q1\nassistant: r1\nuser: q2\ntool: t")
    # conv b, turn 0: first-turn assistant -> NULL context, row kept
    assert by_key[("b", 0)]["context"] is None
    assert by_key[("b", 0)]["response"] == "orphan"
    # conv b, turn 2: context never leaks conv a's lines; null text
    # renders as "role: " in the line and NULL in the response
    assert by_key[("b", 2)]["context"] == "assistant: orphan\nuser: q3"
    assert by_key[("b", 2)]["response"] is None
    # only assistant turns are emitted
    assert set(by_key) == {("a", 1), ("a", 4), ("b", 0), ("b", 2)}
    # tail truncation keeps the most recent chars
    tr = context_windows_scan(BASE, max_chars=10)
    got = {(r["conv_id"], r["turn_idx"]): r["context"]
           for r in tr.to_pylist()}
    assert got[("a", 4)] == "\nuser: q2\ntool: t"[-10:]
    assert got[("a", 1)] == "user: q1"  # short contexts untouched


def test_tool_loops_runs_and_boundaries():
    from d1_log_aggregation_ray.ops.pairs import tool_loops_scan
    t = _t([
        # conv a: search x2 (non-tool turn between -> run continues),
        # then calc breaks it, then search again (new run of 1)
        ("a", 0, "user", "q", None, 1),
        ("a", 1, "tool", "t", "search", 2),
        ("a", 2, "assistant", "r", None, 3),
        ("a", 3, "tool", "t", "search", 4),
        ("a", 4, "tool", "t", "calc", 5),
        ("a", 5, "tool", "t", "search", 6),
        # conv b: the stuck-agent loop, search x3; empty-string tool
        # rows are not tool calls
        ("b", 0, "tool", "t", "search", 1),
        ("b", 1, "tool", "t", "search", 2),
        ("b", 2, "tool", "t", "", 3),
        ("b", 3, "tool", "t", "search", 4),
        # conv c: no tool calls -> not emitted
        ("c", 0, "user", "q", None, 1),
        # run never spans conversations: d's search doesn't extend b's
        ("d", 0, "tool", "t", "search", 1),
    ])
    got = {r["conv_id"]: r["max_run"]
           for r in tool_loops_scan(t).to_pylist()}
    assert got == {"a": 2, "b": 3, "d": 1}


def test_ooo_turns_semantics():
    from d1_log_aggregation_ray.ops.pairs import ooo_turns_scan
    t = _t([
        # conv a: 10, 20, 15 (ooo), 25, 5 (ooo) -> n_ooo = 2
        ("a", 0, "user", "x", None, 10),
        ("a", 1, "assistant", "x", None, 20),
        ("a", 2, "user", "x", None, 15),
        ("a", 3, "assistant", "x", None, 25),
        ("a", 4, "user", "x", None, 5),
        # conv b: monotone + a null ts (skipped) -> 0
        ("b", 0, "user", "x", None, 1),
        ("b", 1, "assistant", "x", None, None),
        ("b", 2, "user", "x", None, 2),
        # conv c: all null ts -> absent from output
        ("c", 0, "user", "x", None, None),
        # corrupt conv ids filtered
        (None, 0, "user", "x", None, 3),
    ])
    # shuffled input: the scan imposes its own (conv, turn) order
    shuf = t.take(pa.array([5, 2, 9, 0, 8, 4, 1, 7, 3, 6]))
    out = ooo_turns_scan(shuf).sort_by([("conv_id", "ascending")])
    assert out.column("conv_id").to_pylist() == ["a", "b"]
    assert out.column("n_ooo").to_pylist() == [2, 0]


def test_tool_path_and_trigram_semantics():
    from d1_log_aggregation_ray.ops.pairs import (tool_path_scan,
                                                  tool_trigram_scan)
    t = _t([
        ("a", 0, "user", "x", None, 1),
        ("a", 1, "tool", "x", "grep", 2),
        ("a", 2, "assistant", "x", None, 3),
        ("a", 3, "tool", "x", "read", 4),
        ("a", 4, "tool", "x", "grep", 5),
        ("a", 5, "tool", "x", "edit", 6),
        ("b", 0, "tool", "x", "grep", 1),
        ("b", 1, "tool", "x", "read", 2),
        ("b", 2, "tool", "x", "grep", 3),
        ("b", 3, "tool", "x", "edit", 4),
        ("c", 0, "user", "x", None, 1),  # no tools: no path row
    ])
    paths = tool_path_scan(t).sort_by([("path", "ascending")])
    assert paths.column("path").to_pylist() == ["grep->read->grep->edit"]
    assert paths.column("n_convs").to_pylist() == [2]
    tri = tool_trigram_scan(t)
    got = {(r["t1"], r["t2"], r["t3"]): r["n"] for r in tri.to_pylist()}
    assert got == {("grep", "read", "grep"): 2, ("read", "grep", "edit"): 2}


def test_role_repair_keeps_first_of_each_run():
    """A A U U A collapses to A U A; per-conv independent; null/''
    conv rows dropped by the validity filter."""
    import pyarrow as pa

    from d1_log_aggregation_ray.ops.pairs import role_repair_scan

    batch = pa.table({
        "conv_id": pa.array(["c1"] * 5 + ["c2"] * 3 + [None]),
        "turn_idx": pa.array([0, 1, 2, 3, 4, 0, 1, 2, 0], pa.int32()),
        "role": pa.array(["assistant", "assistant", "user", "user",
                          "assistant", "user", "user", "user",
                          "assistant"]),
    })
    out = role_repair_scan(batch).to_pylist()
    assert [(r["conv_id"], r["turn_idx"], r["role"]) for r in out] == [
        ("c1", 0, "assistant"), ("c1", 2, "user"), ("c1", 4, "assistant"),
        ("c2", 0, "user")]


def test_role_merge_concatenates_runs():
    """A A U run structure: texts '\n'-joined per run, keyed by the
    run's first turn_idx, n_merged counts the run length."""
    import pyarrow as pa

    from d1_log_aggregation_ray.ops.pairs import role_merge_scan

    batch = pa.table({
        "conv_id": pa.array(["c1"] * 4 + ["c2"] * 2),
        "turn_idx": pa.array([0, 1, 2, 3, 0, 1], pa.int32()),
        "role": pa.array(["a", "a", "u", "a", "u", "u"]),
        "text": pa.array(["x", None, "y", "z", "p", "q"]),
    })
    out = role_merge_scan(batch).to_pylist()
    assert [(r["conv_id"], r["turn_idx"], r["role"], r["text"],
             r["n_merged"]) for r in out] == [
        ("c1", 0, "a", "x\n", 2),
        ("c1", 2, "u", "y", 1),
        ("c1", 3, "a", "z", 1),
        ("c2", 0, "u", "p\nq", 2)]
