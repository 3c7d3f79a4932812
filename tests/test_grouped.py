"""grouped_quantiles and grouped_mode must match pandas oracles exactly
(including quantile_disc rank semantics, mode tie-breaks, and NULL
skipping); cum_chars_scan is pure-arrow tested for per-segment rebasing
and NULL-text zeroing."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from d1_log_aggregation_ray.ops.pairs import cum_chars_scan
from d1_log_aggregation_ray.ops.relational import (grouped_mode,
                                                   grouped_quantiles)


def _ds(t: pa.Table) -> ray.data.Dataset:
    # many small blocks so partials genuinely merge across batches
    return ray.data.from_arrow(t).map_batches(
        lambda b: b, batch_size=500, batch_format="pyarrow")


def test_grouped_quantiles_matches_quantile_disc():
    rng = np.random.RandomState(11)
    n = 10_000
    keys = [f"k{v}" for v in rng.randint(0, 40, n)]
    vals = rng.randint(0, 300, n).astype(np.int64)
    mask = rng.rand(n) < 0.03  # some NULL values must be skipped
    t = pa.table({"k": pa.array(keys),
                  "v": pa.array(vals, mask=mask)})
    qs = [0.25, 0.5, 0.9]
    got = grouped_quantiles(_ds(t), "k", "v", qs).to_pandas()

    df = t.to_pandas().dropna(subset=["v"])
    rows = []
    for k, g in df.groupby("k"):
        s = np.sort(g["v"].to_numpy().astype(np.int64))
        for q in qs:
            rank = max(math.ceil(q * len(s)) - 1, 0)
            rows.append((k, float(q), int(s[rank])))
    want = pd.DataFrame(rows, columns=["k", "q", "value"])
    got = got.sort_values(["k", "q"]).reset_index(drop=True)
    want = want.sort_values(["k", "q"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_grouped_quantiles_float_values_bit_exact():
    # value_type=float64: the picked element is COPIED, never
    # recomputed — compare bit-exact against the sorted-multiset rank
    rng = np.random.RandomState(7)
    n = 5_000
    keys = [f"k{v}" for v in rng.randint(0, 10, n)]
    vals = np.round(rng.rand(n) * 200, 2)
    mask = rng.rand(n) < 0.05
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals, mask=mask)})
    qs = [0.05, 0.95]
    got = grouped_quantiles(_ds(t), "k", "v", qs,
                            value_type=pa.float64()).to_pandas()
    assert got["value"].dtype.kind == "f"
    df = t.to_pandas().dropna(subset=["v"])
    rows = []
    for k, g in df.groupby("k"):
        s = np.sort(g["v"].to_numpy())
        for q in qs:
            rank = max(math.ceil(q * len(s)) - 1, 0)
            rows.append((k, float(q), float(s[rank])))
    want = pd.DataFrame(rows, columns=["k", "q", "value"])
    got = got.sort_values(["k", "q"]).reset_index(drop=True)
    want = want.sort_values(["k", "q"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_grouped_mode_tie_breaks_to_smallest_value():
    t = pa.table({
        "k": pa.array(["a"] * 4 + ["b"] * 3 + ["c"] * 2 + [None]),
        "v": pa.array(["y", "x", "y", "x",      # a: tie 2-2 -> x
                       "z", "z", "w",           # b: z wins 2-1
                       "q", None,               # c: q (null skipped)
                       "v"]),                   # null key skipped
    })
    got = grouped_mode(_ds(t), "k", "v").to_pandas().sort_values(
        "k").reset_index(drop=True)
    want = pd.DataFrame({"k": ["a", "b", "c"],
                         "top_value": ["x", "z", "q"],
                         "n": [2, 2, 1]})
    pd.testing.assert_frame_equal(got, want)


def test_grouped_mode_matches_pandas():
    rng = np.random.RandomState(3)
    n = 8_000
    t = pa.table({
        "k": pa.array([f"c{v}" for v in rng.randint(0, 500, n)]),
        "v": pa.array([f"t{v}" for v in rng.randint(0, 12, n)]),
    })
    got = grouped_mode(_ds(t), "k", "v").to_pandas()
    df = t.to_pandas()
    cnt = df.groupby(["k", "v"]).size().reset_index(name="n")
    cnt = cnt.sort_values(["k", "n", "v"],
                          ascending=[True, False, True], kind="mergesort")
    want = cnt.groupby("k").head(1).reset_index(drop=True)
    got = got.sort_values("k").reset_index(drop=True).rename(
        columns={"top_value": "v"})[["k", "v", "n"]]
    pd.testing.assert_frame_equal(got, want[["k", "v", "n"]])


def test_cum_chars_scan():
    t = pa.table({
        "conv_id": pa.array(["a", "a", "a", "b", "b", "", None]),
        "turn_idx": pa.array([2, 0, 1, 1, 0, 0, 0], pa.int32()),
        "role": pa.array(["u"] * 7),
        "text": pa.array(["dd", "abc", None, "xy", "z", "ignored", "me"]),
        "tool": pa.array([None] * 7, pa.string()),
        "ts": pa.array([0] * 7, pa.timestamp("us")),
    })
    out = cum_chars_scan(t)
    assert out.column("conv_id").to_pylist() == ["a", "a", "a", "b", "b"]
    assert out.column("turn_idx").to_pylist() == [0, 1, 2, 0, 1]
    # a: 3, 3+0 (null), 3+0+2; b rebased: 1, 1+2
    assert out.column("cum_chars").to_pylist() == [3, 3, 5, 1, 3]
    empty = cum_chars_scan(t.slice(0, 0))
    assert empty.num_rows == 0 and len(empty.schema) == 3


def test_percent_rank_tie_and_singleton_semantics():
    """RANK ties (shared first-occurrence rank), (rank-1)/(n-1)
    division, singleton groups -> 0.0 — checked against pandas'
    rank(method='min') reference."""
    from d1_log_aggregation_ray.ops.relational import percent_rank_per_key
    t = pa.table({
        "doc_id": pa.array(list(range(9)), pa.int64()),
        "source": pa.array(["a"] * 5 + ["b"] * 3 + ["c"]),
        "n_chars": pa.array([10, 20, 20, 30, 40, 7, 7, 7, 99],
                            pa.int64())})
    out = percent_rank_per_key(
        ray.data.from_arrow(t).repartition(4),
        key_col="source", val_col="n_chars").take_all()
    got = {r["doc_id"]: r["pct_rank"] for r in out}
    df = t.to_pandas()
    ref = {}
    for _, g in df.groupby("source"):
        r = g["n_chars"].rank(method="min")
        n = len(g)
        for d, rk in zip(g["doc_id"], r):
            ref[d] = 0.0 if n == 1 else (rk - 1) / (n - 1)
    assert got == ref
    # all three identical values in group b share rank 1 -> pct 0.0
    assert got[5] == got[6] == got[7] == 0.0


def test_grouped_corr_matches_numpy_and_guards():
    """grouped_corr vs np.corrcoef per key; degenerate groups (n=1,
    zero variance either side) dropped; string keys emit ORIGINAL
    key values; partition-count independent."""
    from d1_log_aggregation_ray.ops.relational import grouped_corr
    rng = np.random.default_rng(3)
    keys = [f"u{int(i)}" for i in rng.integers(0, 40, 3000)]
    x = rng.normal(10, 3, 3000)
    y = 0.6 * x + rng.normal(0, 2, 3000)
    # degenerate rows: singleton key, zero-variance-x key
    keys += ["solo", "flatx", "flatx", "flatx"]
    x = np.r_[x, 1.0, 5.0, 5.0, 5.0]
    y = np.r_[y, 2.0, 1.0, 2.0, 3.0]
    t = pa.table({"k": pa.array(keys), "x": pa.array(x),
                  "y": pa.array(y)})
    got = {r["k"]: r["corr"] for r in grouped_corr(
        ray.data.from_arrow(t), "k", "x", "y").take_all()}
    assert "solo" not in got and "flatx" not in got
    assert set(got) == {f"u{i}" for i in range(40)}
    df = pd.DataFrame({"k": keys, "x": x, "y": y})
    for k, g in df.groupby("k"):
        if k in ("solo", "flatx"):
            continue
        want = np.corrcoef(g["x"], g["y"])[0, 1]
        assert math.isclose(got[k], want, abs_tol=2e-6), (k, got[k], want)
    got7 = {r["k"]: r["corr"] for r in grouped_corr(
        ray.data.from_arrow(t).repartition(7), "k", "x", "y")
        .take_all()}
    assert got7 == got
