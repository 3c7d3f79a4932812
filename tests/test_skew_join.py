"""Skew-aware hybrid join (ops/relational.skew_join_rows).

A planted hot key occupying most of the fact side must (a) be found by
the sampled heavy-hitter pass, (b) join through the broadcast branch,
and (c) produce exactly the rows a pandas merge produces — identical
whether the key rides the hot or the cold path.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from d1_log_aggregation_ray.ops.relational import (detect_hot_keys,
                                                   skew_join_rows)


def _mk(seed=7, n_right=20_000, hot_frac=0.6):
    rng = np.random.default_rng(seed)
    # dimension side: 200 keys, a few duplicate-key rows (general inner
    # join), one key (4242) absent from the right side
    keys = np.arange(100, 300)
    left = pd.DataFrame({
        "k": np.r_[keys, keys[:5], [4242]],
        "seg": [f"s{i % 7}" for i in range(len(keys) + 6)],
    })
    # fact side: one planted hot key = hot_frac of all rows, rest
    # uniform over the dim keys; some rows dangle (no dim match)
    n_hot = int(n_right * hot_frac)
    rk = np.r_[np.full(n_hot, 111),
               rng.choice(np.r_[keys, [9999]], n_right - n_hot)]
    right = pd.DataFrame({
        "rk": rk,
        "val": rng.integers(0, 1000, n_right),
    })
    return left, right


def _expected(left, right):
    m = left.merge(right, left_on="k", right_on="rk", how="inner")
    return m[["k", "seg", "val"]].sort_values(
        ["k", "seg", "val"], kind="mergesort").reset_index(drop=True)


def _norm(df):
    return df.sort_values(["k", "seg", "val"],
                          kind="mergesort").reset_index(drop=True)


def test_detect_hot_keys_finds_planted_key():
    _, right = _mk()
    ds = ray.data.from_arrow(pa.Table.from_pandas(right)) \
        .repartition(8)
    hot = detect_hot_keys(ds, "rk", hot_min_rows=1000)
    assert 111 in hot.tolist()
    # uniform keys (~40 rows each) must NOT be flagged at that floor
    assert len(hot) < 5


def test_skew_join_matches_pandas_merge():
    left, right = _mk()
    lds = ray.data.from_arrow(pa.Table.from_pandas(left)).repartition(3)
    rds = ray.data.from_arrow(pa.Table.from_pandas(right)).repartition(8)
    got = skew_join_rows(lds, rds, "k", "rk", ["seg"], ["val"],
                         hot_min_rows=1000).to_pandas()
    exp = _expected(left, right)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(_norm(got), exp,
                                  check_dtype=False)


def test_hot_and_cold_paths_agree():
    """Forcing the planted key through the cold path (empty hot set)
    must give the identical row multiset as the hybrid plan."""
    left, right = _mk(n_right=5_000)
    lds = ray.data.from_arrow(pa.Table.from_pandas(left))
    rds = ray.data.from_arrow(pa.Table.from_pandas(right)).repartition(4)
    hybrid = skew_join_rows(lds, rds, "k", "rk", ["seg"], ["val"],
                            hot_keys=np.array([111], np.int64)).to_pandas()
    cold = skew_join_rows(lds, rds, "k", "rk", ["seg"], ["val"],
                          hot_keys=np.array([], np.int64)).to_pandas()
    pd.testing.assert_frame_equal(_norm(hybrid), _norm(cold),
                                  check_dtype=False)


def test_null_keys_never_match():
    left = pd.DataFrame({"k": pd.array([1, 2, None], dtype="Int64"),
                         "seg": ["a", "b", "c"]})
    right = pd.DataFrame({"rk": pd.array([1, None, None], dtype="Int64"),
                          "val": [10, 20, 30]})
    lds = ray.data.from_arrow(pa.Table.from_pandas(left))
    rds = ray.data.from_arrow(pa.Table.from_pandas(right))
    got = skew_join_rows(lds, rds, "k", "rk", ["seg"], ["val"],
                         hot_keys=np.array([], np.int64)).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["k"] == 1 and got.iloc[0]["val"] == 10


def test_string_keys():
    left = pd.DataFrame({"k": ["a", "b", "c"], "seg": ["x", "y", "z"]})
    right = pd.DataFrame({"rk": ["a", "a", "c", "d"],
                          "val": [1, 2, 3, 4]})
    lds = ray.data.from_arrow(pa.Table.from_pandas(left))
    rds = ray.data.from_arrow(pa.Table.from_pandas(right))
    got = skew_join_rows(lds, rds, "k", "rk", ["seg"], ["val"],
                         hot_min_rows=2).to_pandas()
    exp = _expected(left, right)
    pd.testing.assert_frame_equal(_norm(got), exp, check_dtype=False)
