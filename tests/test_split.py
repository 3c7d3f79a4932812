"""Corpus split / shuffle / composition operators (ops/split.py):
invariants checked against independent pure-python references, not
the engine under test."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from d1_log_aggregation_ray.functions.hashing import md5_lower64
from d1_log_aggregation_ray.ops.split import (shuffle_shards,
                                              source_stats, train_split)


def _docs_table(n=2000):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array([f"src{i % 7}" for i in range(n)]),
        "lang": pa.array(["en", "de", "fr"][i % 3] for i in range(n)),
        "n_chars": pa.array([(i * 37) % 500 + 10 for i in range(n)],
                            pa.int64()),
    })


def test_train_split_matches_reference_and_proportions():
    t = _docs_table()
    out = train_split(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == t.num_rows
    # independent reference: same md5 math in pure python
    for _, row in out.sample(n=100, random_state=0).iterrows():
        h = md5_lower64(f"s42:{row.doc_id}") % 100
        want = "train" if h < 80 else ("val" if h < 90 else "test")
        assert row.split == want
    frac = out.split.value_counts(normalize=True)
    assert 0.72 < frac["train"] < 0.88
    assert 0.05 < frac["val"] < 0.15
    assert 0.05 < frac["test"] < 0.15


def test_train_split_deterministic_across_block_layouts():
    t = _docs_table(500)
    a = train_split(ray.data.from_arrow(t)).to_pandas()
    b = train_split(
        ray.data.from_arrow(t).repartition(13)).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_shuffle_shards_is_a_permutation():
    t = _docs_table(1000)
    out = shuffle_shards(ray.data.from_arrow(t), n_shards=8).to_pandas()
    assert len(out) == 1000
    assert sorted(out.doc_id) == list(range(1000))
    for sid, g in out.groupby("shard_id"):
        # pos is dense 0..len-1 within the shard
        assert sorted(g.pos) == list(range(len(g)))
        # shard assignment and internal order match the reference hash
        for _, row in g.head(5).iterrows():
            assert md5_lower64(f"s42:{row.doc_id}") % 8 == sid
        ref = sorted(g.doc_id,
                     key=lambda i: (md5_lower64(f"s42:{i}"), i))
        assert list(g.sort_values("pos").doc_id) == ref


def test_shuffle_shards_parallelism_independent():
    t = _docs_table(600)
    a = shuffle_shards(ray.data.from_arrow(t)).to_pandas()
    b = shuffle_shards(ray.data.from_arrow(t).repartition(11)).to_pandas()
    key = ["doc_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_source_stats_matches_pandas():
    t = _docs_table(900)
    out = source_stats(ray.data.from_arrow(t)).to_pandas()
    df = t.to_pandas()
    ref = df.groupby("source").agg(
        n_docs=("doc_id", "size"), total_chars=("n_chars", "sum"),
        n_langs=("lang", "nunique")).reset_index()
    out = out.sort_values("source").reset_index(drop=True)
    ref = ref.sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(out[ref.columns], ref,
                                  check_dtype=False)


def test_temperature_thresholds_match_spec():
    """Recompute the mT5 rule from the paper's formula with
    independently-written math: q_s = p_s^a / sum(p_t^a) over
    FRACTIONS p_s = n_s/N (the helper uses raw counts — the N^a
    factor cancels in the normalization, so both must agree)."""
    from d1_log_aggregation_ray.ops.split import temperature_thresholds
    counts = {"en": 218, "zh": 75, "es": 73, "de": 70, "fr": 64}
    alpha, budget = 0.5, 300
    n_total = sum(counts.values())
    p = {s: c / n_total for s, c in counts.items()}
    z = sum(v ** alpha for v in p.values())
    got = temperature_thresholds(counts, alpha, budget)
    import math
    for s, c in counts.items():
        target = math.floor(budget * (p[s] ** alpha) / z)
        want = math.floor(1_000_000 * min(1.0, target / c))
        assert got[s] == want
    # the dominant language is downweighted RELATIVE to the tail
    assert got["en"] < got["fr"]


def test_temperature_mix_rebalances_languages():
    from d1_log_aggregation_ray.ops.split import temperature_mix
    n_en, n_rare = 1600, 100
    t = pa.table({
        "doc_id": pa.array(range(n_en + n_rare), pa.int64()),
        "lang": pa.array(["en"] * n_en + ["sw"] * n_rare),
    })
    out = temperature_mix(ray.data.from_arrow(t), alpha=0.5,
                          budget_docs=500,
                          source_col="lang").to_pandas()
    by = out.groupby("lang").size()
    # alpha=0.5: weights 40:10 -> targets 400:100 -> en keep-rate 25%,
    # sw keep-all — the rare language keeps ~4x the relative share
    assert by.get("sw", 0) == n_rare
    assert 320 <= by.get("en", 0) <= 480
    # deterministic across block layouts
    out2 = temperature_mix(ray.data.from_arrow(t).repartition(9),
                           alpha=0.5, budget_docs=500,
                           source_col="lang").to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_mixture_sample_caps_dominant_source():
    from d1_log_aggregation_ray.ops.split import mixture_sample
    # src_big: 100k chars total; src_small: 3k chars -> kept whole
    n_big, n_small = 1000, 30
    t = pa.table({
        "doc_id": pa.array(range(n_big + n_small), pa.int64()),
        "source": pa.array(["src_big"] * n_big + ["src_small"] * n_small),
        "n_chars": pa.array([100] * (n_big + n_small), pa.int64()),
    })
    out = mixture_sample(ray.data.from_arrow(t),
                         budget_chars=10_000.0).to_pandas()
    by = out.groupby("source").size()
    # src_small is under budget: every doc kept
    assert by.get("src_small", 0) == n_small
    # src_big keep-rate = 10k/100k = 10%: binomial-ish around 100
    assert 60 <= by.get("src_big", 0) <= 140
    # deterministic: re-run identical
    out2 = mixture_sample(ray.data.from_arrow(t).repartition(9),
                          budget_chars=10_000.0).to_pandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_exact_sample_matches_hashlib_reference():
    """Independent reference: full hashlib md5 sort (no shared code
    with the operator's local-top-n + merge path)."""
    import hashlib

    from d1_log_aggregation_ray.ops.split import exact_sample
    ids = list(range(1000, 1200))
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    # many tiny blocks so the local-top-n path is actually exercised
    ds = ray.data.from_arrow(t).repartition(13)
    out = exact_sample(ds, n=25)
    lo64 = [int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:],
                           "little") for i in ids]
    want = [i for _, i in sorted(zip(lo64, ids))][:25]
    assert out.column("doc_id").to_pylist() == want
    assert out.column("sample_rank").to_pylist() == list(range(1, 26))


def test_exact_sample_n_exceeds_corpus():
    from d1_log_aggregation_ray.ops.split import exact_sample
    t = pa.table({"doc_id": pa.array([5, 3, 9], pa.int64())})
    out = exact_sample(ray.data.from_arrow(t), n=10)
    assert out.num_rows == 3
    assert sorted(out.column("doc_id").to_pylist()) == [3, 5, 9]
