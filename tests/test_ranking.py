"""BM25 ranking (ops/ranking.py) against a from-scratch pure-python
reference on a planted corpus."""

import math

import numpy as np
import pyarrow as pa

import ray.data

from d1_log_aggregation_ray.ops.ranking import bm25_topk


def _bm25_reference(docs: dict[int, str], terms, k=10,
                    k1=1.2, b=0.75):
    toks = {i: t.split(" ") for i, t in docs.items()}
    n = len(toks)
    avgdl = sum(len(w) for w in toks.values()) / n
    df = {t: sum(1 for w in toks.values() if t in w) for t in terms}
    out = []
    for i, w in toks.items():
        s = 0.0
        for t in terms:
            tf = w.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(w) / avgdl))
        if s > 0:
            out.append((i, math.floor(s * 1e6 + 0.5) / 1e6))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def test_bm25_matches_reference():
    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "xx", "yy", "zz"]
    docs = {i: " ".join(rng.choice(vocab,
                                   size=rng.integers(5, 40)))
            for i in range(300)}
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([docs[i] for i in sorted(docs)]),
    }))
    got = bm25_topk(ds, terms=["alpha", "gamma"], k=10)
    want = _bm25_reference(docs, ["alpha", "gamma"], k=10)
    got_rows = list(zip(got.column("doc_id").to_pylist(),
                        got.column("score").to_pylist()))
    assert [i for i, _ in got_rows] == [i for i, _ in want]
    for (gi, gs), (wi, ws) in zip(got_rows, want):
        assert abs(gs - ws) < 1e-9, (gi, gs, ws)


def test_bm25_rare_term_outranks_common():
    # doc 0 holds the only occurrence of the rare term; a single rare
    # hit must outrank docs stuffed with the ubiquitous term
    rows = {"doc_id": pa.array(range(50), pa.int64()),
            "text": pa.array(
                ["needle common common common"] +
                ["common " * 5 + "filler"] * 49)}
    got = bm25_topk(ray.data.from_arrow(pa.table(rows)),
                    terms=["needle", "common"], k=3)
    assert got.column("doc_id")[0].as_py() == 0


def test_bm25_no_hits_returns_empty():
    rows = {"doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c", "d e f"])}
    got = bm25_topk(ray.data.from_arrow(pa.table(rows)),
                    terms=["missing"], k=5)
    assert got.num_rows == 0


def test_anti_join_keys_planted():
    import pyarrow as pa
    import ray.data
    from d1_log_aggregation_ray.ops.relational import anti_join_keys

    left = ray.data.from_arrow(pa.table(
        {"k": pa.array(range(100), pa.int64())}))
    # right covers everything except multiples of 7
    right_vals = [i for i in range(100) if i % 7 != 0] * 3  # with dups
    right = ray.data.from_arrow(pa.table(
        {"rk": pa.array(right_vals, pa.int64())}))
    got = sorted(r["k"] for r in anti_join_keys(
        left, right, "k", "rk").take_all())
    assert got == [i for i in range(100) if i % 7 == 0]
    # empty right keeps every left key
    empty = ray.data.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    got2 = sorted(r["k"] for r in anti_join_keys(
        left, empty, "k", "rk").take_all())
    assert got2 == list(range(100))


def test_zscore_per_key_hand_computed():
    import numpy as np
    import pyarrow as pa
    import ray.data
    from d1_log_aggregation_ray.ops.relational import zscore_per_key

    # user 1: values 1,2,3 -> mean 2, sample std 1 -> z = -1,0,1
    # user 2: single row -> dropped
    t = pa.table({
        "event_id": pa.array([10, 11, 12, 13], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, 99.0]),
    })
    out = {r["event_id"]: r["z"] for r in zscore_per_key(
        ray.data.from_arrow(t), "user_id", "value",
        "event_id").take_all()}
    assert out == {10: -1.0, 11: 0.0, 12: 1.0}

    # parallelism independence on a bigger random table
    rng = np.random.default_rng(4)
    n = 5000
    big = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 200, n), pa.int64()),
        "value": pa.array(rng.normal(50, 10, n)),
    })
    a = sorted((r["event_id"], r["z"]) for r in zscore_per_key(
        ray.data.from_arrow(big), "user_id", "value",
        "event_id").take_all())
    b = sorted((r["event_id"], r["z"]) for r in zscore_per_key(
        ray.data.from_arrow(big).repartition(13), "user_id", "value",
        "event_id").take_all())
    assert [i for i, _ in a] == [i for i, _ in b]
    assert max(abs(x - y) for (_, x), (_, y) in zip(a, b)) <= 1e-6
