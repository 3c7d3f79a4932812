"""HLL sketch: mergeability and accuracy vs the exact distinct count."""

import numpy as np
import pyarrow as pa

import ray.data

from d1_log_aggregation_ray.ops.sketch import HLL, approx_distinct, _hash_column
from d1_log_aggregation_ray.ops.relational import distinct_count


def test_hll_estimate_accuracy():
    rng = np.random.RandomState(1)
    h = HLL(p=12)
    n = 20_000
    hashes = rng.randint(-2**63, 2**63, size=n, dtype=np.int64).astype(np.uint64)
    h.add_hashes(hashes)
    est = h.estimate()
    assert abs(est - n) / n < 0.05  # ~1.6% expected at p=12


def test_hll_merge_equals_union():
    rng = np.random.RandomState(2)
    a_h = rng.randint(-2**63, 2**63, size=5000, dtype=np.int64).astype(np.uint64)
    b_h = rng.randint(-2**63, 2**63, size=5000, dtype=np.int64).astype(np.uint64)
    ha, hb, hu = HLL(), HLL(), HLL()
    ha.add_hashes(a_h)
    hb.add_hashes(b_h)
    hu.add_hashes(np.concatenate([a_h, b_h]))
    ha.merge(hb)
    assert ha.estimate() == hu.estimate()  # register-max merge is exact
    # serialization round trip
    assert HLL.from_bytes(ha.to_bytes()).estimate() == ha.estimate()


def test_approx_distinct_matches_exact_within_error():
    rng = np.random.RandomState(3)
    n = 30_000
    keys = rng.choice(["a", "b", "c"], size=n)
    vals = rng.randint(0, 5000, size=n)
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals)})
    ds = ray.data.from_arrow(t)
    approx = {r["k"]: r["n_distinct_approx"]
              for r in approx_distinct(ds, "k", "v").take_all()}
    exact = {r["k"]: r["n_distinct"]
             for r in distinct_count(ds, "k", "v").take_all()}
    for k in exact:
        rel = abs(approx[k] - exact[k]) / exact[k]
        assert rel < 0.08, f"{k}: approx {approx[k]} vs exact {exact[k]}"


def test_hash_column_stable():
    a = _hash_column(pa.array(["x", "y", "x"]))
    assert a[0] == a[2] != a[1]


def test_approx_distinct_null_keys():
    """Null keys form their own group (SQL GROUP BY semantics) and
    must survive the vectorized merge (dictionary indices of nulls are
    null — regression: NaN codes split the group / crashed take)."""
    t = pa.table({"k": pa.array(["a", None, "a", "b", None, None]),
                  "v": pa.array([1, 2, 3, 4, 5, 5])})
    out = {r["k"]: r["n_distinct_approx"] for r in
           approx_distinct(ray.data.from_arrow(t), "k", "v").take_all()}
    assert out == {"a": 2, "b": 1, None: 2}
    t2 = pa.table({"k": pa.array([None, None], pa.string()),
                   "v": pa.array([1, 2])})
    out2 = {r["k"]: r["n_distinct_approx"] for r in
            approx_distinct(ray.data.from_arrow(t2), "k", "v").take_all()}
    assert out2 == {None: 2}


def test_heavy_tokens_superset_and_overestimate():
    """CMS heavy hitters must (a) include every exactly-heavy token,
    (b) never underestimate, (c) at this vocab size (far below the
    2^14 slot width) match the exact counts exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from d1_log_aggregation_ray.ops.sketch import heavy_tokens

    rng = np.random.default_rng(13)
    vocab = [f"tok{i}" for i in range(500)]
    # token i appears ~ proportional to 1/(i+1): a heavy head
    weights = 1.0 / np.arange(1, len(vocab) + 1)
    weights /= weights.sum()
    texts = [" ".join(rng.choice(vocab, size=40, p=weights))
             for _ in range(400)]
    exact: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            exact[w] = exact.get(w, 0) + 1
    T = 150
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    got = {r["token"]: r["est"]
           for r in heavy_tokens(ds, threshold=T).take_all()}
    heavy_exact = {w for w, c in exact.items() if c >= T}
    assert heavy_exact <= set(got)          # superset
    for w, est in got.items():
        assert est >= exact.get(w, 0)       # never underestimates
    # 500 tokens into 4 x 16384 slots: collisions are overwhelmingly
    # unlikely, so estimates should be exact here
    for w in heavy_exact:
        assert got[w] == exact[w]


def test_heavy_tokens_parallelism_independent():
    import pyarrow as pa
    import ray.data
    from d1_log_aggregation_ray.ops.sketch import heavy_tokens

    texts = [("aa bb " * 30).strip()] * 50 + ["cc dd ee"] * 20
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    a = sorted((r["token"], r["est"]) for r in heavy_tokens(
        ray.data.from_arrow(t), threshold=100).take_all())
    b = sorted((r["token"], r["est"]) for r in heavy_tokens(
        ray.data.from_arrow(t).repartition(7), threshold=100).take_all())
    assert a == b
    assert [t for t, _ in a] == ["aa", "bb"]
