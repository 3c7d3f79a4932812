"""Round-3 curation operators: n-gram decontamination, repetition
signals, exact distributed quantiles.  Each test checks the operator
against a hand-computed or independent pure-python reference (the
house rule from tests/test_independent_reference.py: goldens must not
come from the engine under test)."""

import math

import numpy as np
import pyarrow as pa

import ray.data

from d1_log_aggregation_ray.ops.decontam import contamination_hits
from d1_log_aggregation_ray.ops.relational import value_quantiles
from d1_log_aggregation_ray.ops.text import repetition_batch
from d1_log_aggregation_ray.functions.hashing import md5_lower64


def _bench_ids(ids, mod=100, lt=10):
    return {i for i in ids if md5_lower64(str(i)) % mod < lt}


def test_contamination_finds_planted_ngram_overlap():
    # find one bench id and one corpus id under the house hash split
    bench_id = next(i for i in range(1000)
                    if md5_lower64(str(i)) % 100 < 10)
    corpus = [i for i in range(1000) if md5_lower64(str(i)) % 100 >= 10]
    shared = " ".join(f"w{j}" for j in range(8))  # one exact 8-gram
    rows = {
        "doc_id": [bench_id, corpus[0], corpus[1], corpus[2]],
        "text": [
            "aa bb " + shared + " cc",
            "zz yy " + shared,             # contains the bench 8-gram
            shared + " " + shared,         # same gram twice -> 1 distinct
            "totally different words here with no overlap at all ok",
        ],
    }
    ds = ray.data.from_arrow(pa.table(rows))
    out = contamination_hits(ds, n=8).to_pandas().set_index("doc_id")
    assert set(out.index) == {corpus[0], corpus[1]}
    assert out.loc[corpus[0], "n_hits"] == 1
    assert out.loc[corpus[1], "n_hits"] == 1  # distinct grams, not hits


def test_contamination_counts_distinct_shared_grams():
    bench_id = next(i for i in range(1000)
                    if md5_lower64(str(i)) % 100 < 10)
    cid = next(i for i in range(1000) if md5_lower64(str(i)) % 100 >= 10)
    # bench doc of 10 tokens -> 3 distinct 8-grams; corpus doc repeats
    # the full 10-token span, sharing all 3
    span = " ".join(f"t{j}" for j in range(10))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [bench_id, cid],
        "text": [span, "x " + span + " y"],
    }))
    out = contamination_hits(ds, n=8).to_pandas()
    assert out.to_dict("records") == [{"doc_id": cid, "n_hits": 3}]


def test_contamination_empty_bench_is_empty_not_error():
    cid = next(i for i in range(1000) if md5_lower64(str(i)) % 100 >= 10)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [cid], "text": ["a b c d e f g h i j"]}))
    out = contamination_hits(ds, n=8).to_pandas()
    assert len(out) == 0


def test_contamination_no_cross_document_grams():
    # two bench docs of 4 tokens each: no single doc has an 8-gram, and
    # grams must NOT span the doc boundary
    b = sorted(_bench_ids(range(1000)))[:2]
    cid = next(i for i in range(1000) if md5_lower64(str(i)) % 100 >= 10)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [b[0], b[1], cid],
        "text": ["a b c d", "e f g h", "a b c d e f g h"],
    }))
    out = contamination_hits(ds, n=8).to_pandas()
    assert len(out) == 0


def test_repetition_hand_computed():
    t = pa.table({
        "doc_id": [0, 1, 2],
        "text": [
            "a b a b a",     # 5 tokens, 2 distinct, top bigram 'a b' x2
            "x y z",         # no repetition, every bigram unique
            "q",             # single token: no bigram
        ],
    })
    out = repetition_batch(t)
    assert out.column("n_tokens").to_pylist() == [5, 3, 1]
    assert out.column("n_dup_tokens").to_pylist() == [3, 0, 0]
    assert out.column("top_2gram_count").to_pylist() == [2, 1, 0]


def test_repetition_matches_python_reference():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 40))))
             for _ in range(200)]
    out = repetition_batch(pa.table({"text": texts}))
    for i, txt in enumerate(texts):
        w = txt.split(" ")
        assert out.column("n_tokens")[i].as_py() == len(w)
        assert out.column("n_dup_tokens")[i].as_py() == len(w) - len(set(w))
        pairs = list(zip(w, w[1:]))
        top = max((pairs.count(p) for p in set(pairs)), default=0)
        assert out.column("top_2gram_count")[i].as_py() == top


def test_value_quantiles_matches_disc_rule_across_batches():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, size=5000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(7)
    qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    out = value_quantiles(ds, "v", qs)
    s = np.sort(vals)
    expect = [int(s[max(math.ceil(q * len(s)) - 1, 0)]) for q in qs]
    assert out.column("value").to_pylist() == expect
    assert out.column("q").to_pylist() == qs
