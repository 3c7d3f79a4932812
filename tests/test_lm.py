"""Bigram-LM quality scoring (ops/lm.py) vs an independent pure-python
reference (Counter + dict loops, no shared code), plus hand-computed
probabilities, bounded-model backoff, and parallelism independence."""

import math
from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data

from d1_log_aggregation_ray.ops.lm import BACKOFF_LOGP, lm_score


def _ref_scores(texts, max_bigrams=100_000):
    big = Counter()
    for t in texts:
        ws = (t or "").split(" ")
        for p in zip(ws, ws[1:]):
            big[p] += 1
    kept = sorted(big.items(),
                  key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:max_bigrams]
    left_tot = Counter()
    for (a, _), c in big.items():
        left_tot[a] += c
    logp = {p: math.log2(c / left_tot[p[0]]) for p, c in kept}
    out = []
    for t in texts:
        ws = (t or "").split(" ")
        if len(ws) < 2:
            out.append(BACKOFF_LOGP)
            continue
        s = 0.0
        for p in zip(ws, ws[1:]):
            s += logp.get(p, BACKOFF_LOGP)
        out.append(s / (len(ws) - 1))
    return out


def _ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))


def test_lm_score_hand_computed():
    """corpus 'a b' x3 + 'a c': c(a,b)=3, c(a,c)=1, c(a,*)=4 ->
    P(b|a)=3/4, P(c|a)=1/4; single-pair docs score log2 of their
    pair's probability; a one-token doc scores the backoff."""
    texts = ["a b", "a b", "a b", "a c", "x"]
    got = {r["doc_id"]: r["lm_score"]
           for r in lm_score(_ds(texts)).take_all()}
    assert got[0] == got[1] == got[2] == math.log2(3 / 4)
    assert got[3] == math.log2(1 / 4)
    assert got[4] == BACKOFF_LOGP


def test_lm_score_matches_independent_reference():
    rng = np.random.default_rng(13)
    vocab = ["w%d" % i for i in range(60)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 50)))
             for _ in range(400)] + [None, ""]
    want = _ref_scores(texts)
    got = {r["doc_id"]: r["lm_score"]
           for r in lm_score(_ds(texts)).take_all()}
    assert len(got) == len(texts)
    # math.log2 and np.log2 can differ in the last ulp for the same
    # integer ratio, so the cross-implementation check is 1e-12
    # relative; the PIN's bit-exactness only requires the engine to
    # agree with itself (np.log2 throughout), which the parallelism
    # test below asserts exactly
    for i, w in enumerate(want):
        assert math.isclose(got[i], w, rel_tol=1e-12, abs_tol=1e-12), \
            (i, got[i], w)


def test_lm_score_bounded_model_backoff_and_parallelism():
    """max_bigrams=2 keeps only the two most frequent bigrams; every
    other pair scores the backoff — and the result is identical at a
    different block layout."""
    texts = ["p q", "p q", "q r", "q r", "r s"]
    want = _ref_scores(texts, max_bigrams=2)
    got = {r["doc_id"]: r["lm_score"] for r in lm_score(
        _ds(texts), max_bigrams=2).take_all()}
    assert [got[i] for i in range(len(texts))] == want
    got2 = {r["doc_id"]: r["lm_score"] for r in lm_score(
        _ds(texts).repartition(4), max_bigrams=2).take_all()}
    assert got == got2
