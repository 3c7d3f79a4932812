"""BPE merge-rule induction (ops/text.bpe_train): hand-verifiable
first merges on the classic Sennrich-style corpus, a full comparison
against an INDEPENDENT recount-from-scratch reference (no incremental
bookkeeping, different data structures), and parallelism independence.
"""

import collections

import numpy as np
import pyarrow as pa

import ray.data

from d1_log_aggregation_ray.ops.text import bpe_train


def _ref_bpe(texts, n_merges=60):
    """Independent reference: recompute EVERY pair count from scratch
    each round over a Counter of space-joined symbol strings — no
    shared code or incremental state with the engine's trainer."""
    wc = collections.Counter(
        w for t in texts for w in (t or "").split(" ") if w)
    vocab = {" ".join(w): c for w, c in wc.items()}
    merges = []
    for rank in range(n_merges):
        pairs = collections.Counter()
        for sw, c in vocab.items():
            syms = sw.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        mx = max(pairs.values())
        if mx < 2:
            break
        best = min(p for p, c in pairs.items() if c == mx)
        merges.append((rank, best[0], best[1], mx))
        merged = {}
        for sw, c in vocab.items():
            syms = sw.split(" ")
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    ns.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            merged[" ".join(ns)] = merged.get(" ".join(ns), 0) + c
        vocab = merged
    return merges


def _ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))


def _rows(t: pa.Table):
    return list(zip(t.column("rank").to_pylist(),
                    t.column("left").to_pylist(),
                    t.column("right").to_pylist(),
                    t.column("count").to_pylist()))


def test_bpe_hand_computed_first_merges():
    """low x5, lower x2, newest x6, widest x3: pair counts put
    ('e','s') and ('s','t') at 9 — lexicographic tie-break picks
    ('e','s'); then ('es','t') at 9; then the l-o / o-w 7-7 tie
    picks ('l','o')."""
    corpus = ["low " * 5 + "lower " * 2,
              "newest " * 6 + "widest " * 3]
    out = _rows(bpe_train(_ds(corpus), n_merges=3))
    assert out == [(0, "e", "s", 9), (1, "es", "t", 9),
                   (2, "l", "o", 7)]


def test_bpe_matches_independent_reference():
    rng = np.random.default_rng(9)
    vocab = ["".join(rng.choice(list("abcdefgh"),
                                size=rng.integers(3, 9)))
             for _ in range(120)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 40)))
             for _ in range(300)]
    want = _ref_bpe(texts, n_merges=60)
    got = _rows(bpe_train(_ds(texts), n_merges=60))
    assert got == want
    assert len(got) > 10  # the corpus is rich enough to be a real test


def test_bpe_encode_matches_independent_reference():
    """Engine encode (GPT-2 min-rank loop, Arrow flatten + memo +
    scatter-add) vs the independent Sennrich one-pass-per-rule
    reference (tests/bpe_reference.py), rules from the independent
    trainer — nulls excluded, empty/whitespace texts count 0."""
    from bpe_reference import ref_bpe_merges, ref_encode_counts

    from d1_log_aggregation_ray.ops.text import bpe_encode_counts
    rng = np.random.default_rng(17)
    vocab = ["".join(rng.choice(list("abcdefgh"),
                                size=rng.integers(3, 9)))
             for _ in range(80)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(5, 30)))
             for _ in range(200)]
    texts += [None, "", "   ", "zq"]  # nulls / empties / untrained word
    rules = [(lt, rt) for _, lt, rt, _ in ref_bpe_merges(texts)]
    assert len(rules) > 10
    want = ref_encode_counts(range(len(texts)), texts, rules)
    out = bpe_encode_counts(_ds(texts), rules).take_all()
    got = {r["doc_id"]: r["n_tokens"] for r in out}
    assert got == want
    assert len(texts) - 1 == len(got)  # only the null row dropped
    # partition-count independence
    ds7 = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(7)
    got7 = {r["doc_id"]: r["n_tokens"]
            for r in bpe_encode_counts(ds7, rules).take_all()}
    assert got7 == want


def test_bpe_encode_string_ids_and_empty_rules():
    from d1_log_aggregation_ray.ops.text import bpe_encode_counts
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(["a", "b"]),
        "text": pa.array(["low lower", "low"])}))
    # no rules -> character counts per word, summed per doc
    got = {r["doc_id"]: r["n_tokens"]
           for r in bpe_encode_counts(ds, []).take_all()}
    assert got == {"a": 8, "b": 3}
    got = {r["doc_id"]: r["n_tokens"]
           for r in bpe_encode_counts(
               ds, [("l", "o"), ("lo", "w")]).take_all()}
    assert got == {"a": 1 + 3, "b": 1}


def test_bpe_parallelism_independent_and_max_words():
    texts = ["lo lo lo lower lowest", "lo lower lowest west west"] * 40
    a = _rows(bpe_train(_ds(texts)))
    b = _rows(bpe_train(ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(7)))
    assert a == b and len(a) > 0
    # max_words keeps only the most frequent words: with max_words=1
    # only 'lo' (count 160... the most frequent word) trains the vocab
    c = _rows(bpe_train(_ds(texts), max_words=1))
    ref = _ref_bpe(["lo"] * 120, n_merges=60)
    assert [(r[1], r[2]) for r in c] == [(m[1], m[2]) for m in ref]
