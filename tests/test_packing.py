"""Shard packing (ops/packing.py): global prefix-sum semantics must be
independent of block structure, and boundaries must match the spec
(shard = cum_before // capacity, docs never split)."""

import numpy as np
import pyarrow as pa
import ray.data

from d1_log_aggregation_ray.ops.packing import pack_shards


def _table(ids, toks):
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "n_tokens": pa.array(toks, pa.int64())})


def _run(t, capacity, range_width, parts):
    ds = ray.data.from_arrow(t).repartition(parts)
    out = pack_shards(ds, capacity=capacity, range_width=range_width)
    return {r["doc_id"]: (r["shard_id"], r["shard_off"])
            for r in out.take_all()}


def test_pack_matches_serial_spec():
    rng = np.random.RandomState(3)
    ids = np.arange(200)
    toks = rng.randint(1, 50, size=200)
    got = _run(_table(ids, toks), capacity=100, range_width=16, parts=7)
    cum = 0
    for i, tok in zip(ids, toks):
        assert got[i] == (cum // 100, cum % 100), i
        cum += tok
    # a shard holds ~capacity tokens: every shard index up to the last
    # appears (no gaps), and offsets stay inside the budget
    shards = sorted({s for s, _ in got.values()})
    assert shards == list(range(shards[-1] + 1))
    assert all(0 <= off < 100 for _, off in got.values())


def test_pack_block_structure_invariant():
    rng = np.random.RandomState(9)
    ids = rng.permutation(500)  # arrival order is NOT id order
    toks = rng.randint(1, 30, size=500)
    t = _table(ids, toks)
    a = _run(t, capacity=64, range_width=32, parts=1)
    b = _run(t, capacity=64, range_width=32, parts=11)
    c = _run(t, capacity=64, range_width=250, parts=11)  # fewer ranges
    assert a == b == c


def test_pack_oversized_doc_not_split():
    # doc 1 alone exceeds capacity: it stays in one shard and pushes
    # the next doc's shard index past the overflow
    got = _run(_table([0, 1, 2], [10, 500, 10]),
               capacity=100, range_width=2, parts=2)
    assert got[0] == (0, 0)
    assert got[1] == (0, 10)   # starts inside shard 0, never split
    assert got[2] == (5, 10)   # 510 tokens before it -> shard 5
