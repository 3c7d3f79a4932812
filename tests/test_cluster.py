"""Distributed k-means (ops/cluster.py) vs the independent reference.

The engine's claim is bit-exact determinism at any parallelism (all
arithmetic int64, ties to lowest cluster id), so the tests assert
EXACT assignment equality — against the pure-python reference, and
across different block structures of the same input.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from d1_log_aggregation_ray.ops.cluster import kmeans_embeddings

from kmeans_reference import kmeans_reference

SF_DIR = "/root/testdata/sf0.001"


def _load_emb():
    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    emb = np.asarray(t.column("embedding").combine_chunks().flatten(),
                     dtype=np.float64).reshape(len(ids), -1)
    return t, ids, emb


def _engine_assign(ds, **kw):
    return {r["vec_id"]: r["cluster"]
            for r in kmeans_embeddings(ds, **kw).take_all()}


def test_kmeans_matches_independent_reference():
    t, ids, emb = _load_emb()
    eng = _engine_assign(ray.data.read_parquet(
        os.path.join(SF_DIR, "embeddings.parquet")), k=10, iters=5)
    ref = kmeans_reference(ids, emb, k=10, iters=5)
    assert eng == ref


def test_kmeans_parallelism_independent():
    """Same input, different block structures -> identical labels
    (the integer-associativity property the golden pin relies on)."""
    t, ids, emb = _load_emb()
    a = _engine_assign(
        ray.data.from_arrow(t).repartition(1), k=7, iters=3)
    b = _engine_assign(
        ray.data.from_arrow(t).repartition(13), k=7, iters=3)
    assert a == b
    assert len(set(a.values())) > 1  # actually clustered, not one blob


def test_kmeans_k_exceeds_corpus_raises():
    t = pa.table({"vec_id": pa.array([1, 2, 3], pa.int64()),
                  "embedding": pa.array([[0.1, 0.2]] * 3,
                                        pa.list_(pa.float32()))})
    with pytest.raises(ValueError, match="exceeds corpus size"):
        kmeans_embeddings(ray.data.from_arrow(t), k=5, iters=1).take_all()


def test_kmeans_separated_blobs_recovered():
    """Three well-separated blobs -> k=3 recovers the planted
    partition exactly (labels are arbitrary, the partition is not)."""
    rng = np.random.RandomState(11)
    centers = np.array([[0.0, 0.0], [8.0, 8.0], [-8.0, 8.0]])
    planted = np.repeat([0, 1, 2], 40)
    emb = centers[planted] + rng.uniform(-0.5, 0.5, size=(120, 2))
    t = pa.table({"vec_id": pa.array(np.arange(120), pa.int64()),
                  "embedding": pa.array(
                      [row.astype(np.float32) for row in emb],
                      pa.list_(pa.float32()))})
    eng = _engine_assign(ray.data.from_arrow(t).repartition(5),
                         k=3, iters=8)
    groups = {}
    for i, lab in enumerate(planted):
        groups.setdefault(lab, set()).add(eng[i])
    # each planted blob maps to exactly one engine cluster, all distinct
    assert all(len(s) == 1 for s in groups.values())
    assert len({next(iter(s)) for s in groups.values()}) == 3
