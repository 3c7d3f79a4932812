"""Distributed PCA (ops/projection.py): exact equality with the
independent serial reference, parallelism independence, and a planted
anisotropic-structure recovery check."""

import numpy as np
import pyarrow as pa

import ray.data

from d1_log_aggregation_ray.ops.projection import pca_project
from pca_reference import pca_reference


def _emb_table(emb: np.ndarray) -> pa.Table:
    n, d = emb.shape
    offs = np.arange(n + 1, dtype=np.int32) * d
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.ListArray.from_arrays(
            pa.array(offs), pa.array(emb.reshape(-1).astype(np.float32))),
    })


def _planted(n=800, d=16, seed=7):
    rng = np.random.default_rng(seed)
    # dominant variance along axis 0, second along axis 1
    x = rng.normal(size=(n, d)) * 0.05
    x[:, 0] += rng.normal(size=n) * 3.0
    x[:, 1] += rng.normal(size=n) * 1.0
    return x.astype(np.float32)


def test_pca_matches_independent_reference_exactly():
    emb = _planted()
    out = pca_project(ray.data.from_arrow(_emb_table(emb)),
                      d_out=4).to_pandas()
    ref = pca_reference(range(len(emb)),
                        emb.astype(np.float64), d_out=4)
    assert len(out) == len(emb)
    for _, r in out.iterrows():
        want = ref[int(r.vec_id)]
        got = [r.pc1, r.pc2, r.pc3, r.pc4]
        assert got == want  # bit-exact, not approximate


def test_pca_parallelism_independent():
    emb = _planted(500, 12, seed=3)
    t = _emb_table(emb)
    a = pca_project(ray.data.from_arrow(t), d_out=3).to_pandas()
    b = pca_project(ray.data.from_arrow(t).repartition(17),
                    d_out=3).to_pandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    assert (a == b).all().all()  # byte-identical, floats included


def test_pca_recovers_planted_axes():
    emb = _planted()
    out = pca_project(ray.data.from_arrow(_emb_table(emb)),
                      d_out=2).to_pandas()
    # pc1 must carry the dominant planted direction (axis 0): its
    # variance dominates pc2's, and it correlates with the raw axis
    v1, v2 = out.pc1.var(), out.pc2.var()
    assert v1 > 4 * v2
    corr = np.corrcoef(out.sort_values("vec_id").pc1,
                       emb[:, 0].astype(np.float64))[0, 1]
    assert abs(corr) > 0.99
