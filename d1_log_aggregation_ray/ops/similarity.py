"""Similarity search over an embedding column (list<float>).

- brute_force_topk: the exact baseline — per-batch numpy matmul against
  a broadcast query matrix, local top-k per batch, then a single small
  merge.  No global sort: the reduce sees only k rows per batch.
- lsh_topk: the scale path — random-hyperplane bucket assignment;
  candidates searched only within the query's bucket (and its 1-bit
  neighbors), brute-force fallback if the bucket is empty.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _as_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col).combine_chunks()
    if batch.num_rows == 0:
        return np.empty((0, 1), dtype=np.float64)
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(batch.num_rows, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(ds: ray.data.Dataset, query: np.ndarray, k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> pa.Table:
    """Exact cosine top-k: returns (id, score) sorted by
    (-score, id).  Query vector is shipped once via ray.put."""
    q = query.astype(np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    qref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = _normalize(_as_matrix(batch, vec_col))
        scores = m @ qv
        ids = batch.column(id_col).to_numpy()
        # deterministic tie-break (-score, id) BEFORE truncating to k:
        # argpartition would keep an arbitrary subset of boundary ties,
        # diverging from the oracle's ORDER BY score DESC, id
        order = np.lexsort((ids, -scores))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "score": pa.array(scores[order])})

    local = ds.map_batches(local_topk, batch_format="pyarrow",
                           batch_size=4096).take_all()
    ids = np.array([r[id_col] for r in local])
    scores = np.array([r["score"] for r in local])
    order = np.lexsort((ids, -scores))[:k]
    return pa.table({id_col: pa.array(ids[order]),
                     "score": pa.array(scores[order])})


def lsh_topk(ds: ray.data.Dataset, query: np.ndarray, k: int = 10,
             n_planes: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding") -> pa.Table:
    """Approximate top-k: random-hyperplane LSH pre-filter (query bucket
    + 1-bit-flip neighbor buckets), then exact cosine on candidates."""
    dim = len(query)
    rng = np.random.RandomState(11)
    planes = rng.randn(n_planes, dim)
    q = query.astype(np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    qsig = int((((planes @ q) > 0).astype(np.uint32)
                << np.arange(n_planes, dtype=np.uint32)).sum())
    want = {qsig} | {qsig ^ (1 << i) for i in range(n_planes)}
    pref = ray.put((planes, q))

    def candidates(batch: pa.Table) -> pa.Table:
        pl, qv = ray.get(pref)
        m = _normalize(_as_matrix(batch, vec_col))
        sigs = ((m @ pl.T) > 0).astype(np.uint32) @ (
            1 << np.arange(n_planes, dtype=np.uint32))
        mask = np.isin(sigs, list(want))
        ids = batch.column(id_col).to_numpy()[mask]
        scores = (m[mask] @ qv)
        order = np.lexsort((ids, -scores))[:k]  # deterministic ties
        return pa.table({id_col: pa.array(ids[order]),
                         "score": pa.array(scores[order])})

    local = ds.map_batches(candidates, batch_format="pyarrow",
                           batch_size=4096).take_all()
    if not local:
        return brute_force_topk(ds, query, k, id_col, vec_col)
    ids = np.array([r[id_col] for r in local])
    scores = np.array([r["score"] for r in local])
    order = np.lexsort((ids, -scores))[:k]
    return pa.table({id_col: pa.array(ids[order]),
                     "score": pa.array(scores[order])})
