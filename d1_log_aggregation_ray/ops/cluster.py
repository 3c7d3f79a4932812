"""Distributed k-means over an embedding column (Lloyd iterations).

The corpus-organization operator a training-data pipeline needs for
topic balancing, domain mixing, and semantic dedup blocking: assign
every vector to one of k centroids learned with a fixed number of
Lloyd iterations.

Reference analog: the repeated full-corpus aggregation passes of the
harvest cycle (LogAggregationScheduleManager.java scheduling one
bounded pass per cycle) — each Lloyd iteration is one streaming pass
with a per-batch combiner and a tiny driver-side merge.

Scale shape (100 TB corpus):
  - The narrow (id, vector) projection is materialized ONCE as Arrow
    blocks in the object store (spills block-by-block if it exceeds
    memory); every subsequent pass reads the same immutable block
    refs.  Iterative refinement with a driver barrier per iteration
    is the documented case for raw Ray tasks over those refs — one
    tiny task per block per pass — instead of re-planning a Dataset
    execution per iteration (which costs a full executor startup each
    time and re-decodes parquet).
  - Seeds: k vectors with the smallest (md5(vec_id), vec_id) — a
    per-block local smallest-k task + one driver merge of k-row
    partials.  No global sort (the house `brute_force_topk` shape).
  - Each iteration: centroids (k x d int64, a few KiB) broadcast via
    one `ray.put`; per-block partial = per-cluster integer sums +
    counts (k rows per BLOCK cross the wire, never the corpus); the
    k-row partials merge on the driver.
  - Nothing all-pairs, no shuffle at all: k-means is combiner-only.
  - Final assignment is a streaming `map_batches` over the cached
    blocks so the (id, cluster) output composes with downstream
    Dataset stages.

Determinism (the property the pinned golden + cross-cpu-count
equality tests rely on): ALL arithmetic is int64 — embeddings are
quantized once (round(x * 2^20)), centroids are floor-div integer
means, distances are exact integer sums of squares, ties break to the
lowest cluster id.  Integer sums are associative, so the result is
bit-identical at any batch size, block order, or parallelism — a
float-accumulation k-means would flip near-tie assignments with BLAS
blocking and batch boundaries.  Cross-validated against an
independent pure-python reference (tests/kmeans_reference.py), which
also generates the driver's pinned golden oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import md5_lower64_array

#: quantization scale: 20 fractional bits.  |x| < 2^10 keeps every
#: squared-distance sum far inside int64 (d * (2^31)^2 < 2^63 needs
#: d < 2; real bound: values ~1 -> diff^2*d ~ 2^42*d).
KMEANS_SCALE = 1 << 20


def _quantize(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch.column(vec_col).combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float64)
    m = flat.reshape(batch.num_rows, -1) if batch.num_rows else \
        np.empty((0, 1), dtype=np.float64)
    return np.rint(m * KMEANS_SCALE).astype(np.int64)


def _assign(q: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Exact integer argmin_j ||q_i - c_j||^2, ties -> lowest j.
    ||q||^2 is constant per row, so argmin of (-2 q.c_j + ||c_j||^2)
    suffices — one integer matmul per batch."""
    cross = q @ cent.T  # int64 matmul: exact
    score = cent_norms(cent)[None, :] - 2 * cross
    return np.argmin(score, axis=1).astype(np.int64)  # first min wins


def cent_norms(cent: np.ndarray) -> np.ndarray:
    return np.einsum("kd,kd->k", cent, cent)


@ray.remote
def _seed_part(tbl: pa.Table, k: int, id_col: str, vec_col: str):
    """Local smallest-k by (md5(id), id): (h, id, quantized vec)."""
    if tbl.num_rows == 0:
        return None
    h = md5_lower64_array(pc.cast(tbl.column(id_col), pa.string()))
    ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, h))[:k]
    return (h[order], ids[order].astype(np.int64),
            _quantize(tbl, vec_col)[order])


@ray.remote
def _lloyd_part(tbl: pa.Table, cent: np.ndarray, id_col: str,
                vec_col: str):
    """Per-cluster (counts, integer sums) for one block — the k-row
    combiner partial that crosses the wire instead of the block."""
    if tbl.num_rows == 0:
        return None
    q = _quantize(tbl, vec_col)
    a = _assign(q, cent)
    order = np.argsort(a, kind="stable")
    a_s, q_s = a[order], q[order]
    starts = np.flatnonzero(np.r_[True, a_s[1:] != a_s[:-1]])
    return (a_s[starts],
            np.diff(np.r_[starts, len(a_s)]).astype(np.int64),
            np.add.reduceat(q_s, starts, axis=0))


def _seed_centroids(refs: list, k: int, id_col: str,
                    vec_col: str) -> np.ndarray:
    parts = [p for p in ray.get(
        [_seed_part.remote(r, k, id_col, vec_col) for r in refs])
        if p is not None]
    h = np.concatenate([p[0] for p in parts])
    ids = np.concatenate([p[1] for p in parts])
    q = np.concatenate([p[2] for p in parts], axis=0)
    order = np.lexsort((ids, h))[:k]
    if len(order) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(order)}")
    return q[order]


def kmeans_embeddings(ds: ray.data.Dataset, k: int = 10, iters: int = 5,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> ray.data.Dataset:
    """(id, cluster) assignment after `iters` Lloyd iterations from
    deterministic hash-ordered seeds.  See module docstring for the
    scale shape and the integer-exactness argument."""
    # block count == per-pass task count: a corpus that arrives as few
    # fat blocks (one parquet file at smoke scale) would serialize
    # every Lloyd pass onto few cores, so split to ~2 blocks per CPU
    # once at cache time (streaming split, no all-to-all)
    from ..functions.parts import hash_parts
    from ..functions.parts import arrow_block_refs
    mat = (ds.select_columns([id_col, vec_col])
           .repartition(hash_parts()).materialize())
    refs = arrow_block_refs(mat)
    cent = _seed_centroids(refs, k, id_col, vec_col)
    d = cent.shape[1]

    for _ in range(iters):
        cref = ray.put(cent)
        parts = [p for p in ray.get(
            [_lloyd_part.remote(r, cref, id_col, vec_col) for r in refs])
            if p is not None]
        S = np.zeros((k, d), dtype=np.int64)
        N = np.zeros(k, dtype=np.int64)
        for cl, n, s in parts:
            N[cl] += n
            S[cl] += s
        nz = N > 0  # empty clusters keep their previous centroid
        cent = cent.copy()
        cent[nz] = S[nz] // N[nz, None]  # integer floor-div mean

    cref = ray.put(cent)

    def final(batch: pa.Table, *, cent_ref) -> pa.Table:
        c = ray.get(cent_ref) if isinstance(
            cent_ref, ray.ObjectRef) else cent_ref
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        a = _assign(_quantize(batch, vec_col), c)
        return pa.table({
            id_col: pc.cast(batch.column(id_col), pa.int64()),
            "cluster": pa.array(a)})

    return mat.map_batches(final, batch_format="pyarrow",
                           zero_copy_batch=True,
                           fn_kwargs={"cent_ref": cref})
