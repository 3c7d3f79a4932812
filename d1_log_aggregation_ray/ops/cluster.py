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
  - Seeds: k vectors with the smallest (md5(vec_id), vec_id) — a
    per-batch local smallest-k combiner + one driver merge of k-row
    partials.  No global sort (the house `brute_force_topk` shape).
  - Each iteration: centroids (k x d int64, a few KiB) broadcast via
    one `ray.put`; per-batch partial = per-cluster integer sums +
    counts (k rows per BATCH cross the wire, never the corpus); the
    k-row partials merge on the driver.  Lineage is re-executed once
    per iteration — fine for a parquet read (same documented
    assumption as the dedup tail), so `iters` stays small.
  - Nothing all-pairs, no shuffle at all: k-means is combiner-only.

Determinism (the property the pinned golden + cross-cpu-count
equality tests rely on): ALL arithmetic is int64 — embeddings are
quantized once (round(x * 2^20)), centroids are floor-div integer
means, distances are exact integer sums of squares, ties break to the
lowest cluster id.  Integer sums are associative, so the result is
bit-identical at any batch size, block order, or parallelism — a
float-accumulation k-means would flip near-tie assignments with BLAS
blocking and batch boundaries.
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


def _seed_centroids(ds: ray.data.Dataset, k: int, id_col: str,
                    vec_col: str) -> np.ndarray:
    """k quantized vectors with the smallest (md5(id), id) — local
    smallest-k per batch, k-row partials merged once on the driver."""

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             id_col: pa.array([], pa.int64()),
                             "q": pa.array([], pa.list_(pa.int64()))})
        h = md5_lower64_array(pc.cast(batch.column(id_col), pa.string()))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:k]
        q = _quantize(batch, vec_col)[order]
        return pa.table({"h": pa.array(h[order]),
                         id_col: pa.array(ids[order].astype(np.int64)),
                         "q": pa.array(list(q))})

    parts = [t for t in ray.get(
        ds.map_batches(local, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs())
        if t.num_rows]
    merged = pa.concat_tables(parts)
    h = merged.column("h").to_numpy(zero_copy_only=False)
    ids = merged.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, h))[:k]
    q = np.array(merged.column("q").to_pylist(), dtype=np.int64)
    if len(order) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(order)}")
    return q[order]


def kmeans_embeddings(ds: ray.data.Dataset, k: int = 10, iters: int = 5,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> ray.data.Dataset:
    """(id, cluster) assignment after `iters` Lloyd iterations from
    deterministic hash-ordered seeds.  See module docstring for the
    scale shape and the integer-exactness argument."""
    narrow = ds.select_columns([id_col, vec_col])
    cent = _seed_centroids(narrow, k, id_col, vec_col)
    d = cent.shape[1]

    for _ in range(iters):
        cref = ray.put(cent)

        def partial(batch: pa.Table, *, cent_ref) -> pa.Table:
            c = ray.get(cent_ref) if isinstance(
                cent_ref, ray.ObjectRef) else cent_ref
            if batch.num_rows == 0:
                return pa.table({"cl": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.list_(pa.int64()))})
            q = _quantize(batch, vec_col)
            a = _assign(q, c)
            order = np.argsort(a, kind="stable")
            a_s, q_s = a[order], q[order]
            starts = np.flatnonzero(np.r_[True, a_s[1:] != a_s[:-1]])
            sums = np.add.reduceat(q_s, starts, axis=0)
            return pa.table({
                "cl": pa.array(a_s[starts]),
                "n": pa.array(np.diff(np.r_[starts, len(a_s)])
                              .astype(np.int64)),
                "s": pa.array(list(sums))})

        parts = [t for t in ray.get(
            narrow.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True,
                               fn_kwargs={"cent_ref": cref})
            .to_arrow_refs()) if t.num_rows]
        S = np.zeros((k, d), dtype=np.int64)
        N = np.zeros(k, dtype=np.int64)
        for t in parts:
            cl = t.column("cl").to_numpy(zero_copy_only=False)
            N[cl] += t.column("n").to_numpy(zero_copy_only=False)
            S[cl] += np.array(t.column("s").to_pylist(), dtype=np.int64)
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

    return narrow.map_batches(final, batch_format="pyarrow",
                              zero_copy_batch=True,
                              fn_kwargs={"cent_ref": cref})
