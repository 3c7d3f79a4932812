"""Scalar int8 quantization of the embedding column — the standard
shrink-the-vectors move before large-scale ANN (4x smaller payloads,
integer SIMD distance kernels downstream).

Two passes by design: quantization needs the global value range first
(pass 1 collapses to ONE (min, max) row per block — KiB partials), then
pass 2 maps every vector with the two scalars closed over (no
broadcast object needed: two floats ride the function closure).  The
input is read twice; both passes are over the raw parquet read, the
same documented trade as the dedup survivor tail (a derived input
should be materialized by the caller first).

Determinism contract (mirrored by the SQL oracle): code = floor(
(float64(x) - gmin) * 255.0 / (gmax - gmin)) with gmin/gmax the exact
float32 corpus extrema — identical IEEE ops in identical order on both
sides, so codes are bit-equal to DuckDB's list_transform formulation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def global_minmax(ds: ray.data.Dataset,
                  vec_col: str = "embedding") -> tuple[float, float]:
    """Global (min, max) over every list element: per-block one-row
    partials, driver merges the tiny remainder."""

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(vec_col).combine_chunks()
        v = np.asarray(col.flatten(), dtype=np.float32)
        if len(v) == 0:
            return pa.table({"mn": pa.array([], pa.float32()),
                             "mx": pa.array([], pa.float32())})
        return pa.table({"mn": pa.array([v.min()], pa.float32()),
                         "mx": pa.array([v.max()], pa.float32())})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    if not rows:
        raise ValueError("empty dataset: no quantization range")
    mn = np.float64(np.min(np.array([r["mn"] for r in rows],
                                    dtype=np.float32)))
    mx = np.float64(np.max(np.array([r["mx"] for r in rows],
                                    dtype=np.float32)))
    return float(mn), float(mx)


def quantize_batch(batch: pa.Table, gmin: float, gmax: float,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> pa.Table:
    """Map one Arrow batch to (id, qvec list<int64>): zero-copy flatten,
    one vectorized float64 affine + floor, offsets reused as-is."""
    col = batch.column(vec_col).combine_chunks()
    v = np.asarray(col.flatten(), dtype=np.float64)
    rng = gmax - gmin
    q = np.floor((v - gmin) * 255.0 / rng).astype(np.int64) \
        if rng > 0 else np.zeros(len(v), np.int64)
    offsets = col.offsets
    qvec = pa.ListArray.from_arrays(offsets, pa.array(q, pa.int64()))
    return pa.table({id_col: batch.column(id_col), "qvec": qvec})


def quantize_embeddings(ds: ray.data.Dataset, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> ray.data.Dataset:
    """Full operator: range pass + streaming quantize pass.  Returns
    (id, qvec) with codes in [0, 255]."""
    gmin, gmax = global_minmax(ds, vec_col)
    return ds.map_batches(quantize_batch, batch_format="pyarrow",
                          zero_copy_batch=True,
                          fn_kwargs={"gmin": gmin, "gmax": gmax,
                                     "id_col": id_col,
                                     "vec_col": vec_col})


def quantize_digest(ds: ray.data.Dataset, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> ray.data.Dataset:
    """Per-vector integer digest of the quantized codes — (id, q_sum,
    q_l2) — the value-gate form (exact BIGINT compare vs the SQL
    oracle without shipping list columns through the compare)."""
    gmin, gmax = global_minmax(ds, vec_col)

    def digest(batch: pa.Table) -> pa.Table:
        qt = quantize_batch(batch, gmin, gmax, id_col=id_col,
                            vec_col=vec_col)
        col = qt.column("qvec").combine_chunks()
        q = np.asarray(col.flatten(), dtype=np.int64)
        off = col.offsets.to_numpy(zero_copy_only=False)
        if len(off) <= 1:
            return pa.table({id_col: qt.column(id_col),
                             "q_sum": pa.array([], pa.int64()),
                             "q_l2": pa.array([], pa.int64())})
        starts = off[:-1]
        # reduceat needs non-empty input; empty lists sum to 0 via the
        # subtraction-of-cumsum formulation (robust to zero-length rows)
        cs = np.r_[0, np.cumsum(q)]
        cs2 = np.r_[0, np.cumsum(q * q)]
        s = cs[off[1:]] - cs[starts]
        s2 = cs2[off[1:]] - cs2[starts]
        return pa.table({id_col: qt.column(id_col),
                         "q_sum": pa.array(s.astype(np.int64)),
                         "q_l2": pa.array(s2.astype(np.int64))})

    return ds.map_batches(digest, batch_format="pyarrow",
                          zero_copy_batch=True)
