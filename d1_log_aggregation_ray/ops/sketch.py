"""Mergeable sketches: HyperLogLog approximate distinct counting.

The guide-recommended pattern for aggregation at scale: each batch
emits ONE serialized sketch per key (a fixed 2^p-byte register array),
and a tiny second stage merges them — the shuffle moves kilobytes of
sketch instead of the raw key column.  Standard HLL (public algorithm,
Flajolet et al.) with the usual small-range linear-counting correction.

Everything is vectorized: value hashing is md5-per-UNIQUE-value with a
dictionary scatter (house pattern, functions/hashing.py), and the
per-key register update is one np.maximum.at scatter into a
(n_keys, 2^p) register matrix — no per-key pass over the batch.

Exact counterpart for verification: ops/relational.distinct_count.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _rank_of_rest(h: np.ndarray, p: int) -> np.ndarray:
    """HLL rank: leading zeros of the (64-p)-bit remainder + 1, with a
    guard bit so the all-zero remainder gets the max rank.  Vectorized
    over rows; the bit loop is bounded by 64-p and early-exits."""
    rest = (h << np.uint64(p)) | np.uint64(1 << (p - 1))
    lz = np.zeros(len(h), dtype=np.uint8)
    v = rest.copy()
    mask_hi = np.uint64(1) << np.uint64(63)
    done = np.zeros(len(h), dtype=bool)
    for r in range(1, 64 - p + 2):
        is_set = (v & mask_hi) != 0
        newly = is_set & ~done
        lz[newly] = r
        done |= is_set
        if done.all():
            break
        v = v << np.uint64(1)
    return lz


class HLL:
    """Minimal vectorized HyperLogLog over uint64 hashes."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p >= 7:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        else:
            self.alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        np.maximum.at(self.registers, idx, _rank_of_rest(h, self.p))

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        regs = self.registers.astype(np.float64)
        est = self.alpha * self.m * self.m / np.sum(2.0 ** -regs)
        zeros = int(np.sum(self.registers == 0))
        if est <= 2.5 * self.m and zeros:
            est = self.m * np.log(self.m / zeros)  # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, p: int = 12) -> "HLL":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


def _hash_column(arr: pa.Array) -> np.ndarray:
    """Stable, uniformly distributed 64-bit hashes of arbitrary values.

    md5-based (process-stable unlike python hash()), one digest per
    UNIQUE value + dictionary scatter — O(uniques) python, O(n)
    vectorized.  NOTE: a crc32 pair is NOT suitable here — crc is
    affine in its init value, so the two words are linearly related
    and the effective entropy is ~32 bits, which visibly biases HLL
    register ranks."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    uniq = pc.unique(arr)
    vals = uniq.to_pylist()
    lut = np.empty(max(len(vals), 1), dtype=np.uint64)
    for i, v in enumerate(vals):
        d = hashlib.md5(repr(v).encode("utf-8")).digest()
        lut[i] = int.from_bytes(d[:8], "little")
    idx = pc.index_in(arr, uniq).to_numpy(zero_copy_only=False)
    if arr.null_count:
        idx = np.where(np.isnan(idx), vals.index(None), idx)
    return lut[idx.astype(np.int64)]


def approx_distinct(ds: ray.data.Dataset, key: str, distinct_col: str,
                    p: int = 12) -> ray.data.Dataset:
    """Per-key approximate distinct count (~1.04/sqrt(2^p) rel. error).

    Stage 1 (combiner): one HLL sketch per key per batch — the exchange
    carries 4 KiB blobs, never the raw column.  The whole batch's
    registers are built with a single scatter-max into a (n_keys, 2^p)
    matrix (flat index key_code * 2^p + register).  Stage 2: merge per
    key."""
    m = 1 << p

    def sketch_batch(batch: pa.Table) -> pa.Table:
        keys_col = batch.column(key)
        if isinstance(keys_col, pa.ChunkedArray):
            keys_col = keys_col.combine_chunks()
        hashes = _hash_column(batch.column(distinct_col))
        uniq = pc.unique(keys_col)
        code = pc.index_in(keys_col, uniq).to_numpy(zero_copy_only=False)
        if keys_col.null_count:
            code = np.where(np.isnan(code), uniq.to_pylist().index(None), code)
        code = code.astype(np.int64)
        nk = len(uniq)
        regs = np.zeros(nk * m, dtype=np.uint8)
        reg_idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
        np.maximum.at(regs, code * m + reg_idx, _rank_of_rest(hashes, p))
        regs = regs.reshape(nk, m)
        return pa.table({key: uniq,
                         "sketch": pa.array([regs[i].tobytes()
                                             for i in range(nk)],
                                            pa.binary())})

    sketches = ds.map_batches(sketch_batch, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge_group(group: pa.Table) -> pa.Table:
        """Merge ALL keys of a groupby partition in one vectorized
        pass: stack the partials into an (n, 2^p) matrix, register-max
        per key segment via np.maximum.reduceat, then one batched
        estimate — no per-key python loop (many keys at corpus scale
        mean map_groups hands multi-row groups; this fn is also safe
        for the one-key-per-call contract)."""
        n = group.num_rows
        kcol = group.column(key).combine_chunks()
        blobs = group.column("sketch").to_pylist()
        regs = np.frombuffer(b"".join(blobs), dtype=np.uint8).reshape(n, m)
        enc = kcol.dictionary_encode()
        # null keys: a null index would surface as float64 NaN in
        # np.asarray (NaN != NaN splits the null group) and
        # dictionary.take on float codes raises — group nulls under a
        # one-past-the-dictionary code and emit them back as null
        null_code = len(enc.dictionary)
        code = pc.fill_null(enc.indices, null_code).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.argsort(code, kind="stable")
        starts = np.flatnonzero(np.r_[True, code[order][1:]
                                      != code[order][:-1]])
        merged = np.maximum.reduceat(regs[order], starts, axis=0)
        # batched estimates (vectorized HLL math over all keys at once)
        alpha = HLL(p).alpha
        est = alpha * m * m / np.sum(2.0 ** -merged.astype(np.float64),
                                     axis=1)
        zeros = (merged == 0).sum(axis=1)
        small = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            lin = m * np.log(m / np.maximum(zeros, 1))
        est = np.where(small, lin, est)
        sel = code[order][starts]
        idx = pa.array(np.where(sel == null_code, 0, sel),
                       mask=(sel == null_code))  # null index -> null key
        return pa.table({key: enc.dictionary.take(idx),
                         "n_distinct_approx": pa.array(
                             np.rint(est).astype(np.int64))})

    # hash-partition by key (corpus-cardinality keys; merge_group
    # handles every key of a partition in one vectorized pass)
    from ..stages.aggregate import add_part_column
    from ..functions.parts import hash_parts
    parts = sketches.map_batches(
        add_part_column, batch_format="pyarrow",
        fn_kwargs={"key": key, "n_parts": hash_parts()})
    return parts.groupby("_part").map_groups(
        lambda g: merge_group(g.drop_columns(["_part"])),
        batch_format="pyarrow")
