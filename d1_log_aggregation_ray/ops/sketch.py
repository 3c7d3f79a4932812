"""Mergeable sketches: HyperLogLog approximate distinct counting.

The guide-recommended pattern for aggregation at scale: each batch
emits ONE serialized sketch per key (a fixed 2^p-byte register array),
and a tiny second stage merges them — the shuffle moves kilobytes of
sketch instead of the raw key column.  Standard HLL (public algorithm,
Flajolet et al.) with the usual small-range linear-counting correction.

Exact counterpart for verification: ops/relational.distinct_count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


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
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1 (vectorized via
        # bit_length on the flipped value)
        lz = np.zeros(len(h), dtype=np.uint8)
        v = rest.copy()
        mask_hi = np.uint64(1) << np.uint64(63)
        done = np.zeros(len(h), dtype=bool)
        for r in range(1, 64 - self.p + 2):
            is_set = (v & mask_hi) != 0
            newly = is_set & ~done
            lz[newly] = r
            done |= is_set
            if done.all():
                break
            v = v << np.uint64(1)
        np.maximum.at(self.registers, idx, lz)

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

    md5-based (process-stable unlike python hash()).  NOTE: a crc32
    pair is NOT suitable here — crc is affine in its init value, so the
    two words are linearly related and the effective entropy is ~32
    bits, which visibly biases HLL register ranks."""
    import hashlib
    vals = arr.to_pylist()
    out = np.empty(len(vals), dtype=np.uint64)
    for i, v in enumerate(vals):
        d = hashlib.md5(repr(v).encode("utf-8")).digest()
        out[i] = int.from_bytes(d[:8], "little")
    return out


def approx_distinct(ds: ray.data.Dataset, key: str, distinct_col: str,
                    p: int = 12) -> ray.data.Dataset:
    """Per-key approximate distinct count (~1.04/sqrt(2^p) rel. error).

    Stage 1 (combiner): one HLL sketch per key per batch — the exchange
    carries 4 KiB blobs, never the raw column.  Stage 2: merge per key."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        keys_col = batch.column(key)
        hashes = _hash_column(batch.column(distinct_col).combine_chunks())
        uniq_keys = keys_col.unique()
        rows_k, rows_s = [], []
        keys_np = np.asarray(keys_col.to_pylist(), dtype=object)
        for kv in uniq_keys.to_pylist():
            h = HLL(p)
            h.add_hashes(hashes[keys_np == kv])
            rows_k.append(kv)
            rows_s.append(h.to_bytes())
        return pa.table({key: pa.array(rows_k),
                         "sketch": pa.array(rows_s, pa.binary())})

    sketches = ds.map_batches(sketch_batch, batch_format="pyarrow",
                              zero_copy_batch=True)

    def merge_group(group: pa.Table) -> pa.Table:
        acc = HLL(p)
        for b in group.column("sketch").to_pylist():
            acc.merge(HLL.from_bytes(b, p))
        return pa.table({key: group.column(key).slice(0, 1),
                         "n_distinct_approx": pa.array(
                             [int(round(acc.estimate()))], pa.int64())})

    return sketches.groupby(key).map_groups(merge_group,
                                            batch_format="pyarrow")
