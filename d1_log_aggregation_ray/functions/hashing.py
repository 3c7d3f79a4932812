"""Portable deterministic hashing.

`md5_lower64(s)` returns the SAME value as DuckDB's `md5_number_lower(s)`
(the lower 8 bytes of the md5 digest, little-endian, as uint64).  This
makes every hash-derived column (sink routing, range semi-join key,
synthetic geo) reproducible bit-for-bit in the DuckDB oracle SQL, which
is how the driver's value-hash correctness gate is satisfied.

Reference analog: the deterministic natural key `id = nodeId + "." +
entryId` (LogHarvesterTask.java:431-435) and the IP/CIDR interval
membership space (LogEntrySolrItem.java:388-442).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def md5_lower64(s: str) -> int:
    """uint64 == DuckDB md5_number_lower(s)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


def md5_lower64_array(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized md5_lower64 over an Arrow string array (nulls -> 0).

    md5 is inherently per-item, but conv_ids repeat heavily within a
    batch, so hash each *unique* value once and scatter via dictionary
    indices (pc.unique + pc.index_in) — O(uniques) digests per batch.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    uniq = pc.unique(arr)
    lut = np.zeros(len(uniq), dtype=np.uint64)
    for i in range(len(uniq)):
        s = uniq[i].as_py()
        lut[i] = 0 if s is None else md5_lower64(s)
    idx = pc.index_in(arr, uniq).fill_null(0).to_numpy(zero_copy_only=False)
    return lut[idx.astype(np.int64)]


def md5_bytes_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Full 128-bit md5 digests of an Arrow string OR binary array as
    fixed-width binary(16) (nulls -> 16 zero bytes).

    The exact-dedup exchange key: 16 fixed bytes instead of raw
    text/payload.  64 bits would see ~birthday(2^64) collisions at
    10^12 docs; 128 bits is collision-free at any realistic corpus
    size, so a hash-groupby is equivalent to GROUP BY text.  md5 is
    inherently per-item; hash each unique value once and scatter
    (house pattern).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    uniq = pc.unique(arr)
    lut = []
    for i in range(len(uniq)):
        s = uniq[i].as_py()
        lut.append(b"\x00" * 16 if s is None
                   else hashlib.md5(
                       s if isinstance(s, bytes)
                       else s.encode("utf-8")).digest())
    idx = pc.index_in(arr, uniq).fill_null(0).to_numpy(zero_copy_only=False)
    lut_np = np.frombuffer(b"".join(lut), dtype=np.uint8).reshape(-1, 16)
    buf = lut_np[idx.astype(np.int64)].tobytes()
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(16), len(idx), [None, pa.py_buffer(buf)])


def hash32_array(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """32-bit membership-space hash: md5_lower64 % 2**32 (uint64 ndarray).

    DuckDB equivalent: ``md5_number_lower(x) % 4294967296``.
    """
    return md5_lower64_array(arr) % np.uint64(2**32)


def epoch_us(dt) -> int:
    """Naive-datetime -> microseconds since epoch, TZ-INDEPENDENT
    (datetime.timestamp() interprets naive datetimes in the local
    zone, which would make outputs machine-dependent)."""
    from datetime import datetime as _dt
    return int((dt - _dt(1970, 1, 1)).total_seconds() * 1_000_000)
