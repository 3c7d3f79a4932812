"""Geohash encoding (public algorithm, base32) — analog of the
reference's geohash emission at precision 9 with prefixes 1..9
(LogEntrySolrItem.java:61,283,304-314).
"""

from __future__ import annotations

import numpy as np

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_BASE32_BYTES = np.frombuffer(_BASE32.encode("ascii"), dtype=np.uint8)


def geohash_encode(lat: float, lon: float, precision: int = 9) -> str:
    """Standard geohash of (lat, lon) at the given precision."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out = []
    bit = 0
    ch = 0
    even = True  # start with longitude
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch = ch << 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch = ch << 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(_BASE32[ch])
            bit = 0
            ch = 0
    return "".join(out)


def geohash_encode_array(lat: "np.ndarray", lon: "np.ndarray",
                         precision: int = 9) -> "np.ndarray":
    """Vectorized geohash over float64 arrays -> numpy 'U{precision}'.

    Bit-parity with the scalar `geohash_encode` by construction: the
    SAME midpoint-bisection float sequence runs per element ((lo+hi)/2
    and >= comparisons — no rescaling shortcut whose rounding could
    diverge), just across the whole array per step.  Used by the
    enrichment hot path (stages/enrich.py) where the per-unique-conv
    Python loop dominated the slice stage's CPU.
    """
    n = len(lat)
    lat_lo = np.full(n, -90.0)
    lat_hi = np.full(n, 90.0)
    lon_lo = np.full(n, -180.0)
    lon_hi = np.full(n, 180.0)
    codes = np.zeros((precision, n), dtype=np.uint8)
    ch = np.zeros(n, dtype=np.uint8)
    bit = 0
    pos = 0
    even = True
    for _ in range(precision * 5):
        if even:
            mid = (lon_lo + lon_hi) / 2
            b = lon >= mid
            lon_lo = np.where(b, mid, lon_lo)
            lon_hi = np.where(b, lon_hi, mid)
        else:
            mid = (lat_lo + lat_hi) / 2
            b = lat >= mid
            lat_lo = np.where(b, mid, lat_lo)
            lat_hi = np.where(b, lat_hi, mid)
        ch = (ch << 1) | b
        even = not even
        bit += 1
        if bit == 5:
            codes[pos] = ch
            pos += 1
            bit = 0
            ch = np.zeros(n, dtype=np.uint8)
    mat = np.ascontiguousarray(_BASE32_BYTES[codes.T])  # (n, precision)
    return mat.view(f"S{precision}").ravel().astype(f"U{precision}")
