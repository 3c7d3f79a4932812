"""Helpers: portable hash parity with DuckDB, geohash golden values,
interval merge."""

import duckdb
import numpy as np
import pyarrow as pa

from d1_log_aggregation_ray.functions.hashing import md5_lower64, md5_lower64_array, hash32_array
from d1_log_aggregation_ray.functions.geohash import geohash_encode
from d1_log_aggregation_ray.sources.readers import _merge_intervals


def test_md5_lower64_matches_duckdb():
    con = duckdb.connect()
    for s in ["abc", "conv-000123", "", "Ωunicode"]:
        expect = con.execute("select md5_number_lower(?)", [s]).fetchone()[0]
        assert md5_lower64(s) == expect


def test_md5_array_vectorized():
    arr = pa.array(["a", "b", "a", None, "c"])
    out = md5_lower64_array(arr)
    assert out[0] == out[2] == md5_lower64("a")
    assert out[3] == 0
    assert hash32_array(arr)[1] == md5_lower64("b") % 2**32


def test_geohash_golden():
    # public golden values (wikipedia geohash examples)
    assert geohash_encode(42.605, -5.603, 5) == "ezs42"
    assert geohash_encode(57.64911, 10.40744, 11) == "u4pruydqqvj"


def test_merge_intervals():
    lo = np.array([10, 5, 30], dtype=np.uint64)
    hi = np.array([20, 12, 35], dtype=np.uint64)
    mlo, mhi = _merge_intervals(lo, hi)
    assert mlo.tolist() == [5, 30] and mhi.tolist() == [20, 35]
