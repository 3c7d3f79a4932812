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


def test_geohash_array_bit_parity_with_scalar():
    """The vectorized bisection must emit byte-identical geohashes to
    the scalar encoder — including the exact lat/lon grid the synthetic
    geo derives from hashes (thousandth-degree steps) and boundary
    values that sit ON bisection midpoints."""
    from d1_log_aggregation_ray.functions.geohash import geohash_encode_array

    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**64, size=2000, dtype=np.uint64)
    lat = (h % np.uint64(170000)).astype(np.float64) / 1000.0 - 85.0
    lon = ((h // np.uint64(170000)) % np.uint64(360000)
           ).astype(np.float64) / 1000.0 - 180.0
    # planted edges: midpoints of early bisection steps + extremes
    lat = np.concatenate([lat, [0.0, -90.0, 89.999, 45.0, -45.0, 22.5]])
    lon = np.concatenate([lon, [0.0, -180.0, 179.999, 90.0, -90.0, 45.0]])
    vec = geohash_encode_array(lat, lon, 9)
    for i in range(len(lat)):
        assert vec[i] == geohash_encode(float(lat[i]), float(lon[i]), 9)
    # non-default precision path
    v5 = geohash_encode_array(lat[:50], lon[:50], 5)
    for i in range(50):
        assert v5[i] == geohash_encode(float(lat[i]), float(lon[i]), 5)


def test_compression_ratio_planted_and_sql_rawlen():
    """Repetitive text compresses far below random text; raw_len
    matches DuckDB octet_length on the real fixture (the SQL-checkable
    half of the pinned golden); null text behaves like ''."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from d1_log_aggregation_ray.ops.text import compression_ratio_batch

    rng = np.random.default_rng(17)
    rep = "spam and eggs " * 200
    rand = "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz "),
                              size=len(rep)))
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array([rep, rand, None])})
    out = compression_ratio_batch(t)
    ratios = {r["doc_id"]: r["comp_len"] / max(r["raw_len"], 1)
              for r in out.to_pylist()}
    assert ratios[0] < 0.05          # boilerplate collapses
    assert ratios[1] > 0.5           # near-random barely compresses
    row2 = out.to_pylist()[2]
    assert row2["raw_len"] == 0 and row2["comp_len"] > 0

    import pyarrow.parquet as pq
    sf = "/root/testdata/sf0.001/documents.parquet"
    docs = pq.read_table(sf, columns=["doc_id", "text"])
    got = {r["doc_id"]: r["raw_len"]
           for r in compression_ratio_batch(docs).to_pylist()}
    want = dict(duckdb.sql(
        f"SELECT doc_id, octet_length(CAST(COALESCE(text,'') AS BLOB)) "
        f"FROM read_parquet('{sf}')").fetchall())
    assert got == {int(k): int(v) for k, v in want.items()}
