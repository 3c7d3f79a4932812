"""Replicates the grading driver's correctness gate end-to-end: runs
entry(), every queries()[name](sf_dir), and the matching oracle_sql()
via DuckDB on the same tables, comparing row count + column names +
order-insensitive values.  Usage:

    python scripts/drive_contract.py [sf_dir]
"""
import ray, time, duckdb, pandas as pd
ray.init(address="local", num_cpus=32, include_dashboard=False)
import sys
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as E

ds = E.entry()
print("entry() rows:", ds.count())

qs, sqls = E.queries(), E.oracle_sql()
print("queries:", len(qs), "oracles:", len(sqls))
con = duckdb.connect()
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object: df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("uint","int","bool")): df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("datetime"): df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

fails = []
for name in sorted(sqls):
    t0 = time.time()
    res = qs[name](SF)
    e = norm(res.to_pandas() if hasattr(res, "to_pandas") else res)
    t1 = time.time()
    o = norm(con.execute(sqls[name]).df())
    ok = list(e.columns)==list(o.columns) and len(e)==len(o) and all(((e[c]==o[c])|(e[c].isna()&o[c].isna())).all() for c in e.columns)
    print(f"{name:24s} ray={t1-t0:6.2f}s sql={time.time()-t1:6.2f}s rows={len(e):7d} {'MATCH' if ok else 'MISMATCH'}")
    if not ok: fails.append(name)
print("FAILS:", fails)
ray.shutdown()
