"""Scale smoke for the round-3 ranking/projection/bookkeeping ops
(the pca/bm25/shuffle analog of the 200k-doc dedup smoke and the
kmeans/packing vector smoke recorded in BASELINE.md).

Synthesizes a deterministic 200k x 64 embedding corpus and a 200k-doc
text corpus (seeded vocab sampling), then runs pca_project, bm25_topk
and shuffle_shards at TWO parallelism levels in FRESH ray sessions
(subprocesses) and asserts:
  - pca_project: byte-identical (vec_id, pc1..pc4) tables (md5 of the
    sorted table) — the integer-exactness claim at 100x bench scale;
  - bm25_topk: identical top-10 (doc_id, score) at both levels;
  - shuffle_shards: byte-identical (doc_id, shard_id, pos) tables.
Prints one timing line per run for BASELINE.md.

Usage: python scripts/scale_smoke_ranking.py  (writes /tmp scratch)
"""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/tmp/graft_scale_rank"
N = 200_000
D = 64

CHILD = r"""
import hashlib, json, sys, time
import numpy as np
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False)
import ray.data
sys.path.insert(0, %(repo)r)
from d1_log_aggregation_ray.ops.projection import pca_project
from d1_log_aggregation_ray.ops.ranking import bm25_topk
from d1_log_aggregation_ray.ops.split import shuffle_shards

def md5_rows(rows, cols):
    h = hashlib.md5()
    for r in rows:
        h.update(repr([r[c] for c in cols]).encode())
    return h.hexdigest()

out = {}
t0 = time.time()
emb = ray.data.read_parquet(%(data)r + "/emb.parquet")
rows = pca_project(emb, d_out=4).take_all()
out["pca_sec"] = round(time.time() - t0, 3)
rows.sort(key=lambda r: r["vec_id"])
out["pca_md5"] = md5_rows(rows, ["vec_id", "pc1", "pc2", "pc3", "pc4"])

t0 = time.time()
docs = ray.data.read_parquet(%(data)r + "/docs.parquet")
top = bm25_topk(docs, terms=["alpha", "gamma", "kappa"], k=10)
out["bm25_sec"] = round(time.time() - t0, 3)
out["bm25_top"] = [[r["doc_id"], r["score"]] for r in top.to_pylist()]

t0 = time.time()
sh = shuffle_shards(ray.data.read_parquet(%(data)r + "/docs.parquet"),
                    n_shards=64).take_all()
out["shuffle_sec"] = round(time.time() - t0, 3)
sh.sort(key=lambda r: r["doc_id"])
out["shuffle_md5"] = md5_rows(sh, ["doc_id", "shard_id", "pos"])

from d1_log_aggregation_ray.ops.cluster import organize_embeddings
t0 = time.time()
oe = organize_embeddings(ray.data.read_parquet(
    %(data)r + "/emb.parquet"), k=16, iters=3, threshold=0.95,
    d_out=4).take_all()
out["organize_sec"] = round(time.time() - t0, 3)
oe.sort(key=lambda r: r["vec_id"])
out["organize_rows"] = len(oe)
out["organize_md5"] = md5_rows(
    oe, ["vec_id", "cluster", "pc1", "pc2", "pc3", "pc4"])

import pyarrow.compute as pc_
import pyarrow as pa_
from d1_log_aggregation_ray.ops.dedup import incremental_exact_dedup
from d1_log_aggregation_ray.functions.hashing import md5_lower64_array
import numpy as np
def _tag(b):
    h = md5_lower64_array(pc_.cast(b.column("doc_id"), pa_.string()))
    return b.append_column("is_prior", pa_.array(h %% np.uint64(100) < 50))
t0 = time.time()
inc = incremental_exact_dedup(ray.data.read_parquet(
    %(data)r + "/docs.parquet").map_batches(
    _tag, batch_format="pyarrow")).take_all()
out["incdedup_sec"] = round(time.time() - t0, 3)
out["incdedup_rows"] = len(inc)
inc.sort(key=lambda r: r["doc_id"])
out["incdedup_md5"] = md5_rows(inc, ["doc_id"])

from d1_log_aggregation_ray.ops.similarity import knn_join
t0 = time.time()
kj = knn_join(ray.data.read_parquet(%(data)r + "/emb.parquet"), k=5)
def _rowhash(b):
    # order-insensitive block digest: xor of per-row md5s (every
    # (vec_id, neighbor_id, rank) row is unique), so the check is
    # independent of block layout without a driver-side 1M-row sort
    import pyarrow.compute as pcc
    s = pcc.binary_join_element_wise(
        pcc.cast(b.column("vec_id"), pa_.string()),
        pcc.cast(b.column("neighbor_id"), pa_.string()),
        pcc.cast(b.column("nn_rank"), pa_.string()), ":")
    h = md5_lower64_array(s)
    x = np.bitwise_xor.reduce(h) if len(h) else np.uint64(0)
    return pa_.table({"x": pa_.array([int(x)], pa_.uint64()),
                      "n": pa_.array([len(h)], pa_.int64())})
parts = kj.map_batches(_rowhash, batch_format="pyarrow").take_all()
out["knn_sec"] = round(time.time() - t0, 3)
out["knn_rows"] = sum(r["n"] for r in parts)
x = np.uint64(0)
for r in parts:
    x ^= np.uint64(r["x"])
out["knn_xor"] = int(x)

print("RESULT " + json.dumps(out))
ray.shutdown()
"""


def gen() -> None:
    os.makedirs(DATA, exist_ok=True)
    if not os.path.exists(DATA + "/emb.parquet"):
        rng = np.random.default_rng(5)
        m = rng.normal(size=(N, D)).astype(np.float32)
        offs = np.arange(N + 1, dtype=np.int32) * D
        pq.write_table(pa.table({
            "vec_id": pa.array(range(N), pa.int64()),
            "embedding": pa.ListArray.from_arrays(
                pa.array(offs), pa.array(m.reshape(-1)))}),
            DATA + "/emb.parquet")
    if not os.path.exists(DATA + "/docs.parquet"):
        rng = np.random.default_rng(6)
        vocab = np.array(["alpha", "beta", "gamma", "delta", "kappa",
                          "omega", "w%d" % 0, "w1", "w2", "w3", "w4",
                          "w5", "w6", "w7"])
        lens = rng.integers(10, 60, size=N)
        toks = rng.choice(vocab, size=int(lens.sum()))
        texts, pos = [], 0
        for L in lens:
            texts.append(" ".join(toks[pos:pos + L]))
            pos += L
        pq.write_table(pa.table({
            "doc_id": pa.array(range(N), pa.int64()),
            "text": pa.array(texts)}), DATA + "/docs.parquet")


def run(n_cpus: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c",
         CHILD % {"repo": REPO, "data": DATA}, str(n_cpus)],
        capture_output=True, text=True, timeout=1800)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child cpus={n_cpus} failed:\n{proc.stderr[-2000:]}")


def main() -> None:
    gen()
    lo, hi = run(8), run(32)
    for k in ("pca_md5", "shuffle_md5", "bm25_top", "organize_md5",
              "incdedup_md5", "knn_xor", "knn_rows"):
        assert lo[k] == hi[k], f"{k} differs across parallelism!"
    print(json.dumps({
        "n": N,
        "pca_sec": {"8": lo["pca_sec"], "32": hi["pca_sec"]},
        "bm25_sec": {"8": lo["bm25_sec"], "32": hi["bm25_sec"]},
        "shuffle_sec": {"8": lo["shuffle_sec"], "32": hi["shuffle_sec"]},
        "organize_sec": {"8": lo["organize_sec"],
                         "32": hi["organize_sec"]},
        "organize_rows": lo["organize_rows"],
        "incdedup_sec": {"8": lo["incdedup_sec"],
                         "32": hi["incdedup_sec"]},
        "incdedup_rows": lo["incdedup_rows"],
        "knn_sec": {"8": lo["knn_sec"], "32": hi["knn_sec"]},
        "knn_rows": lo["knn_rows"],
        "identical_across_levels": True,
        "bm25_top1": lo["bm25_top"][0]}))


if __name__ == "__main__":
    main()
