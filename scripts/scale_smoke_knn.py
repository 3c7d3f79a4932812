"""Scale smoke for the scale-adaptive knn_join (round-4 change).

Synthesizes a deterministic 600k x 16 embedding corpus — large enough
that knn_planes_for derives MORE planes than the floor (600k rows /
2048 target -> 9 planes, vs the 8-plane floor every test corpus uses)
— and runs knn_join at two parallelism levels in fresh ray sessions:

  1. asserts the derived plane count is 9 (the scale path is live);
  2. asserts the (vec_id, neighbor_id, nn_rank) output is
     byte-identical across 8 and 32 CPUs (md5 of the sorted table) —
     the determinism claim at 120x the bench corpus, multi-chunk
     bucket scans included;
  3. prints one timing line per level for BASELINE.md.

Usage: python scripts/scale_smoke_knn.py   (writes /tmp scratch)
"""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/tmp/graft_scale_knn"
N, D = 600_000, 16

CHILD = r"""
import json, sys, time, hashlib
import numpy as np
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False)
import ray.data
sys.path.insert(0, %(repo)r)
from d1_log_aggregation_ray.ops.similarity import knn_join, knn_planes_for

assert knn_planes_for(%(n)d) == 9, knn_planes_for(%(n)d)
t0 = time.time()
ds = ray.data.read_parquet(%(data)r + "/emb.parquet")
rows = knn_join(ds, k=3).take_all()
sec = round(time.time() - t0, 3)
rows.sort(key=lambda r: (r["vec_id"], r["nn_rank"]))
arr = np.array([[r["vec_id"], r["neighbor_id"], r["nn_rank"]]
                for r in rows], dtype=np.int64)
out = {"sec": sec, "n_rows": len(arr),
       "md5": hashlib.md5(arr.tobytes()).hexdigest()}
ray.shutdown()
print("RESULT " + json.dumps(out))
"""


def synth() -> None:
    os.makedirs(DATA, exist_ok=True)
    path = os.path.join(DATA, "emb.parquet")
    if os.path.exists(path):
        return
    rng = np.random.RandomState(9)
    emb = rng.normal(size=(N, D)).astype(np.float32)
    emb[N - 1000:] = emb[:1000]          # planted exact-dup tail
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(N, dtype=np.int64)),
        "embedding": pa.array(list(emb.astype(np.float64)),
                              type=pa.list_(pa.float64())),
    }), path)


def run(cpus: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c",
         CHILD % {"repo": REPO, "data": DATA, "n": N}, str(cpus)],
        capture_output=True, text=True, timeout=1200)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main() -> None:
    synth()
    results = {c: run(c) for c in (8, 32)}
    for c, r in results.items():
        print(f"cpus={c}: {r}")
    assert results[8]["md5"] == results[32]["md5"], "non-deterministic!"
    assert results[8]["n_rows"] > 0
    print("OK: derived-planes path live (9), byte-identical at 8 vs 32")


if __name__ == "__main__":
    main()
