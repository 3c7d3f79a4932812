"""Scale smoke for the transcript bucket-scan family: run
context_windows, tool_loops and sft_pairs over the sf0.1 corpus (500k
turns) at TWO parallelism levels in FRESH ray sessions (subprocesses)
and assert byte-identical sorted outputs (md5 over the row reprs) —
the determinism claim that lets a resumable production run mix node
counts freely.  Prints one timing line per level for BASELINE.md.

Usage: python scripts/scale_smoke_transcripts.py  (expects the sf0.1
fixtures; generates them if absent)
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

CHILD = r"""
import hashlib, json, sys, time
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False)
sys.path.insert(0, %(repo)r)
from d1_log_aggregation_ray.pipelines.queries import RAY_QUERIES

def md5_sorted(tbl_rows, cols):
    h = hashlib.md5()
    for r in tbl_rows:
        h.update(repr([r[c] for c in cols]).encode())
    return h.hexdigest()

out = {}
for name, key_cols in (("context_windows", ["conv_id", "turn_idx"]),
                       ("tool_loops", ["conv_id"]),
                       ("sft_pairs", ["conv_id", "turn_idx"])):
    t0 = time.time()
    ds = RAY_QUERIES[name](%(sf)r)
    rows = ds.take_all()
    out[name + "_sec"] = round(time.time() - t0, 3)
    rows.sort(key=lambda r: tuple(r[c] for c in key_cols))
    cols = list(rows[0].keys()) if rows else []
    out[name + "_md5"] = md5_sorted(rows, sorted(cols))
    out[name + "_rows"] = len(rows)
print(json.dumps(out))
ray.shutdown()
"""


def run(cpus: int) -> dict:
    script = CHILD % {"repo": REPO, "sf": SF_DIR}
    proc = subprocess.run([sys.executable, "-c", script, str(cpus)],
                          capture_output=True, text=True, timeout=1200)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-2000:])
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sys.path.insert(0, REPO)
    from d1_log_aggregation_ray.gen.fixtures import generate_fixtures
    generate_fixtures(SF_DIR)
    a, b = run(8), run(32)
    for name in ("context_windows", "tool_loops", "sft_pairs"):
        assert a[name + "_md5"] == b[name + "_md5"], (
            name, a[name + "_md5"], b[name + "_md5"])
        assert a[name + "_rows"] == b[name + "_rows"]
        print(f"{name}: rows={a[name + '_rows']} byte-identical at "
              f"8/32 cpus; sec 8cpu={a[name + '_sec']} "
              f"32cpu={b[name + '_sec']}")
    print("OK")


if __name__ == "__main__":
    main()
