"""Scale + determinism smoke for keep_best_dedup (the quality-aware
near-dup survivor selector) at 40x the bench corpus.

Synthesizes a deterministic 200k-doc corpus: 185k unique docs (seeded
vocab sampling over a 1,000-word vocabulary, 20-60 tokens) plus 5k
planted near-copy CHAINS of three members each — (base + 5 extra
tokens, base + 10 extra tokens, base) over a 150-token base, laid out
so the LONGEST member sits at the chain's MIDDLE id.  A min-id
survivor rule would keep the first member; keep_best must keep the
middle one.

Runs keep_best_dedup at 8 and 32 CPUs in FRESH ray sessions
(subprocesses) and asserts:
  - byte-identical survivor sets at both parallelism levels (md5 of
    the sorted id list) — the determinism claim at 40x bench scale;
  - >= 90% of planted chains collapse to exactly ONE survivor, and
    EVERY single-survivor chain kept its longest member (the +10
    variant at the middle id), never the min id;
  - unique docs all survive (no false positives outside the chains).
Prints one timing line per level for BASELINE.md.

Usage: python scripts/scale_smoke_keepbest.py  (writes /tmp scratch)
"""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/tmp/graft_scale_keepbest"
N_UNIQUE = 185_000
N_CHAINS = 5_000
CHAIN0 = N_UNIQUE  # first chain id; chain i = ids CHAIN0+3i .. +3i+2

CHILD = r"""
import hashlib, json, sys, time
import ray
ray.init(address="local", num_cpus=int(sys.argv[1]),
         include_dashboard=False)
import ray.data
sys.path.insert(0, %(repo)r)
from d1_log_aggregation_ray.ops.dedup import keep_best_dedup

t0 = time.time()
docs = ray.data.read_parquet(%(data)r + "/docs.parquet")
surv = sorted(r["doc_id"] for r in keep_best_dedup(docs).take_all())
sec = round(time.time() - t0, 3)

from d1_log_aggregation_ray.ops.lm import lm_score
from d1_log_aggregation_ray.ops.text import bpe_train
t0 = time.time()
lm = sorted((r["doc_id"], r["lm_score"]) for r in lm_score(
    ray.data.read_parquet(%(data)r + "/docs.parquet")).take_all())
lm_sec = round(time.time() - t0, 3)
lm_md5 = hashlib.md5(repr(lm).encode()).hexdigest()
t0 = time.time()
bt = bpe_train(ray.data.read_parquet(%(data)r + "/docs.parquet"),
               n_merges=100)
bpe_sec = round(time.time() - t0, 3)
bpe_md5 = hashlib.md5(repr(bt.to_pylist()).encode()).hexdigest()

sset = set(surv)
n_unique_kept = sum(1 for i in range(%(n_unique)d) if i in sset)
one, longest_kept, min_id_kept = 0, 0, 0
for c in range(%(n_chains)d):
    a = %(chain0)d + 3 * c
    members = [m for m in (a, a + 1, a + 2) if m in sset]
    if len(members) == 1:
        one += 1
        if members[0] == a + 1:      # the +10-token longest member
            longest_kept += 1
        if members[0] == a:          # what a min-id rule would keep
            min_id_kept += 1

h = hashlib.md5(repr(surv).encode()).hexdigest()
print("RESULT " + json.dumps({
    "sec": sec, "n_survivors": len(surv), "md5": h,
    "unique_kept": n_unique_kept, "chains_one_survivor": one,
    "chains_longest_kept": longest_kept,
    "chains_min_id_kept": min_id_kept,
    "lm_sec": lm_sec, "lm_md5": lm_md5,
    "bpe_sec": bpe_sec, "bpe_md5": bpe_md5}))
ray.shutdown()
"""


def gen() -> None:
    os.makedirs(DATA, exist_ok=True)
    if os.path.exists(DATA + "/docs.parquet"):
        return
    rng = np.random.default_rng(11)
    vocab = np.array(["w%d" % i for i in range(1000)])
    ids, texts = [], []
    lens = rng.integers(20, 60, size=N_UNIQUE)
    toks = rng.choice(vocab, size=int(lens.sum()))
    pos = 0
    for i, L in enumerate(lens):
        ids.append(i)
        texts.append(" ".join(toks[pos:pos + L]))
        pos += L
    base_toks = rng.choice(vocab, size=(N_CHAINS, 160))
    for c in range(N_CHAINS):
        base = " ".join(base_toks[c, :150])
        mid5 = base + " " + " ".join(base_toks[c, 150:155])
        long10 = base + " " + " ".join(base_toks[c, 150:160])
        a = CHAIN0 + 3 * c
        ids += [a, a + 1, a + 2]
        texts += [mid5, long10, base]   # longest at the MIDDLE id
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts)}), DATA + "/docs.parquet")


def run(n_cpus: int) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c",
         CHILD % {"repo": REPO, "data": DATA, "n_unique": N_UNIQUE,
                  "n_chains": N_CHAINS, "chain0": CHAIN0},
         str(n_cpus)],
        capture_output=True, text=True, timeout=1800)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"child cpus={n_cpus} failed:\n{proc.stderr[-2000:]}")


def main() -> None:
    gen()
    lo, hi = run(8), run(32)
    assert lo["md5"] == hi["md5"], "survivors differ across parallelism!"
    assert lo["lm_md5"] == hi["lm_md5"], "lm_score differs!"
    assert lo["bpe_md5"] == hi["bpe_md5"], "bpe merges differ!"
    for r in (lo, hi):
        assert r["unique_kept"] == N_UNIQUE, "unique doc falsely dropped"
        assert r["chains_one_survivor"] >= 0.9 * N_CHAINS, \
            f"only {r['chains_one_survivor']} chains fully collapsed"
        assert r["chains_longest_kept"] == r["chains_one_survivor"], \
            "a collapsed chain kept a non-longest member"
        assert r["chains_min_id_kept"] == 0, \
            "min-id member survived a collapsed chain"
    print(json.dumps({
        "n_docs": N_UNIQUE + 3 * N_CHAINS,
        "sec": {"8": lo["sec"], "32": hi["sec"]},
        "n_survivors": hi["n_survivors"],
        "chains_one_survivor": hi["chains_one_survivor"],
        "lm_sec": {"8": lo["lm_sec"], "32": hi["lm_sec"]},
        "bpe_sec": {"8": lo["bpe_sec"], "32": hi["bpe_sec"]},
        "md5_equal": True}))


if __name__ == "__main__":
    main()
