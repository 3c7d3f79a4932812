"""REAL mid-compaction kill tests (round-4 verdict item 5): SIGKILL a
subprocess between the two phases of the marker protocol — after the
marker lands but before the merged data exists, and after the merged
data lands but before the input deletes — then assert the next pass
recovers and the content/survivors are identical.

The child process patches os.replace to self-SIGKILL right after the
Nth protocol rename (filtered to the marker / merged names so Ray's
own file activity can't shift the count).  This exercises the ACTUAL
crash windows, not a hand-built simulation of their aftermath (the
simulations live in test_compact.py / test_index_compact.py and stay
— they cover the recovery branches cheaply; this file proves a real
kill lands in exactly those states).
"""

import glob
import json
import os
import signal
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq

import ray.data

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_HELPER = r'''
import os, signal, sys
sys.path.insert(0, sys.argv[4])
kill_at = int(sys.argv[1])
target = sys.argv[2]
mode = sys.argv[3]
n = [0]
orig = os.replace
def patched(a, b):
    orig(a, b)
    base = os.path.basename(str(b))
    if str(b).startswith(target) and (
            base == "_compacting.json" or base.startswith("merged-")
            or base.startswith("seg-compact-")):
        n[0] += 1
        if n[0] == kill_at:
            os.kill(os.getpid(), signal.SIGKILL)
os.replace = patched
if mode == "leaf":
    from d1_log_aggregation_ray.sources.compact import _compact_leaf
    _compact_leaf(target)
else:
    import ray
    ray.init(address="local", num_cpus=2, include_dashboard=False)
    from d1_log_aggregation_ray.ops.dedup import compact_minhash_index
    compact_minhash_index(target)
'''


def _run_killed(kill_at: int, target: str, mode: str) -> int:
    p = subprocess.run(
        [sys.executable, "-c", _HELPER, str(kill_at), target, mode,
         REPO],
        capture_output=True, timeout=180)
    return p.returncode


def _fan_leaf(tmp_path, n_files=3):
    leaf = str(tmp_path / "bucket_id=0" / "sink_id=0")
    os.makedirs(leaf)
    t = pa.table({"conv_id": pa.array([f"c{i}" for i in range(9)]),
                  "turn_idx": pa.array(range(9), pa.int32()),
                  "text": pa.array([f"t{i}" for i in range(9)])})
    step = 9 // n_files
    for i in range(n_files):
        pq.write_table(t.slice(i * step, step),
                       os.path.join(leaf, f"part-{i}.parquet"))
    return leaf, t


def _leaf_table(leaf):
    t = pa_ds.dataset(leaf).to_table()
    return t.sort_by([("conv_id", "ascending"),
                      ("turn_idx", "ascending")])


def test_kill_after_marker_before_data_then_recover(tmp_path):
    """SIGKILL lands right after the marker rename: the merged file
    does not exist, inputs are intact.  The next pass discards the
    stale marker and compacts from scratch; content identical."""
    from d1_log_aggregation_ray.sources.compact import (_MARKER,
                                                        _compact_leaf)
    leaf, want = _fan_leaf(tmp_path)
    rc = _run_killed(1, leaf, "leaf")
    assert rc == -signal.SIGKILL
    assert os.path.exists(os.path.join(leaf, _MARKER))
    assert len(glob.glob(os.path.join(leaf, "part-*.parquet"))) == 3
    assert not glob.glob(os.path.join(leaf, "merged-*.parquet"))

    rep = _compact_leaf(leaf)
    assert rep["action"] == "merged"
    assert not os.path.exists(os.path.join(leaf, _MARKER))
    files = glob.glob(os.path.join(leaf, "*.parquet"))
    assert len(files) == 1 and "merged-" in files[0]
    assert _leaf_table(leaf).equals(want)


def test_kill_after_data_before_deletes_then_recover(tmp_path):
    """SIGKILL lands right after the merged rename: merged file AND
    inputs both present (the transient-duplicate window).  The next
    pass finishes the deletes; content identical, no dup rows."""
    from d1_log_aggregation_ray.sources.compact import (_MARKER,
                                                        _compact_leaf)
    leaf, want = _fan_leaf(tmp_path)
    rc = _run_killed(2, leaf, "leaf")
    assert rc == -signal.SIGKILL
    assert os.path.exists(os.path.join(leaf, _MARKER))
    assert len(glob.glob(os.path.join(leaf, "merged-*.parquet"))) == 1
    assert len(glob.glob(os.path.join(leaf, "part-*.parquet"))) == 3

    rep = _compact_leaf(leaf)
    assert rep["action"] == "finish"
    files = glob.glob(os.path.join(leaf, "*.parquet"))
    assert len(files) == 1 and "merged-" in files[0]
    assert not os.path.exists(os.path.join(leaf, _MARKER))
    assert _leaf_table(leaf).equals(want)


def _corpus(seed, n, start_id):
    rng = np.random.RandomState(seed)
    words = ("alpha beta gamma delta eps zeta eta theta iota "
             "kappa lam mu nu xi omic pi rho sigma tau ups").split()
    texts = [" ".join(rng.choice(words, size=15)) for _ in range(n)]
    return list(range(start_id, start_id + n)), texts


def _docs(ids, texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts)}))


def test_kill_mid_index_compaction_survivors_identical(tmp_path):
    """The minhash band-index compaction under a REAL kill in each
    phase window: day-2 incremental-dedup survivors must be identical
    to the uncompacted index's before the kill, after the kill (the
    index stays readable in every crash state), and after recovery."""
    from d1_log_aggregation_ray.ops.dedup import (
        _COMPACT_MARKER, append_minhash_index, build_minhash_index,
        compact_minhash_index, incremental_minhash_dedup)
    idx = str(tmp_path / "idx")
    ids0, t0 = _corpus(1, 40, 0)
    build_minhash_index(_docs(ids0, t0), idx)
    for day in (2, 3):
        ids, t = _corpus(day, 25, 1000 * day)
        append_minhash_index(_docs(ids, t), idx)

    q_ids, q_texts = _corpus(9, 30, 50_000)
    q_texts[3] = t0[7]            # planted: already in the index
    want = sorted(r["doc_id"] for r in incremental_minhash_dedup(
        _docs(q_ids, q_texts), idx).take_all())
    assert 50_003 not in want and len(want) < 30

    # phase-1 kill: marker present, merged segment absent
    rc = _run_killed(1, idx, "index")
    assert rc == -signal.SIGKILL
    assert os.path.exists(os.path.join(idx, _COMPACT_MARKER))
    got_killed = sorted(r["doc_id"] for r in incremental_minhash_dedup(
        _docs(q_ids, q_texts), idx).take_all())
    assert got_killed == want     # index still fully readable

    rep = compact_minhash_index(idx)
    assert rep["action"] == "merged"
    got = sorted(r["doc_id"] for r in incremental_minhash_dedup(
        _docs(q_ids, q_texts), idx).take_all())
    assert got == want

    # grow the index again so a second compaction has work, then kill
    # in phase 2: merged segment present, inputs not yet deleted
    ids4, t4 = _corpus(4, 25, 4000)
    append_minhash_index(_docs(ids4, t4), idx)
    want2 = sorted(r["doc_id"] for r in incremental_minhash_dedup(
        _docs(q_ids, q_texts), idx).take_all())
    rc = _run_killed(2, idx, "index")
    assert rc == -signal.SIGKILL
    assert os.path.exists(os.path.join(idx, _COMPACT_MARKER))
    tops = {p.split(os.sep)[0] for p in (
        os.path.relpath(f, idx) for f in glob.glob(
            os.path.join(idx, "*", "*.parquet")))}
    assert any(t.startswith("seg-compact-") for t in tops)
    # transient duplicate window is semantically safe (bucket
    # presence is idempotent): survivors unchanged even now
    got_killed2 = sorted(r["doc_id"] for r in incremental_minhash_dedup(
        _docs(q_ids, q_texts), idx).take_all())
    assert got_killed2 == want2

    rep2 = compact_minhash_index(idx)
    assert rep2["action"] == "finish"
    assert not os.path.exists(os.path.join(idx, _COMPACT_MARKER))
    got2 = sorted(r["doc_id"] for r in incremental_minhash_dedup(
        _docs(q_ids, q_texts), idx).take_all())
    assert got2 == want2
