"""Compaction pass: row-for-row content preservation over a fanned-out
harvest output tree, idempotency, and crash-window recovery via the
two-phase marker."""

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq
import pytest

from d1_log_aggregation_ray.pipelines.harvest import run_harvest
from d1_log_aggregation_ray.sources.compact import (_MARKER,
                                                    compact_output)


@pytest.fixture(scope="module")
def out_tree(fx_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("compact") / "out")
    run_harvest(fx_dir, out, resume=False)
    # fan one leaf out into 3 slice files so compaction has work
    leaf = sorted(glob.glob(os.path.join(
        out, "bucket_id=*", "sink_id=*", "part-*.parquet")))[0]
    t = pq.read_table(leaf)
    d = os.path.dirname(leaf)
    n = t.num_rows
    step = max(1, n // 3)
    for i, off in enumerate(range(0, n, step)):
        pq.write_table(t.slice(off, step),
                       os.path.join(d, f"part-fan{i}.parquet"))
    os.remove(leaf)
    return out, d


def _read_sorted(out):
    t = pa_ds.dataset(out, partitioning="hive").to_table()
    return t.sort_by([(c, "ascending") for c in
                      ["conv_id", "turn_idx"] if c in t.column_names])


def test_compact_preserves_content(out_tree):
    out, fanned = out_tree
    before = _read_sorted(out)
    man = compact_output(out).take_all()
    byleaf = {r["leaf_dir"]: r for r in man}
    assert byleaf[fanned]["action"] == "merged"
    assert byleaf[fanned]["n_in_files"] >= 3
    # all other leaves untouched
    assert all(r["action"] == "skip" for r in man
               if r["leaf_dir"] != fanned)
    assert len(glob.glob(os.path.join(fanned, "*.parquet"))) == 1
    assert _read_sorted(out).equals(before)
    # idempotent: second pass skips everything
    man2 = compact_output(out).take_all()
    assert all(r["action"] == "skip" for r in man2)


def test_compact_finishes_interrupted_pass(out_tree, tmp_path):
    out, _ = out_tree
    # simulate: merged file written, deletes + marker cleanup not done
    leaf = str(tmp_path / "bucket_id=0" / "sink_id=0")
    os.makedirs(leaf)
    src = sorted(glob.glob(os.path.join(
        out, "bucket_id=*", "sink_id=*", "*.parquet")))[0]
    t = pq.read_table(src)
    pq.write_table(t.slice(0, 1), os.path.join(leaf, "part-a.parquet"))
    pq.write_table(t.slice(1, 1), os.path.join(leaf, "part-b.parquet"))
    merged = pa.concat_tables([
        pq.read_table(os.path.join(leaf, "part-a.parquet")),
        pq.read_table(os.path.join(leaf, "part-b.parquet"))])
    pq.write_table(merged, os.path.join(leaf, "merged-dead.parquet"))
    with open(os.path.join(leaf, _MARKER), "w") as f:
        json.dump({"merged": "merged-dead.parquet",
                   "inputs": ["part-a.parquet", "part-b.parquet"]}, f)
    man = {r["leaf_dir"]: r for r in
           compact_output(str(tmp_path)).take_all()}
    assert man[leaf]["action"] == "finish"
    files = glob.glob(os.path.join(leaf, "*.parquet"))
    assert files == [os.path.join(leaf, "merged-dead.parquet")]
    assert pq.read_table(files[0]).num_rows == 2
    assert not os.path.exists(os.path.join(leaf, _MARKER))


def test_compact_discards_stale_marker(tmp_path):
    # marker exists but merged file was never written -> fresh compact
    leaf = str(tmp_path / "bucket_id=1" / "sink_id=0")
    os.makedirs(leaf)
    t = pa.table({"x": pa.array([1, 2], pa.int64())})
    pq.write_table(t.slice(0, 1), os.path.join(leaf, "part-a.parquet"))
    pq.write_table(t.slice(1, 1), os.path.join(leaf, "part-b.parquet"))
    with open(os.path.join(leaf, _MARKER), "w") as f:
        json.dump({"merged": "merged-neverwritten.parquet",
                   "inputs": ["part-a.parquet"]}, f)
    man = {r["leaf_dir"]: r for r in
           compact_output(str(tmp_path)).take_all()}
    assert man[leaf]["action"] == "merged"
    files = glob.glob(os.path.join(leaf, "*.parquet"))
    assert len(files) == 1 and "merged-" in files[0]
    assert pq.read_table(files[0]).num_rows == 2
