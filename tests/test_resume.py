"""Kill-resume semantics (SURVEY §5 rebuild test plan): a run resumed
after losing a bucket reprocesses only that bucket; totals and routed
rows are identical to an uninterrupted run — no dupes, no gaps."""

import json
import shutil

import pyarrow.dataset as pads

from d1_log_aggregation_ray.pipelines.harvest import run_harvest


def _read_keys(out):
    t = pads.dataset(out, partitioning="hive").to_table(columns=["turn_id"])
    return sorted(t.column("turn_id").to_pylist())


def test_kill_resume_no_dupes_no_gaps(fx_dir, tmp_path):
    out = str(tmp_path / "out")
    s1 = run_harvest(fx_dir, out, resume=False)
    keys_full = _read_keys(out)

    # simulate a kill that lost bucket 5's manifest entry and left a
    # partial (here: truncated) output dir behind
    mpath = f"{out}/_manifest.jsonl"
    recs = [json.loads(l) for l in open(mpath) if l.strip()]
    with open(mpath, "w") as f:
        for r in recs:
            if r["bucket"] != 5:
                f.write(json.dumps(r) + "\n")
    shutil.rmtree(f"{out}/bucket_id=5")

    from d1_log_aggregation_ray.config import DEFAULT_CONFIG
    s2 = run_harvest(fx_dir, out, resume=True)
    assert s2["resumed_skipped"] == [b for b in range(DEFAULT_CONFIG.n_buckets)
                                     if b != 5]
    assert s2["rows_in_this_run"] < s1["rows_in_this_run"]
    assert _read_keys(out) == keys_full
    for k in ("rows_out_total", "in_partial_list", "in_full_list",
              "is_repeat_visit", "max_ts"):
        assert s2[k] == s1[k], k


def test_resume_complete_run_is_noop(fx_dir, tmp_path):
    out = str(tmp_path / "out")
    run_harvest(fx_dir, out, resume=False)
    from d1_log_aggregation_ray.config import DEFAULT_CONFIG
    s = run_harvest(fx_dir, out, resume=True)
    assert s["rows_in_this_run"] == 0
    assert s["resumed_skipped"] == list(range(DEFAULT_CONFIG.n_buckets))
