"""The flagship harvest pipeline: parse -> enrich -> route -> aggregate.

End-to-end analog of LogHarvesterTask.harvest
(/root/reference/src/main/java/org/dataone/cn/batch/logging/tasks/LogHarvesterTask.java:129-525),
re-expressed as one streaming Ray Data DAG:

    read_parquet(bucket files)                    [S1/S2]
      -> map_batches(clean_project)               [M1-M5, zero-copy Arrow]
      -> groupby(conv_id).map_groups(repeat_visit)[O1 sort + W1 window]
      -> map_batches(Enricher actor pool)         [R1-R3, J1-J5, M4, S6]
      -> write_parquet(partition by bucket/sink)  [S6 sinks]

Design notes (scale):
  - The ONE all-to-all exchange (groupby) runs on the narrow 6-column
    input; all ~30 enrichment columns are added after the shuffle.
  - Side tables are ray.put once; every enrich actor reads the same
    object-store copy.
  - Buckets (the generator's hash partitions; convs never span them)
    are the resume unit, processed in waves; each completed wave appends
    per-bucket lineage records to the checkpoint manifest.
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

import ray
import ray.data

from ..config import PipelineConfig, DEFAULT_CONFIG
from ..sources.readers import read_transcripts, load_side_tables
from ..stages.project import clean_project
from ..stages.window import repeat_visit_group, bucket_window_scan
from ..stages.enrich import Enricher, DEFAULT_RUN_TS
from ..state.manifest import Manifest


def build_pipeline(fx_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                   buckets: list[int] | None = None,
                   run_ts: datetime = DEFAULT_RUN_TS,
                   side_ref=None, bucketed: bool = True) -> ray.data.Dataset:
    """Lazy Dataset of enriched records for the given buckets.

    bucketed=True (default) exploits the conv-hash partitioning of the
    input files: the W1 window scan runs per bucket block with NO
    shuffle (see stages/window.bucket_window_scan).  bucketed=False is
    the general path for non-partitioned inputs: one all-to-all
    groupby(conv_id) exchange on the narrow pre-enrichment columns.
    """
    if side_ref is None:
        side_ref = ray.put(load_side_tables(fx_dir))
    ds = read_transcripts(fx_dir, buckets=buckets,
                          one_block_per_bucket=bucketed)
    if bucketed:
        # clean + whole-bucket sort + window scan in ONE task per bucket
        def clean_then_scan(batch, cfg=cfg):
            return bucket_window_scan(clean_project(batch, cfg), cfg)
        ds = ds.map_batches(clean_then_scan, batch_size=None,
                            batch_format="pyarrow", zero_copy_batch=True)
    else:
        ds = ds.map_batches(clean_project, batch_format="pyarrow",
                            zero_copy_batch=True, fn_kwargs={"cfg": cfg})
        ds = ds.groupby("conv_id").map_groups(
            repeat_visit_group, batch_format="pyarrow", fn_kwargs={"cfg": cfg})
    ds = ds.map_batches(
        Enricher, fn_constructor_args=(side_ref, cfg, run_ts),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=cfg.batch_size, concurrency=cfg.enrich_concurrency)
    return ds


def _wave_stats(out_dir: str, buckets: list[int],
                cfg: PipelineConfig = DEFAULT_CONFIG) -> dict[int, dict]:
    """Per-bucket lineage stats for a completed wave: ONE column-pruned
    parallel arrow scan over the wave's sink files + a vectorized
    group_by, instead of 32 sequential per-bucket reads."""
    paths = [os.path.join(out_dir, f"bucket_id={b}") for b in buckets
             if os.path.isdir(os.path.join(out_dir, f"bucket_id={b}"))]
    out: dict[int, dict] = {b: {
        "rows_out": 0, "per_sink_rows": {}, "in_partial_list": 0,
        "in_full_list": 0, "is_repeat_visit": 0, "max_ts": None,
    } for b in buckets}
    if not paths:
        return out
    dset = pads.dataset([pads.dataset(p, partitioning="hive") for p in paths])
    t = dset.to_table(columns=["conv_id", "sink_id", "in_partial_list",
                               "in_full_list", "is_repeat_visit", "ts"])
    from ..functions.hashing import md5_lower64_array
    bucket_arr = pa.array(
        (md5_lower64_array(t.column("conv_id").combine_chunks())
         % np.uint64(cfg.n_buckets)).astype(np.int64))
    t = t.append_column("bucket_id", bucket_arr)
    flags = pa.table({
        "bucket_id": t.column("bucket_id"),
        "sink_id": t.column("sink_id"),
        "p": pc.cast(t.column("in_partial_list"), pa.int64()),
        "f": pc.cast(t.column("in_full_list"), pa.int64()),
        "r": pc.cast(t.column("is_repeat_visit"), pa.int64()),
        "ts": t.column("ts"),
    })
    agg = flags.group_by(["bucket_id", "sink_id"]).aggregate(
        [([], "count_all"), ("p", "sum"), ("f", "sum"), ("r", "sum"),
         ("ts", "max")])
    for row in agg.to_pylist():
        b = row["bucket_id"]
        rec = out[b]
        rec["rows_out"] += row["count_all"]
        rec["per_sink_rows"][str(row["sink_id"])] = row["count_all"]
        rec["in_partial_list"] += row["p_sum"] or 0
        rec["in_full_list"] += row["f_sum"] or 0
        rec["is_repeat_visit"] += row["r_sum"] or 0
        mt = row["ts_max"]
        if mt is not None:
            iso = mt.isoformat()
            if rec["max_ts"] is None or iso > rec["max_ts"]:
                rec["max_ts"] = iso
    return out


def run_harvest(fx_dir: str, out_dir: str,
                cfg: PipelineConfig = DEFAULT_CONFIG,
                run_ts: datetime = DEFAULT_RUN_TS,
                wave_size: int = 8,
                resume: bool = True) -> dict:
    """Run (or resume) the harvest over all buckets; returns a summary.

    Buckets are processed in waves of `wave_size`; after each wave the
    manifest records one lineage line per bucket.  On resume, completed
    buckets are skipped and partial output dirs of incomplete buckets
    are cleared before reprocessing (partition-atomic overwrite — the
    idempotency analog of Solr upsert-by-id).
    """
    os.makedirs(out_dir, exist_ok=True)
    # "_" prefix: ignored by parquet dataset discovery (ignore_prefixes)
    manifest = Manifest(os.path.join(out_dir, "_manifest.jsonl"))
    done = manifest.completed_buckets() if resume else set()
    todo = [b for b in range(cfg.n_buckets) if b not in done]
    if not resume:
        for b in range(cfg.n_buckets):
            shutil.rmtree(os.path.join(out_dir, f"bucket_id={b}"),
                          ignore_errors=True)
        if os.path.exists(manifest.path):
            os.remove(manifest.path)
        done = set()
        todo = list(range(cfg.n_buckets))
    # clear partials from a previous killed run
    for b in todo:
        shutil.rmtree(os.path.join(out_dir, f"bucket_id={b}"), ignore_errors=True)

    side_ref = ray.put(load_side_tables(fx_dir))
    t_start = time.time()
    rows_in_total = 0
    for i in range(0, len(todo), wave_size):
        wave = todo[i:i + wave_size]
        t0 = time.time()
        n_in = sum(
            pads.dataset(os.path.join(fx_dir, "transcripts",
                                      f"part-{b:02d}.parquet")).count_rows()
            for b in wave)
        rows_in_total += n_in
        ds = build_pipeline(fx_dir, cfg, buckets=wave, run_ts=run_ts,
                            side_ref=side_ref)
        ds.write_parquet(out_dir, partition_cols=["bucket_id", "sink_id"])
        dt = time.time() - t0
        wave_stats = _wave_stats(out_dir, wave, cfg)
        for b in wave:
            stats = wave_stats[b]
            manifest.append({
                "bucket": b, "complete": True,
                "fragment": f"transcripts/part-{b:02d}.parquet",
                "wave": wave, "wave_rows_in": n_in,
                "wave_duration_s": round(dt, 3),
                "run_ts": run_ts.isoformat(),
                **stats,
            })

    recs = [r for r in manifest.records() if r.get("complete")]
    total_out = sum(r["rows_out"] for r in recs)
    summary = {
        "buckets": len(recs),
        "resumed_skipped": sorted(done),
        "rows_in_this_run": rows_in_total,
        "rows_out_total": total_out,
        "in_partial_list": sum(r["in_partial_list"] for r in recs),
        "in_full_list": sum(r["in_full_list"] for r in recs),
        "is_repeat_visit": sum(r["is_repeat_visit"] for r in recs),
        "max_ts": max((r["max_ts"] for r in recs if r["max_ts"]), default=None),
        "duration_s": round(time.time() - t_start, 3),
    }
    return summary
