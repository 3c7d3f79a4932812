#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:

  {"metric": "harvest_e2e_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": .., "num_cpus": N,
   "rows": .., "turns_per_sec": ..}

--scaling: run the identical headline job in FRESH processes at
2/4/8/16/32 CPUs on the same input and report throughput at each level
plus the N -> 4N scaling efficiencies (thr_4N / thr_N) / 4 — the
sandbox evidence for the cluster-size criterion; declared pair 4 -> 16
(see run_scaling docstring + BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time


def _sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _num_cpus(default: int | None = None) -> int:
    if default is not None:
        return default
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_bench(sf_dir: str, num_cpus: int, headline_only: bool = False,
              only: list[str] | None = None) -> dict:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from d1_log_aggregation_ray.gen.fixtures import generate_fixtures, sf_from_dir
    from d1_log_aggregation_ray.pipelines.harvest import run_harvest

    fx = generate_fixtures(sf_dir)  # cached/idempotent; outside timings
    out_base = os.environ.get("GRAFT_BENCH_OUT", "/tmp")
    out_dir = f"{out_base}/bench_out_{num_cpus}"
    shutil.rmtree(out_dir, ignore_errors=True)

    # warm the Ray worker pool (python process spawn + imports, ~2-4 s
    # at 32 cpus) so throughput numbers measure the pipeline, not
    # cold-start; a real cluster's workers are long-lived
    import ray.data
    ray.data.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
        lambda b: b).materialize()

    # the sandbox box has bursty multi-core background interference
    # (load avg ~4-5 at 98% idle, ~2% steal): single samples swing
    # +-50-100%, so every measurement is best-of-N with all samples
    # reported (same policy as --scaling)
    reps = int(os.environ.get("GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    # round-5 (verdict r4 item 7): 1-min load average recorded PER
    # SAMPLE so a band breach can be machine-adjudicated as
    # interference (this box idles at load ~4-5 with bursts to ~10;
    # see BASELINE.md) instead of re-derived from prose each round
    loads: dict[str, list[float]] = {}

    harvest_samples = []
    rows = 0
    for r in range(reps if not only else 0):
        shutil.rmtree(out_dir, ignore_errors=True)
        loads.setdefault("harvest", []).append(
            round(os.getloadavg()[0], 2))
        t0 = time.time()
        summary = run_harvest(fx, out_dir, wave_size=64, resume=False)
        harvest_samples.append(round(time.time() - t0, 3))
        rows = summary["rows_out_total"]
    harvest_sec = min(harvest_samples) if harvest_samples else 0.0
    if harvest_samples:
        timings["harvest"] = harvest_sec
        samples["harvest"] = harvest_samples

    if not headline_only:
        from d1_log_aggregation_ray.pipelines.queries import RAY_QUERIES
        for name in only if only else [
                     "route_counts", "repeat_visit", "watermark",
                     "dedup_exact", "dedup_minhash", "token_count",
                     "ann_cosine_topk", "sessionize",
                     # round-2 additions: the vectorized kernels + the
                     # new banded near-dup family
                     "doc_fingerprint", "lang_id", "asof_prior",
                     "approx_distinct_users", "dedup_simhash_near",
                     # round-3 additions: the remaining dedup families
                     # + vocabulary stats + cluster assignment
                     "dedup_ngram", "dedup_embedding",
                     "vocab_df", "dedup_clusters",
                     "ann_multi_topk", "ann_pq_topk",
                     "ann_ivfpq_topk", "stratified_sample",
                     # round-3 curation ops: benchmark decontamination,
                     # repetition signals, exact quantiles
                     "ngram_decontaminate", "doc_repetition",
                     "length_quantiles", "pii_redact",
                     "dup_ngram_stats", "distinctive_terms",
                     # cross-source contamination matrix
                     "source_overlap",
                     # corpus-organization k-means (integer-exact Lloyd)
                     # + training-shard packing (distributed prefix sum)
                     "kmeans_clusters", "pack_shards",
                     # large x large shuffle join (TPC-H Q3 analog)
                     # + canonical text normalization + line dedup
                     "top_orders", "normalize_text", "line_dedup",
                     # round-3 late additions: rare-token stats,
                     # token-window chunking, SemDeDup, Bloom decontam
                     "token_rarity", "chunk_tokens",
                     "semantic_dedup", "bloom_decontam",
                     # flagship curation composition (one exchange)
                     "curate_corpus",
                     # corpus bookkeeping (split/shuffle/stats) + PCA
                     # projection + BM25 ranked retrieval
                     "train_split", "shuffle_shards", "source_stats",
                     "events_profile",
                     "pca_project", "bm25_topk",
                     # entropy quality signal + budgeted mixture sampler
                     "doc_entropy", "mixture_sample",
                     # adaptive quantile length gate + CMS heavy hitters
                     "length_trim", "heavy_tokens",
                     # large x large ANTI join (lapsed customers)
                     # + SEMI join (TPC-H Q4 analog)
                     "cust_no_orders", "priority_semi",
                     "incremental_dedup",
                     "strip_dup_spans", "weighted_sample",
                     # grouped standardization (aggregate-then-rejoin)
                     "zscore_events", "window_distinct",
                     "sliding_distinct", "event_seq",
                     "organize_embeddings",
                     "media_summary",
                     # per-conv bucket scans: SFT pair extraction,
                     # conversation rollups, role-protocol validation,
                     # budgeted multi-turn context assembly
                     "sft_pairs", "conv_stats", "role_violations",
                     "context_windows", "tool_loops",
                     # turn-pair scans + conversation-level dedup
                     "turn_latency", "tool_transitions", "conv_dedup",
                     # grouped quantiles/mode, rollups, window cumsum
                     "role_length_quantiles", "top_tool_per_conv",
                     "rollup_counts", "cum_chars",
                     # events-stream telemetry rollups
                     "funnel_counts", "funnel_window",
                     "retention", "session_ids",
                     # embedding compression + contrastive mining
                     "quantize_embeddings", "hard_negatives",
                     # prefix-fork conversation dedup
                     "fork_dedup",
                     # equi+range interval join, sampled quantiles,
                     # tar-shard export, day-2 minhash vs band index
                     "interval_join", "approx_quantiles",
                     "export_tar", "sorted_export",
                     "incremental_minhash",
                     # quality-aware near-dup survivor selection
                     "dedup_keep_best",
                     # temperature-based language rebalancing
                     "temperature_mix",
                     # embedding-space benchmark decontamination
                     "semantic_decontam",
                     # BPE merge-rule induction (tokenizer training)
                     # + tokenizer apply (per-doc token counts)
                     "bpe_vocab", "bpe_encode",
                     # CCNet-style bigram-LM quality scoring
                     "lm_score",
                     # cluster-balanced sampling (topic rebalancing)
                     "cluster_sample",
                     # zlib compression-ratio quality signal
                     "compress_ratio",
                     # three-table having-filter join (TPC-H Q18)
                     "big_orders",
                     # curriculum decile labels (quantiles + map pass)
                     "quality_buckets",
                     # latest-wins CDC upsert merge
                     "snapshot_merge",
                     # all-pairs approximate kNN join (LSH buckets)
                     "knn_join",
                     # exact-n deterministic sample (md5 order stat)
                     "exact_sample",
                     # per-source PERCENT_RANK window
                     "percent_rank",
                     # tool-chain mining (trigrams + whole paths) and
                     # templated-reply detection over transcripts
                     "tool_trigrams", "tool_paths",
                     "assistant_templates",
                     # rolling window sum/mean + LAG deltas per key
                     # + exponential decay feature (exact recursion)
                     "rolling_window", "value_deltas", "ewma_value",
                     # robust per-key outlier screen (median + MAD)
                     # + snapshot drift monitor (histogram terms)
                     "mad_outliers", "drift_terms",
                     # large x large LEFT OUTER join (null fill)
                     # + its FULL OUTER completion, and the per-user
                     # event-type pivot feature vectors
                     "order_fill", "order_fill_outer",
                     "user_features",
                     # out-of-order-timestamp ingest audit
                     "ooo_turns",
                     # distance-to-centroid embedding outlier mining
                     "embedding_outliers",
                     # row-producing large x large equi join
                     "order_lines",
                     # skew-aware hybrid join (hot-key broadcast +
                     # cold-key co-partition)
                     "order_segments",
                     # full-scan group report (TPC-H Q1 analog)
                     "pricing_summary",
                     # six-table star join (TPC-H Q5 analog)
                     "regional_revenue",
                     # turns -> training-document assembly
                     "conv_text",
                     # calendar gap-filled daily event counts
                     "gapfill_daily",
                     # sparse-signal forward fill (LOCF imputation)
                     "locf_fill",
                     # grouped percentile clipping
                     "winsorize",
                     # per-key Pearson correlation (pure combiner)
                     "price_qty_corr",
                     # round-4: the previously-unbenched registry tail
                     # (verdict r3 item 7) — harvest-internal stage
                     # queries, the remaining ANN variants, windowed
                     # counts, per-source/user samples, real media
                     # decode — so the band gate watches the WHOLE
                     # registry
                     "clean_project", "parse_flags",
                     "membership_flags", "enrich_meta", "geo_enrich",
                     "watermark_salted", "harvest_sink_counts",
                     "token_count_bpe", "sample_docs",
                     "quality_filter", "ann_ivf_topk", "doc_quality",
                     "ann_lsh_topk", "dedup_simhash", "pca_ann_topk",
                     "events_agg", "props_extract", "tumbling_counts",
                     "sliding_counts", "sample_per_source",
                     "topk_per_user", "distinct_users",
                     "media_decode",
                     # error-tolerant media ingest audit (flag+count)
                     # + exact binary-payload dedup
                     "media_audit", "media_dedup",
                     # role-alternation repair/merge (bucket scans)
                     "role_repair", "role_merge",
                     # dedup family-agreement audit
                     "dedup_diff",
                     # round-5: REAL pixel/sample paths — NN resize,
                     # per-channel pixel sums, PCM sample stats, and
                     # the featurize -> cosine-top-k composition
                     "media_resize", "media_pixstats", "audio_stats",
                     "media_embed_knn", "frame_stats",
                     "audio_resample",
                     # day-2 incremental IVF (frozen-centroid append)
                     "ann_ivf_day2"]:
            samples[name] = []
            loads[name] = []
            for r in range(reps):
                loads[name].append(round(os.getloadavg()[0], 2))
                t = time.time()
                res = RAY_QUERIES[name](sf_dir)
                # consume the stream (count() triggers full execution)
                if hasattr(res, "count"):
                    res.count()
                samples[name].append(round(time.time() - t, 3))
            timings[name] = min(samples[name])

    result = {
        "metric": "harvest_e2e_sec",
        "value": round(harvest_sec, 3),
        "unit": "sec",
        "queries": timings,
        "samples": samples,
        "loads": loads,
        "verdicts": _band_verdicts(timings, loads),
        "sf": sf_from_dir(sf_dir),
        "num_cpus": num_cpus,
        "rows": rows,
        "turns_per_sec": (round(rows / harvest_sec, 1)
                          if harvest_sec else None),
    }
    ray.shutdown()
    return result


def _band_verdicts(timings: dict, loads: dict) -> dict:
    """Machine-readable band adjudication (round-4 verdict item 7):
    compare each best-of-N timing against the declared operating band
    in docs/BANDS.json ([lo, hi] seconds per query, written from the
    round's own quiet+loaded runs) and attach a verdict:

      in_band               best <= hi * 1.10
      below_band            best < lo * 0.80 (faster than declared —
                            informational, the engine floor moved)
      interference_suspect  over band AND some sample started at
                            1-min load >= $GRAFT_LOAD_SUSPECT
                            (default 8.0 — this box idles at ~4-5)
      over_band             over band on a quiet box (a real
                            regression — investigate)

    Queries without a declared band get no entry."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "BANDS.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        bands = json.load(f)
    suspect_load = float(os.environ.get("GRAFT_LOAD_SUSPECT", "8.0"))
    out = {}
    for name, best in timings.items():
        band = bands.get(name)
        if not band:
            continue
        lo, hi = float(band[0]), float(band[1])
        if best <= hi * 1.10:
            verdict = "below_band" if best < lo * 0.80 else "in_band"
        elif max(loads.get(name, [0.0])) >= suspect_load:
            verdict = "interference_suspect"
        else:
            verdict = "over_band"
        out[name] = {"verdict": verdict, "band": [lo, hi],
                     "best": best,
                     "max_load_1m": max(loads.get(name, [0.0]))}
    return out


def run_scaling(sf_dir: str | None = None, repeats: int | None = None) -> dict:
    """Fresh-process N -> 4N sweep (2/4/8/16/32 CPUs) on the same input.

    Uses a larger corpus (default sf5, 25M turns — override with
    $GRAFT_SCALING_SF_DIR) so per-job fixed overheads (~2-3 s: actor
    pool spin-up, sink finalize, lineage stats) don't swamp the compute
    being scaled.  Each level runs $GRAFT_SCALING_REPEATS times
    (default 2) and the BEST throughput per level is used: the sandbox
    box carries ~2-4 cores of background interference (load avg ~4 at
    idle) that hits small-N runs hardest and is not a property of the
    engine; every sample is still reported in `samples` for honesty.
    The DECLARED criterion pair is 4 -> 16 (fixed, not best-of): it
    sits away from tiny-job fixed-cost noise at 2 CPUs and from the
    single box's shared memory/object-store ceiling above 16 CPUs (a
    real 4N-node cluster adds memory bandwidth per node; one sandbox
    box does not — see BASELINE.md).  All three pairs are reported."""
    sf_dir = sf_dir or os.environ.get("GRAFT_SCALING_SF_DIR",
                                      "/root/testdata/sf5")
    repeats = repeats or int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    # pre-generate the corpus once so neither timed run pays for it
    from d1_log_aggregation_ray.gen.fixtures import generate_fixtures
    generate_fixtures(sf_dir)

    def _settle():
        # flush the previous run's ~GBs of dirty output pages so the
        # next timed run doesn't compete with writeback (measured to
        # invert results when omitted)
        subprocess.run(["sync"], timeout=600)
        time.sleep(2)

    def _one(n: int) -> float:
        _settle()
        # sink output goes to tmpfs for the scaling measurement: a
        # single sandbox disk (~400 MB/s) caps BOTH runs at the same
        # wall time, but on the real N- vs 4N-node cluster aggregate
        # sink bandwidth scales with nodes — tmpfs keeps the criterion
        # about the engine, not this box's one spindle (see BASELINE.md)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpus", str(n),
             "--headline-only"],
            capture_output=True, text=True,
            env={**os.environ, "GRAFT_SF_DIR": sf_dir,
                 "GRAFT_BENCH_OUT": "/dev/shm/graft_bench"}, timeout=3600)
        if proc.returncode != 0:
            raise RuntimeError(
                f"bench child (cpus={n}) failed rc={proc.returncode}:\n"
                f"{proc.stderr[-2000:]}")
        lines = [l for l in proc.stdout.strip().splitlines()
                 if l.startswith("{")]
        if not lines:
            raise RuntimeError(
                f"bench child (cpus={n}) emitted no JSON:\n"
                f"stdout={proc.stdout[-500:]}\nstderr={proc.stderr[-1500:]}")
        return json.loads(lines[-1])["turns_per_sec"]

    samples: dict[int, list[float]] = {n: [] for n in (2, 4, 8, 16, 32)}
    try:
        for _ in range(repeats):  # interleaved: drift hits levels evenly
            for n in (2, 4, 8, 16, 32):
                samples[n].append(_one(n))
    finally:
        shutil.rmtree("/dev/shm/graft_bench", ignore_errors=True)
    thr = {n: max(v) for n, v in samples.items()}
    pairs = {f"eff_{n}_to_{4*n}": round((thr[4*n] / thr[n]) / 4, 3)
             for n in (2, 4, 8)}
    from d1_log_aggregation_ray.gen.fixtures import sf_from_dir
    # declared criterion pair: 4 -> 16 (fixed in advance, rationale in
    # the docstring; all pairs reported alongside)
    return {
        "metric": "scaling_efficiency_4_to_16",
        "value": pairs["eff_4_to_16"],
        "unit": "ratio",
        "pairs": pairs,
        "turns_per_sec": {str(k): v for k, v in thr.items()},
        "samples": {str(k): v for k, v in samples.items()},
        "repeats": repeats,
        "sf": sf_from_dir(sf_dir),
        "sf_dir": sf_dir,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated query names: bench only these "
                         "(skips the harvest headline)")
    args = ap.parse_args()

    if args.scaling:
        print(json.dumps(run_scaling()))
    else:
        only = args.only.split(",") if args.only else None
        print(json.dumps(run_bench(_sf_dir(), _num_cpus(args.cpus),
                                   args.headline_only, only)))
