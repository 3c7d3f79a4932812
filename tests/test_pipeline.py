"""Conformance test: full harvest vs the single-process pandas oracle —
the analog of the reference's golden-count conformance test
(LogEntryProcessorTest.java:108-341, golden 238/235/9) plus routed-row
set equality and per-turn text equality under (conv_id, turn_idx)."""

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import pytest

from d1_log_aggregation_ray.pipelines.harvest import run_harvest
from d1_log_aggregation_ray.pipelines.oracle import oracle_enriched
from d1_log_aggregation_ray.stages.enrich import ENRICHED_COLUMNS


@pytest.fixture(scope="module")
def harvest(fx_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("harvest_out"))
    summary = run_harvest(fx_dir, out, resume=False)
    engine = pads.dataset(out, partitioning="hive").to_table().to_pandas()
    engine = engine.sort_values(["conv_id", "turn_idx"],
                                kind="mergesort").reset_index(drop=True)
    oracle = oracle_enriched(fx_dir)
    return summary, engine, oracle


def test_row_counts(harvest, fx_dir):
    import json
    summary, engine, oracle = harvest
    meta = json.load(open(f"{fx_dir}/meta.json"))
    assert len(engine) == meta["n_valid"] == len(oracle)
    assert summary["rows_out_total"] == meta["n_valid"]


def test_golden_flag_counts(harvest):
    summary, engine, oracle = harvest
    for col in ("in_partial_list", "in_full_list", "is_repeat_visit"):
        assert int(engine[col].sum()) == int(oracle[col].sum()), col
        # exact per-row equality, not just totals
        assert (engine[col].to_numpy() == oracle[col].to_numpy()).all(), col


def test_per_turn_text_equality(harvest):
    _, engine, oracle = harvest
    assert engine["turn_id"].tolist() == oracle["turn_id"].tolist()
    e, o = engine["text"], oracle["text"]
    assert ((e == o) | (e.isna() & o.isna())).all()


def test_routed_row_sets(harvest):
    _, engine, oracle = harvest
    for sink in sorted(oracle["sink_id"].unique()):
        es = set(engine.loc[engine["sink_id"] == sink, "turn_id"])
        os_ = set(oracle.loc[oracle["sink_id"] == sink, "turn_id"])
        assert es == os_, f"sink {sink}"


def test_enrichment_columns_equal(harvest):
    _, engine, oracle = harvest
    cols = ["version_compliance", "node_id", "format_id", "series_id",
            "size", "rights_holder", "tool_family", "country", "region",
            "city", "location", "geohash_1", "geohash_5", "geohash_9",
            "bucket_id"]
    for c in cols:
        e, o = engine[c], oracle[c]
        eq = (e == o) | (e.isna() & o.isna())
        assert eq.all(), f"{c}: {int((~eq).sum())} mismatches"


def test_timestamps_and_schema(harvest):
    _, engine, oracle = harvest
    assert (engine["date_updated"] == oracle["date_updated"]).all()
    assert (engine["date_aggregated"] == oracle["date_aggregated"]).all()
    e, o = engine["ts"], oracle["ts"]
    assert ((e == o) | (e.isna() & o.isna())).all()
    # full canonical column set present
    assert set(ENRICHED_COLUMNS) <= set(engine.columns)


def test_read_permission_list(harvest):
    _, engine, oracle = harvest
    norm = lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else ()
    e = engine["read_permission"].map(norm)
    o = oracle["read_permission"].map(norm)
    assert (e == o).all()


def test_slice_fanout_splits_hot_buckets(fx_dir, tmp_path):
    """Scale guard: when a bucket's rows exceed write_slice_rows, the
    terminal stage must fan out at SLICE granularity — multiple
    content-tagged part files per (bucket, sink) — not run one
    whole-bucket task (the round-3 hot-bucket serialization fix:
    repartition(target_num_rows_per_block=write_slice_rows) after the
    window scan).  Output content must be unaffected by the split."""
    import dataclasses
    import glob
    import json
    import os

    from d1_log_aggregation_ray.config import DEFAULT_CONFIG

    cfg = dataclasses.replace(DEFAULT_CONFIG, write_slice_rows=64)
    out = str(tmp_path / "fanout")
    s = run_harvest(fx_dir, out, cfg=cfg, resume=False)
    with open(os.path.join(fx_dir, "meta.json")) as f:
        assert s["rows_out_total"] == json.load(f)["n_valid"]
    per_bucket_files = {}
    for bdir in glob.glob(os.path.join(out, "bucket_id=*")):
        parts = glob.glob(os.path.join(bdir, "sink_id=*", "part-*.parquet"))
        per_bucket_files[os.path.basename(bdir)] = len(parts)
    # sf0.001 buckets hold ~100-200 rows; at 64-row slices every
    # bucket must have split into several files
    assert per_bucket_files and max(per_bucket_files.values()) >= 2, \
        per_bucket_files
    # the split output still reads back to exactly the dataset a
    # whole-bucket run produces
    t_split = pads.dataset(out, partitioning="hive").to_table()
    out2 = str(tmp_path / "whole")
    run_harvest(fx_dir, out2, resume=False)
    t_whole = pads.dataset(out2, partitioning="hive").to_table()
    cols = sorted(t_split.column_names)
    key = ["conv_id", "turn_idx"]
    ts = t_split.select(cols).sort_by([(k, "ascending") for k in key])
    tw = t_whole.select(cols).sort_by([(k, "ascending") for k in key])
    assert ts.equals(tw)
