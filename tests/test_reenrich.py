"""S7 point-query source, C6 incremental re-enrichment, and D1
overlap-harvest idempotency."""

import os
from datetime import datetime

import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

import ray

from d1_log_aggregation_ray.pipelines.harvest import run_harvest, build_pipeline
from d1_log_aggregation_ray.pipelines.reenrich import (retrieve_turns,
                                                       reenrich_convs,
                                                       bucket_for_conv)


@pytest.fixture(scope="module")
def harvest_out(fx_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("reenrich_out"))
    run_harvest(fx_dir, out, resume=False)
    return out


def _some_conv(fx_dir):
    t = pq.read_table(os.path.join(fx_dir, "conv_meta.parquet"),
                      columns=["conv_id"])
    return t.column("conv_id")[0].as_py()


def test_retrieve_turns_point_query(fx_dir, harvest_out):
    conv = _some_conv(fx_dir)
    t = retrieve_turns(harvest_out, conv)
    assert t.num_rows > 0
    assert set(t.column("conv_id").to_pylist()) == {conv}
    tix = t.column("turn_idx").to_pylist()
    assert tix == sorted(tix)


def test_reenrich_updates_only_changed_convs(fx_dir, harvest_out):
    conv = _some_conv(fx_dir)
    before_all = pads.dataset(harvest_out, partitioning="hive").to_table()
    update_ts = datetime(2025, 7, 4, 12, 0, 0)
    res = reenrich_convs(harvest_out, fx_dir, [conv], update_ts)
    assert res["rows_updated"] > 0
    assert res["buckets_touched"] == [bucket_for_conv(conv)]

    after = retrieve_turns(harvest_out, conv)
    assert all(v == update_ts for v in after.column("date_updated").to_pylist())

    # untouched rows byte-identical (same bucket, other convs)
    after_all = pads.dataset(harvest_out, partitioning="hive").to_table()
    assert after_all.num_rows == before_all.num_rows
    mask = pc.fill_null(pc.not_equal(after_all.column("conv_id"), conv), True)
    a = after_all.filter(mask).sort_by([("conv_id", "ascending"),
                                        ("turn_idx", "ascending")])
    b = before_all.filter(
        pc.fill_null(pc.not_equal(before_all.column("conv_id"), conv), True)
    ).sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    for col in ("turn_id", "format_id", "date_updated", "size"):
        assert a.column(col).combine_chunks().equals(
            b.column(col).combine_chunks()), col


def test_overlap_harvest_dedup(fx_dir):
    """Re-harvesting the same bucket (input union'd with itself) must
    produce the same rows once — the upsert-idempotency analog."""
    ds_once = build_pipeline(fx_dir, buckets=[1])
    # repartition(1): the dedup contract is "all turns of a conv in one
    # block" — in production one bucket == one file == one block
    ds_twice_src = ray.data.read_parquet(
        [os.path.join(fx_dir, "transcripts", "part-01.parquet")] * 2
    ).repartition(1)
    from d1_log_aggregation_ray.stages.project import clean_project
    from d1_log_aggregation_ray.stages.window import bucket_window_scan
    ds_twice = ds_twice_src.map_batches(
        lambda b: bucket_window_scan(clean_project(b)),
        batch_size=None, batch_format="pyarrow")
    once = ds_once.select_columns(["turn_id", "is_repeat_visit"]).to_pandas()
    twice = ds_twice.select_columns(["turn_id", "is_repeat_visit"]).to_pandas()
    once = once.sort_values("turn_id").reset_index(drop=True)
    twice = twice.sort_values("turn_id").reset_index(drop=True)
    assert once.equals(twice)
