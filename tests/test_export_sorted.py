"""Range-partitioned sorted export (sources/export_sorted): global
order across shards, internal shard order, manifest faithfulness, and
sample-derived bounds balance."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from d1_log_aggregation_ray.sources.export_sorted import (
    export_sorted_parquet, sample_range_bounds)


def _ds(n=5000, seed=3):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 10_000, n)
    keys[::97] = 42  # heavy tie run crossing shard boundaries
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "k": pa.array(keys, pa.int64())})
    return t, ray.data.from_arrow(t).repartition(8)


def test_sorted_export_global_order(tmp_path):
    t, ds = _ds()
    man = export_sorted_parquet(ds, "k", str(tmp_path),
                                n_shards=6).to_pandas()
    man = man.sort_values("shard_id").reset_index(drop=True)
    # manifest ranges are non-overlapping and ordered
    assert (man["max_v"].to_numpy()[:-1]
            <= man["min_v"].to_numpy()[1:]).all()
    # reading shards in id order yields a globally sorted key column
    all_k, all_ids = [], []
    for p in man["path"]:
        sh = pq.read_table(p)
        k = sh.column("k").to_numpy(zero_copy_only=False)
        assert (np.diff(k) >= 0).all(), "shard not internally sorted"
        all_k.append(k)
        all_ids.append(sh.column("id").to_numpy(zero_copy_only=False))
    cat = np.concatenate(all_k)
    assert (np.diff(cat) >= 0).all(), "global order broken at seams"
    # no row lost or duplicated
    assert sorted(np.concatenate(all_ids)) == list(range(t.num_rows))
    assert int(man["n_rows"].sum()) == t.num_rows


def test_sample_bounds_balanced():
    _, ds = _ds(n=20_000)
    bounds = sample_range_bounds(ds, "k", n_shards=8)
    assert 1 <= len(bounds) <= 7
    assert bounds == sorted(bounds)


def test_null_keys_dropped(tmp_path):
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "k": pa.array([5, None, 1], pa.int64())})
    man = export_sorted_parquet(ray.data.from_arrow(t), "k",
                                str(tmp_path), bounds=[3]).to_pandas()
    assert int(man["n_rows"].sum()) == 2
    rows = pa.concat_tables(
        [pq.read_table(p) for p in man["path"]])
    assert sorted(rows.column("id").to_pylist()) == [1, 3]


def test_rerun_is_idempotent(tmp_path):
    _, ds = _ds(n=1000)
    m1 = export_sorted_parquet(ds, "k", str(tmp_path),
                               bounds=[2000, 6000]).to_pandas()
    m2 = export_sorted_parquet(ds, "k", str(tmp_path),
                               bounds=[2000, 6000]).to_pandas()
    assert m1.sort_values("shard_id").reset_index(drop=True).equals(
        m2.sort_values("shard_id").reset_index(drop=True))
    # no stray tmp files left behind
    assert not glob.glob(os.path.join(str(tmp_path), "*.tmp"))
