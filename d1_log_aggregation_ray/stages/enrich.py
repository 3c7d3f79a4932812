"""Enrichment stages: broadcast lookups, membership semi-join, synthetic
geo + geohash, constants, sink routing.

Reference analogs:
  - J1/J2/J3 sysmeta + format-type + access-policy joins
    (LogHarvesterTask.java:347-349; LogEntrySolrItem.java:215-265;
    LogAccessRestriction.java:41-89) -> vectorized broadcast hash join:
    pc.index_in against side arrays held in actor state.
  - J5 robot-IP semi-join with CIDR ranges (LogEntrySolrItem.java:388-442)
    -> exact-key is_in + interval hit via np.searchsorted over merged
    sorted [lo,hi] uint32 ranges (the CIDR -> (lo,hi) compilation).
  - J4 GeoIP stateful enrich (LogEntrySolrItem.java:274-320,
    GeoIPService.java:78-167) -> synthetic geo derived as a pure
    function of the 64-bit conv hash (same shape: point lookup into a
    per-actor-preloaded structure), then geohash precision 9 with
    prefixes 1..9 (LogEntrySolrItem.java:304-314).
  - M4 constants/overwrites: nodeId overwritten with harvesting node
    (bug #4099 fix, LogHarvesterTask.java:346-356), dateUpdated sentinel
    1900-01-01 (:102), dateAggregated = run timestamp (:355 — here a
    deterministic run_ts parameter instead of wall-clock `now` so
    re-runs are idempotent and oracle-comparable).
  - S6 routing: sink_id = hash(conv_id) % n_sinks (content-hash fan-out
    to per-sink parquet dirs, replacing the Solr upsert sink).

This is the stateful actor-pool stage: all side tables are loaded once
per actor in __init__ (from a single ray.put broadcast), never per
batch.  All per-row work is pyarrow/numpy kernels; md5 + geohash run
once per *unique* conv_id per batch and scatter via index LUTs.
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..config import PipelineConfig, DEFAULT_CONFIG, DATE_UPDATED_SENTINEL
from ..functions.hashing import md5_lower64
from ..functions.geohash import geohash_encode
from ..sources.readers import SideTables
from .parse import regex_flags

DEFAULT_RUN_TS = datetime(2025, 6, 1)

# canonical enriched-record column order (LogEntrySolrItem analog, §1.1)
ENRICHED_COLUMNS = [
    "turn_id", "conv_id", "turn_idx", "role", "text", "tool", "ts",
    "version_compliance", "date_aggregated", "date_updated", "node_id",
    "format_id", "series_id", "size", "rights_holder", "read_permission",
    "tool_family", "country", "region", "city", "location",
    *[f"geohash_{i}" for i in range(1, 10)],
    "in_partial_list", "in_full_list", "is_repeat_visit",
    "bucket_id", "sink_id",
]


def geo_fields_for_hash(h: int) -> dict:
    """Synthetic geo from a 64-bit hash — pure arithmetic, reproducible
    in DuckDB SQL (md5_number_lower-based)."""
    lat = (h % 170000) / 1000.0 - 85.0
    lon = ((h // 170000) % 360000) / 1000.0 - 180.0
    gh = geohash_encode(lat, lon, 9)
    return {
        "country": f"country-{h % 40}",
        "region": f"region-{(h // 40) % 60}",
        "city": f"city-{(h // 2400) % 97}",
        "location": f"{lat:.4f}, {lon:.4f}",
        "geohash": gh,
    }


class Enricher:
    """Callable actor class for map_batches(concurrency=(m,n))."""

    def __init__(self, side: "SideTables | ray.ObjectRef",
                 cfg: PipelineConfig = DEFAULT_CONFIG,
                 run_ts: datetime = DEFAULT_RUN_TS):
        if isinstance(side, ray.ObjectRef):
            side = ray.get(side)
        self.side = side
        self.cfg = cfg
        self.run_ts = run_ts
        self._gate_set = pa.array(list(cfg.gate_roles))

    # -- per-batch helpers -------------------------------------------------

    def _conv_luts(self, conv: pa.Array):
        """Per-unique-conv hash + geo LUTs, scattered via index_in."""
        uniq = pc.unique(conv)
        n = len(uniq)
        h64 = np.zeros(n, dtype=np.uint64)
        geo_cols = {k: np.empty(n, dtype=object)
                    for k in ("country", "region", "city", "location", "geohash")}
        for i in range(n):
            s = uniq[i].as_py()
            h = md5_lower64(s)
            h64[i] = h
            g = geo_fields_for_hash(h)
            for k in geo_cols:
                geo_cols[k][i] = g[k]
        idx = pc.index_in(conv, uniq).fill_null(0).to_numpy(zero_copy_only=False)
        idx = idx.astype(np.int64)
        return h64, geo_cols, idx

    def _range_hit(self, h32: np.ndarray) -> np.ndarray:
        lo, hi = self.side.range_lo, self.side.range_hi
        if len(lo) == 0:
            return np.zeros(len(h32), dtype=bool)
        pos = np.searchsorted(lo, h32, side="right") - 1
        ok = pos >= 0
        hit = np.zeros(len(h32), dtype=bool)
        hit[ok] = h32[ok] <= hi[pos[ok]]
        return hit

    def __call__(self, batch: pa.Table) -> pa.Table:
        side, cfg = self.side, self.cfg
        n = batch.num_rows
        conv = batch.column("conv_id").combine_chunks()

        # R1-R3: regex banks (vectorized union match)
        batch = regex_flags(batch, side.partial_union, side.full_union, cfg)

        h64_lut, geo_lut, idx = self._conv_luts(conv)
        h64 = h64_lut[idx]
        h32 = h64 % np.uint64(2**32)

        # J5: membership semi-join (exact keys + hash-space intervals);
        # promotes BOTH flags for gated rows not already fully flagged
        # (reference: checks skipped when UA already matched both lists,
        # LogEntrySolrItem.java:388-394)
        gated = pc.fill_null(
            pc.is_in(batch.column("role"), value_set=self._gate_set), False)
        in_p = batch.column("in_partial_list")
        in_f = batch.column("in_full_list")
        member = pc.or_(
            pc.fill_null(pc.is_in(conv, value_set=side.member_keys), False),
            pc.fill_null(pc.is_in(conv, value_set=side.range_exact_keys), False))
        member = pc.or_(member, pa.array(self._range_hit(h32)))
        promote = pc.and_(pc.and_(gated, member),
                          pc.invert(pc.and_(in_p, in_f)))
        in_p = pc.or_(in_p, promote)
        in_f = pc.or_(in_f, promote)
        batch = batch.set_column(
            batch.schema.get_field_index("in_partial_list"),
            "in_partial_list", in_p)
        batch = batch.set_column(
            batch.schema.get_field_index("in_full_list"),
            "in_full_list", in_f)

        # J1/J3: conv_meta broadcast join (null-tolerant; size default 0,
        # LogEntrySolrItem.java:251-256)
        midx = pc.index_in(conv, side.meta_conv_id)
        batch = batch.append_column("format_id", pc.take(side.meta_format_id, midx))
        batch = batch.append_column("series_id", pc.take(side.meta_series_id, midx))
        size = pc.fill_null(pc.take(pa.array(side.meta_size), midx), 0)
        batch = batch.append_column("size", pc.cast(size, pa.int64()))
        batch = batch.append_column("rights_holder",
                                    pc.take(side.meta_rights_holder, midx))
        batch = batch.append_column("read_permission",
                                    pc.take(side.meta_read_permission, midx))

        # J2: tool -> tool_family
        tidx = pc.index_in(batch.column("tool").combine_chunks(), side.tool_keys)
        batch = batch.append_column("tool_family", pc.take(side.tool_family, tidx))

        # M4: constants + node overwrite
        bucket = (h64 % np.uint64(cfg.n_buckets)).astype(np.int64)
        node_id = pc.binary_join_element_wise(
            pa.array(["urn:node:SYNTH"] * n),
            pc.utf8_lpad(pc.cast(pa.array(bucket), pa.string()), 2, "0"), "")
        batch = batch.append_column("node_id", node_id)
        batch = batch.append_column(
            "date_aggregated",
            pa.array(np.full(n, int(self.run_ts.timestamp() * 1e6)),
                     type=pa.int64()).cast(pa.timestamp("us")))
        sentinel = int(datetime.fromisoformat(DATE_UPDATED_SENTINEL).timestamp() * 1e6)
        batch = batch.append_column(
            "date_updated",
            pa.array(np.full(n, sentinel), type=pa.int64()).cast(pa.timestamp("us")))

        # J4: synthetic geo + geohash prefixes 1..9
        for k in ("country", "region", "city", "location"):
            batch = batch.append_column(
                k, pa.array(geo_lut[k][idx], type=pa.string()))
        gh_full = geo_lut["geohash"][idx]
        gh_arr = pa.array(gh_full, type=pa.string())
        for p in range(1, 10):
            batch = batch.append_column(
                f"geohash_{p}", pc.utf8_slice_codeunits(gh_arr, 0, p))

        # S6 routing
        batch = batch.append_column("bucket_id",
                                    pa.array(bucket.astype(np.int32), type=pa.int32()))
        sink = (h64 % np.uint64(cfg.n_sinks)).astype(np.int32)
        batch = batch.append_column("sink_id", pa.array(sink, type=pa.int32()))

        return batch.select([c for c in ENRICHED_COLUMNS
                             if c in batch.column_names])
