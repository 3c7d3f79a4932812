"""Single-process pandas oracle: an independent reimplementation of the
harvest semantics (SURVEY §5 test plan — the analog of the reference's
conformance test LogEntryProcessorTest.java:108-341, which replays a
small corpus and asserts golden aggregate counts).

Deliberately written row-at-a-time / pandas-first with NO shared code
path through the Ray stages (only the tiny pure helpers md5_lower64 /
geohash_encode are shared, since both sides must agree on them by
definition).
"""

from __future__ import annotations

import os
import re
from datetime import datetime

import numpy as np
import pandas as pd
import pyarrow.dataset as pads

from ..config import PipelineConfig, DEFAULT_CONFIG, DATE_UPDATED_SENTINEL
from ..functions.hashing import md5_lower64
from ..functions.geohash import geohash_encode
from ..stages.enrich import DEFAULT_RUN_TS


def oracle_enriched(fx_dir: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                    run_ts: datetime = DEFAULT_RUN_TS) -> pd.DataFrame:
    df = pads.dataset(os.path.join(fx_dir, "transcripts")).to_table().to_pandas()
    # M2 validity filter
    df = df[df["conv_id"].notna() & (df["conv_id"] != "")].copy()
    # O1 explicit ordering
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    # M5 key, M1 version tag
    df["turn_id"] = df["conv_id"] + "." + df["turn_idx"].astype(str)
    df["version_compliance"] = np.where(df["role"].isin(cfg.v1_roles), "v1", "v2")

    # R1-R3 regex banks
    with open(os.path.join(fx_dir, "patterns_partial.txt")) as f:
        partial = [re.compile(p.strip()) for p in f if p.strip()]
    with open(os.path.join(fx_dir, "patterns_full.txt")) as f:
        full = [re.compile(p.strip()) for p in f if p.strip()]
    gated = df["role"].isin(cfg.gate_roles).to_numpy()

    def any_match(patterns, text):
        if not isinstance(text, str) or not text:
            return False
        return any(p.search(text) for p in patterns)

    texts = df["text"].tolist()
    in_p = np.array([g and any_match(partial, t) for g, t in zip(gated, texts)])
    in_f = np.array([g and any_match(full, t) for g, t in zip(gated, texts)])

    # J5 membership
    reg = pads.dataset(os.path.join(fx_dir, "node_registry.parquet")).to_table().to_pandas()
    members = set(reg["member_key"])
    rl = pads.dataset(os.path.join(fx_dir, "range_list.parquet")).to_table().to_pandas()
    exact = set(rl.loc[rl["kind"] == "exact", "key"])
    ranges = [(int(r.lo), int(r.hi)) for r in rl[rl["kind"] == "range"].itertuples()]

    convs = df["conv_id"].tolist()
    h64s = {c: md5_lower64(c) for c in set(convs)}

    def is_member(c):
        if c in members or c in exact:
            return True
        h32 = h64s[c] % 2**32
        return any(lo <= h32 <= hi for lo, hi in ranges)

    member_by_conv = {c: is_member(c) for c in set(convs)}
    mem = np.array([member_by_conv[c] for c in convs])
    promote = gated & mem & ~(in_p & in_f)
    df["in_partial_list"] = in_p | promote
    df["in_full_list"] = in_f | promote

    # W1 repeat-visit: sequential scan per (conv_id, gate-role)
    interval_end = pd.Timedelta(seconds=cfg.repeat_visit_interval_end_s)
    repeat = np.zeros(len(df), dtype=bool)
    sub = df[df["role"].isin(cfg.gate_roles)]
    for (_, _), grp in sub.groupby(["conv_id", "role"], sort=False):
        ws = None
        for i, t in zip(grp.index, grp["ts"]):
            if pd.isna(t):
                continue
            if ws is not None and ws < t < ws + interval_end:
                repeat[i] = True
            else:
                ws = t
    df["is_repeat_visit"] = repeat

    # J1/J3 conv_meta join
    meta = pads.dataset(os.path.join(fx_dir, "conv_meta.parquet")).to_table().to_pandas()
    df = df.merge(meta, on="conv_id", how="left")
    df["size"] = df["size"].fillna(0).astype(np.int64)

    # J2 tool family
    etl = pads.dataset(os.path.join(fx_dir, "event_type_lookup.parquet")).to_table().to_pandas()
    fam = dict(zip(etl["tool"], etl["tool_family"]))
    df["tool_family"] = df["tool"].map(fam)

    # M4 constants + node, J4 geo, S6 routing
    df["date_aggregated"] = pd.Timestamp(run_ts)
    df["date_updated"] = pd.Timestamp(datetime.fromisoformat(DATE_UPDATED_SENTINEL))
    geo_rows = {}
    for c, h in h64s.items():
        lat = (h % 170000) / 1000.0 - 85.0
        lon = ((h // 170000) % 360000) / 1000.0 - 180.0
        gh = geohash_encode(lat, lon, 9)
        geo_rows[c] = (f"country-{h % 40}", f"region-{(h // 40) % 60}",
                       f"city-{(h // 2400) % 97}", f"{lat:.4f}, {lon:.4f}", gh,
                       h % cfg.n_buckets, h % cfg.n_sinks)
    g = df["conv_id"].map(geo_rows)
    df["country"] = g.str[0]
    df["region"] = g.str[1]
    df["city"] = g.str[2]
    df["location"] = g.str[3]
    for p in range(1, 10):
        df[f"geohash_{p}"] = g.str[4].str[:p]
    df["bucket_id"] = g.str[5].astype(np.int32)
    df["sink_id"] = g.str[6].astype(np.int32)
    df["node_id"] = "urn:node:SYNTH" + df["bucket_id"].astype(str).str.zfill(2)
    return df
