"""Deterministic synthetic transcript corpus + side tables (seed=42).

Mirrors the shape of the reference test corpus (FIXTURES.md; reference
corpus LogEntries.csv, 256 rows with deliberate corruption, documented
at LogEntryProcessorTest.java:223-229):

  transcripts/  — bucket-partitioned parquet, columns
                  (conv_id, turn_idx, role, text, tool, ts).
                  conv_ids are zipf-skewed with hot keys; ~10% of text
                  empty/null; ~1.5% corrupt rows (null/blank conv_id);
                  ~2% out-of-order ts within a conv; timestamp bursts
                  so a known subset falls inside the 31 s repeat window.
                  Convs NEVER span buckets (bucket = md5_lower64(conv_id)
                  % n_buckets) — buckets are the independent "node"
                  harvest/resume units.
  conv_meta.parquet        — sysmeta-IMap analog (~90% conv coverage)
  node_registry.parquet    — DataONE_IPs membership analog (hot convs)
  event_type_lookup.parquet— ObjectFormatCache analog (tool -> family)
  range_list.parquet       — webRobotIPs CIDR analog: exact keys +
                             [lo, hi] intervals over the 32-bit
                             md5-hash space
  patterns_partial.txt / patterns_full.txt — robot regex bank analogs;
                             partial-hit set ⊂ full-hit set by
                             construction (full = partial + extras)

Everything is a pure function of (seed=42, scale factor); generation is
idempotent and protected by a lock + _SUCCESS marker so concurrent
bench/test processes can share one corpus.
"""

from __future__ import annotations

import fcntl
import json
import os
import re
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import md5_lower64

SEED = 42
DATA_ROOT = "/tmp/graft_data"
# TZ-independent (datetime.timestamp() would use the local zone)
EPOCH_US = int((datetime(2025, 1, 1) - datetime(1970, 1, 1)).total_seconds() * 1_000_000)

# ---- regex banks (RE2-safe: no lookaround/backrefs, work identically in
# python re and DuckDB regexp_matches) -------------------------------------
PARTIAL_PATTERNS = [
    r"ERRCODE-[0-9]{3}",
    r"tool_call:(search|browse|fetch)",
    r"AgentSig/[0-9]+\.[0-9]+",
    r"\[RETRY [0-9]+\]",
    r"segfault at 0x[0-9a-f]+",
    r"TIMEOUT after [0-9]+s",
    r"robots?\.txt",
    r"crawler-[a-z]{4}",
    r"spiderbot",
    r"HTTP/1\.[01] 50[0-9]",
    r"OOM-killed",
    r"quota exceeded",
    r"rate.limit",
    r"\[trace [0-9a-f]{8}\]",
]
FULL_EXTRA_PATTERNS = [
    r"deprecation warning",
    r"checksum mismatch",
    r"EPERM",
    r"sandbox violation",
    r"watchdog timer",
    r"GC pause [0-9]+ms",
    r"cache miss storm",
    r"connection reset by peer",
    r"certificate expired",
    r"\bmalformed frame\b",
]
FULL_PATTERNS = PARTIAL_PATTERNS + FULL_EXTRA_PATTERNS

# literals that trigger exactly the banks above
_PARTIAL_MARKERS = [
    "ERRCODE-417", "ERRCODE-090", "tool_call:search", "tool_call:browse",
    "tool_call:fetch", "AgentSig/3.1", "AgentSig/12.0", "[RETRY 2]",
    "[RETRY 11]", "segfault at 0xdeadbeef", "TIMEOUT after 30s",
    "robots.txt", "robot.txt", "crawler-zeta", "spiderbot",
    "HTTP/1.1 503", "HTTP/1.0 500", "OOM-killed", "quota exceeded",
    "rate limit", "rate-limit", "[trace 0a1b2c3d]",
]
_FULL_ONLY_MARKERS = [
    "deprecation warning", "checksum mismatch", "EPERM",
    "sandbox violation", "watchdog timer", "GC pause 250ms",
    "cache miss storm", "connection reset by peer",
    "certificate expired", "malformed frame",
]

# plain vocabulary — must never match any bank pattern
_PLAIN_WORDS = (
    "the model reviews prior context and drafts an answer summarizing "
    "key findings while citing sources plus follow up questions about "
    "data schema planning design tradeoffs memory layout compute graphs "
    "shuffle strategy partition sizing throughput latency goals"
).split()

TOOL_VOCAB = [
    "web.search", "web.open", "code.run", "code.lint", "fs.read",
    "fs.write", "db.query", "db.insert", "math.eval", "plot.render",
    "shell.exec", "git.diff", "git.commit", "http.get", "http.post",
    "vector.lookup", "doc.summarize", "doc.translate", "img.caption",
    "audio.transcribe",
]
TOOL_FAMILY = {
    "web.search": "web", "web.open": "web", "http.get": "web",
    "http.post": "web", "code.run": "code", "code.lint": "code",
    "shell.exec": "code", "git.diff": "code", "git.commit": "code",
    "fs.read": "io", "fs.write": "io", "db.query": "db",
    "db.insert": "db", "math.eval": "compute", "plot.render": "compute",
    "vector.lookup": "search", "doc.summarize": "nlp",
    "doc.translate": "nlp", "img.caption": "vision",
    "audio.transcribe": "audio",
}

FORMAT_IDS = [f"fmt/{x}" for x in (
    "text", "markdown", "json", "yaml", "html", "csv", "parquet",
    "pdf", "png", "wav", "mp4", "bin")]
SUBJECTS = [f"cn=subject{i:02d},dc=synth,dc=org" for i in range(15)]

N_BUCKETS = 32
GEN_VERSION = 3  # bump to invalidate cached corpora in /tmp

# non-ASCII vocabulary (~1.5% of texts): proves RE2 (DuckDB) and python
# `re` agree on the banks under unicode input (banks use explicit ASCII
# classes — \d/\w would diverge between the engines)
_UNICODE_WORDS = ["схема", "データ処理", "modèle", "größe", "技术方案",
                  "θεωρία", "परीक्षण", "śledzenie"]


def sf_from_dir(sf_dir: str) -> float:
    """Parse a scale factor out of a path like /root/testdata/sf0.01."""
    base = os.path.basename(os.path.normpath(sf_dir))
    m = re.search(r"sf([0-9.]+)", base)
    if not m:
        raise ValueError(
            f"cannot parse a scale factor from {sf_dir!r} (expected a "
            "path component like 'sf0.01') — refusing to silently "
            "default to another corpus")
    return float(m.group(1))


def fixture_dir(sf_dir: str) -> str:
    sf = sf_from_dir(sf_dir)
    return os.path.join(DATA_ROOT, f"sf{sf:g}")


def n_turns_for_sf(sf: float) -> int:
    return max(2_000, int(round(5_000_000 * sf)))


def _conv_lengths(rng: np.random.RandomState, n: int) -> np.ndarray:
    """Skewed conv sizes: one mega conv (~4% of rows, mirroring the
    reference corpus where 217/256 rows share one IP), a few medium-hot
    convs, then a geometric tail (mean ~13 turns)."""
    hot = [max(60, int(0.04 * n))] + [max(30, int(0.005 * n))] * 4
    remaining = n - sum(hot)
    tail = 1 + rng.geometric(0.085, size=max(16, int(remaining / 8)))
    tail = np.minimum(tail, 400)
    cum = np.cumsum(tail)
    k = int(np.searchsorted(cum, remaining))
    tail = tail[: k + 1]
    if len(tail):
        overshoot = int(np.sum(tail)) - remaining
        if overshoot > 0:
            tail[-1] = max(1, tail[-1] - overshoot)
    lens = np.asarray(hot + list(tail), dtype=np.int64)
    return lens


def _build_transcripts(rng: np.random.RandomState, n: int) -> dict[str, np.ndarray]:
    lens = _conv_lengths(rng, n)
    n = int(lens.sum())
    n_convs = len(lens)
    perm = rng.permutation(max(n_convs, 8) * 2)[:n_convs]  # sparse ids
    conv_ids = np.array([f"conv-{k:06d}" for k in perm])

    starts = np.zeros(n_convs, dtype=np.int64)
    starts[1:] = np.cumsum(lens)[:-1]
    row_conv = np.repeat(np.arange(n_convs), lens)
    turn_idx = (np.arange(n) - np.repeat(starts, lens)).astype(np.int32)

    # roles: 3-cycle with per-conv phase + ~2% odd (v2-compliance) roles
    phase = rng.randint(0, 3, size=n_convs)
    role_pool = np.array(["user", "assistant", "tool"])
    roles = role_pool[(turn_idx + np.repeat(phase, lens)) % 3]
    odd_mask = rng.random_sample(n) < 0.02
    odd_pool = np.array(["function", "critic", "observer"])
    roles = np.where(odd_mask, odd_pool[rng.randint(0, 3, size=n)], roles)

    # timestamps: per-conv base + bursty gaps (bursts create repeats
    # inside the 31 s window); ~2% out-of-order swaps; ~0.5% null
    base_s = rng.uniform(0, 30 * 86400, size=n_convs)
    u = rng.random_sample(n)
    gaps = np.where(u < 0.30, rng.uniform(0.5, 24.0, size=n),
                    rng.exponential(90.0, size=n))
    gaps[starts] = 0.0
    cs = np.cumsum(gaps)
    within = cs - np.repeat(cs[starts], lens)
    ts_s = np.repeat(base_s, lens) + within
    ts_us = (EPOCH_US + ts_s * 1e6).astype(np.int64)
    # out-of-order: swap with previous row inside the same conv.
    # Adjacent candidates would alias under the vectorized fancy-index
    # swap (ts[i-1]=old[i]; ts[i]=old[i+1]; ts[i+1]=old[i] loses one
    # value) — enforce a gap of >= 2 between candidates first.
    cand = np.where((turn_idx > 0) & (rng.random_sample(n) < 0.02))[0]
    if len(cand) > 1:
        keep = np.ones(len(cand), dtype=bool)
        keep[1:] = np.diff(cand) > 1
        cand = cand[keep]
    prev = cand - 1
    ts_us[cand], ts_us[prev] = ts_us[prev], ts_us[cand].copy()
    ts_null = rng.random_sample(n) < 0.005

    # text
    r = rng.random_sample(n)
    pick_partial = rng.randint(0, len(_PARTIAL_MARKERS), size=n)
    pick_full = rng.randint(0, len(_FULL_ONLY_MARKERS), size=n)
    w1 = rng.randint(0, len(_PLAIN_WORDS), size=n)
    w2 = rng.randint(0, len(_PLAIN_WORDS), size=n)
    w3 = rng.randint(0, len(_PLAIN_WORDS), size=n)
    num = rng.randint(0, 1000, size=n)
    empty_kind = rng.random_sample(n) < 0.5
    texts: list[str | None] = [None] * n
    for i in range(n):
        ri = r[i]
        if ri < 0.10:
            texts[i] = "" if empty_kind[i] else None
        elif ri < 0.22:
            texts[i] = (f"step {num[i]}: {_PLAIN_WORDS[w1[i]]} "
                        f"{_PARTIAL_MARKERS[pick_partial[i]]} while "
                        f"{_PLAIN_WORDS[w2[i]]} {_PLAIN_WORDS[w3[i]]}")
        elif ri < 0.27:
            texts[i] = (f"note {num[i]}: {_PLAIN_WORDS[w1[i]]} "
                        f"{_FULL_ONLY_MARKERS[pick_full[i]]} during "
                        f"{_PLAIN_WORDS[w2[i]]} {_PLAIN_WORDS[w3[i]]}")
        elif ri < 0.285:
            texts[i] = (f"{_UNICODE_WORDS[w1[i] % len(_UNICODE_WORDS)]} "
                        f"{_PLAIN_WORDS[w2[i]]} "
                        f"{_UNICODE_WORDS[w3[i] % len(_UNICODE_WORDS)]} {num[i]}")
        else:
            texts[i] = (f"{_PLAIN_WORDS[w1[i]]} {_PLAIN_WORDS[w2[i]]} "
                        f"{_PLAIN_WORDS[w3[i]]} {num[i]}")

    # tool column: ~30% null
    tool_null = rng.random_sample(n) < 0.30
    tools_idx = rng.randint(0, len(TOOL_VOCAB), size=n)
    tools = np.array(TOOL_VOCAB)[tools_idx].astype(object)
    tools[tool_null] = None

    return dict(
        conv_ids=conv_ids, lens=lens, row_conv=row_conv, turn_idx=turn_idx,
        roles=roles, ts_us=ts_us, ts_null=ts_null, texts=np.asarray(texts, dtype=object),
        tools=tools, n=n,
    )


def generate_fixtures(sf_dir: str, force: bool = False) -> str:
    """Generate (idempotently) the corpus for sf_dir; returns fixture dir."""
    out = fixture_dir(sf_dir)
    marker = os.path.join(out, "_SUCCESS")

    def _current() -> bool:
        if not os.path.exists(marker):
            return False
        try:
            with open(os.path.join(out, "meta.json")) as f:
                meta = json.load(f)
                return (meta.get("n_buckets") == N_BUCKETS
                        and meta.get("gen_version") == GEN_VERSION)
        except (OSError, json.JSONDecodeError):
            return False

    if _current() and not force:
        return out
    os.makedirs(DATA_ROOT, exist_ok=True)
    lock_path = os.path.join(DATA_ROOT, f".lock-{os.path.basename(out)}")
    with open(lock_path, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        if _current() and not force:
            return out
        _generate(out, sf_from_dir(sf_dir))
        with open(marker, "w") as f:
            f.write("ok\n")
    return out


def _generate(out: str, sf: float) -> None:
    rng = np.random.RandomState(SEED)
    n_target = n_turns_for_sf(sf)
    t = _build_transcripts(rng, n_target)
    n, n_convs = t["n"], len(t["conv_ids"])
    conv_per_row = t["conv_ids"][t["row_conv"]]

    # corrupt rows (blank/null conv_id -> must be filtered + counted;
    # reference: LogHarvesterTask.java:338-341)
    n_bad = max(8, int(0.015 * n))
    bad_conv = np.array([None if i % 2 == 0 else "" for i in range(n_bad)], dtype=object)
    bad_turn = np.arange(n_bad, dtype=np.int32)
    bad_role = np.array(["user"] * n_bad)
    bad_text = np.array([f"corrupt row {i}" for i in range(n_bad)], dtype=object)
    bad_tool = np.array([None] * n_bad, dtype=object)
    bad_ts = EPOCH_US + rng.randint(0, 30 * 86400, size=n_bad) * 1_000_000

    conv_all = np.concatenate([conv_per_row.astype(object), bad_conv])
    turn_all = np.concatenate([t["turn_idx"], bad_turn])
    role_all = np.concatenate([t["roles"].astype(object), bad_role.astype(object)])
    text_all = np.concatenate([t["texts"], bad_text])
    tool_all = np.concatenate([t["tools"], bad_tool])
    ts_all = np.concatenate([t["ts_us"], bad_ts])
    ts_null = np.concatenate([t["ts_null"], np.zeros(n_bad, dtype=bool)])

    # bucket per conv (corrupt -> bucket 0); convs never span buckets
    conv_bucket = np.array([md5_lower64(c) % N_BUCKETS for c in t["conv_ids"]])
    bucket_all = np.concatenate([conv_bucket[t["row_conv"]], np.zeros(n_bad, dtype=np.int64)])

    order = rng.permutation(len(conv_all))  # scramble input row order
    tmp = out + ".tmp"
    if os.path.exists(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(os.path.join(tmp, "transcripts"))

    ts_arr = pa.array(ts_all[order], type=pa.int64(), mask=ts_null[order]).cast(
        pa.timestamp("us"))

    table = pa.table({
        "conv_id": pa.array(conv_all[order], type=pa.string()),
        "turn_idx": pa.array(turn_all[order], type=pa.int32()),
        "role": pa.array(role_all[order], type=pa.string()),
        "text": pa.array(text_all[order], type=pa.string()),
        "tool": pa.array(tool_all[order], type=pa.string()),
        "ts": ts_arr,
    })
    buckets_sorted = bucket_all[order]
    for b in range(N_BUCKETS):
        sub = table.filter(pa.array(buckets_sorted == b))
        pq.write_table(sub, os.path.join(tmp, "transcripts", f"part-{b:02d}.parquet"),
                       row_group_size=64 * 1024)

    # ---- side tables ------------------------------------------------------
    # conv_meta (~90% coverage)
    keep = rng.random_sample(n_convs) < 0.9
    meta_convs = t["conv_ids"][keep]
    m = len(meta_convs)
    fmt = np.array(FORMAT_IDS)[rng.randint(0, len(FORMAT_IDS), size=m)]
    series_null = rng.random_sample(m) < 0.3
    series = np.array([f"series-{k:04d}" for k in rng.randint(0, 5000, size=m)], dtype=object)
    series[series_null] = None
    size = rng.randint(0, 10_000_000, size=m).astype(np.int64)
    rh_idx = rng.randint(0, len(SUBJECTS), size=m)
    rights = np.array(SUBJECTS)[rh_idx]
    extra_n = rng.randint(0, 4, size=m)
    perms = []
    for i in range(m):
        extras = list(np.array(SUBJECTS)[rng.randint(0, len(SUBJECTS), size=extra_n[i])])
        seen, acc = set(), []
        for s in [rights[i]] + extras:
            if s not in seen:
                seen.add(s)
                acc.append(s)
        perms.append(acc)
    pq.write_table(pa.table({
        "conv_id": pa.array(meta_convs.astype(object), type=pa.string()),
        "format_id": pa.array(fmt.astype(object), type=pa.string()),
        "series_id": pa.array(list(series), type=pa.string()),
        "size": pa.array(size),
        "rights_holder": pa.array(rights.astype(object), type=pa.string()),
        "read_permission": pa.array(perms, type=pa.list_(pa.string())),
    }), os.path.join(tmp, "conv_meta.parquet"))

    # node_registry: hot convs until ~60% of traffic is member-covered
    order_by_len = np.argsort(-t["lens"])
    cum = np.cumsum(t["lens"][order_by_len])
    k = int(np.searchsorted(cum, int(0.60 * n))) + 1
    members = t["conv_ids"][order_by_len[:k]]
    pq.write_table(pa.table({
        "member_key": pa.array(members.astype(object), type=pa.string()),
        "node_id": pa.array([f"urn:node:SYNTH{i % 10:02d}" for i in range(len(members))]),
        "node_name": pa.array([f"synth-host-{i:03d}" for i in range(len(members))]),
    }), os.path.join(tmp, "node_registry.parquet"))

    # event_type_lookup
    pq.write_table(pa.table({
        "tool": pa.array(TOOL_VOCAB),
        "tool_family": pa.array([TOOL_FAMILY[x] for x in TOOL_VOCAB]),
    }), os.path.join(tmp, "event_type_lookup.parquet"))

    # range_list: exact keys + [lo,hi] intervals over 32-bit hash space
    n_ranges = 30
    los = rng.randint(0, 2**32 - 2**25, size=n_ranges).astype(np.uint64)
    widths = rng.randint(2**20, 2**25, size=n_ranges).astype(np.uint64)
    his = los + widths
    exact = t["conv_ids"][rng.randint(0, n_convs, size=10)]
    kinds = ["range"] * n_ranges + ["exact"] * 10
    pq.write_table(pa.table({
        "kind": pa.array(kinds),
        "key": pa.array([None] * n_ranges + list(exact.astype(object)), type=pa.string()),
        "lo": pa.array(list(los) + [None] * 10, type=pa.uint64()),
        "hi": pa.array(list(his) + [None] * 10, type=pa.uint64()),
        "label": pa.array([f"blk-{i:02d}" for i in range(n_ranges + 10)]),
    }), os.path.join(tmp, "range_list.parquet"))

    with open(os.path.join(tmp, "patterns_partial.txt"), "w") as f:
        f.write("\n".join(PARTIAL_PATTERNS) + "\n")
    with open(os.path.join(tmp, "patterns_full.txt"), "w") as f:
        f.write("\n".join(FULL_PATTERNS) + "\n")

    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"seed": SEED, "gen_version": GEN_VERSION, "sf": sf,
                   "n_rows": int(len(conv_all)),
                   "n_valid": int(n), "n_corrupt": int(n_bad),
                   "n_convs": int(n_convs), "n_buckets": N_BUCKETS,
                   "n_members": int(len(members))}, f, indent=2)

    # atomic publish
    import shutil
    if os.path.exists(out):
        shutil.rmtree(out)
    os.replace(tmp, out)
