"""Conversation-JSONL export sink: round-trip equality against the
parquet corpus, resume-skip on re-run, and per-turn ordering."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from d1_log_aggregation_ray.sources.export import export_conversations_jsonl


def _valid_sorted_corpus(fx_dir):
    paths = sorted(glob.glob(os.path.join(fx_dir, "transcripts",
                                          "part-*.parquet")))
    t = pa.concat_tables([pq.read_table(p, columns=[
        "conv_id", "turn_idx", "role", "text", "tool", "ts"])
        for p in paths])
    conv = t.column("conv_id")
    ok = pc.and_kleene(conv.is_valid(), pc.not_equal(conv, pa.scalar("")))
    return t.filter(pc.fill_null(ok, False)).combine_chunks().sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_export_roundtrip_and_resume(fx_dir, tmp_path):
    out = str(tmp_path / "export")
    man = export_conversations_jsonl(fx_dir, out).take_all()
    assert all(not r["skipped"] for r in man)
    want = _valid_sorted_corpus(fx_dir)
    # manifest totals match the valid corpus
    assert sum(r["n_turns"] for r in man) == want.num_rows

    # explode the JSONL back to rows and compare
    rows = []
    for r in man:
        with open(r["out_path"]) as f:
            for line in f:
                c = json.loads(line)
                for turn in c["turns"]:
                    rows.append({"conv_id": c["conv_id"], **turn})
    got = pa.Table.from_pylist(rows).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert got.num_rows == want.num_rows
    assert pc.all(pc.equal(got.column("conv_id"),
                           want.column("conv_id"))).as_py()
    text_eq = pc.fill_null(pc.equal(got.column("text"),
                                    want.column("text")), False)
    both_null = pc.and_(got.column("text").is_null(),
                        want.column("text").combine_chunks().is_null())
    assert pc.all(pc.or_(text_eq, both_null)).as_py()
    assert pc.all(pc.equal(
        got.column("ts_us").cast(pa.int64()),
        want.column("ts").cast(pa.int64()))).as_py()
    # turns are nested in turn_idx order within each conversation line
    for r in man[:2]:
        with open(r["out_path"]) as f:
            c = json.loads(f.readline())
        idx = [t["turn_idx"] for t in c["turns"]]
        assert idx == sorted(idx)

    # resume: second run skips every shard and rewrites nothing
    mtimes = {r["out_path"]: os.path.getmtime(r["out_path"]) for r in man}
    man2 = export_conversations_jsonl(fx_dir, out).take_all()
    assert all(r["skipped"] for r in man2)
    assert all(os.path.getmtime(p) == m for p, m in mtimes.items())
