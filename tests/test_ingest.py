"""Round-trip tests for the multi-format ingest normalizer: a fixture
transcript bucket exported to JSONL and CSV must read back (through
read_transcripts_jsonl / read_transcripts_csv) equal to the parquet
original under the canonical schema."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from d1_log_aggregation_ray.sources.ingest import (TRANSCRIPT_SCHEMA,
                                                   normalize_transcripts,
                                                   read_transcripts_csv,
                                                   read_transcripts_jsonl)


@pytest.fixture(scope="module")
def bucket_table(fx_dir):
    path = sorted(glob.glob(os.path.join(fx_dir, "transcripts",
                                         "part-*.parquet")))[0]
    t = pq.read_table(path, columns=[f.name for f in TRANSCRIPT_SCHEMA])
    return t.cast(TRANSCRIPT_SCHEMA)


def _sorted(t: pa.Table) -> pa.Table:
    return t.select([f.name for f in TRANSCRIPT_SCHEMA]).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_jsonl_roundtrip(bucket_table, tmp_path):
    p = tmp_path / "bucket.jsonl"
    with open(p, "w") as f:
        for row in bucket_table.to_pylist():
            row["ts"] = (None if row["ts"] is None
                         else int(row["ts"].timestamp() * 1e6))
            f.write(json.dumps(row) + "\n")
    got = _sorted(pa.Table.from_pandas(
        read_transcripts_jsonl(str(p)).to_pandas(),
        schema=TRANSCRIPT_SCHEMA, preserve_index=False))
    assert got.equals(_sorted(bucket_table))


def test_jsonl_iso_ts_and_missing_cols(tmp_path):
    p = tmp_path / "iso.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"conv_id": "c1", "turn_idx": 0,
                            "role": "user", "text": "hi",
                            "ts": "2025-01-02T03:04:05.123456",
                            "extra": "dropped"}) + "\n")
        f.write(json.dumps({"conv_id": "c1", "turn_idx": 1,
                            "role": "assistant", "text": "yo",
                            "ts": "2025-01-02T03:04:06.000001"}) + "\n")
    t = _sorted(pa.Table.from_pandas(
        read_transcripts_jsonl(str(p)).to_pandas(),
        schema=TRANSCRIPT_SCHEMA, preserve_index=False))
    assert t.schema.equals(TRANSCRIPT_SCHEMA)
    assert t.column("tool").null_count == 2       # missing -> typed null
    assert "extra" not in t.column_names
    us = t.column("ts").cast(pa.int64()).to_pylist()
    assert us[1] - us[0] == 876545                # fractional secs kept


def test_csv_roundtrip_modulo_empty_strings(bucket_table, tmp_path):
    from pyarrow import csv as pa_csv
    p = tmp_path / "bucket.csv"
    # CSV cannot carry timestamps natively at us precision reliably;
    # export ts as epoch-us int64 (the documented int contract)
    exp = bucket_table.set_column(
        bucket_table.schema.get_field_index("ts"), "ts",
        bucket_table.column("ts").cast(pa.int64()))
    pa_csv.write_csv(exp, str(p))
    got = _sorted(pa.Table.from_pandas(
        read_transcripts_csv(str(p)).to_pandas(),
        schema=TRANSCRIPT_SCHEMA, preserve_index=False))
    # CSV round-trip maps ""/null to null: compare with "" -> null,
    # applied BEFORE sorting so null rows land in the same positions
    want = bucket_table
    for c in ["role", "text", "tool", "conv_id"]:
        i = want.schema.get_field_index(c)
        col = want.column(c).combine_chunks()
        want = want.set_column(
            i, c, pc.if_else(pc.equal(pc.fill_null(col, ""), ""),
                             pa.nulls(len(col), pa.string()), col))
    assert got.equals(_sorted(want))


def test_normalize_rejects_bad_ts_type():
    t = pa.table({"conv_id": pa.array(["a"]),
                  "turn_idx": pa.array([0], pa.int32()),
                  "ts": pa.array([1.5], pa.float64())})
    with pytest.raises(TypeError):
        normalize_transcripts(t)


_XML_V1 = """<?xml version="1.0" encoding="UTF-8"?>
<d1:logEntry xmlns:d1="http://ns.dataone.org/service/types/v1">
    <entryId>7</entryId>
    <identifier>conv-a</identifier>
    <ipAddress>10.0.0.1</ipAddress>
    <userAgent>hello world</userAgent>
    <subject>user</subject>
    <event>search</event>
    <dateLogged>2006-05-04T18:13:51.0Z</dateLogged>
    <nodeIdentifier>nodeX</nodeIdentifier>
</d1:logEntry>
"""

_XML_V2 = _XML_V1.replace("types/v1", "types/v2.0").replace(
    "conv-a", "conv-b").replace(">7<", ">8<")

_XML_MULTI = """<?xml version="1.0"?>
<log>
  <logEntry>
    <conv_id>conv-c</conv_id><turn_idx>0</turn_idx>
    <role>assistant</role><text>hi</text><tool>none</tool>
    <ts>2024-01-02T03:04:05.000006</ts>
  </logEntry>
  <logEntry>
    <conv_id>conv-c</conv_id><turn_idx>1</turn_idx>
    <role>user</role><text></text>
  </logEntry>
</log>
"""


def test_xml_roundtrip_v1_v2_and_canonical(tmp_path):
    """The reference's v1/v2 LogEntry element shape (samples/
    v{1,2}/logEntry-valid.xml structure) AND canonical child names
    normalize to the transcript schema; multi-entry documents expand
    one row per element; extra children (ipAddress/nodeIdentifier)
    drop; trailing-Z timestamps parse."""
    import datetime

    from d1_log_aggregation_ray.sources.ingest import read_transcripts_xml

    for name, content in [("v1.xml", _XML_V1), ("v2.xml", _XML_V2),
                          ("multi.xml", _XML_MULTI)]:
        (tmp_path / name).write_text(content)
    ds = read_transcripts_xml(str(tmp_path))
    got = _sorted(pa.Table.from_pandas(
        ds.to_pandas(), schema=TRANSCRIPT_SCHEMA, preserve_index=False))
    assert got.schema.equals(TRANSCRIPT_SCHEMA)
    rows = {(r["conv_id"], r["turn_idx"]): r for r in got.to_pylist()}
    assert set(rows) == {("conv-a", 7), ("conv-b", 8),
                         ("conv-c", 0), ("conv-c", 1)}
    a = rows[("conv-a", 7)]
    assert (a["role"], a["text"], a["tool"]) == ("user", "hello world",
                                                 "search")
    assert a["ts"] == datetime.datetime(2006, 5, 4, 18, 13, 51)
    c0 = rows[("conv-c", 0)]
    assert c0["ts"] == datetime.datetime(2024, 1, 2, 3, 4, 5, 6)
    assert rows[("conv-c", 1)]["tool"] is None


def test_xml_escaped_content_roundtrip(tmp_path):
    """Escaped markup, entities and non-ASCII text inside logEntry
    children parse back to the original strings."""
    from xml.sax.saxutils import escape

    from d1_log_aggregation_ray.sources.ingest import read_transcripts_xml

    text = 'a < b && "c" > d — ünïcødé <tag/>'
    role = "user&agent"
    doc = f"""<?xml version="1.0" encoding="UTF-8"?>
<log><logEntry>
  <conv_id>c-esc</conv_id><turn_idx>0</turn_idx>
  <role>{escape(role)}</role><text>{escape(text)}</text>
</logEntry></log>"""
    (tmp_path / "esc.xml").write_text(doc, encoding="utf-8")
    rows = read_transcripts_xml(str(tmp_path / "esc.xml")).take_all()
    assert len(rows) == 1
    assert rows[0]["text"] == text
    assert rows[0]["role"] == role
    assert rows[0]["tool"] is None and rows[0]["ts"] is None
