"""Multi-format transcript ingest: JSONL and CSV sources normalized to
the canonical transcript schema, so every downstream pipeline runs
unchanged regardless of the wire format the corpus arrived in.

Reference analog: the reader factory dispatching on node API version
(v1/v2 NodeCommunication.java) — here the dispatch is on file format,
and the normalizer is a vectorized Arrow cast stage fused into the
read tasks (no extra object-store hop).

Canonical schema (BASELINE.json input_hint): conv_id string,
turn_idx int32, role string, text string, tool string,
ts timestamp[us].  The normalizer accepts:
  - ts as timestamp (any unit), int64 epoch-MICROseconds, or ISO-8601
    strings ("%Y-%m-%dT%H:%M:%S" with optional fractional seconds);
  - missing optional columns (role/text/tool/ts) -> typed null columns;
  - extra columns -> dropped.

Format caveat (CSV only): Arrow's CSV writer encodes null strings as
empty fields, so on read-back ""/null are indistinguishable; the
reader maps empty strings to null (strings_can_be_null), which is the
lossy-but-standard CSV round-trip.  JSONL and parquet round-trip nulls
exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def _to_ts_us(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_null(t):
        # an all-missing ts column infers as null type (e.g. an XML
        # batch whose entries carry no dateLogged) — typed nulls
        return pa.nulls(len(col), pa.timestamp("us"))
    if pa.types.is_timestamp(t):
        return col.cast(pa.timestamp("us"))
    if pa.types.is_integer(t):
        # epoch microseconds by contract
        return col.cast(pa.int64()).cast(pa.timestamp("us"))
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        # ISO-8601 (fractional seconds included): Arrow's string ->
        # timestamp cast parses ISO natively and exactly
        return col.cast(pa.timestamp("us"))
    raise TypeError(f"unsupported ts column type: {t}")


def normalize_transcripts(batch: pa.Table) -> pa.Table:
    """Vectorized normalization of an arbitrary-format batch to the
    canonical transcript schema (casts only — no row loops)."""
    n = batch.num_rows
    cols = {}
    names = set(batch.column_names)
    for field in TRANSCRIPT_SCHEMA:
        if field.name not in names:
            cols[field.name] = pa.nulls(n, field.type)
        elif field.name == "ts":
            cols["ts"] = _to_ts_us(batch.column("ts"))
        else:
            cols[field.name] = batch.column(field.name).cast(field.type)
    return pa.table(cols).cast(TRANSCRIPT_SCHEMA)


def read_transcripts_jsonl(paths: str | list[str]) -> ray.data.Dataset:
    """JSONL transcript source: one JSON object per line with the
    canonical column names; ts as epoch-us int or ISO-8601 string."""
    return ray.data.read_json(paths).map_batches(
        normalize_transcripts, batch_format="pyarrow",
        zero_copy_batch=True)


def read_transcripts_csv(paths: str | list[str]) -> ray.data.Dataset:
    """CSV transcript source (header row, quoted strings); empty
    string fields read back as null (see module caveat)."""
    from pyarrow import csv as pa_csv
    return ray.data.read_csv(
        paths,
        convert_options=pa_csv.ConvertOptions(
            strings_can_be_null=True)).map_batches(
        normalize_transcripts, batch_format="pyarrow",
        zero_copy_batch=True)


#: reference LogEntry child -> canonical transcript column (the v1/v2
#: wire shape of samples/v{1,2}/logEntry-valid.xml:1-11: entryId,
#: identifier, ipAddress, userAgent, subject, event, dateLogged,
#: nodeIdentifier).  identifier/entryId key the record like
#: conv_id/turn_idx; subject is the acting principal (role analog);
#: userAgent is the free-text payload; event is the action tag (tool
#: analog); dateLogged is the timestamp.  ipAddress/nodeIdentifier
#: have no transcript analog and drop like any extra column.
_XML_FIELD_MAP = {"identifier": "conv_id", "entryId": "turn_idx",
                  "subject": "role", "userAgent": "text",
                  "event": "tool", "dateLogged": "ts"}


def _xml_entry_rows(payload: bytes) -> list[dict]:
    """Parse one XML document into canonical-name row dicts: every
    <logEntry> element (any namespace — the reference's v1 and v2
    differ only in the xmlns), children accepted under EITHER the
    canonical transcript names or the reference's LogEntry names
    (_XML_FIELD_MAP).  stdlib ElementTree; trailing 'Z' stripped from
    timestamps (Arrow's naive-timestamp cast rejects zone suffixes)."""
    import xml.etree.ElementTree as ET
    root = ET.fromstring(payload)

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    entries = ([root] if local(root.tag) == "logEntry"
               else [e for e in root.iter() if local(e.tag) == "logEntry"])
    rows = []
    for e in entries:
        f = {}
        for c in e:
            name = local(c.tag)
            f[_XML_FIELD_MAP.get(name, name)] = c.text
        ts = f.get("ts")
        rows.append({
            "conv_id": f.get("conv_id"),
            "turn_idx": int(f["turn_idx"])
            if f.get("turn_idx") is not None else None,
            "role": f.get("role"),
            "text": f.get("text"),
            "tool": f.get("tool"),
            "ts": ts.strip().rstrip("Zz") if ts else None,
        })
    return rows


def read_transcripts_xml(paths: str | list[str]) -> ray.data.Dataset:
    """XML transcript source: files of <logEntry> elements in the
    reference's v1/v2 wire shape (or the canonical names), one row
    per element.  Parsing is per-file python by nature (XML), but
    each file parses inside its read task — the stage stays
    distributed and the normalizer is the same vectorized cast the
    other formats share."""
    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for payload in batch.column("bytes"):
            rows.extend(_xml_entry_rows(payload.as_py()))
        if not rows:
            return TRANSCRIPT_SCHEMA.empty_table()
        return normalize_transcripts(pa.Table.from_pylist(rows))

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow")
