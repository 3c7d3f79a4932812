"""Checkpoint manifest: per-partition lineage records enabling resume.

Replaces the reference's LDAP watermark + lease checkpointing
(LogHarvesterTask.java:189-204,492-496 `logLastAggregated`;
LogAggregationHarvestJob.java:78-94 `aggregateLogs` lease): each
completed input bucket appends one JSONL lineage record — input
fragment, row counts in/out/dropped, per-sink routed counts, flag
totals, max ts watermark, stage timings.  A resumed run skips buckets
already recorded and clears partial output dirs of incomplete ones,
so a killed run never reprocesses completed partitions and never
double-writes (deterministic natural key turn_id = conv_id.turn_idx
keeps any overlap idempotent, mirroring the Solr upsert-by-id,
LogHarvesterTask.java:431-435).

Appends are single O_APPEND writes (atomic on POSIX) + fsync.
"""

from __future__ import annotations

import json
import os


class Manifest:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path), exist_ok=True)

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as f:
            for ln in f:
                ln = ln.strip()
                if ln:
                    try:
                        out.append(json.loads(ln))
                    except json.JSONDecodeError:
                        pass  # torn write from a killed run: ignore tail
        return out

    def completed_buckets(self) -> set[int]:
        return {r["bucket"] for r in self.records() if r.get("complete")}

    def latest_complete(self) -> dict[int, dict]:
        """bucket -> LAST complete record.  Incremental delta harvests
        append an updated CUMULATIVE record per re-harvested bucket
        (never rewrite history), so rollups must read last-wins."""
        out: dict[int, dict] = {}
        for r in self.records():
            if r.get("complete"):
                out[r["bucket"]] = r
        return out

    def append(self, record: dict) -> None:
        data = (json.dumps(record, sort_keys=True) + "\n").encode()
        fd = os.open(self.path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
        try:
            os.write(fd, data)
            os.fsync(fd)
        finally:
            os.close(fd)

    def rewrite(self, records: list[dict]) -> None:
        """Atomically replace the manifest (reconciliation only; normal
        progress is append-only)."""
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            for r in records:
                f.write(json.dumps(r, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.path)
