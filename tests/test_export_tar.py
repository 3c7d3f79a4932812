"""Tar-shard export sink: read the shards back and byte-compare every
member against the source corpus, verify the pack-spec shard
assignment, cross-run determinism, and resume-skip."""

import glob
import hashlib
import json
import os
import tarfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from d1_log_aggregation_ray.sources.export_tar import export_tar_shards

SF = "/root/testdata/sf0.001"
CAP = 8192


def _docs_table():
    return pq.read_table(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "text", "lang", "source"])


def _run(out):
    ds = ray.data.read_parquet(
        os.path.join(SF, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"])
    return export_tar_shards(ds, str(out), capacity=CAP,
                             meta_cols=("lang", "source")).take_all()


def _tar_digest(out):
    return {os.path.basename(p): hashlib.md5(
        open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(str(out), "*.tar"))}


def test_tar_export_roundtrip(tmp_path):
    out = tmp_path / "shards"
    man = _run(out)
    assert man and all(not r["skipped"] for r in man)

    t = _docs_table().sort_by([("doc_id", "ascending")])
    ids = t.column("doc_id").to_pylist()
    texts = [x if x is not None else "" for x in
             t.column("text").to_pylist()]
    langs = t.column("lang").to_pylist()
    srcs = t.column("source").to_pylist()

    # pack-spec oracle: exclusive byte cumsum // CAP in id order
    nb = np.array([len(x.encode("utf-8")) for x in texts], np.int64)
    cumb = np.concatenate(([0], np.cumsum(nb)[:-1]))
    want_shard = dict(zip(ids, cumb // CAP))

    # manifest covers every doc exactly once with the spec assignment
    assert sum(r["n_docs"] for r in man) == len(ids)
    assert sum(r["n_bytes"] for r in man) == int(nb.sum())

    seen = {}
    for r in man:
        with tarfile.open(r["path"]) as tf:
            members = tf.getmembers()
            by_name = {m.name: tf.extractfile(m).read() for m in members}
        txt = [n for n in by_name if n.endswith(".txt")]
        assert len(txt) == r["n_docs"]
        for name in txt:
            did = int(name[:-4])
            seen[did] = (r["shard_id"], by_name[name],
                         json.loads(by_name[name[:-4] + ".json"]))
    assert set(seen) == set(ids)
    for i, did in enumerate(ids):
        sid, payload, meta = seen[did]
        assert sid == want_shard[did]
        assert payload == texts[i].encode("utf-8")
        assert meta == {"doc_id": did, "lang": langs[i],
                        "source": srcs[i]}


def test_tar_export_deterministic_and_resume(tmp_path):
    out1, out2 = tmp_path / "a", tmp_path / "b"
    man1 = _run(out1)
    _run(out2)
    # byte-identical shards across runs (fixed tar headers, off order)
    assert _tar_digest(out1) == _tar_digest(out2)

    # resume: re-export into the same dir skips every existing shard
    # with unchanged counts and identical bytes
    before = _tar_digest(out1)
    man3 = _run(out1)
    assert all(r["skipped"] for r in man3)
    assert ({(r["shard_id"], r["n_docs"], r["n_bytes"]) for r in man1}
            == {(r["shard_id"], r["n_docs"], r["n_bytes"]) for r in man3})
    assert _tar_digest(out1) == before
