"""Token-entropy quality signal (ops/text.py::entropy_batch)."""

import math

import pyarrow as pa

import ray.data

from d1_log_aggregation_ray.ops.text import entropy_batch


def _ref_entropy(text):
    w = text.split(" ")
    n = len(w)
    tf = {}
    for t in w:
        tf[t] = tf.get(t, 0) + 1
    s = sum(c * math.log2(c) for c in tf.values())
    h = math.log2(n) - s / n
    return math.floor(h * 1e6 + 0.5) / 1e6


def test_entropy_matches_reference():
    texts = ["a a a a",                  # zero entropy
             "a b c d",                  # maximal: log2(4) = 2
             "a a b b c",                # mixed
             "x y x y x y zz"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = ray.data.from_arrow(t).map_batches(
        entropy_batch, batch_format="pyarrow").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    for i, txt in enumerate(texts):
        assert abs(out.entropy[i] - _ref_entropy(txt)) < 1e-9
    assert out.entropy[0] == 0.0
    assert out.entropy[1] == 2.0
