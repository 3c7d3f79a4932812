"""Corpus bigram language-model quality scoring (CCNet-style).

The classic LM quality filter for pretraining data: train a small
n-gram LM on the corpus (here a word bigram model), score every
document by its mean token log-probability, and gate/bucket on the
score — fluent text scores high, boilerplate/gibberish scores low.

Reference analog: the regex-bank parse stage (R2/R3,
LogHarvesterTask.java partial/full robot banks) — derive a per-record
signal from a broadcast model built out of corpus-level statistics.

Scale shape (100 TB corpus):
  * Model build is ONE exchange: per-batch bigram-count combiners
    (blocks collapse to their distinct (left, right) pairs before
    anything crosses the wire) -> hash-partition aggregate keyed on
    `left`, so each partition holds every bigram of its lefts and the
    conditional denominators c(left, *) are computed IN-PARTITION with
    no second exchange.  A layout-independent per-partition top-k
    (total order: -count, left, right) bounds what reaches the driver
    to P x max_bigrams rows; the broadcast table is <= max_bigrams.
  * Scoring is a map-only corpus scan against the ray.put model:
    per-batch Arrow split + one index_in probe of the joined
    "left\\x1fright" key against the model's key array, miss ->
    fixed backoff log-prob, per-doc mean via np.add.reduceat.
  * Determinism at any parallelism: all counts are integers, log2 is
    evaluated once per distinct bigram from integer ratios, and each
    document is wholly contained in one row, so its pair sequence —
    and the float accumulation ORDER — never depends on batching.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

#: log2 prob assigned to bigrams outside the (bounded) model table
BACKOFF_LOGP = -20.0

_SEP = "\x1f"


def _bigram_partials(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch combiner: distinct (left, right, count) bigram rows,
    pairs never crossing document boundaries."""
    text = pc.fill_null(batch.column(text_col).combine_chunks(), "")
    toks = pc.split_pattern(text, " ")
    flat = pc.list_flatten(toks)
    n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return pa.table({"left": pa.array([], pa.string()),
                         "right": pa.array([], pa.string()),
                         "count": pa.array([], pa.int64())})
    # adjacent positions within the same doc: drop each doc's last slot
    ends = np.cumsum(n_tok) - 1          # last token index per doc
    keep = np.ones(len(flat), dtype=bool)
    keep[ends[n_tok > 0]] = False
    idx = np.nonzero(keep)[0]
    left = flat.take(pa.array(idx))
    right = flat.take(pa.array(idx + 1))
    g = pa.table({"left": left, "right": right}).group_by(
        ["left", "right"]).aggregate([([], "count_all")])
    return g.rename_columns(["left", "right", "count"])


def build_bigram_lm(ds: ray.data.Dataset, max_bigrams: int = 100_000,
                    text_col: str = "text") -> pa.Table:
    """(left, right, count, left_total) for the corpus's top
    `max_bigrams` bigrams by (count desc, left, right) — exact counts,
    exact conditional denominators, one exchange, bounded driver
    collect."""
    from ..stages.aggregate import hash_partition_aggregate
    from .text import _iter_driver_tables

    partials = ds.select_columns([text_col]).map_batches(
        _bigram_partials, batch_format="pyarrow", zero_copy_batch=True,
        fn_kwargs={"text_col": text_col})
    merged = hash_partition_aggregate(partials, ["left", "right"],
                                      [("count", "sum")],
                                      rename={"count_sum": "count"})

    _empty = pa.table({"left": pa.array([], pa.string()),
                       "right": pa.array([], pa.string()),
                       "count": pa.array([], pa.int64()),
                       "left_total": pa.array([], pa.int64())})

    def totals_and_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "left" not in batch.column_names:
            return _empty
        # the partition key is hash(left): every bigram of a left is
        # HERE, so c(left, *) is exact with no extra exchange
        lt = batch.group_by(["left"]).aggregate([("count", "sum")])
        lt = dict(zip(lt.column("left").to_pylist(),
                      lt.column("count_sum").to_pylist()))
        l = np.asarray(batch.column("left").to_pylist())
        r = np.asarray(batch.column("right").to_pylist())
        c = batch.column("count").to_numpy(zero_copy_only=False)
        order = np.lexsort((r, l, -c))[:max_bigrams]
        order = np.sort(order)
        return pa.table({
            "left": batch.column("left").take(pa.array(order)),
            "right": batch.column("right").take(pa.array(order)),
            "count": batch.column("count").take(pa.array(order)),
            "left_total": pa.array(
                [int(lt[x]) for x in l[order]], pa.int64())})

    rows = []
    for t in _iter_driver_tables(merged.map_batches(
            totals_and_topk, batch_format="pyarrow")):
        if t.num_rows == 0 or "left" not in t.column_names:
            continue
        rows.extend(zip(t.column("left").to_pylist(),
                        t.column("right").to_pylist(),
                        t.column("count").to_pylist(),
                        t.column("left_total").to_pylist()))
    rows.sort(key=lambda x: (-x[2], x[0], x[1]))
    rows = rows[:max_bigrams]
    return pa.table({
        "left": pa.array([x[0] for x in rows], pa.string()),
        "right": pa.array([x[1] for x in rows], pa.string()),
        "count": pa.array([x[2] for x in rows], pa.int64()),
        "left_total": pa.array([x[3] for x in rows], pa.int64())})


def lm_score(ds: ray.data.Dataset, max_bigrams: int = 100_000,
             id_col: str = "doc_id",
             text_col: str = "text") -> ray.data.Dataset:
    """(id, lm_score): mean per-bigram log2 P(right|left) under the
    corpus bigram LM, backoff BACKOFF_LOGP for bigrams outside the
    bounded model; docs with < 2 tokens score exactly BACKOFF_LOGP.
    Two passes over the pruned (id, text) input — model build +
    scoring — the decontamination shape: a broadcast model derived
    from the corpus, then one shuffle-free scan."""
    lm = build_bigram_lm(ds, max_bigrams=max_bigrams,
                         text_col=text_col)
    keys = pc.binary_join_element_wise(
        lm.column("left").combine_chunks(),
        lm.column("right").combine_chunks(), _SEP)
    logp = np.log2(
        lm.column("count").to_numpy(zero_copy_only=False)
        / lm.column("left_total").to_numpy(
            zero_copy_only=False).astype(np.float64))
    model_ref = ray.put((keys, logp))

    def score(batch: pa.Table) -> pa.Table:
        mkeys, mlogp = ray.get(model_ref)
        text = pc.fill_null(batch.column(text_col).combine_chunks(),
                            "")
        toks = pc.split_pattern(text, " ")
        flat = toks.flatten()
        n_tok = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False)
        n = batch.num_rows
        out = np.full(n, BACKOFF_LOGP, dtype=np.float64)
        if len(flat):
            ends = np.cumsum(n_tok) - 1
            keep = np.ones(len(flat), dtype=bool)
            keep[ends[n_tok > 0]] = False
            idx = np.nonzero(keep)[0]
            if len(idx):
                pair = pc.binary_join_element_wise(
                    flat.take(pa.array(idx)),
                    flat.take(pa.array(idx + 1)), _SEP)
                pos = pc.index_in(pair, mkeys)
                hit = pos.is_valid().to_numpy(zero_copy_only=False)
                pi = pc.fill_null(pos, 0).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                lp = np.where(hit, mlogp[pi] if len(mlogp) else 0.0,
                              BACKOFF_LOGP)
                # doc index of each kept pair slot
                doc_of = np.repeat(np.arange(n), n_tok)[idx]
                sums = np.zeros(n, dtype=np.float64)
                np.add.at(sums, doc_of, lp)
                cnt = np.maximum(n_tok - 1, 0)
                has = cnt > 0
                out[has] = sums[has] / cnt[has]
        return pa.table({
            id_col: pc.cast(batch.column(id_col), pa.int64()),
            "lm_score": pa.array(out)})

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)
