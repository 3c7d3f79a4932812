"""Deduplication operators over the `documents` table.

Five families, each Ray-Data-native:
  - exact: content-hash groupby, keep min id  (D1 analog at doc scale)
  - minhash + LSH: shingle -> minhash signature -> band buckets ->
    groupby(band, band_key) -> keep min id per bucket
  - simhash: 64-bit simhash exact-bucket dedup
  - n-gram Jaccard: LSH candidate buckets + exact shingle-set verify
  - embedding cosine near-dup: normalized-matrix broadcast + blockwise
    matmul (the brute-force baseline; IVF/LSH variant in similarity.py)

Scale notes: every groupby key is a fixed-width hash (never raw text —
the shuffle moves 8-byte keys + doc ids); signatures are computed once
per doc in a stateless map_batches; the embedding broadcast uses one
ray.put of the normalized matrix.  Hash functions are crc32-based
(deterministic across processes, unlike Python's salted hash()).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.hashing import md5_lower64

_MERSENNE31 = (1 << 31) - 1  # 31-bit modulus: (a*x + b) fits in uint64


_WORKER_HASHERS: dict = {}


def _signatures(ds: ray.data.Dataset, num_perm: int, text_col: str,
                id_col: str) -> ray.data.Dataset:
    """Signature stage as TASKS with a worker-global MinHasher (init is
    just seeded coefficient generation, so tasks schedule better than
    an actor pool here — no spin-up, perfect balance)."""
    def sig_fn(batch: pa.Table) -> pa.Table:
        key = (num_perm, text_col, id_col)
        h = _WORKER_HASHERS.get(key)
        if h is None:
            h = _WORKER_HASHERS[key] = MinHasher(
                num_perm=num_perm, text_col=text_col, id_col=id_col)
        return h(batch)
    return ds.map_batches(sig_fn, batch_format="pyarrow")


def _join_partitions() -> int:
    """Size hash-join aggregator count to the cluster: each partition
    is an actor, and requesting more actors than free CPUs stalls the
    join on a small (e.g. 4-cpu test) session."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(16, cpus // 2))
_WCOMB = np.uint64(1_000_003)


def _word_codes(words: list[str], vocab: dict) -> np.ndarray:
    """word -> 31-bit crc code, memoized in `vocab` (per-batch/actor)."""
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        c = vocab.get(w)
        if c is None:
            c = zlib.crc32(w.encode("utf-8")) & _MERSENNE31
            vocab[w] = c
        out[i] = c
    return out


def _shingle_hashes(text: str, k: int = 3, vocab: dict | None = None) -> np.ndarray:
    """k-word shingles -> 31-bit hashes, fully vectorized: per-word crc
    codes combined with a polynomial roll (no string joins)."""
    if vocab is None:
        vocab = {}
    codes = _word_codes(text.split(), vocab)
    n = len(codes)
    if n == 0:
        return np.zeros(1, dtype=np.uint64)
    if n < k:
        h = np.uint64(0)
        for c in codes:
            h = (h * _WCOMB + c) % np.uint64(_MERSENNE31)
        return np.array([h], dtype=np.uint64)
    h = codes[:n - k + 1].copy()
    for j in range(1, k):
        h = (h * _WCOMB + codes[j:n - k + 1 + j]) % np.uint64(_MERSENNE31)
    return h


class MinHasher:
    """Signature stage: per-batch vectorized minhash.  All docs' shingle
    hashes are concatenated and the (a*x+b) mod p sketch is computed
    with segment-min (np.minimum.reduceat) over perm chunks — no
    per-doc Python math.  Coefficients are seeded once per actor in
    __init__ and identical across actors."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.RandomState(7)
        self.a = rng.randint(1, _MERSENNE31, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE31, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col
        self._vocab: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table({
                self.id_col: batch.column(self.id_col),
                self.text_col: batch.column(self.text_col),
                "signature": pa.array([], pa.list_(pa.uint64(),
                                                   self.num_perm)),
            })
        if len(self._vocab) > 4_000_000:
            self._vocab.clear()
        chunks = [_shingle_hashes(t, self.k, self._vocab) if t
                  else np.zeros(1, dtype=np.uint64) for t in texts]
        lens = np.array([len(c) for c in chunks])
        offsets = np.zeros(n, dtype=np.int64)
        offsets[1:] = np.cumsum(lens)[:-1]
        allh = np.concatenate(chunks)  # (total_shingles,)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        M = np.uint64(_MERSENNE31)
        for p0 in range(0, self.num_perm, 16):  # chunk perms: bounded memory
            a = self.a[p0:p0 + 16]
            b = self.b[p0:p0 + 16]
            vals = (allh[:, None] * a[None, :] + b[None, :]) % M
            sigs[:, p0:p0 + 16] = np.minimum.reduceat(vals, offsets, axis=0)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            self.text_col: batch.column(self.text_col),
            "signature": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1)), self.num_perm),
        })


def _band_rows(batch: pa.Table, n_bands: int, id_col: str = "doc_id",
               carry_text: bool = False) -> pa.Table:
    """Expand each doc into one row per band: (band_key, id) — fully
    vectorized (band key = polynomial combine of the band's sig slice
    plus a band-salt, so identical slices in different bands never
    collide into one bucket)."""
    nrows = batch.num_rows
    if nrows == 0:
        cols = {"band_key": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64())}
        if carry_text:
            cols["text"] = pa.array([], pa.string())
        return pa.table(cols)
    sig = np.asarray(batch.column("signature").combine_chunks().flatten()
                     ).reshape(nrows, -1)
    if sig.shape[1] % n_bands != 0 or sig.shape[1] < n_bands:
        raise ValueError(
            f"num_perm={sig.shape[1]} must be a positive multiple of "
            f"n_bands={n_bands} (otherwise perms are silently dropped or "
            "every doc collapses into one salt-only bucket)")
    rows_per = sig.shape[1] // n_bands
    ids = batch.column(id_col).to_numpy()
    P = np.uint64(1099511628211)
    SALT = np.uint64(0x9E3779B97F4A7C15)
    keys = np.empty((nrows, n_bands), dtype=np.uint64)
    for b in range(n_bands):
        chunk = sig[:, b * rows_per:(b + 1) * rows_per]
        k = np.full(nrows, np.uint64(b) * SALT, dtype=np.uint64)
        for j in range(rows_per):
            k = k * P + chunk[:, j]  # uint64 wraparound is the hash
        keys[:, b] = k
    cols = {
        "band_key": pa.array(keys.reshape(-1).view(np.int64)),
        id_col: pa.array(np.repeat(ids, n_bands)),
    }
    if carry_text:
        texts = np.asarray(batch.column("text").to_pylist(), dtype=object)
        cols["text"] = pa.array(np.repeat(texts, n_bands), type=pa.string())
    return pa.table(cols)


def minhash_lsh_dedup(ds: ray.data.Dataset, num_perm: int = 64,
                      n_bands: int = 16, id_col: str = "doc_id",
                      text_col: str = "text") -> ray.data.Dataset:
    """Docs surviving minhash-LSH dedup (doc is a dup iff any band
    bucket contains a smaller doc id whose full band-slice matches).

    All-vectorized formulation: per-bucket min id via a sort-based
    groupby AGGREGATE (never per-group python — band buckets are
    mostly singletons, so map_groups would pay ~1 python call per
    row), then a hash join back and a per-doc max.  Equivalent to:
    survivor iff doc_id == min(doc_id) in EVERY band bucket it is in."""
    sigs = _signatures(ds, num_perm, text_col, id_col)
    band = sigs.map_batches(_band_rows, fn_kwargs={"n_bands": n_bands,
                                                   "id_col": id_col},
                            batch_format="pyarrow")
    # band is consumed TWICE (mins + dup scan): materialize so the
    # signature/banding lineage doesn't re-execute.  The banded table is
    # (8-byte key, id) per doc per band — small relative to the corpus;
    # at extreme scale prefer re-execution or a persisted intermediate.
    band = band.materialize()
    mins = band.groupby("band_key").min(id_col)  # (band_key, min(doc_id))

    # broadcast the (band_key -> min id) map and resolve with
    # searchsorted: one shuffle total.  At 100 TB scale, when the min
    # map outgrows a broadcast, swap this block for
    # band.join(mins, num_partitions=_join_partitions()) — same result.
    mt = pa.concat_tables(ray.get(mins.to_arrow_refs()))
    keys = mt.column("band_key").to_numpy()
    vals = mt.column(f"min({id_col})").to_numpy()
    order = np.argsort(keys)
    bref = ray.put((keys[order], vals[order]))

    def dup_ids(batch: pa.Table) -> pa.Table:
        k_sorted, v_sorted = ray.get(bref)
        bk = batch.column("band_key").to_numpy()
        ids = batch.column(id_col).to_numpy()
        pos = np.searchsorted(k_sorted, bk)
        dup = ids > v_sorted[pos]
        return pa.table({id_col: pa.array(np.unique(ids[dup]))})

    dup_set = set()
    for b in band.map_batches(dup_ids, batch_format="pyarrow").to_arrow_refs():
        dup_set.update(ray.get(b).column(id_col).to_pylist())
    dref = ray.put(pa.array(sorted(dup_set)))

    def survivors(batch: pa.Table) -> pa.Table:
        dups = ray.get(dref)
        keep = pc.invert(pc.fill_null(
            pc.is_in(batch.column(id_col), value_set=dups), False))
        return pa.table({id_col: batch.column(id_col).filter(keep)})

    return ds.map_batches(survivors, batch_format="pyarrow")


def _word_hash64(words: list[str], vocab: dict) -> np.ndarray:
    out = np.empty(len(words), dtype=np.uint64)
    for i, w in enumerate(words):
        c = vocab.get(w)
        if c is None:
            b = w.encode("utf-8")
            c = zlib.crc32(b) | (zlib.crc32(b, 0xA5A5) << 32)
            vocab[w] = c
        out[i] = c
    return out


def simhash64(text: str, vocab: dict | None = None) -> int:
    """64-bit simhash over word tokens — vectorized bit counting
    (unpackbits over the token-hash byte view + column sums)."""
    if vocab is None:
        vocab = {}
    words = text.split()
    if not words:
        return 0
    hs = _word_hash64(words, vocab)
    bits = np.unpackbits(hs.view(np.uint8).reshape(len(hs), 8),
                         axis=1, bitorder="little").astype(np.int32)
    acc = bits.sum(axis=0) * 2 - len(hs)
    out_bits = (acc > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(out_bits, bitorder="little").tobytes(),
                          "little")


def simhash_dedup(ds: ray.data.Dataset, id_col: str = "doc_id",
                  text_col: str = "text") -> ray.data.Dataset:
    """Exact-simhash-bucket dedup (hamming-0; near-dup via band trick
    would split the 64 bits into 4 bands of 16)."""

    def add_simhash(batch: pa.Table) -> pa.Table:
        vocab: dict = {}
        texts = batch.column(text_col).to_pylist()
        hs = np.array([simhash64(t, vocab) if t else 0 for t in texts],
                      dtype=np.uint64)
        return pa.table({id_col: batch.column(id_col),
                         "simhash": pa.array(hs.astype(np.int64))})

    with_h = ds.map_batches(add_simhash, batch_format="pyarrow")
    return with_h.groupby("simhash").min(id_col).map_batches(
        lambda b: b.select(["min(" + id_col + ")"]).rename_columns([id_col]),
        batch_format="pyarrow")


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = set(a.tolist()), set(b.tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def ngram_jaccard_dedup(ds: ray.data.Dataset, threshold: float = 0.8,
                        num_perm: int = 64, n_bands: int = 16,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> ray.data.Dataset:
    """LSH candidate buckets + EXACT n-gram-shingle Jaccard verification
    against the bucket's min-id representative."""
    sigs = _signatures(ds, num_perm, text_col, id_col)
    band = sigs.map_batches(_band_rows,
                            fn_kwargs={"n_bands": n_bands, "id_col": id_col,
                                       "carry_text": True},
                            batch_format="pyarrow")

    # exact-verify ONLY multi-doc buckets: band buckets are mostly
    # singletons, and a singleton can't produce a dup — the count join
    # keeps the expensive per-group text jaccard off 99% of rows
    band = band.materialize()  # consumed by counts AND the join below
    counts = band.groupby("band_key").count()
    multi = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("count()"), 1)),
        batch_format="pyarrow").select_columns(["band_key"])
    cand = band.join(multi, join_type="inner",
                     num_partitions=_join_partitions(), on=("band_key",))

    def verify(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column(id_col).to_numpy())
        ids = group.column(id_col).to_numpy()[order]
        texts = np.asarray(group.column("text").to_pylist(), dtype=object)[order]
        rep = _shingle_hashes(texts[0] or "")
        dup = np.zeros(len(ids), dtype=np.int8)
        for i in range(1, len(ids)):
            dup[i] = 1 if _jaccard(rep, _shingle_hashes(texts[i] or "")) >= threshold else 0
        return pa.table({id_col: pa.array(ids), "dup": pa.array(dup)})

    marked = cand.groupby("band_key").map_groups(verify, batch_format="pyarrow")
    all_ids = ds.map_batches(
        lambda b: pa.table({id_col: b.column(id_col),
                            "dup": pa.array(np.zeros(b.num_rows, np.int8))}),
        batch_format="pyarrow")
    per_doc = all_ids.union(marked).groupby(id_col).max("dup")
    return per_doc.map_batches(
        lambda t: t.filter(pc.equal(t.column("max(dup)"), 0)),
        batch_format="pyarrow").select_columns([id_col])


def embedding_cosine_dedup(ds: ray.data.Dataset, threshold: float = 0.95,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> ray.data.Dataset:
    """Near-dup by cosine similarity: doc is a dup iff some SMALLER id
    has cosine >= threshold.  Brute-force baseline: the full normalized
    matrix is ray.put once and each batch does one blockwise matmul
    against it (at 100 TB scale, swap the broadcast for the IVF/LSH
    bucketing in similarity.py)."""
    from .similarity import _as_matrix, _normalize
    mat_tbl = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    tables = [ray.get(r) for r in mat_tbl]
    full = pa.concat_tables(tables).combine_chunks()
    ids = full.column(id_col).to_numpy()
    order = np.argsort(ids)
    mat_n = _normalize(_as_matrix(full, vec_col))[order]
    ids = ids[order]
    ref = ray.put((ids, mat_n))

    def mark(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64())})
        all_ids, m = ray.get(ref)
        bids = batch.column(id_col).to_numpy()
        sims = _normalize(_as_matrix(batch, vec_col)) @ m.T  # (batch, N)
        # mask out cols with id >= row id, then one vectorized row-max
        smaller = all_ids[None, :] < bids[:, None]
        best = np.where(smaller, sims, -np.inf).max(axis=1)
        keep = best < threshold
        return pa.table({id_col: pa.array(bids[keep])})

    return ds.map_batches(mark, batch_format="pyarrow", batch_size=512)
