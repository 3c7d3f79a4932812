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

_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-word shingles -> uint64 hashes (crc32 pair, process-stable)."""
    words = text.split()
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)]
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        b = s.encode("utf-8")
        out[i] = np.uint64(zlib.crc32(b)) | (np.uint64(zlib.crc32(b, 0xA5A5)) << np.uint64(32))
    return out


class MinHasher:
    """Stateless-per-batch signature stage; permutation coefficients are
    built once per actor in __init__ (seeded, identical across actors)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.RandomState(7)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (a*x + b) mod p, vectorized over shingles x perms (uint64 with
        # python-int promotion to dodge overflow on the multiply)
        x = sh.astype(object)[:, None]
        vals = (x * self.a.astype(object)[None, :] + self.b.astype(object)[None, :]) % _MERSENNE
        return np.min(np.asarray(vals, dtype=np.uint64), axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        sigs = np.zeros((len(texts), self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            if t:
                sigs[i] = self.signature(t)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            self.text_col: batch.column(self.text_col),
            "signature": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1)), self.num_perm),
        })


def _band_rows(batch: pa.Table, n_bands: int, id_col: str = "doc_id",
               carry_text: bool = False) -> pa.Table:
    """Expand each doc into one row per band: (band, band_key, id)."""
    sig = np.asarray(batch.column("signature").combine_chunks().flatten()
                     ).reshape(batch.num_rows, -1)
    rows_per = sig.shape[1] // n_bands
    ids = batch.column(id_col).to_numpy()
    bands, keys, out_ids, text_idx = [], [], [], []
    for b in range(n_bands):
        chunk = sig[:, b * rows_per:(b + 1) * rows_per]
        for i in range(len(ids)):
            bands.append(b)
            keys.append(zlib.crc32(chunk[i].tobytes()) | (b << 32))
            out_ids.append(ids[i])
            text_idx.append(i)
    cols = {
        "band_key": pa.array(np.array(keys, dtype=np.int64)),
        id_col: pa.array(out_ids),
    }
    if carry_text:
        texts = batch.column("text").to_pylist()
        cols["text"] = pa.array([texts[i] for i in text_idx], type=pa.string())
    return pa.table(cols)


def minhash_lsh_dedup(ds: ray.data.Dataset, num_perm: int = 64,
                      n_bands: int = 16, id_col: str = "doc_id",
                      text_col: str = "text") -> ray.data.Dataset:
    """Docs surviving minhash-LSH dedup (doc is a dup iff any band
    bucket contains a smaller doc id whose full band-slice matches)."""
    sigs = ds.map_batches(MinHasher,
                          fn_constructor_kwargs={"num_perm": num_perm,
                                                 "text_col": text_col,
                                                 "id_col": id_col},
                          batch_format="pyarrow", concurrency=(1, 8))
    band = sigs.map_batches(_band_rows, fn_kwargs={"n_bands": n_bands,
                                                   "id_col": id_col},
                            batch_format="pyarrow")

    def mark_dups(group: pa.Table) -> pa.Table:
        ids = np.sort(group.column(id_col).to_numpy())
        dup = np.ones(len(ids), dtype=np.int8)
        dup[0] = 0  # min id in the bucket survives
        return pa.table({id_col: pa.array(ids), "dup": pa.array(dup)})

    marked = band.groupby("band_key").map_groups(mark_dups, batch_format="pyarrow")
    per_doc = marked.groupby(id_col).max("dup")
    return per_doc.filter(lambda r: r["max(dup)"] == 0).select_columns([id_col])


def simhash64(text: str) -> int:
    """64-bit simhash over word tokens (crc32-pair token hashes)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in text.split():
        b = w.encode("utf-8")
        h = zlib.crc32(b) | (zlib.crc32(b, 0xA5A5) << 32)
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "little"), np.uint8),
                             bitorder="little").astype(np.int64)
        acc += bits * 2 - 1
    out_bits = (acc > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(out_bits, bitorder="little").tobytes(),
                          "little")


def simhash_dedup(ds: ray.data.Dataset, id_col: str = "doc_id",
                  text_col: str = "text") -> ray.data.Dataset:
    """Exact-simhash-bucket dedup (hamming-0; near-dup via band trick
    would split the 64 bits into 4 bands of 16)."""

    def add_simhash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        hs = np.array([simhash64(t) if t else 0 for t in texts], dtype=np.uint64)
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
    sigs = ds.map_batches(MinHasher,
                          fn_constructor_kwargs={"num_perm": num_perm,
                                                 "text_col": text_col,
                                                 "id_col": id_col},
                          batch_format="pyarrow", concurrency=(1, 8))
    band = sigs.map_batches(_band_rows,
                            fn_kwargs={"n_bands": n_bands, "id_col": id_col,
                                       "carry_text": True},
                            batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        order = np.argsort(group.column(id_col).to_numpy())
        ids = group.column(id_col).to_numpy()[order]
        texts = np.asarray(group.column("text").to_pylist(), dtype=object)[order]
        rep = _shingle_hashes(texts[0] or "")
        dup = np.zeros(len(ids), dtype=np.int8)
        for i in range(1, len(ids)):
            dup[i] = 1 if _jaccard(rep, _shingle_hashes(texts[i] or "")) >= threshold else 0
        return pa.table({id_col: pa.array(ids), "dup": pa.array(dup)})

    marked = band.groupby("band_key").map_groups(verify, batch_format="pyarrow")
    per_doc = marked.groupby(id_col).max("dup")
    return per_doc.filter(lambda r: r["max(dup)"] == 0).select_columns([id_col])


def embedding_cosine_dedup(ds: ray.data.Dataset, threshold: float = 0.95,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> ray.data.Dataset:
    """Near-dup by cosine similarity: doc is a dup iff some SMALLER id
    has cosine >= threshold.  Brute-force baseline: the full normalized
    matrix is ray.put once and each batch does one blockwise matmul
    against it (at 100 TB scale, swap the broadcast for the IVF/LSH
    bucketing in similarity.py)."""
    mat_tbl = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    tables = [ray.get(r) for r in mat_tbl]
    full = pa.concat_tables(tables)
    ids = full.column(id_col).to_numpy()
    order = np.argsort(ids)
    mat = np.vstack(full.column(vec_col).to_pylist()).astype(np.float64)[order]
    ids = ids[order]
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat_n = mat / norms
    ref = ray.put((ids, mat_n))

    def mark(batch: pa.Table) -> pa.Table:
        all_ids, m = ray.get(ref)
        bids = batch.column(id_col).to_numpy()
        v = np.vstack(batch.column(vec_col).to_pylist()).astype(np.float64)
        nv = np.linalg.norm(v, axis=1, keepdims=True)
        nv[nv == 0] = 1.0
        sims = (v / nv) @ m.T  # (batch, N)
        keep = np.ones(len(bids), dtype=bool)
        for i, bid in enumerate(bids):
            smaller = all_ids < bid
            if smaller.any() and sims[i, smaller].max() >= threshold:
                keep[i] = False
        return pa.table({id_col: pa.array(bids[keep])})

    return ds.map_batches(mark, batch_format="pyarrow", batch_size=1024)
