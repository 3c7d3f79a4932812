"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by actor-pool map_batches
stages.

The DECODE kernel is REAL for the four stdlib-parseable containers —
PNG/BMP (image), animated GIF (video stand-in), WAV (audio) — via the
pure struct/zlib header parsers in ops/media_codecs.py (CRC-verified
IHDR, full GIF block walk, RIFF chunk walk).  Pixel/sample payloads
are never decompressed: decode cost is O(header), which is exactly
what a metadata-extraction pass over 100 TB of media should pay.
`MediaDecoder(fake=True)` keeps the old hash-derived fake decode for
plumbing tests.  The resize/featurize kernels remain honestly stubbed
(`fake=False` raises — pixel resampling and model inference need
codec/model libraries this container lacks); their fake paths keep
the actor shapes testable.

Scale notes: media payloads are large, so the stage uses a SMALL
batch_size (payload bytes x batch_size x concurrency must fit the
worker heap) and an actor pool whose __init__ is where a real codec /
model load would happen (once per actor, never per batch).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray.data

from .media_codecs import (decode_media, encode_bmp, encode_gif,
                           encode_png, encode_wav)

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # image | audio | video
    ("payload", pa.binary()),        # opaque encoded bytes
    ("content_type", pa.string()),
    ("n_bytes", pa.int64()),
])


def make_fake_media_table(texts: list[str], kinds: list[str]) -> pa.Table:
    """Deterministic fake media payloads (utf-8 bytes stand in for
    encoded frames) — generator for tests/benchmarks."""
    payloads = [t.encode("utf-8") for t in texts]
    return pa.table({
        "media_id": pa.array(range(len(texts)), pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "content_type": pa.array(
            [{"image": "image/png", "audio": "audio/wav",
              "video": "video/mp4"}[k] for k in kinds]),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    })


#: deterministic geometry formulas shared with the SQL oracle
#: (pipelines/queries._media_decode_sql): media_id % 4 picks the
#: container, every dimension is integer arithmetic on media_id, so
#: the oracle states the EXPECTED metadata analytically — independent
#: of both the encoder and the decoder it gates.
_MEDIA_KINDS = ("image", "image", "video", "audio")
_MEDIA_CTYPES = ("image/png", "image/bmp", "image/gif", "audio/wav")
_WAV_RATE = 8000


def _media_params(mid: int) -> tuple:
    """(fmt_idx, width, height, n_frames, delay_cs, n_samples,
    channels) for one media_id — the single source of truth for the
    synthesizer; the oracle SQL spells the same arithmetic."""
    k = mid % 4
    if k == 0:   # png
        return k, 16 + (mid * 7) % 33, 16 + (mid * 11) % 29, 1, 0, 0, 0
    if k == 1:   # bmp
        return k, 8 + (mid * 5) % 25, 8 + (mid * 3) % 21, 1, 0, 0, 0
    if k == 2:   # animated gif (video stand-in)
        return (k, 8 + mid % 17, 8 + (mid * 13) % 15,
                1 + (mid // 4) % 5, 4 + mid % 7, 0, 0)
    # wav
    return k, 0, 0, 0, 0, 800 + (mid * 37) % 4000, 1 + mid % 2


def synth_media_payload(mid: int) -> bytes:
    """One deterministic, structurally valid container payload per
    media_id (see _media_params)."""
    k, w, h, nf, delay, ns, ch = _media_params(mid)
    seed = mid % 256
    if k == 0:
        return encode_png(w, h, seed)
    if k == 1:
        return encode_bmp(w, h, seed)
    if k == 2:
        return encode_gif(w, h, nf, delay, seed)
    return encode_wav(_WAV_RATE, ns, ch, seed)


def synth_media_batch(batch: pa.Table,
                      id_col: str = "doc_id") -> pa.Table:
    """Fixture-synthesis map_batches stage: (id) -> MEDIA_SCHEMA rows
    with REAL encoded payloads (ops/media_codecs encoders).  Encoding
    is per-row Python by nature (binary containers), but each payload
    is tiny (<=~7 KB) and the stage runs distributed."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    payloads = [synth_media_payload(int(m)) for m in ids]
    kinds = [_MEDIA_KINDS[int(m) % 4] for m in ids]
    return pa.table({
        "media_id": pa.array(ids.astype(np.int64)),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "content_type": pa.array(
            [_MEDIA_CTYPES[int(m) % 4] for m in ids], pa.string()),
        "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    })


class MediaDecoder:
    """Actor-pool decode/feature stage.

    Usage: ds.map_batches(MediaDecoder, batch_size=64,
                          concurrency=(2, 8), num_cpus=1)
    """

    def __init__(self, fake: bool = False, keep_payload: bool = False,
                 on_error: str = "raise"):
        # a heavier codec/model load would happen HERE, once per actor;
        # the stdlib header parsers need no setup
        self.fake = fake
        # keep_payload=True threads the raw bytes through for chained
        # stages (resize/featurize); drop them at the earliest stage
        # that no longer needs them — payload bytes dominate the blocks
        self.keep_payload = keep_payload
        # error tolerance for corrupt/truncated payloads (the harvest
        # M3 skip-and-count pattern applied to media): "raise" fails
        # the task; "flag" emits the row with zeroed metadata and
        # parse_ok=0 so a downstream audit can count corruption per
        # kind; "skip" drops the row silently
        if on_error not in ("raise", "flag", "skip"):
            raise ValueError(f"on_error={on_error!r}")
        self.on_error = on_error

    def _decode_real(self, payload: bytes, kind: str):
        """Header-level container parse (ops/media_codecs.decode_media:
        PNG/BMP/GIF/WAV, CRC/structure-checked).  `kind` is advisory —
        the container magic is the truth."""
        m = decode_media(payload)
        return {"width": m["width"], "height": m["height"],
                "n_frames": m["n_frames"],
                "duration_ms": m["duration_ms"]}

    def _decode_fake(self, payload: bytes, kind: str):
        h = zlib.crc32(payload)
        if kind == "image":
            return {"width": 64 + h % 1920, "height": 64 + (h >> 8) % 1080,
                    "n_frames": 1, "duration_ms": 0}
        if kind == "audio":
            return {"width": 0, "height": 0, "n_frames": 0,
                    "duration_ms": 100 + h % 600000}
        return {"width": 320 + h % 1600, "height": 240 + (h >> 8) % 840,
                "n_frames": 1 + h % 7200, "duration_ms": 1000 + h % 300000}

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        n = len(payloads)
        ok = np.ones(n, dtype=np.int8)
        if not self.fake:
            if self.on_error == "raise":
                metas = [self._decode_real(p, k)
                         for p, k in zip(payloads, kinds)]
            else:
                from .media_codecs import MediaParseError
                _Z = {"width": 0, "height": 0, "n_frames": 0,
                      "duration_ms": 0}
                metas = []
                for i, (p, k) in enumerate(zip(payloads, kinds)):
                    try:
                        metas.append(self._decode_real(p, k))
                    except MediaParseError:
                        ok[i] = 0
                        metas.append(_Z)
            width = np.array([m["width"] for m in metas], np.int64)
            height = np.array([m["height"] for m in metas], np.int64)
            n_frames = np.array([m["n_frames"] for m in metas], np.int64)
            dur = np.array([m["duration_ms"] for m in metas], np.int64)
        else:
            # vectorized fake path, bit-identical to _decode_fake: the
            # crc32 per payload stays a per-row C call (bytes are
            # opaque), all derived geometry is numpy arithmetic
            h = np.fromiter((zlib.crc32(p) for p in payloads),
                            dtype=np.int64, count=n)
            h8 = h >> 8
            kind_arr = np.asarray(kinds, dtype=object)
            is_img, is_aud = kind_arr == "image", kind_arr == "audio"
            width = np.where(is_img, 64 + h % 1920,
                             np.where(is_aud, 0, 320 + h % 1600))
            height = np.where(is_img, 64 + h8 % 1080,
                              np.where(is_aud, 0, 240 + h8 % 840))
            n_frames = np.where(is_img, 1,
                                np.where(is_aud, 0, 1 + h % 7200))
            dur = np.where(is_img, 0,
                           np.where(is_aud, 100 + h % 600000,
                                    1000 + h % 300000))
        out = pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "n_bytes": batch.column("n_bytes"),
            "width": pa.array(width),
            "height": pa.array(height),
            "n_frames": pa.array(n_frames),
            "duration_ms": pa.array(dur),
        })
        if self.keep_payload:
            out = out.append_column("payload", batch.column("payload"))
        # on_error shapes the schema in EVERY mode (round-4 ADVICE:
        # fake=True used to silently drop the flag column): the fake
        # path never fails a parse, so flag emits all-ones and skip
        # filters nothing — but the output schema is mode-independent
        if self.on_error == "flag":
            out = out.append_column("parse_ok", pa.array(ok))
        elif self.on_error == "skip" and not ok.all():
            out = out.filter(pa.array(ok.astype(bool)))
        return out


def frame_sample_indices(n_frames: int, every_n: int = 30) -> np.ndarray:
    """Deterministic frame-sampling plan for a video payload."""
    if n_frames <= 0:
        return np.empty(0, dtype=np.int64)
    return np.arange(0, n_frames, every_n, dtype=np.int64)


def frame_sample_batch(batch: pa.Table, every_n: int = 30) -> pa.Table:
    """Vectorized frame-sample plan column: for each row, the sampled
    frame indices as list<int64> (empty for non-video rows).  Stateless
    map_batches stage between decode and a real frame extractor."""
    nf = batch.column("n_frames").to_numpy(zero_copy_only=False)
    counts = np.where(nf > 0, (nf + every_n - 1) // every_n, 0).astype(np.int64)
    offsets = np.zeros(len(nf) + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    flat = (np.arange(int(counts.sum()), dtype=np.int64)
            - np.repeat(offsets[:-1], counts)) * every_n
    return batch.append_column(
        "sample_frames",
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                 pa.array(flat)))


class MediaResizer:
    """Actor-pool resize stage (decode -> RESIZE -> featurize).

    Real resampling kernels would be loaded in __init__ (PIL/ffmpeg not
    in this container — `fake=False` raises); the fake path computes
    the deterministic aspect-preserving target geometry (fit into
    max_w x max_h, never upscale), so schema, batch sizing and actor
    shape are real and tested."""

    def __init__(self, max_w: int = 512, max_h: int = 512,
                 fake: bool = False):
        self.max_w, self.max_h, self.fake = max_w, max_h, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "real resize requires imaging libraries not present in "
                "this environment; construct MediaResizer(fake=True)")
        w = batch.column("width").to_numpy(zero_copy_only=False).astype(
            np.float64)
        h = batch.column("height").to_numpy(zero_copy_only=False).astype(
            np.float64)
        scale = np.minimum(1.0, np.minimum(
            self.max_w / np.maximum(w, 1), self.max_h / np.maximum(h, 1)))
        return (batch
                .append_column("resized_w", pa.array(
                    np.maximum(1, np.floor(w * scale)).astype(np.int64)))
                .append_column("resized_h", pa.array(
                    np.maximum(1, np.floor(h * scale)).astype(np.int64))))


class MediaFeaturizer:
    """Actor-pool batched-inference stage: payload -> embedding
    (list<float32>).  A real model would be loaded once per actor in
    __init__ and run BATCHED in __call__; the fake path derives a
    deterministic unit vector from the payload bytes so downstream
    similarity/dedup plumbing can be exercised end-to-end."""

    def __init__(self, dim: int = 16, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "feature extraction requires model libraries not present "
                "in this environment; construct MediaFeaturizer(fake=True)")
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n = len(payloads)
        out = np.empty((n, self.dim), dtype=np.float32)
        for i, p in enumerate(payloads):  # per-payload: bytes are opaque
            seed = zlib.crc32(p or b"")
            out[i] = np.random.RandomState(seed).randn(self.dim)
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        out = out / np.maximum(norms, 1e-9)
        return batch.append_column(
            "embedding",
            pa.FixedSizeListArray.from_arrays(
                pa.array(out.reshape(-1)), self.dim))
