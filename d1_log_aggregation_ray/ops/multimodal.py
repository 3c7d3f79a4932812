"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by actor-pool map_batches
stages.

Every kernel is REAL for the four stdlib-parseable containers —
PNG/BMP (image), animated GIF (video stand-in), WAV (audio):

  - DECODE: header parsers in ops/media_codecs.py (CRC-verified IHDR,
    full GIF block walk, RIFF chunk walk).  Pixel/sample payloads are
    never decompressed here — metadata extraction over 100 TB of
    media should pay O(header).
  - RESIZE / FEATURIZE / PIXSTATS / AUDIOSTATS (round-5): full pixel
    and sample decodes (PNG defilter incl. all five filter types, BMP
    un-padding + BGR swap, GIF LZW + palette lookup, PCM-16 frames),
    integer nearest-neighbor resampling, and content statistics —
    value-gated by analytic SQL oracles over the planted ramp pixels.

`fake=True` on decoder/resizer/featurizer keeps the cheap hash- or
geometry-derived paths for plumbing and speed tests.

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
    frame indices as list<int64>, derived purely from the decoded
    n_frames — a single-frame image row gets [0] (its only frame),
    audio rows (n_frames == 0) get [].  Consumers that only want
    video frames gate on `kind` (FrameStats does).  Stateless
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


def resize_geometry(w: int, h: int, max_w: int, max_h: int
                    ) -> tuple[int, int]:
    """Aspect-preserving fit into max_w x max_h, never upscaling —
    in PURE INTEGER math (floor(w * s) with s = max_h/h or max_w/w
    becomes (w * max_h) // h etc.), so the SQL oracle states the SAME
    arithmetic with no float-rounding seam.  Degenerate (0, 0) inputs
    (audio rows) stay (0, 0)."""
    if w <= max_w and h <= max_h:
        return w, h
    if w * max_h <= h * max_w:               # height is the binding side
        return max(1, (w * max_h) // h), max_h
    return max_w, max(1, (h * max_w) // w)


def _nn_resize(img: np.ndarray, rw: int, rh: int) -> np.ndarray:
    """Nearest-neighbor resample to (rh, rw): source index
    (i * src) // dst — the standard floor rule, integer-exact."""
    h, w = img.shape[:2]
    if (rw, rh) == (w, h):
        return img
    rows = (np.arange(rh, dtype=np.int64) * h) // rh
    cols = (np.arange(rw, dtype=np.int64) * w) // rw
    return img[rows][:, cols]


class MediaResizer:
    """Actor-pool resize stage (decode -> RESIZE -> featurize): REAL
    pixel path by default (round-5) — full container pixel decode
    (ops/media_codecs.decode_pixels: PNG defilter incl. all 5 filter
    types, BMP row un-padding + BGR swap, GIF LZW + palette), integer
    nearest-neighbor resample, and an exact int64 `px_sum` over the
    resized RGB bytes (the value the analytic SQL oracle re-derives
    from the planted ramp pixels).  Audio rows pass through with
    (0, 0, 0).  `fake=True` keeps a geometry-only path (same integer
    target math, px_sum=0) for plumbing/speed tests.

    The per-payload decode is per-row Python by nature (bytes are
    opaque to Arrow); a production deployment swaps decode_pixels for
    a C codec loaded HERE once per actor — the stage shape (small
    batches, init-once actor pool, payload dropped at the earliest
    stage that no longer needs it) is exactly what that needs."""

    def __init__(self, max_w: int = 512, max_h: int = 512,
                 fake: bool = False):
        self.max_w, self.max_h, self.fake = max_w, max_h, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if self.fake:
            # vectorized mirror of resize_geometry (the speed-test
            # path must not pay a per-row Python loop); max(h, 1)
            # divisors guard the audio (0, 0) rows whose branch never
            # selects the division result
            w = batch.column("width").to_numpy(
                zero_copy_only=False).astype(np.int64)
            h = batch.column("height").to_numpy(
                zero_copy_only=False).astype(np.int64)
            mw, mh = self.max_w, self.max_h
            fits = (w <= mw) & (h <= mh)
            hbound = w * mh <= h * mw
            rw = np.where(fits, w, np.where(
                hbound,
                np.maximum(1, (w * mh) // np.maximum(h, 1)), mw))
            rh = np.where(fits, h, np.where(
                hbound, mh,
                np.maximum(1, (h * mw) // np.maximum(w, 1))))
            px_sum = np.zeros(n, np.int64)
        else:
            from .media_codecs import decode_pixels
            payloads = batch.column("payload").to_pylist()
            kinds = batch.column("kind").to_pylist()
            rw = np.zeros(n, np.int64)
            rh = np.zeros(n, np.int64)
            px_sum = np.zeros(n, np.int64)
            for i, (p, k) in enumerate(zip(payloads, kinds)):
                if k == "audio":
                    continue
                img = decode_pixels(p)
                tw, th = resize_geometry(img.shape[1], img.shape[0],
                                         self.max_w, self.max_h)
                resized = _nn_resize(img, tw, th)
                rw[i], rh[i] = tw, th
                px_sum[i] = int(resized.sum(dtype=np.int64))
        return (batch
                .append_column("resized_w", pa.array(rw))
                .append_column("resized_h", pa.array(rh))
                .append_column("px_sum", pa.array(px_sum)))


class MediaFeaturizer:
    """Actor-pool batched-inference stage: payload -> embedding
    (fixed list<float32>, unit norm).  REAL content path by default
    (round-5): images/video decode to pixels and featurize on actual
    pixel statistics (per-channel means/stds, gray quartile histogram,
    log-geometry), audio decodes PCM samples (mean/std/RMS/zero-cross
    rate/duration).  Deterministic per item and independent of
    batching, so chained goldens pin stably.  A heavier learned model
    would be loaded once per actor HERE and run batched; `fake=True`
    keeps the old crc-seeded random vector for plumbing tests."""

    def __init__(self, dim: int = 16, fake: bool = False):
        if dim < 16 and not fake:
            raise ValueError("real featurizer emits 16 features")
        self.dim = dim
        self.fake = fake

    def _feat_real(self, payload: bytes, kind: str) -> np.ndarray:
        from .media_codecs import decode_pixels, decode_wav_samples
        f = np.zeros(self.dim, dtype=np.float64)
        if kind == "audio":
            arr, rate = decode_wav_samples(payload)
            x = arr.astype(np.float64).reshape(-1) / 32768.0
            f[0] = 1.0                        # modality flag
            f[1] = x.mean()
            f[2] = x.std()
            f[3] = np.sqrt(np.mean(x * x))    # RMS
            f[4] = np.abs(x).max(initial=0.0)
            f[5] = float(np.count_nonzero(np.signbit(x[1:])
                                          != np.signbit(x[:-1]))) \
                / max(len(x) - 1, 1)          # zero-crossing rate
            f[6] = np.log1p(arr.shape[0])     # frames
            f[7] = arr.shape[1]               # channels
            f[8] = np.log1p(rate)
        else:
            img = decode_pixels(payload).astype(np.float64) / 255.0
            ch = img.reshape(-1, 3)
            f[0:3] = ch.mean(axis=0)          # mean R,G,B
            f[3:6] = ch.std(axis=0)           # std R,G,B
            gray = ch.mean(axis=1)
            hist, _ = np.histogram(gray, bins=4, range=(0.0, 1.0))
            f[6:10] = hist / max(len(gray), 1)
            h, w = img.shape[:2]
            f[10] = np.log1p(w)
            f[11] = np.log1p(h)
            f[12] = w / max(h, 1)             # aspect
            f[13] = gray.min(initial=1.0)   # gray in [0,1]: identity
            f[14] = gray.max(initial=0.0)   # guards for both bounds
            f[15] = 1.0 if kind == "video" else 0.0
        return f

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        n = len(payloads)
        out = np.empty((n, self.dim), dtype=np.float64)
        if self.fake:
            for i, p in enumerate(payloads):  # per-payload: bytes opaque
                seed = zlib.crc32(p or b"")
                out[i] = np.random.RandomState(seed).randn(self.dim)
        else:
            kinds = batch.column("kind").to_pylist()
            for i, (p, k) in enumerate(zip(payloads, kinds)):
                out[i] = self._feat_real(p, k)
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        out = (out / np.maximum(norms, 1e-9)).astype(np.float32)
        return batch.append_column(
            "embedding",
            pa.FixedSizeListArray.from_arrays(
                pa.array(out.reshape(-1)), self.dim))


class MediaPixStats:
    """Actor-pool pixel-statistics stage: payload -> exact int64
    per-channel sums over the REAL decoded pixels — (n_px, sum_r,
    sum_g, sum_b), zeros for audio rows.  Integer-exact, so the
    registry oracle states the planted ramp arithmetic in SQL and the
    whole pixel path (defilter / un-pad / LZW / palette / BGR swap)
    is value-gated end-to-end."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .media_codecs import decode_pixels
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        n = len(payloads)
        n_px = np.zeros(n, np.int64)
        sums = np.zeros((n, 3), np.int64)
        for i, (p, k) in enumerate(zip(payloads, kinds)):
            if k == "audio":
                continue
            img = decode_pixels(p)
            n_px[i] = img.shape[0] * img.shape[1]
            sums[i] = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "n_px": pa.array(n_px),
            "sum_r": pa.array(sums[:, 0]),
            "sum_g": pa.array(sums[:, 1]),
            "sum_b": pa.array(sums[:, 2]),
        })


class AudioResampler:
    """Actor-pool sample-rate conversion — the audio sibling of
    MediaResizer: decode PCM-16 frames, nearest-neighbor resample to
    `target_rate` (source frame index (f * src_rate) // target_rate —
    the same integer floor rule as the pixel path, so values stay
    EXACT int16 and the SQL oracle restates the arithmetic), and emit
    (media_id, out_frames, n_channels, samp_sum) over the RESAMPLED
    signal.  Non-audio rows emit zeros.  A production pipeline would
    swap the NN gather for a polyphase filter loaded once per actor —
    the stage shape is identical."""

    def __init__(self, target_rate: int = 3000):
        if target_rate <= 0:
            raise ValueError("target_rate must be positive")
        self.target_rate = target_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .media_codecs import decode_wav_samples
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        n = len(payloads)
        out_frames = np.zeros(n, np.int64)
        n_ch = np.zeros(n, np.int64)
        samp_sum = np.zeros(n, np.int64)
        for i, (p, k) in enumerate(zip(payloads, kinds)):
            if k != "audio":
                continue
            arr, rate = decode_wav_samples(p)
            nf = (arr.shape[0] * self.target_rate) // rate
            src = (np.arange(nf, dtype=np.int64) * rate) \
                // self.target_rate
            res = arr[src]
            out_frames[i] = nf
            n_ch[i] = arr.shape[1]
            samp_sum[i] = int(res.sum(dtype=np.int64))
        return pa.table({
            "media_id": batch.column("media_id"),
            "out_frames": pa.array(out_frames),
            "n_channels": pa.array(n_ch),
            "samp_sum": pa.array(samp_sum),
        })


class FrameStats:
    """Actor-pool frame extractor — the REAL consumer of the
    frame-sampling plan (frame_sample_batch): for each video row,
    decode exactly the planned frames (per-frame LZW, not the whole
    file) and emit one row per sampled frame with its exact int64
    pixel sum: (media_id, frame_idx, px_sum).  Non-video rows emit
    nothing.  This is the shape of a production video pipeline's
    keyframe pass: plan cheaply from metadata, decode only the
    sampled frames."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .media_codecs import (MediaParseError, _gif_decode_frame,
                                   _gif_frame_streams)
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        plans = batch.column("sample_frames").to_pylist()
        mids = batch.column("media_id").to_pylist()
        out_mid: list[int] = []
        out_fi: list[int] = []
        out_ps: list[int] = []
        for mid, p, k, plan in zip(mids, payloads, kinds, plans):
            if k != "video" or not plan:
                continue
            # walk the container ONCE per payload, then decode only
            # the planned frames — O(file + sampled frames), not a
            # re-walk per frame
            frames = _gif_frame_streams(p)
            for fi in plan:
                if not 0 <= int(fi) < len(frames):
                    raise MediaParseError(
                        f"planned frame {fi} out of range "
                        f"({len(frames)} frames)")
                px = _gif_decode_frame(frames[int(fi)])
                out_mid.append(int(mid))
                out_fi.append(int(fi))
                out_ps.append(int(px.sum(dtype=np.int64)))
        return pa.table({
            "media_id": pa.array(out_mid, pa.int64()),
            "frame_idx": pa.array(out_fi, pa.int64()),
            "px_sum": pa.array(out_ps, pa.int64()),
        })


class AudioStats:
    """Actor-pool PCM-sample statistics: payload -> exact int64
    (n_frames, n_channels, samp_sum) over the REAL decoded int16
    samples; zeros for non-audio rows.  samp_sum is an integer sum of
    signed samples — the SQL oracle restates the ramp-byte -> int16
    arithmetic analytically."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .media_codecs import decode_wav_samples
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        n = len(payloads)
        n_frames = np.zeros(n, np.int64)
        n_ch = np.zeros(n, np.int64)
        samp_sum = np.zeros(n, np.int64)
        for i, (p, k) in enumerate(zip(payloads, kinds)):
            if k != "audio":
                continue
            arr, _ = decode_wav_samples(p)
            n_frames[i] = arr.shape[0]
            n_ch[i] = arr.shape[1]
            samp_sum[i] = int(arr.sum(dtype=np.int64))
        return pa.table({
            "media_id": batch.column("media_id"),
            "n_frames": pa.array(n_frames),
            "n_channels": pa.array(n_ch),
            "samp_sum": pa.array(samp_sum),
        })
