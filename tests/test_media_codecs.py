"""Real stdlib media codecs (ops/media_codecs.py): decoder checks
against HANDCRAFTED byte fixtures (independent of the encoders),
encoder->decoder round trips, corruption gates, and the distributed
decode query against the analytic formulas."""

import struct

import pytest

from d1_log_aggregation_ray.ops.media_codecs import (
    MediaParseError, decode_media, encode_bmp, encode_gif, encode_png,
    encode_wav, parse_bmp, parse_gif, parse_png, parse_wav, sniff_format)

# the widely-published minimal 1x1 RGBA PNG header (sig + IHDR with
# its canonical CRC 0x1F15C489) — bytes written out by hand, NOT
# produced by encode_png
_PNG_1x1 = (b"\x89PNG\r\n\x1a\n"
            b"\x00\x00\x00\x0dIHDR"
            b"\x00\x00\x00\x01\x00\x00\x00\x01\x08\x06\x00\x00\x00"
            b"\x1f\x15\xc4\x89")


def test_parse_png_handcrafted():
    m = parse_png(_PNG_1x1)
    assert (m["width"], m["height"], m["n_frames"],
            m["duration_ms"]) == (1, 1, 1, 0)


def test_parse_png_crc_gate():
    bad = bytearray(_PNG_1x1)
    bad[20] ^= 0x01  # flip a width bit without fixing the CRC
    with pytest.raises(MediaParseError, match="CRC"):
        parse_png(bytes(bad))


def test_parse_gif_handcrafted():
    # hand-built GIF89a: 2x3 screen, no GCT, one frame, no GCE
    gif = (b"GIF89a" + struct.pack("<HH", 2, 3) + b"\x00\x00\x00"
           + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 3) + b"\x00"
           + b"\x02" + b"\x01\x44\x00"   # min code 2; 1 sub-block; term
           + b"\x3b")
    m = parse_gif(gif)
    assert (m["width"], m["height"], m["n_frames"],
            m["duration_ms"]) == (2, 3, 1, 0)


def test_parse_bmp_handcrafted_topdown():
    # negative height = top-down BMP; parser reports abs(height)
    dib = struct.pack("<IiiHHIIiiII", 40, 5, -7, 1, 24, 0, 0, 0, 0, 0, 0)
    bmp = struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54) + dib
    m = parse_bmp(bmp)
    assert (m["width"], m["height"]) == (5, 7)


def test_parse_wav_handcrafted_chunk_order_and_padding():
    # data chunk BEFORE fmt, with an ODD size (RIFF pads to even) —
    # exercises the chunk walk, not just the happy layout
    data = b"\x01" * 7
    fmt = struct.pack("<HHIIHH", 1, 1, 1000, 2000, 2, 16)
    body = (b"WAVE"
            + b"data" + struct.pack("<I", len(data)) + data + b"\x00"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"LIST" + struct.pack("<I", 4) + b"INFO")  # foreign chunk
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    m = parse_wav(wav)
    assert m["n_frames"] == 7 // 2 == 3
    assert m["duration_ms"] == 3 * 1000 // 1000


@pytest.mark.parametrize("w,h,seed", [(1, 1, 0), (48, 44, 255),
                                      (16, 29, 7), (33, 16, 128)])
def test_png_roundtrip(w, h, seed):
    m = parse_png(encode_png(w, h, seed))
    assert (m["width"], m["height"]) == (w, h)


@pytest.mark.parametrize("w,h", [(1, 1), (25, 21), (8, 28), (32, 8)])
def test_bmp_roundtrip(w, h):
    m = parse_bmp(encode_bmp(w, h, 9))
    assert (m["width"], m["height"]) == (w, h)


@pytest.mark.parametrize("w,h,nf,delay", [(1, 1, 1, 0), (24, 22, 5, 10),
                                          (8, 8, 3, 4), (17, 9, 2, 6)])
def test_gif_roundtrip(w, h, nf, delay):
    m = parse_gif(encode_gif(w, h, nf, delay, seed=3))
    assert (m["width"], m["height"], m["n_frames"],
            m["duration_ms"]) == (w, h, nf, nf * delay * 10)


@pytest.mark.parametrize("rate,ns,ch", [(8000, 800, 1), (8000, 4799, 2),
                                        (44100, 44100, 2), (1, 1, 1)])
def test_wav_roundtrip(rate, ns, ch):
    m = parse_wav(encode_wav(rate, ns, ch, seed=11))
    assert m["n_frames"] == ns
    assert m["duration_ms"] == ns * 1000 // rate


def test_sniff_and_dispatch():
    payloads = {"png": encode_png(2, 2), "bmp": encode_bmp(2, 2),
                "gif": encode_gif(2, 2), "wav": encode_wav(8000, 10)}
    for fmt, p in payloads.items():
        assert sniff_format(p) == fmt
        assert decode_media(p)["format"] == fmt
    assert sniff_format(b"\x00\x01garbage") is None
    with pytest.raises(MediaParseError, match="magic"):
        decode_media(b"not media at all")


def test_truncation_gates():
    with pytest.raises(MediaParseError):
        parse_gif(encode_gif(4, 4, 2, 5)[:-10])  # cut inside LZW blocks
    with pytest.raises(MediaParseError):
        parse_png(encode_png(4, 4)[:20])
    with pytest.raises(MediaParseError):
        parse_wav(b"RIFF\x04\x00\x00\x00WAVE")   # no fmt/data chunks
    with pytest.raises(MediaParseError):
        parse_bmp(b"BM" + b"\x00" * 30)          # bogus DIB size 0


def test_media_decode_query_matches_analytic_formulas(ray_session):
    """Distributed synth -> real decode equals the _media_params
    arithmetic recomputed here per row (the same truth the SQL oracle
    states) — covers the Ray plumbing without DuckDB."""
    from d1_log_aggregation_ray.ops.multimodal import _media_params
    from d1_log_aggregation_ray.pipelines.queries import RAY_QUERIES
    rows = RAY_QUERIES["media_decode"]("/root/testdata/sf0.001").take_all()
    assert len(rows) == 500
    kinds = ("image", "image", "video", "audio")
    for r in rows:
        mid = r["media_id"]
        k, w, h, nf, delay, ns, ch = _media_params(mid)
        assert r["kind"] == kinds[k]
        if k in (0, 1):
            exp = (w, h, 1, 0)
        elif k == 2:
            exp = (w, h, nf, nf * delay * 10)
        else:
            exp = (0, 0, ns, ns * 1000 // 8000)
        got = (r["width"], r["height"], r["n_frames"], r["duration_ms"])
        assert got == exp, (mid, got, exp)


def test_media_decoder_on_error_modes():
    """Corrupt payloads: 'raise' fails, 'flag' emits parse_ok=0 with
    zeroed metadata, 'skip' drops the row — the harvest M3 pattern on
    binary columns.  Direct __call__ (no Ray needed)."""
    import numpy as np
    import pyarrow as pa

    from d1_log_aggregation_ray.ops.multimodal import MediaDecoder

    good = encode_png(5, 7)
    bad = good[:10]
    batch = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "kind": pa.array(["image", "image"]),
        "payload": pa.array([good, bad], pa.binary()),
        "content_type": pa.array(["image/png"] * 2),
        "n_bytes": pa.array([len(good), len(bad)], pa.int64()),
    })
    with pytest.raises(MediaParseError):
        MediaDecoder()(batch)
    flagged = MediaDecoder(on_error="flag")(batch)
    rows = {r["media_id"]: r for r in flagged.to_pylist()}
    assert rows[0]["parse_ok"] == 1 and rows[0]["width"] == 5
    assert rows[1]["parse_ok"] == 0 and rows[1]["width"] == 0
    skipped = MediaDecoder(on_error="skip")(batch)
    assert skipped.column("media_id").to_pylist() == [0]
    with pytest.raises(ValueError):
        MediaDecoder(on_error="bogus")


# ---- property tests: random geometry round trips (hypothesis) ----

from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(w=st.integers(1, 200), h=st.integers(1, 200),
       seed=st.integers(0, 255))
def test_png_roundtrip_property(w, h, seed):
    m = parse_png(encode_png(w, h, seed))
    assert (m["width"], m["height"]) == (w, h)


@settings(max_examples=40, deadline=None)
@given(w=st.integers(1, 100), h=st.integers(1, 100),
       seed=st.integers(0, 255))
def test_bmp_roundtrip_property(w, h, seed):
    m = parse_bmp(encode_bmp(w, h, seed))
    assert (m["width"], m["height"]) == (w, h)


@settings(max_examples=30, deadline=None)
@given(w=st.integers(1, 40), h=st.integers(1, 40),
       nf=st.integers(1, 8), delay=st.integers(0, 100),
       seed=st.integers(0, 255))
def test_gif_roundtrip_property(w, h, nf, delay, seed):
    m = parse_gif(encode_gif(w, h, nf, delay, seed))
    assert (m["width"], m["height"], m["n_frames"],
            m["duration_ms"]) == (w, h, nf, nf * delay * 10)


@settings(max_examples=40, deadline=None)
@given(rate=st.integers(1, 96_000), ns=st.integers(1, 10_000),
       ch=st.integers(1, 4), seed=st.integers(0, 255))
def test_wav_roundtrip_property(rate, ns, ch, seed):
    m = parse_wav(encode_wav(rate, ns, ch, seed))
    assert m["n_frames"] == ns
    assert m["duration_ms"] == ns * 1000 // rate


def test_decode_media_normalizes_low_level_errors():
    """Exotic truncations that hit struct.unpack raise MediaParseError
    (not struct.error) through decode_media, so on_error='flag'/'skip'
    never crashes the task (review finding, round 4)."""
    wav_mid_fmt = encode_wav(8000, 10)[:20]   # cut inside fmt chunk
    with pytest.raises(MediaParseError):
        decode_media(wav_mid_fmt)
    gif_mid_gce = encode_gif(4, 4, 1, 5)[:25]  # cut inside the GCE
    with pytest.raises(MediaParseError):
        decode_media(gif_mid_gce)

    # and the decoder's flag path survives both
    import pyarrow as pa

    from d1_log_aggregation_ray.ops.multimodal import MediaDecoder
    batch = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "kind": pa.array(["audio", "video"]),
        "payload": pa.array([wav_mid_fmt, gif_mid_gce], pa.binary()),
        "content_type": pa.array(["audio/wav", "image/gif"]),
        "n_bytes": pa.array([20, 25], pa.int64()),
    })
    out = MediaDecoder(on_error="flag")(batch)
    assert out.column("parse_ok").to_pylist() == [0, 0]


def test_wav_size_lie_and_gif_missing_trailer_rejected():
    """A WAV whose data chunk declares more bytes than the payload
    holds (truncated file or lying header) must FAIL, not report
    inflated frames; a GIF cut cleanly between blocks (no 0x3B
    trailer) must fail rather than return a partial frame count."""
    import struct as _s
    wav = bytearray(encode_wav(1000, 100))
    # inflate the data-chunk size field 10x (data chunk is last)
    pos = wav.rfind(b"data")
    (real,) = _s.unpack_from("<I", wav, pos + 4)
    _s.pack_into("<I", wav, pos + 4, real * 10)
    with pytest.raises(MediaParseError, match="declares"):
        parse_wav(bytes(wav))
    # truncate a valid WAV inside its data chunk
    with pytest.raises(MediaParseError):
        parse_wav(encode_wav(1000, 100)[:-50])

    gif = encode_gif(4, 4, 2, 5)
    assert parse_gif(gif)["n_frames"] == 2
    # drop the trailer byte: a clean between-block truncation
    with pytest.raises(MediaParseError, match="trailer"):
        parse_gif(gif[:-1])


def test_media_decoder_fake_flag_schema_mode_independent():
    """fake=True must honor on_error the same way the real path does
    (round-4 ADVICE): flag mode emits parse_ok (all ones — the fake
    path never fails), so downstream schemas don't depend on fake."""
    from d1_log_aggregation_ray.ops.multimodal import (MediaDecoder,
                                                       make_fake_media_table)
    batch = make_fake_media_table(["a", "b"], ["image", "audio"])
    out = MediaDecoder(fake=True, on_error="flag")(batch)
    assert "parse_ok" in out.schema.names
    assert out.column("parse_ok").to_pylist() == [1, 1]
    skipped = MediaDecoder(fake=True, on_error="skip")(batch)
    assert skipped.num_rows == 2 and "parse_ok" not in skipped.schema.names


# ---------------------------------------------------------------------------
# round-5: full pixel/sample decoders
# ---------------------------------------------------------------------------

def test_png_pixels_round_trip_ramp():
    import numpy as np
    from d1_log_aggregation_ray.ops.media_codecs import (decode_png_pixels,
                                                         encode_png)
    w, h, seed = 19, 11, 37
    px = decode_png_pixels(encode_png(w, h, seed))
    exp = np.tile(((seed + np.arange(w * 3)) % 256).astype(
        np.uint8).reshape(1, w, 3), (h, 1, 1))
    assert px.shape == (h, w, 3) and (px == exp).all()


def test_png_defilter_all_five_filters():
    """Independent forward-filter encoder (test-local, per spec) ->
    decode must invert every filter type 0-4."""
    import struct
    import zlib

    import numpy as np

    from d1_log_aggregation_ray.ops.media_codecs import (_PNG_SIG,
                                                         decode_png_pixels)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    def forward_filter(img):
        h, w, _ = img.shape
        stride = w * 3
        flat = img.reshape(h, stride).astype(np.int64)
        out = bytearray()
        for y in range(h):
            f = y % 5
            cur = flat[y]
            prior = flat[y - 1] if y else np.zeros(stride, np.int64)
            raw = np.empty(stride, np.int64)
            for x in range(stride):
                a = cur[x - 3] if x >= 3 else 0
                b = prior[x]
                c = prior[x - 3] if x >= 3 else 0
                if f == 0:
                    pred = 0
                elif f == 1:
                    pred = a
                elif f == 2:
                    pred = b
                elif f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                        (b if pb_ <= pc_ else c)
                raw[x] = (cur[x] - pred) & 255
            out.append(f)
            out += raw.astype(np.uint8).tobytes()
        return bytes(out)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(10, 7, 3), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 7, 10, 8, 2, 0, 0, 0)
    payload = (_PNG_SIG + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(forward_filter(img)))
               + chunk(b"IEND", b""))
    assert (decode_png_pixels(payload) == img).all()


def test_bmp_pixels_bottom_up_and_bgr():
    import numpy as np
    from d1_log_aggregation_ray.ops.media_codecs import (decode_bmp_pixels,
                                                         encode_bmp)
    w, h, seed = 13, 9, 201
    px = decode_bmp_pixels(encode_bmp(w, h, seed))
    exp = np.empty((h, w, 3), np.uint8)
    for r in range(h):
        y = h - 1 - r                      # bottom-up storage
        exp[r] = ((seed + y + np.arange(w * 3)) % 256).astype(
            np.uint8).reshape(w, 3)[:, ::-1]   # BGR -> RGB
    assert (px == exp).all()


def test_gif_pixels_real_lzw_palette():
    import numpy as np
    from d1_log_aggregation_ray.ops.media_codecs import (decode_gif_pixels,
                                                         encode_gif)
    w, h, seed = 17, 12, 99
    px = decode_gif_pixels(encode_gif(w, h, 3, 5, seed))
    col = np.array([seed % 256, (seed + 29) % 256, (seed + 58) % 256],
                   np.uint8)
    assert px.shape == (h, w, 3) and (px == col).all()


def test_wav_samples_signed_int16():
    import numpy as np
    from d1_log_aggregation_ray.ops.media_codecs import (
        decode_wav_samples, encode_wav)
    ns, ch, seed, rate = 50, 2, 7, 8000
    arr, r = decode_wav_samples(encode_wav(rate, ns, ch, seed))
    assert r == rate and arr.shape == (ns, ch)
    b = ((seed + 7 * np.arange(ns * ch * 2)) % 256).astype(np.uint8)
    exp = np.frombuffer(b.tobytes(), "<i2")
    assert (arr.reshape(-1) == exp).all()


def test_pixel_decoders_reject_malformed():
    import pytest

    from d1_log_aggregation_ray.ops.media_codecs import (
        MediaParseError, decode_pixels, decode_png_pixels, encode_png,
        encode_wav)
    with pytest.raises(MediaParseError):
        decode_pixels(b"not a container")
    with pytest.raises(MediaParseError):
        decode_pixels(encode_wav(8000, 10))       # audio has no pixels
    good = encode_png(6, 5, 1)
    with pytest.raises(MediaParseError):          # corrupt IDAT CRC
        bad = bytearray(good)
        bad[-20] ^= 0xFF
        decode_png_pixels(bytes(bad))
    with pytest.raises(MediaParseError):          # truncated
        decode_png_pixels(good[:40])


def test_gif_per_frame_decode():
    """Per-frame extraction (the frame-sampling consumer): every
    frame of the planted GIF decodes to the uniform palette color;
    out-of-range frame indices raise."""
    import numpy as np
    import pytest

    from d1_log_aggregation_ray.ops.media_codecs import (
        MediaParseError, decode_gif_frame_pixels, decode_gif_pixels,
        encode_gif)
    p = encode_gif(9, 6, 4, 3, 17)
    col = np.array([17, 46, 75], np.uint8)
    for fi in range(4):
        f = decode_gif_frame_pixels(p, fi)
        assert f.shape == (6, 9, 3) and (f == col).all()
    assert (decode_gif_pixels(p) == col).all()
    with pytest.raises(MediaParseError):
        decode_gif_frame_pixels(p, 4)


def test_media_embed_knn_matches_independent_reference():
    """The pin-time double-gate, run in CI too (mirrors test_bpe's
    pattern): the engine's decode -> featurize -> cosine-top-k must
    equal the codec-free analytic reference on every test run, not
    only when goldens are regenerated."""
    import pyarrow.parquet as pq

    from media_feat_reference import ref_media_embed_knn

    from d1_log_aggregation_ray.pipelines.queries import RAY_QUERIES

    sf = "/root/testdata/sf0.001"
    ids = pq.read_table(sf + "/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_pylist()
    ref = ref_media_embed_knn(ids)
    eng = sorted([int(r["media_id"]), int(r["score_q"])] for r in
                 RAY_QUERIES["media_embed_knn"](sf).to_pylist())
    assert eng == ref and len(ref) == 10


def test_audio_resampler_nn_rule():
    """NN sample-rate conversion: resampled values are exact source
    int16s at (f*src)//dst, verified against a direct numpy gather."""
    import numpy as np

    from d1_log_aggregation_ray.ops.media_codecs import decode_wav_samples
    from d1_log_aggregation_ray.ops.multimodal import (AudioResampler,
                                                       synth_media_batch)
    import pyarrow as pa
    ids = pa.table({"doc_id": pa.array([3, 7, 0], pa.int64())})
    media = synth_media_batch(ids)
    out = {r["media_id"]: r for r in
           AudioResampler(target_rate=3000)(media).to_pylist()}
    for mid in (3, 7):
        arr, rate = decode_wav_samples(
            media.filter(pa.compute.equal(media.column("media_id"),
                                          mid)).column("payload")[0]
            .as_py())
        nf = (arr.shape[0] * 3000) // rate
        src = (np.arange(nf, dtype=np.int64) * rate) // 3000
        assert out[mid]["out_frames"] == nf
        assert out[mid]["samp_sum"] == int(arr[src].sum(dtype=np.int64))
    assert out[0] == {"media_id": 0, "out_frames": 0,
                      "n_channels": 0, "samp_sum": 0}
