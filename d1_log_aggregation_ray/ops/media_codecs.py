"""Pure-stdlib media container codecs (struct/zlib only).

Real header-level ENCODERS + DECODERS for the four container formats a
no-codec-library environment can still handle honestly:

  - PNG  : signature + IHDR (width/height, CRC-verified) + zlib IDAT
  - BMP  : BITMAPFILEHEADER + BITMAPINFOHEADER (also COREHEADER reads)
  - GIF  : GIF89a logical screen descriptor + full block walk — frame
           count = image descriptors, duration = sum of GCE delays
           (animated GIF is the repo's honest stand-in for video)
  - WAV  : RIFF chunk walk — fmt (rate/channels/bits) + data size ->
           sample-frame count and duration

The encoders emit STRUCTURALLY VALID files (correct CRCs, padded BMP
rows, well-formed LZW sub-blocks, even-padded RIFF chunks), generated
deterministically from (geometry, seed) so an analytic oracle can
state the expected metadata without running the decoder.  The decoders
parse headers only — pixel/sample payloads are never decompressed, so
decode cost is O(header + block walk), not O(pixels).

This is the `MediaDecoder._decode_real` kernel (ops/multimodal.py):
the Ray-side plumbing stays the same actor-pool map_batches stage; the
per-payload parse is necessarily per-row Python (bytes are opaque to
Arrow), but each parse is a handful of struct.unpack_from calls.

Reference analog: none (DataONEorg/d1_log_aggregation has no media) —
this family comes from the builder's brief (multimodal columns as
first-class binary + typed metadata).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _ramp_bytes(n: int, seed: int, step: int = 1) -> bytes:
    """(seed + i*step) % 256 for i in range(n) — numpy, not a python
    byte loop (payload synthesis dominates the media bench without
    this)."""
    return ((seed + np.arange(n, dtype=np.int64) * step) % 256).astype(
        np.uint8).tobytes()


# ---------------------------------------------------------------------------
# encoders (fixture generators)
# ---------------------------------------------------------------------------

def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal valid 8-bit RGB PNG: IHDR + one zlib IDAT (filter-0
    scanlines, deterministic pixel bytes) + IEND."""
    if width <= 0 or height <= 0:
        raise ValueError("png geometry must be positive")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = _ramp_bytes(width * 3, seed)
    raw = b"".join(b"\x00" + row for _ in range(height))
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b""))


def encode_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal valid 24-bpp bottom-up BMP (BITMAPINFOHEADER), rows
    padded to 4 bytes per spec."""
    if width <= 0 or height <= 0:
        raise ValueError("bmp geometry must be positive")
    row_bytes = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_bytes - width * 3)
    pix = bytearray()
    for y in range(height):
        pix += _ramp_bytes(width * 3, seed + y) + pad
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pix), 2835, 2835, 0, 0)
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(pix), 0, 0, off)
    return hdr + dib + bytes(pix)


def _gif_lzw_uniform(n_pixels: int) -> bytes:
    """Valid LZW stream (min code size 2) for `n_pixels` color-0
    pixels: a CLEAR before every literal keeps the code width at the
    initial 3 bits, so packing is a fixed-width little-endian roll —
    spec-correct and trivially verifiable."""
    CLEAR, END = 4, 5
    codes = np.zeros(2 * n_pixels + 2, dtype=np.uint8)
    codes[0::2] = CLEAR              # CLEAR before every literal 0
    codes[-1] = END                  # final CLEAR slot becomes END
    # fixed 3-bit little-endian packing, vectorized: 3 bits per code,
    # LSB first, then packbits(bitorder='little')
    bits = ((codes[:, None] >> np.arange(3, dtype=np.uint8)) & 1
            ).astype(np.uint8).reshape(-1)
    return np.packbits(bits, bitorder="little").tobytes()


def _sub_blocks(data: bytes) -> bytes:
    """GIF data sub-block framing: <=255-byte length-prefixed chunks +
    zero terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(width: int, height: int, n_frames: int = 1,
               delay_cs: int = 4, seed: int = 0) -> bytes:
    """Valid animated GIF89a: logical screen descriptor + 4-entry
    global color table + per frame (graphic control extension carrying
    `delay_cs` centiseconds + full-frame image descriptor + LZW data)
    + trailer.  Deterministic: the color table derives from `seed`."""
    if width <= 0 or height <= 0 or n_frames <= 0:
        raise ValueError("gif geometry/frames must be positive")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x91, 0, 0])  # GCT present, 4 entries; bg 0; aspect 0
    for i in range(4):          # 4-entry global color table
        out += bytes(((seed + i * 67 + ch * 29) % 256) for ch in range(3))
    lzw = _sub_blocks(_gif_lzw_uniform(width * height))
    for _ in range(n_frames):
        out += bytes([0x21, 0xF9, 0x04, 0x00])          # GCE
        out += struct.pack("<H", delay_cs) + bytes([0x00, 0x00])
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, width, height)
        out += bytes([0x00, 0x02])                      # no LCT; min code 2
        out += lzw
    out += b"\x3B"
    return bytes(out)


def encode_wav(sample_rate: int, n_samples: int, channels: int = 1,
               seed: int = 0) -> bytes:
    """Valid PCM-16 RIFF/WAVE: fmt chunk + data chunk with
    deterministic sample bytes (even-padded per RIFF spec)."""
    if sample_rate <= 0 or n_samples <= 0 or channels <= 0:
        raise ValueError("wav params must be positive")
    bits = 16
    block = channels * bits // 8
    data = _ramp_bytes(n_samples * block, seed, step=7)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, bits)
    body = bytearray(b"WAVE")
    for tag, payload in ((b"fmt ", fmt), (b"data", data)):
        body += tag + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)


# ---------------------------------------------------------------------------
# decoders (header parsers)
# ---------------------------------------------------------------------------

class MediaParseError(ValueError):
    """Raised on malformed/truncated container bytes."""


def sniff_format(payload: bytes) -> str | None:
    """Container format from magic bytes: png | bmp | gif | wav, or
    None when unrecognized."""
    if payload.startswith(_PNG_SIG):
        return "png"
    if payload.startswith(b"BM"):
        return "bmp"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


def parse_png(payload: bytes) -> dict:
    """PNG IHDR parse with CRC verification (the corruption gate a
    real ingest needs); IDAT is never decompressed."""
    if not payload.startswith(_PNG_SIG) or len(payload) < 33:
        raise MediaParseError("not a PNG")
    (length,) = struct.unpack_from(">I", payload, 8)
    tag = payload[12:16]
    if tag != b"IHDR" or length != 13:
        raise MediaParseError("PNG first chunk is not IHDR")
    data = payload[16:29]
    (crc,) = struct.unpack_from(">I", payload, 29)
    if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
        raise MediaParseError("PNG IHDR CRC mismatch")
    w, h = struct.unpack_from(">II", data, 0)
    return {"format": "png", "width": int(w), "height": int(h),
            "n_frames": 1, "duration_ms": 0}


def parse_bmp(payload: bytes) -> dict:
    """BMP DIB header parse: BITMAPINFOHEADER (and larger V4/V5
    variants) plus the legacy 12-byte COREHEADER."""
    if payload[:2] != b"BM" or len(payload) < 26:
        raise MediaParseError("not a BMP")
    (dib_size,) = struct.unpack_from("<I", payload, 14)
    if dib_size >= 40:
        w, h = struct.unpack_from("<ii", payload, 18)
    elif dib_size == 12:
        w, h = struct.unpack_from("<HH", payload, 18)
    else:
        raise MediaParseError(f"unknown BMP DIB header size {dib_size}")
    if w <= 0 or h == 0:
        raise MediaParseError("degenerate BMP geometry")
    return {"format": "bmp", "width": int(w), "height": abs(int(h)),
            "n_frames": 1, "duration_ms": 0}


def parse_gif(payload: bytes) -> dict:
    """GIF logical-screen parse + full block walk: frames = image
    descriptors, duration = sum of graphic-control delays x 10 ms.
    LZW data is skipped sub-block by sub-block, never decoded."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise MediaParseError("not a GIF")
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    if packed & 0x80:                       # global color table
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    delay_cs = 0
    saw_trailer = False
    n = len(payload)

    def skip_sub_blocks(p: int) -> int:
        while p < n:
            size = payload[p]
            p += 1
            if size == 0:
                return p
            p += size
        raise MediaParseError("GIF truncated inside sub-blocks")

    while pos < n:
        b = payload[pos]
        pos += 1
        if b == 0x3B:                       # trailer
            saw_trailer = True
            break
        if b == 0x21:                       # extension
            if pos >= n:
                raise MediaParseError("GIF truncated at extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9 and pos + 4 < n and payload[pos] >= 4:
                (d,) = struct.unpack_from("<H", payload, pos + 2)
                delay_cs += d
            pos = skip_sub_blocks(pos)
        elif b == 0x2C:                     # image descriptor
            if pos + 9 > n:
                raise MediaParseError("GIF truncated at image descriptor")
            flags = payload[pos + 8]
            pos += 9
            if flags & 0x80:                # local color table
                pos += 3 * (2 << (flags & 0x07))
            pos += 1                        # LZW min code size
            pos = skip_sub_blocks(pos)
            n_frames += 1
        else:
            raise MediaParseError(f"unknown GIF block 0x{b:02x}")
    if not saw_trailer:
        # data ran out before the 0x3B trailer: a file truncated at a
        # block boundary would otherwise return a silent partial
        # frame count
        raise MediaParseError("GIF truncated before trailer")
    if n_frames == 0:
        raise MediaParseError("GIF has no image frames")
    return {"format": "gif", "width": int(w), "height": int(h),
            "n_frames": n_frames, "duration_ms": delay_cs * 10}


def parse_wav(payload: bytes) -> dict:
    """RIFF/WAVE chunk walk: fmt -> (channels, rate, bits), data ->
    byte size; sample frames = data_size // block_align, duration_ms
    floor-divides (the analytic oracle states the same floor)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE" \
            or len(payload) < 12:
        raise MediaParseError("not a WAV")
    pos = 12
    n = len(payload)
    rate = channels = bits = None
    data_size = None
    while pos + 8 <= n:
        tag = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        pos += 8
        if pos + size > n:
            # declared chunk runs past the payload: truncated file or
            # a size-lying header — either way the data is not there,
            # so fail loudly instead of reporting inflated frames
            raise MediaParseError(
                f"WAV chunk {tag!r} declares {size} bytes but only "
                f"{n - pos} remain")
        if tag == b"fmt " and size >= 16:
            _, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos)
        elif tag == b"data":
            data_size = size
        pos += size + (size & 1)            # chunks are even-padded
    if not rate or not channels or not bits or data_size is None:
        raise MediaParseError("WAV missing fmt or data chunk")
    block = channels * bits // 8
    frames = data_size // block if block else 0
    return {"format": "wav", "width": 0, "height": 0,
            "n_frames": int(frames),
            "duration_ms": int(frames * 1000 // rate)}


_PARSERS = {"png": parse_png, "bmp": parse_bmp, "gif": parse_gif,
            "wav": parse_wav}


# ---------------------------------------------------------------------------
# pixel/sample decoders (round-5: the real payload path — stdlib only)
# ---------------------------------------------------------------------------

def decode_png_pixels(payload: bytes) -> np.ndarray:
    """Full PNG pixel decode -> (H, W, 3) uint8 RGB.  8-bit truecolor
    non-interlaced only (what a struct/zlib-only decoder can do
    honestly; anything else raises MediaParseError).  All five scanline
    filters are implemented: None/Up are vector ops, Sub is a per-row
    channel-wise prefix sum mod 256, Average/Paeth take the per-pixel
    path (sequential left dependency is inherent to the spec).  Every
    chunk CRC is verified."""
    meta = parse_png(payload)
    w, h = meta["width"], meta["height"]
    bit_depth, color_type = payload[24], payload[25]
    interlace = payload[28]
    if bit_depth != 8 or color_type != 2 or interlace != 0:
        raise MediaParseError(
            "unsupported PNG variant (8-bit RGB non-interlaced only): "
            f"depth={bit_depth} color={color_type} interlace={interlace}")
    idat = bytearray()
    pos = 33                                  # after signature + IHDR
    n = len(payload)
    while pos + 12 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) < length or pos + 12 + length > n:
            raise MediaParseError("PNG truncated chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise MediaParseError(f"PNG {tag!r} chunk CRC mismatch")
        if tag == b"IDAT":
            idat += data
        pos += 12 + length
        if tag == b"IEND":
            break
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise MediaParseError(f"PNG IDAT inflate failed: {e}") from e
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise MediaParseError(
            f"PNG pixel payload is {len(raw)} bytes, expected "
            f"{h * (stride + 1)}")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filt = arr[:, 0]
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        r = arr[y, 1:].astype(np.int64)
        f = int(filt[y])
        if f == 0:
            rec = r
        elif f == 1:                          # Sub: prefix sum per channel
            rec = (np.cumsum(r.reshape(w, 3), axis=0) % 256).reshape(-1)
        elif f == 2:                          # Up
            rec = (r + prior) % 256
        elif f in (3, 4):                     # Average / Paeth
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - 3] if x >= 3 else 0       # left
                b = prior[x]                           # up
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    c = prior[x - 3] if x >= 3 else 0  # upper-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                rec[x] = (r[x] + pred) & 255
        else:
            raise MediaParseError(f"unknown PNG filter type {f}")
        out[y] = rec
        prior = rec if rec.dtype == np.int64 else rec.astype(np.int64)
    return out.reshape(h, w, 3)


def decode_bmp_pixels(payload: bytes) -> np.ndarray:
    """Full BMP pixel decode -> (H, W, 3) uint8 RGB.  24-bpp
    uncompressed only; handles bottom-up (positive height) and
    top-down (negative) row order and the 4-byte row padding; BGR is
    reordered to RGB."""
    meta = parse_bmp(payload)
    w, h = meta["width"], meta["height"]
    (off,) = struct.unpack_from("<I", payload, 10)
    (dib_size,) = struct.unpack_from("<I", payload, 14)
    if dib_size >= 40:
        _, h_raw = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
    else:                                     # 12-byte COREHEADER
        h_raw = struct.unpack_from("<H", payload, 20)[0]
        bpp = struct.unpack_from("<H", payload, 24)[0]
        compression = 0
    if bpp != 24 or compression != 0:
        raise MediaParseError(
            f"unsupported BMP variant (24bpp uncompressed only): "
            f"bpp={bpp} compression={compression}")
    row_bytes = (w * 3 + 3) & ~3
    if off + row_bytes * h > len(payload):
        raise MediaParseError("BMP pixel data truncated")
    data = np.frombuffer(payload, np.uint8, count=row_bytes * h,
                         offset=off).reshape(h, row_bytes)[:, :w * 3]
    img = data.reshape(h, w, 3)
    if h_raw > 0:                             # bottom-up -> top-down
        img = img[::-1]
    return np.ascontiguousarray(img[..., ::-1])  # BGR -> RGB


def _lzw_decode(data: bytes, min_code_size: int,
                max_pixels: int) -> bytearray:
    """General GIF LZW decode (variable code width, CLEAR/END codes,
    KwKwK case) of one frame's concatenated sub-block bytes.  Codes
    are packed LSB-first per the GIF spec.  Python per-code loop —
    frames here are small; a production decoder would be a C codec
    loaded once per actor (the actor-pool shape already allows it)."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)]
    table = base + [b"", b""]
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while True:
        if bitpos + code_size > total_bits:
            raise MediaParseError("GIF LZW stream truncated (no END)")
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i:byte_i + 4], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = base + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise MediaParseError("GIF LZW: first code not a literal")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):          # KwKwK
                entry = prev + prev[:1]
            else:
                raise MediaParseError(f"GIF LZW: code {code} out of range")
            if len(table) < 4096:             # deferred-clear cap
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
        out += entry
        prev = entry
        if len(out) > max_pixels:
            raise MediaParseError(
                f"GIF LZW produced {len(out)} pixels for a "
                f"{max_pixels}-pixel frame")
    return out


def _gif_frame_streams(payload: bytes,
                       max_frames: int | None = None) -> list[dict]:
    """Walk a validated GIF and return frame decode inputs WITHOUT
    decoding: [{ct, min_code, lzw, fw, fh}] — the shared front half
    of first-frame and per-frame pixel decode.  `max_frames` stops
    the walk (and the per-frame LZW byte assembly, and the
    full-screen/interlace checks) after that many frames — so
    first-frame decode costs O(first frame), not O(file), and a GIF
    whose LATER frames are partial-screen deltas still first-frame
    decodes (the pre-round-5 behavior)."""
    parse_gif(payload)                        # structural validation
    w, h = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, count=3 * n_colors,
                            offset=pos).reshape(n_colors, 3)
        pos += 3 * n_colors
    n = len(payload)
    frames = []
    while pos < n:
        b = payload[pos]
        pos += 1
        if b == 0x3B:                         # trailer
            break
        if b == 0x21:                         # extension: skip
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:                       # image descriptor
            x0, y0, fw, fh = struct.unpack_from("<HHHH", payload, pos)
            flags = payload[pos + 8]
            pos += 9
            if flags & 0x40:
                raise MediaParseError("interlaced GIF unsupported")
            ct = gct
            if flags & 0x80:
                n_colors = 2 << (flags & 0x07)
                ct = np.frombuffer(payload, np.uint8, count=3 * n_colors,
                                   offset=pos).reshape(n_colors, 3)
                pos += 3 * n_colors
            if ct is None:
                raise MediaParseError("GIF frame has no color table")
            if (x0, y0, fw, fh) != (0, 0, w, h):
                raise MediaParseError(
                    "partial-screen GIF frames unsupported")
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                size = payload[pos]
                lzw += payload[pos + 1:pos + 1 + size]
                pos += 1 + size
            pos += 1                          # sub-block terminator
            frames.append({"ct": ct, "min_code": min_code,
                           "lzw": bytes(lzw), "fw": fw, "fh": fh})
            if max_frames is not None and len(frames) >= max_frames:
                return frames
        else:
            raise MediaParseError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise MediaParseError("GIF ended before any image frame")
    return frames


def _gif_decode_frame(fr: dict) -> np.ndarray:
    idx = np.frombuffer(
        _lzw_decode(fr["lzw"], fr["min_code"], fr["fw"] * fr["fh"]),
        np.uint8)
    if len(idx) < fr["fw"] * fr["fh"]:
        raise MediaParseError(
            f"GIF LZW produced {len(idx)} of {fr['fw'] * fr['fh']} "
            "pixels")
    idx = idx[:fr["fw"] * fr["fh"]]
    if int(idx.max(initial=0)) >= len(fr["ct"]):
        raise MediaParseError("GIF pixel index out of palette")
    return fr["ct"][idx].reshape(fr["fh"], fr["fw"], 3)


def decode_gif_pixels(payload: bytes) -> np.ndarray:
    """First-frame GIF pixel decode -> (H, W, 3) uint8 RGB via a real
    LZW decode + color-table lookup.  The FIRST frame must be
    non-interlaced and full-logical-screen; later frames are never
    touched (partial-screen delta frames — the standard animated-GIF
    optimization — don't block a first-frame decode)."""
    return _gif_decode_frame(_gif_frame_streams(payload,
                                                max_frames=1)[0])


def decode_gif_frame_pixels(payload: bytes,
                            frame_idx: int) -> np.ndarray:
    """Pixel decode of ONE selected GIF frame: the walk stops at the
    requested frame and only its LZW stream is decoded.  For MANY
    frames of one payload, walk once with _gif_frame_streams and
    decode each with _gif_decode_frame (the FrameStats pattern) —
    repeated calls here would re-walk the file per frame."""
    if frame_idx < 0:
        raise MediaParseError(f"frame {frame_idx} out of range")
    frames = _gif_frame_streams(payload, max_frames=frame_idx + 1)
    if frame_idx >= len(frames):
        raise MediaParseError(
            f"frame {frame_idx} out of range ({len(frames)} frames)")
    return _gif_decode_frame(frames[frame_idx])


def decode_wav_samples(payload: bytes) -> tuple[np.ndarray, int]:
    """Full WAV sample decode -> ((frames, channels) int16 array,
    sample_rate).  PCM-16 only."""
    meta = parse_wav(payload)
    pos = 12
    n = len(payload)
    rate = channels = bits = None
    fmt_code = None
    data = None
    while pos + 8 <= n:
        tag = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        pos += 8
        if tag == b"fmt " and size >= 16:
            fmt_code, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos)
        elif tag == b"data":
            data = payload[pos:pos + size]
        pos += size + (size & 1)
    if fmt_code != 1 or bits != 16:
        raise MediaParseError(
            f"unsupported WAV variant (PCM-16 only): fmt={fmt_code} "
            f"bits={bits}")
    frames = meta["n_frames"]
    arr = np.frombuffer(data, dtype="<i2", count=frames * channels)
    return arr.reshape(frames, channels), int(rate)


def decode_pixels(payload: bytes) -> np.ndarray:
    """Sniff the container and decode REAL pixels: PNG/BMP/first GIF
    frame -> (H, W, 3) uint8 RGB.  Raises MediaParseError for audio
    or unrecognized containers."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png_pixels(payload)
    if fmt == "bmp":
        return decode_bmp_pixels(payload)
    if fmt == "gif":
        return decode_gif_pixels(payload)
    raise MediaParseError(f"no pixel decoder for container {fmt!r}")


def decode_media(payload: bytes) -> dict:
    """Sniff the container from magic bytes and parse its header:
    {format, width, height, n_frames, duration_ms}.  Raises
    MediaParseError on ANY unrecognized/malformed/truncated payload —
    low-level struct/index errors from exotic truncations are
    normalized here so the error-tolerant decode modes
    (MediaDecoder on_error='flag'/'skip') can rely on one exception
    type (a struct.error escaping this boundary would fail the whole
    Ray task instead of flagging the row)."""
    fmt = sniff_format(payload)
    if fmt is None:
        raise MediaParseError("unrecognized container magic")
    try:
        return _PARSERS[fmt](payload)
    except MediaParseError:
        raise
    except (struct.error, IndexError, ValueError) as e:
        raise MediaParseError(f"malformed {fmt}: {e}") from e
