"""Independent reference for the media featurize -> cosine top-k
composition (media_embed_knn).

INDEPENDENCE: pixels/samples are constructed DIRECTLY from the planted
ramp formulas (ops/multimodal._media_params + the encoder byte rules)
— the container codecs (encode/decode) are never touched — and the
16-dim feature spec is re-implemented here from its documentation.
scripts/make_goldens.py pins THIS module's output and asserts the
engine matches it exactly, so a silent divergence in either the codec
round-trip or the featurizer fails loudly at pin time.
"""

from __future__ import annotations

import numpy as np

_WAV_RATE = 8000


def media_params(mid: int):
    k = mid % 4
    if k == 0:
        return k, 16 + (mid * 7) % 33, 16 + (mid * 11) % 29, 0, 0
    if k == 1:
        return k, 8 + (mid * 5) % 25, 8 + (mid * 3) % 21, 0, 0
    if k == 2:
        return k, 8 + mid % 17, 8 + (mid * 13) % 15, 0, 0
    return k, 0, 0, 800 + (mid * 37) % 4000, 1 + mid % 2


def ref_pixels(mid: int) -> np.ndarray:
    """(H, W, 3) uint8 RGB straight from the ramp formulas."""
    k, w, h, _, _ = media_params(mid)
    seed = mid % 256
    if k == 0:                               # png: identical ramp rows
        row = ((seed + np.arange(w * 3)) % 256).astype(np.uint8)
        return np.tile(row.reshape(1, w, 3), (h, 1, 1))
    if k == 1:                               # bmp: bottom-up, BGR
        img = np.empty((h, w, 3), np.uint8)
        for r in range(h):
            y = h - 1 - r
            img[r] = ((seed + y + np.arange(w * 3)) % 256).astype(
                np.uint8).reshape(w, 3)[:, ::-1]
        return img
    if k == 2:                               # gif: uniform color 0
        col = np.array([seed % 256, (seed + 29) % 256,
                        (seed + 58) % 256], np.uint8)
        return np.broadcast_to(col, (h, w, 3)).copy()
    raise ValueError("audio has no pixels")


def ref_samples(mid: int) -> tuple[np.ndarray, int]:
    """((frames, channels) int16, rate) from the ramp byte rule."""
    k, _, _, ns, ch = media_params(mid)
    assert k == 3
    seed = mid % 256
    b = ((seed + 7 * np.arange(ns * ch * 2)) % 256).astype(np.uint8)
    return np.frombuffer(b.tobytes(), "<i2").reshape(ns, ch), _WAV_RATE


def ref_features(mid: int, dim: int = 16) -> np.ndarray:
    """The documented 16-dim content-statistic feature vector,
    UNNORMALIZED float64 (the spec in ops/multimodal.MediaFeaturizer,
    re-stated independently)."""
    k = mid % 4
    f = np.zeros(dim, dtype=np.float64)
    if k == 3:
        arr, rate = ref_samples(mid)
        x = arr.astype(np.float64).reshape(-1) / 32768.0
        f[0] = 1.0
        f[1] = x.mean()
        f[2] = x.std()
        f[3] = np.sqrt(np.mean(x * x))
        f[4] = np.abs(x).max(initial=0.0)
        f[5] = float(np.count_nonzero(np.signbit(x[1:])
                                      != np.signbit(x[:-1]))) \
            / max(len(x) - 1, 1)
        f[6] = np.log1p(arr.shape[0])
        f[7] = arr.shape[1]
        f[8] = np.log1p(rate)
    else:
        img = ref_pixels(mid).astype(np.float64) / 255.0
        ch = img.reshape(-1, 3)
        f[0:3] = ch.mean(axis=0)
        f[3:6] = ch.std(axis=0)
        gray = ch.mean(axis=1)
        hist, _ = np.histogram(gray, bins=4, range=(0.0, 1.0))
        f[6:10] = hist / max(len(gray), 1)
        h, w = img.shape[:2]
        f[10] = np.log1p(w)
        f[11] = np.log1p(h)
        f[12] = w / max(h, 1)
        f[13] = gray.min(initial=1.0)
        f[14] = gray.max(initial=0.0)
        f[15] = 1.0 if k == 2 else 0.0
    return f


def ref_embedding(mid: int) -> np.ndarray:
    """Unit-norm float32 embedding — the featurizer's output dtype
    path (normalize in float64, cast to float32) mirrored exactly."""
    f = ref_features(mid)
    return (f / max(np.linalg.norm(f), 1e-9)).astype(np.float32)


def ref_media_embed_knn(media_ids, k: int = 10) -> list[list[int]]:
    """Pinned rows [media_id, score_q] for the top-k cosine neighbors
    of media 0's embedding among all OTHER media rows, score_q =
    round(score * 2^20) int64 fixed point; tie order (-score, id) —
    the brute_force_topk rule."""
    q32 = ref_embedding(0)
    q = q32.astype(np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    ids = np.array([m for m in media_ids if m != 0], dtype=np.int64)
    mat = np.stack([ref_embedding(int(m)) for m in ids]).astype(
        np.float64)
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0          # exact mirror of similarity._normalize
    mat = mat / n
    scores = mat @ q
    order = np.lexsort((ids, -scores))[:k]
    return sorted([int(ids[i]), int(np.rint(scores[i] * (1 << 20)))]
                  for i in order)
