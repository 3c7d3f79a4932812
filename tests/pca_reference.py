"""Independent serial reference for ops/projection.py: the same
integer-exact PCA contract (quantize -> exact moments -> eigh ->
re-quantized components -> exact fixed-point projection) implemented
directly over the full in-memory matrix, with no Ray, no blocking, no
partial merge.  Golden pins come from HERE (the house rule: goldens
must not come from the engine they gate)."""

import numpy as np

SCALE = 1 << 20


def pca_reference(ids, emb: np.ndarray, d_out: int = 4):
    """Returns {id: [pc1..pc_d_out]} (python floats, bit-exact)."""
    q = np.rint(np.asarray(emb, dtype=np.float64) * SCALE).astype(np.int64)
    n, dim = q.shape
    s = q.sum(axis=0, dtype=object)
    ss = q.astype(object).T @ q.astype(object)
    mu = np.array([int(v) // n for v in s], dtype=np.int64)
    m = ss - np.outer(s, mu) - np.outer(mu, s) + n * np.outer(mu, mu)
    cov = m.astype(np.float64) / (n * float(SCALE) ** 2)
    vals, vecs = np.linalg.eigh(cov)
    top = np.argsort(-vals, kind="stable")[:d_out]
    w = vecs[:, top]
    for j in range(w.shape[1]):
        i = int(np.argmax(np.abs(w[:, j])))
        if w[i, j] < 0:
            w[:, j] = -w[:, j]
    wq = np.rint(w * SCALE).astype(np.int64)
    p = (q - mu[None, :]) @ wq
    out = p * (1.0 / float(SCALE) ** 2)
    return {int(i): [float(v) for v in row] for i, row in zip(ids, out)}
