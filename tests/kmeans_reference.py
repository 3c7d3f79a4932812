"""Independent single-process reference for ops/cluster.kmeans_embeddings.

Deliberately different implementation (plain python loops + hashlib,
no code shared with the engine beyond the published spec constants:
scale 2^20 quantization, md5-ordered seeds, integer floor-div means,
lowest-id tie-break).  Used by tests AND by scripts/make_goldens.py so
the driver's pinned VALUES oracle is generated from an implementation
independent of the engine it gates (the round-2 ADVICE rule).
"""

import hashlib

import numpy as np

SCALE = 1 << 20


def _md5low(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:],
                          "little")


def kmeans_reference(ids, emb, k=10, iters=5):
    """ids: sequence of int; emb: (n, d) array-like of float.
    Returns {id: cluster}."""
    q = np.rint(np.asarray(emb, dtype=np.float64) * SCALE).astype(np.int64)
    ids = list(ids)
    n = len(ids)
    seed_order = sorted(range(n),
                        key=lambda i: (_md5low(str(ids[i])), ids[i]))[:k]
    cent = [q[i].copy() for i in seed_order]

    def assign_all():
        out = []
        for i in range(n):
            best, bd = 0, None
            for j in range(k):
                dist = int(((q[i] - cent[j]) ** 2).sum())
                if bd is None or dist < bd:
                    best, bd = j, dist
            out.append(best)
        return out

    for _ in range(iters):
        a = assign_all()
        new = [c.copy() for c in cent]
        for j in range(k):
            members = [i for i in range(n) if a[i] == j]
            if members:
                s = q[members].sum(axis=0)
                new[j] = np.array([v // len(members) for v in s],
                                  dtype=np.int64)
        cent = new
    final = assign_all()
    return {ids[i]: final[i] for i in range(n)}


def kmeans_reference_dists(ids, emb, k=10, iters=5):
    """Same fit as kmeans_reference, but returns
    {id: (cluster, squared_dist_to_own_centroid)} — the independent
    pin source for the embedding_outliers golden."""
    q = np.rint(np.asarray(emb, dtype=np.float64) * SCALE).astype(np.int64)
    ids = list(ids)
    n = len(ids)
    seed_order = sorted(range(n),
                        key=lambda i: (_md5low(str(ids[i])), ids[i]))[:k]
    cent = [q[i].copy() for i in seed_order]

    def assign_all():
        out = []
        for i in range(n):
            best, bd = 0, None
            for j in range(k):
                dist = int(((q[i] - cent[j]) ** 2).sum())
                if bd is None or dist < bd:
                    best, bd = j, dist
            out.append(out_pair(i, best))
        return out

    def out_pair(i, j):
        return (j, int(((q[i] - cent[j]) ** 2).sum()))

    for _ in range(iters):
        a = [j for j, _ in assign_all()]
        new = [c.copy() for c in cent]
        for j in range(k):
            members = [i for i in range(n) if a[i] == j]
            if members:
                s = q[members].sum(axis=0)
                new[j] = np.array([v // len(members) for v in s],
                                  dtype=np.int64)
        cent = new
    final = assign_all()
    return {ids[i]: final[i] for i in range(n)}
