"""Regenerate the pinned dedup-survivor goldens.

The dedup families (minhash/simhash/simhash_near/ngram/embedding) are
deterministic (seeded hash functions, partition-count-independent
survivor math) but not SQL-expressible, so the driver's DuckDB oracle
gets a PINNED golden: the survivor id set at each test scale, committed
as tests/goldens/dedup_survivors.json and inlined into the oracle SQL
as a VALUES list.  Semantic correctness is guarded separately by the
planted-duplicate pytests (tests/test_ops.py); the golden guards
regressions and feeds the driver's hash gate.

Run after any intentional change to dedup semantics:
    python scripts/make_goldens.py
then commit the JSON and re-run pytest (test_golden_dedup_pins).
"""

import json
import os
import sys

import ray

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_PATH = os.path.join(REPO, "tests", "goldens", "dedup_survivors.json")
QUERIES = ["dedup_minhash", "dedup_simhash", "dedup_simhash_near",
           "dedup_ngram", "dedup_embedding", "ann_ivf_topk",
           "ann_pq_topk", "ann_ivfpq_topk", "ann_ivf_day2",
           "incremental_minhash", "dedup_keep_best"]
# multi-column pins: whole deterministic result rows (the HLL estimate
# is md5-hashed + fixed-p -> batch/partition-count independent)
ROW_QUERIES = {"approx_distinct_users": ["event_type",
                                         "n_distinct_approx"],
               # bloom probes are deterministic (md5 gram hashes +
               # fixed double-hash); superset-of-exact guarded in
               # tests/test_curation_ops.py
               "bloom_decontam": ["doc_id", "n_hits"],
               # connected-components cluster assignment: deterministic
               # (seeded hashes) and partition-count-independent
               "dedup_clusters": ["doc_id", "cluster_id"],
               # count-min estimates are deterministic (md5 hashes +
               # fixed multipliers); superset-of-exact guarded in
               # tests/test_sketch.py
               "heavy_tokens": ["token", "est"],
               # the multimodal chain's REAL kernels (round-5 pixel/
               # sample paths) are deterministic per item (independent
               # of batching); this pins its per-kind aggregate
               # projection
               "media_summary": ["kind", "n", "sum_bytes",
                                 "sum_frames", "sum_rw", "emb_sum_q"],
               # BPE merge rules: deterministic (integer counts, total
               # pair order) but iterative; cross-checked against the
               # independent reference in tests/test_bpe.py
               "bpe_vocab": ["rank", "left", "right", "count"],
               # bigram-LM quality scores: integer counts + per-doc
               # fixed accumulation order -> bit-reproducible floats;
               # cross-checked in tests/test_lm.py
               "lm_score": ["doc_id", "lm_score"],
               # zlib sizes: deterministic for the container's pinned
               # zlib at fixed level; raw_len cross-checked vs
               # octet_length in tests
               "compress_ratio": ["doc_id", "raw_len", "comp_len"]}
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def _kmeans_ref(sf_dir: str) -> dict:
    """kmeans assignment from the INDEPENDENT pure-python reference
    (tests/kmeans_reference.py) — the pin source, per the round-2
    ADVICE rule that goldens should not come from the engine they
    gate where an independent formulation exists."""
    import numpy as np
    import pyarrow.parquet as pq
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from kmeans_reference import kmeans_reference
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    emb = np.asarray(t.column("embedding").combine_chunks().flatten(),
                     dtype=np.float64).reshape(len(ids), -1)
    return kmeans_reference(ids, emb, k=10, iters=5)


def _outliers_ref(sf_dir: str, n: int = 50) -> list:
    """Independent embedding-outlier pin source: pure-python kmeans
    fit + exact integer distance-to-own-centroid, top-n by
    (dist desc, id asc)."""
    import numpy as np
    import pyarrow.parquet as pq
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from kmeans_reference import kmeans_reference_dists
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    emb = np.asarray(t.column("embedding").combine_chunks().flatten(),
                     dtype=np.float64).reshape(len(ids), -1)
    full = kmeans_reference_dists(ids, emb, k=10, iters=5)
    top = sorted(full.items(), key=lambda kv: (-kv[1][1], kv[0]))[:n]
    return [[int(i), int(c), int(d)] for i, (c, d) in top]


def _semdedup_ref(sf_dir: str, threshold: float = 0.4) -> list:
    """Independent SemDeDup survivors: pure-python kmeans reference
    labels + an O(n^2)-per-cluster numpy brute force (dup iff some
    strictly-smaller id in the cluster has cosine >= threshold)."""
    import numpy as np
    import pyarrow.parquet as pq
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from kmeans_reference import kmeans_reference
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    emb = np.asarray(t.column("embedding").combine_chunks().flatten(),
                     dtype=np.float64).reshape(len(ids), -1)
    mn = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    lab = kmeans_reference(ids, mn, k=10, iters=5)  # unit-sphere kmeans
    vid = np.array(ids)
    la = np.array([lab[v] for v in ids])
    dup = set()
    for c in np.unique(la):
        m = la == c
        ii, seg = vid[m], mn[m]
        o = np.argsort(ii)
        ii, seg = ii[o], seg[o]
        sims = seg @ seg.T
        for a in range(1, len(ii)):
            if (sims[a, :a] >= threshold).any():
                dup.add(int(ii[a]))
    return sorted(int(v) for v in ids if int(v) not in dup)


def main() -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    from d1_log_aggregation_ray.pipelines.queries import RAY_QUERIES
    out: dict = {"_comment": (
        "Pinned dedup survivor ids per scale; regenerate with "
        "scripts/make_goldens.py after intentional semantic changes.")}
    for sf_dir in SF_DIRS:
        sf = os.path.basename(sf_dir)
        out[sf] = {}
        for q in QUERIES:
            col = ("vec_id" if q in ("dedup_embedding", "ann_ivf_topk",
                                     "ann_pq_topk", "ann_ivfpq_topk",
                                     "ann_ivf_day2")
                   else "doc_id")
            res = RAY_QUERIES[q](sf_dir)
            rows = res.take_all() if hasattr(res, "take_all") \
                else res.to_pylist()
            out[sf][q] = sorted(int(r[col]) for r in rows)
            print(f"{sf} {q}: {len(out[sf][q])} survivors")
        for q, cols in ROW_QUERIES.items():
            res = RAY_QUERIES[q](sf_dir)
            rows = res.take_all() if hasattr(res, "take_all") \
                else res.to_pylist()
            out[sf][q] = {"columns": cols,
                          "rows": sorted([r[c] for c in cols]
                                         for r in rows)}
            print(f"{sf} {q}: {len(rows)} pinned rows")
        # bpe_encode pin: generated from the INDEPENDENT pure-python
        # Sennrich-formulation reference (tests/bpe_reference.py —
        # retrain via recount-from-scratch, encode via rank-order
        # rule application) and cross-checked exactly vs the engine.
        import pyarrow.parquet as _pq_enc
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from bpe_reference import ref_bpe_merges, ref_encode_counts
        _dt = _pq_enc.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"])
        _dids = _dt.column("doc_id").to_pylist()
        _texts = _dt.column("text").to_pylist()
        _rules = [(lt, rt) for _, lt, rt, _ in ref_bpe_merges(_texts)]
        enc_ref = {int(i): int(n) for i, n in
                   ref_encode_counts(_dids, _texts, _rules).items()}
        enc_eng = {r["doc_id"]: r["n_tokens"] for r in
                   RAY_QUERIES["bpe_encode"](sf_dir).take_all()}
        if enc_eng != enc_ref:
            raise AssertionError(f"bpe_encode engine != reference at {sf}")
        out[sf]["bpe_encode"] = {
            "columns": ["doc_id", "n_tokens"],
            "rows": sorted([i, n] for i, n in enc_ref.items())}
        print(f"{sf} bpe_encode: {len(enc_ref)} pinned rows")
        # media_embed_knn pin: generated from the INDEPENDENT analytic
        # reference (pixels rebuilt from the ramp formulas, codecs
        # never touched) and cross-checked against the engine — a
        # divergence in codec round-trip OR featurizer fails loudly
        # at pin time.
        from media_feat_reference import ref_media_embed_knn
        ref_rows = ref_media_embed_knn(_dids)  # bpe block's id list
        eng_rows = sorted(
            [int(r["media_id"]), int(r["score_q"])] for r in
            RAY_QUERIES["media_embed_knn"](sf_dir).to_pylist())
        if eng_rows != ref_rows:
            raise AssertionError(
                f"media_embed_knn engine != reference at {sf}:\n"
                f"  engine    {eng_rows}\n  reference {ref_rows}")
        out[sf]["media_embed_knn"] = {
            "columns": ["media_id", "score_q"], "rows": ref_rows}
        print(f"{sf} media_embed_knn: {len(ref_rows)} pinned rows")
        # kmeans pin: generated from the independent reference and
        # cross-checked against the engine so a divergence fails
        # loudly at pin time instead of shipping a wrong golden.
        eng = {r["vec_id"]: r["cluster"] for r in
               RAY_QUERIES["kmeans_clusters"](sf_dir).take_all()}
        ref = _kmeans_ref(sf_dir)
        if eng != ref:
            raise AssertionError(f"kmeans engine != reference at {sf}")
        out[sf]["kmeans_clusters"] = {
            "columns": ["vec_id", "cluster"],
            "rows": sorted([int(i), int(c)] for i, c in ref.items())}
        print(f"{sf} kmeans_clusters: {len(ref)} pinned rows")
        # cluster_sample pin: independent reference = the SAME
        # kmeans_reference labels + plain-python md5 hash-rank
        # selection (ceil(300/10) smallest md5('cbal:'+id) per
        # cluster); cross-checked against the engine at pin time
        import math as _math

        from d1_log_aggregation_ray.functions.hashing import md5_lower64
        _m = _math.ceil(300 / 10)
        _byc: dict = {}
        for _vid, _c in ref.items():
            _byc.setdefault(_c, []).append(_vid)
        _keep: dict = {}
        for _c, _members in _byc.items():
            _members.sort(key=lambda v: (md5_lower64(f"cbal:{v}"), v))
            for _v in _members[:_m]:
                _keep[int(_v)] = int(_c)
        _eng = {r["vec_id"]: r["cluster"] for r in
                RAY_QUERIES["cluster_sample"](sf_dir).take_all()}
        if _eng != _keep:
            raise AssertionError(
                f"cluster_sample engine != reference at {sf}")
        out[sf]["cluster_sample"] = {
            "columns": ["vec_id", "cluster"],
            "rows": sorted([i, c] for i, c in _keep.items())}
        print(f"{sf} cluster_sample: {len(_keep)} pinned rows")
        # embedding_outliers pin: independent kmeans_reference_dists
        # top-n farthest-from-own-centroid, cross-checked vs engine
        ol_ref = _outliers_ref(sf_dir)
        ol_eng = [[r["vec_id"], r["cluster"], r["dist"]] for r in
                  RAY_QUERIES["embedding_outliers"](sf_dir).to_pylist()]
        if ol_eng != ol_ref:
            raise AssertionError(
                f"embedding_outliers engine != reference at {sf}")
        out[sf]["embedding_outliers"] = {
            "columns": ["vec_id", "cluster", "dist"],
            "rows": sorted(ol_ref)}
        print(f"{sf} embedding_outliers: {len(ol_ref)} pinned rows")
        # pca pin: generated from the independent serial reference
        # (tests/pca_reference.py) and cross-checked EXACTLY against
        # the engine (both are bit-exact integer formulations)
        import numpy as np
        import pyarrow.parquet as _pq
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from pca_reference import pca_reference
        _t = _pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])
        _ids = _t.column("vec_id").to_pylist()
        _emb = np.asarray(_t.column("embedding").combine_chunks()
                          .flatten(), dtype=np.float64).reshape(
            len(_ids), -1)
        pca_ref = pca_reference(_ids, _emb, d_out=4)
        pca_eng = {r["vec_id"]: [r["pc1"], r["pc2"], r["pc3"], r["pc4"]]
                   for r in RAY_QUERIES["pca_project"](sf_dir).take_all()}
        if pca_eng != pca_ref:
            raise AssertionError(f"pca engine != reference at {sf}")
        out[sf]["pca_project"] = {
            "columns": ["vec_id", "pc1", "pc2", "pc3", "pc4"],
            "rows": sorted([int(i)] + v for i, v in pca_ref.items())}
        print(f"{sf} pca_project: {len(pca_ref)} pinned rows")
        # pca_ann pin: independent reference = serial PCA reference ->
        # numpy exact cosine top-10 (mirrors brute_force_topk's
        # normalize/score/tie-break order)
        red_ref = pca_reference(_ids, _emb, d_out=8)
        rid = np.array([i for i in sorted(red_ref) if i != 0])
        rm = np.array([red_ref[int(i)] for i in rid])
        qv = np.array(red_ref[0])
        qn = qv / (np.linalg.norm(qv) or 1.0)
        nn = np.linalg.norm(rm, axis=1, keepdims=True)
        nn[nn == 0] = 1.0
        scores = (rm / nn) @ qn
        order = np.lexsort((rid, -scores))[:10]
        ann_ref = [int(v) for v in rid[order]]
        ann_eng = [r["vec_id"] for r in
                   RAY_QUERIES["pca_ann_topk"](sf_dir).to_pylist()]
        if ann_eng != ann_ref:
            raise AssertionError(f"pca_ann engine != reference at {sf}")
        out[sf]["pca_ann_topk"] = ann_ref
        print(f"{sf} pca_ann_topk: top-{len(ann_ref)} pinned")
        # semantic_dedup pin: same independent-reference rule
        sd_eng = sorted(r["vec_id"] for r in
                        RAY_QUERIES["semantic_dedup"](sf_dir).take_all())
        sd_ref = _semdedup_ref(sf_dir)
        if sd_eng != sd_ref:
            raise AssertionError(
                f"semantic_dedup engine != reference at {sf}")
        out[sf]["semantic_dedup"] = sd_ref
        print(f"{sf} semantic_dedup: {len(sd_ref)} survivors")
        # organize_embeddings pin: the composed independent references
        # (semdedup survivors -> kmeans_reference + pca_reference over
        # the survivor subset), cross-checked exactly vs the engine
        from kmeans_reference import kmeans_reference
        surv_ids = set(sd_ref)
        keep = [i for i, v in enumerate(_ids) if int(v) in surv_ids]
        sub_ids = [int(_ids[i]) for i in keep]
        sub_emb = _emb[keep]
        oe_lab = kmeans_reference(sub_ids, sub_emb, k=10, iters=5)
        oe_pca = pca_reference(sub_ids, sub_emb, d_out=4)
        oe_ref = {i: [int(oe_lab[i])] + oe_pca[i] for i in sub_ids}
        oe_eng = {r["vec_id"]: [r["cluster"], r["pc1"], r["pc2"],
                                r["pc3"], r["pc4"]]
                  for r in RAY_QUERIES["organize_embeddings"](
                      sf_dir).take_all()}
        if oe_eng != oe_ref:
            raise AssertionError(
                f"organize_embeddings engine != reference at {sf}")
        out[sf]["organize_embeddings"] = {
            "columns": ["vec_id", "cluster", "pc1", "pc2", "pc3",
                        "pc4"],
            "rows": sorted([int(i)] + v for i, v in oe_ref.items())}
        print(f"{sf} organize_embeddings: {len(oe_ref)} pinned rows")
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", GOLDEN_PATH)
    ray.shutdown()


if __name__ == "__main__":
    main()
