"""Training-data-pipeline operators beyond the reference's inventory
(SURVEY §2 "not present in the reference" + the 100 TB training-data
ops): deduplication (5 families + clusters + SemDeDup + incremental),
similarity search (brute/LSH/IVF + PCA-reduced), text analysis &
quality gates, decontamination, PII, line dedup, corpus bookkeeping
(split/shuffle/stats/mixture), PCA projection, BM25 ranking,
sketches (HLL, count-min), clustering + the organize_embeddings
composition, relational (asof/windows/topk/quantiles/anti-join/
zscore), shard packing, multimodal plumbing, sessionization.
"""
