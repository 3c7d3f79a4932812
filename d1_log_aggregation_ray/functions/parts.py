"""Cluster-sized partition counts for the manual hash-partition
pattern (`part = key_hash % P` + groupby(part).map_groups with one
vectorized scan per partition) and for hash joins.

Partitioning assumption of the pattern: one partition of the shuffled
rows fits in a worker's heap; P scales with the cluster, so at N x
the data on N x the nodes the per-partition size is constant.
"""

from __future__ import annotations

import numpy as np

import ray

#: multiplicative 64-bit mixing constant (golden-ratio) used to spread
#: integer keys across partitions
HASH_MIX = np.uint64(0x9E3779B97F4A7C15)


def _cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4


def hash_parts() -> int:
    """Partition count for partition scans: enough for full CPU
    parallelism, few enough that per-partition python-call overhead is
    negligible."""
    return max(8, _cpus() * 2)


def join_parts() -> int:
    """Hash-join aggregator count: each partition is an actor, and
    requesting more actors than free CPUs stalls the join on a small
    (e.g. 4-cpu test) session."""
    return max(2, min(16, _cpus() // 2))


def key_parts(keys: np.ndarray, n_parts: int) -> np.ndarray:
    """int64 partition column for integer keys (golden-ratio mix)."""
    return ((keys.view(np.uint64) * HASH_MIX) % np.uint64(n_parts)
            ).astype(np.int64)
