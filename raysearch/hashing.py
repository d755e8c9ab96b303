"""Deterministic vectorized hashing (never Python's seeded hash())."""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer over a uint64/int64 array (public-domain
    algorithm; deterministic across processes and machines)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + _C1
        z = (z ^ (z >> np.uint64(30))) * _C2
        z = (z ^ (z >> np.uint64(27))) * _C3
        return z ^ (z >> np.uint64(31))


def doc_partition(doc_ids: np.ndarray, num_parts: int) -> np.ndarray:
    """Document-hash partition id (int64 in [0, num_parts))."""
    return (splitmix64(doc_ids) % np.uint64(num_parts)).astype(np.int64)


def doc_salt(doc_ids: np.ndarray, salt: int) -> np.ndarray:
    """Build-shuffle sub-key in [0, salt). Independent of doc_partition
    (different avalanche input) so salting actually subdivides a part."""
    with np.errstate(over="ignore"):
        mixed = splitmix64(doc_ids.astype(np.uint64) ^ _C3)
    return (mixed % np.uint64(max(1, salt))).astype(np.int64)
