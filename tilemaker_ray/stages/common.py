"""Shared shuffle-bucketing helper."""

from __future__ import annotations

import numpy as np


def mix_bucket(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Hash-mix ids into shuffle buckets (ids may be sequential — a
    plain modulo would range-partition poorly). One implementation so
    co-location semantics cannot drift between stages."""
    with np.errstate(over="ignore"):
        h = np.asarray(keys).astype(np.uint64) \
            * np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(29)
    return (h % np.uint64(num_buckets)).astype(np.int64)
