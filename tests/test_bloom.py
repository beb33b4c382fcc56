"""Bloom semi-join: bitmap kernels + end-to-end exactness (the verify
stage must delete every false positive)."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.bloom import (bloom_build, bloom_contains,
                                        bloom_semi_join)


def test_bloom_no_false_negatives():
    rng = np.random.RandomState(3)
    keys = rng.randint(0, 1 << 40, 5000).astype(np.int64)
    w = bloom_build(keys, m_bits=1 << 16, k_hashes=5)
    assert bloom_contains(w, keys, 1 << 16, 5).all()


def test_bloom_false_positive_rate_bounded():
    rng = np.random.RandomState(4)
    keys = rng.randint(0, 1 << 40, 2000).astype(np.int64)
    probe = rng.randint(1 << 41, 1 << 42, 20000).astype(np.int64)
    m, k = 1 << 16, 5
    w = bloom_build(keys, m, k)
    fp = bloom_contains(w, probe, m, k).mean()
    # theory: (1 - e^{-kn/m})^k ≈ 0.0043 at n=2000, m=65536, k=5
    assert fp < 0.02, fp


def test_bloom_semi_join_exact(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(5)
    big_keys = rng.randint(0, 500, 20000).astype(np.int64)
    big = rd.from_arrow(pa.table({
        "row_id": pa.array(np.arange(20000), pa.int64()),
        "k": pa.array(big_keys, pa.int64())}))
    small_keys = np.arange(0, 500, 3, dtype=np.int64)  # every 3rd
    small = rd.from_arrow(pa.table({"sk": pa.array(small_keys,
                                                   pa.int64())}))
    # tiny filter → many false positives → verify must scrub them
    got = bloom_semi_join(big, small, big_key="k", small_key="sk",
                          m_bits=256, k_hashes=2).to_pandas()
    want_rows = np.isin(big_keys, small_keys)
    assert sorted(got["row_id"]) == sorted(
        np.flatnonzero(want_rows).tolist())


def test_bloom_semi_join_empty_small(ray_session):
    import ray.data as rd
    big = rd.from_arrow(pa.table({
        "row_id": pa.array([1, 2, 3], pa.int64()),
        "k": pa.array([7, 8, 9], pa.int64())}))
    small = rd.from_arrow(pa.table({"sk": pa.array([], pa.int64())}))
    got = bloom_semi_join(big, small, big_key="k",
                          small_key="sk").to_pandas()
    assert len(got) == 0
