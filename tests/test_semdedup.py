"""SemDeDup: distributed run vs the single-process union-find
reference; partition invariance; mega-cluster star degradation."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.semdedup import (semantic_pairs, semdedup_keep,
                                           semdedup_reference)


def _corpus(n_groups=6, dup_per_group=4, n_noise=30, dim=16, seed=3):
    """Planted semantic-dup groups (cos > 0.999 within a group) plus
    well-separated noise vectors. Threshold 0.95 has wide margin on
    both sides, so a gemm-vs-dot ulp difference can't flip a pair."""
    rng = np.random.RandomState(seed)
    vecs, ids = [], []
    vid = 0
    for g in range(n_groups):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        for _ in range(dup_per_group):
            vecs.append(base + rng.normal(scale=1e-4, size=dim))
            ids.append(vid)
            vid += 1
    for _ in range(n_noise):
        vecs.append(rng.normal(size=dim) * 3)
        ids.append(vid)
        vid += 1
    return (np.asarray(ids, dtype=np.int64),
            np.asarray(vecs, dtype=np.float64))


def _ds(ids, V, n_blocks):
    import ray.data as rd
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32()))})
    return rd.from_arrow(t).repartition(n_blocks)


def test_semdedup_matches_reference_any_partitioning(ray_session):
    ids, V = _corpus()
    # float32 storage: the reference must see the same rounded values
    V32 = V.astype(np.float32).astype(np.float64)
    want = semdedup_reference(ids, V32, k=5, iters=6, threshold=0.95)
    assert len(want) < len(ids)            # something was deduped
    for n_blocks in (2, 5):
        got = sorted(semdedup_keep(_ds(ids, V, n_blocks), dim=16, k=5,
                                   iters=6, threshold=0.95)
                     .to_pandas()["vec_id"].tolist())
        assert got == want, n_blocks


def test_semdedup_keeps_component_minimum(ray_session):
    ids, V = _corpus(n_groups=3, dup_per_group=3, n_noise=5)
    V32 = V.astype(np.float32).astype(np.float64)
    kept = set(semdedup_reference(ids, V32, k=3, iters=4,
                                  threshold=0.95))
    # group g occupies ids [3g, 3g+2]; min survives
    for g in range(3):
        assert 3 * g in kept
        assert 3 * g + 1 not in kept and 3 * g + 2 not in kept


def test_semantic_pairs_mega_cluster_star(ray_session):
    # one cluster far over max_cluster: star pairs keep it connected
    rng = np.random.RandomState(1)
    base = rng.normal(size=8)
    base /= np.linalg.norm(base)
    n = 30
    V = np.stack([base + rng.normal(scale=1e-5, size=8)
                  for _ in range(n)])
    ids = np.arange(n, dtype=np.int64)
    # k=1 forces ONE cluster (k=2 may legitimately split the near-
    # identical ball between two centroids, giving two stars)
    pairs = semantic_pairs(_ds(ids, V, 3), dim=8, k=1, iters=2,
                           threshold=0.95, max_cluster=10).to_pandas()
    got = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    assert {(0, b) for b in range(1, n)} <= got
    kept = semdedup_keep(_ds(ids, V, 3), dim=8, k=1, iters=2,
                         threshold=0.95, max_cluster=10) \
        .to_pandas()["vec_id"].tolist()
    assert kept == [0]
