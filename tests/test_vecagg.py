"""Grouped vector centroids: partition invariance + numpy parity."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.vecagg import grouped_centroids

DIM = 8


def _ds(n_blocks):
    import ray.data as rd
    rng = np.random.RandomState(2)
    n = 600
    vecs = rng.randn(n, DIM).astype(np.float32)
    t = pa.table({
        "label": pa.array((np.arange(n) % 5).astype(np.int64)),
        "embedding": pa.array(list(vecs),
                              pa.list_(pa.float32()))})
    return rd.from_arrow(t).repartition(n_blocks), vecs


def test_centroids_partition_invariant_and_correct(ray_session):
    ds1, vecs = _ds(1)
    ds6, _ = _ds(6)
    c1 = grouped_centroids(ds1, "label", "embedding", DIM).to_pandas() \
        .sort_values(["label", "dim"]).reset_index(drop=True)
    c6 = grouped_centroids(ds6, "label", "embedding", DIM).to_pandas() \
        .sort_values(["label", "dim"]).reset_index(drop=True)
    assert c1.equals(c6)                     # bit-identical

    lab = np.arange(600) % 5
    q = np.floor(vecs.astype(np.float64) * 1e6) / 1e6
    for k in range(5):
        ref = q[lab == k].mean(axis=0)
        got = c1[c1["label"] == k].sort_values("dim")["centroid"] \
            .to_numpy()
        assert np.allclose(got, ref, atol=1e-9)
