"""Distributed KMeans: bit-exact vs the single-process fixed-point
reference, and partition-invariant."""

import numpy as np
import pyarrow.parquet as pq

from tilemaker_ray.stages.cluster import kmeans_fixed, kmeans_reference

SF = "/root/testdata/sf0.001"


def _load():
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return t, ids, V


def test_kmeans_matches_reference(ray_session):
    import ray.data as rd
    t, ids, V = _load()
    ds = rd.from_arrow(t)
    assign, cent = kmeans_fixed(ds, k=8, iters=8, dim=V.shape[1])
    got = assign.to_pandas().sort_values("vec_id")
    want = kmeans_reference(ids, V, k=8, iters=8)
    order = np.argsort(ids)
    assert np.array_equal(got["cluster"].to_numpy(), want[order])
    # every cluster non-degenerate on this data
    assert len(set(got["cluster"])) > 1


def test_kmeans_partition_invariant(ray_session):
    import ray.data as rd
    t, ids, V = _load()
    a1, c1 = kmeans_fixed(rd.from_arrow(t).repartition(1), k=8, iters=8,
                          dim=V.shape[1])
    a8, c8 = kmeans_fixed(rd.from_arrow(t).repartition(8), k=8, iters=8,
                          dim=V.shape[1])
    assert np.array_equal(c1, c8)
    p1 = a1.to_pandas().sort_values("vec_id").reset_index(drop=True)
    p8 = a8.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert p1.equals(p8)


def test_kmeans_integer_matches_reference(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.cluster import (kmeans_integer,
                                              kmeans_integer_reference)
    t, ids, V = _load()
    ds = rd.from_arrow(t)
    assign, cent = kmeans_integer(ds, k=8, iters=8, dim=V.shape[1])
    got = assign.to_pandas().sort_values("vec_id")
    want_a, want_c = kmeans_integer_reference(ids, V, k=8, iters=8)
    order = np.argsort(ids)
    assert np.array_equal(got["cluster"].to_numpy(), want_a[order])
    assert np.array_equal(cent, want_c)
    assert cent.dtype == np.int64          # integer end to end
    assert len(set(got["cluster"])) > 1


def test_kmeans_integer_partition_invariant(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.cluster import kmeans_integer
    t, ids, V = _load()
    a1, c1 = kmeans_integer(rd.from_arrow(t).repartition(1), k=8,
                            iters=8, dim=V.shape[1])
    a8, c8 = kmeans_integer(rd.from_arrow(t).repartition(8), k=8,
                            iters=8, dim=V.shape[1])
    assert np.array_equal(c1, c8)
    p1 = a1.to_pandas().sort_values("vec_id").reset_index(drop=True)
    p8 = a8.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert p1.equals(p8)
