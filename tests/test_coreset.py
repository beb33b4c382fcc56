"""Brute-force oracle for greedy k-center selection (stages/coreset)."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.coreset import kcenter_select, quantize_fn


def _brute(q: np.ndarray, ids: np.ndarray, k: int):
    """Single-process farthest-point traversal, min-id tie-break."""
    sel = []
    centers = []
    for rank in range(1, k + 1):
        if not centers:
            dm = (q * q).sum(axis=1)
        else:
            cs = np.array(centers, np.int64)
            xx = (q * q).sum(axis=1)[:, None]
            cc = (cs * cs).sum(axis=1)[None, :]
            dm = (xx - 2 * (q @ cs.T) + cc).min(axis=1)
        i = int(np.lexsort((ids, -dm))[0])
        sel.append((rank, int(ids[i]), int(dm[i])))
        centers.append(q[i])
    return sel


def _quant_ds(q, ids, n_parts):
    import ray.data as rd
    cols = {"vec_id": pa.array(ids, pa.int64())}
    for j in range(q.shape[1]):
        cols[f"q{j}"] = pa.array(q[:, j], pa.int64())
    return rd.from_arrow(pa.table(cols)).repartition(n_parts)


def test_kcenter_matches_brute(ray_session):
    rng = np.random.RandomState(11)
    q = rng.randint(-1000, 1000, size=(80, 6)).astype(np.int64)
    ids = rng.permutation(80).astype(np.int64) * 3 + 1
    ref = _brute(q, ids, 5)
    got = kcenter_select(_quant_ds(q, ids, 4), 5, 6)
    assert got == ref


def test_kcenter_partition_invariant(ray_session):
    rng = np.random.RandomState(3)
    q = rng.randint(-500, 500, size=(60, 4)).astype(np.int64)
    ids = np.arange(60, dtype=np.int64)
    a = kcenter_select(_quant_ds(q, ids, 1), 4, 4)
    b = kcenter_select(_quant_ds(q, ids, 7), 4, 4)
    assert a == b == _brute(q, ids, 4)


def test_kcenter_tie_breaks_min_id(ray_session):
    # two copies of the same farthest vector: lower id wins
    q = np.array([[0, 0], [10, 0], [10, 0], [3, 4]], np.int64)
    ids = np.array([7, 5, 2, 1], np.int64)
    got = kcenter_select(_quant_ds(q, ids, 2), 2, 2)
    assert got[0][1] == 2  # seed: max norm 100, ids 5 and 2 tie -> 2
    ref = _brute(q, ids, 2)
    assert got == ref


def test_quantize_shape_guard(ray_session):
    t = pa.table({"vec_id": pa.array([1], pa.int64()),
                  "embedding": pa.array([[0.5, -0.25, 1.0]],
                                        pa.list_(pa.float32()))})
    out = quantize_fn(t, 3)
    assert out["q0"][0].as_py() == 1 << 19
    assert out["q1"][0].as_py() == -(1 << 18)
    assert out["q2"][0].as_py() == 1 << 20
    import pytest
    with pytest.raises(ValueError):
        quantize_fn(t, 4)
