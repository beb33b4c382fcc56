"""Exact spatial kNN self-join vs numpy brute force — including the
guarantee-failure fallback path (forced with oversized cells)."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.knn_graph import knn_graph


def _brute(ids, x, y, k, probe_mod):
    out = {}
    for i in range(len(ids)):
        if ids[i] % probe_mod != 0:
            continue
        d2 = (x - x[i]) ** 2 + (y - y[i]) ** 2
        d2[ids == ids[i]] = np.inf
        order = np.lexsort((ids, d2))
        sel = order[np.isfinite(d2[order])][:k]
        out[int(ids[i])] = [(int(ids[j]), float(d2[j])) for j in sel]
    return out


def _run(ids, x, y, ray_kwargs):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "lon": pa.array(x, pa.float64()),
        "lat": pa.array(y, pa.float64())}))
    got = knn_graph(ds, **ray_kwargs).to_pandas()
    res = {}
    for r in got.sort_values(["event_id", "rank"]).itertuples():
        res.setdefault(int(r.event_id), []).append(
            (int(r.neighbor_id), float(r.neighbor_dist2)))
    return res


def test_knn_graph_matches_brute(ray_session):
    rng = np.random.RandomState(5)
    n = 400
    ids = np.arange(1, n + 1) * 7  # multiples of 20 exist (140, ...)
    x = rng.uniform(-170, 170, n)
    y = rng.uniform(-80, 80, n)
    want = _brute(ids, x, y, k=3, probe_mod=20)
    got = _run(ids, x, y, dict(k=3, n_cells=32, probe_mod=20))
    assert got == want
    assert len(want) > 5


def test_knn_graph_sparse_forces_fallback(ray_session):
    """Very fine grid → empty 3×3 neighborhoods → every probe fails the
    guarantee and resolves through the broadcast fallback, still
    exactly."""
    rng = np.random.RandomState(9)
    n = 60
    ids = np.arange(n) * 10  # all probes (mod 20 hits half)
    x = rng.uniform(-170, 170, n)
    y = rng.uniform(-80, 80, n)
    want = _brute(ids, x, y, k=3, probe_mod=20)
    got = _run(ids, x, y, dict(k=3, n_cells=256, probe_mod=20))
    assert got == want


def test_knn_graph_isolated_probe(ray_session):
    """A probe alone in a far corner has no neighborhood candidates —
    the sentinel path must still produce its exact global kNN."""
    ids = np.array([20, 40, 60, 7, 11], dtype=np.int64)
    x = np.array([150.0, -150.0, 0.0, 1.0, 2.0])
    y = np.array([80.0, -80.0, 0.0, 1.0, 2.0])
    want = _brute(ids, x, y, k=2, probe_mod=20)
    got = _run(ids, x, y, dict(k=2, n_cells=64, probe_mod=20))
    assert got == want
