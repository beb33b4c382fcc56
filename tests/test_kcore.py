"""k-core oracles: h-index fixpoint vs brute peeling on random
graphs; known shapes; shard invariance."""

import numpy as np
import pyarrow as pa


def _brute_core(rows):
    """Classic peeling: repeatedly remove the min-degree node."""
    adj = {}
    for s, d in rows:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    core = {}
    k = 0
    left = dict(adj)
    while left:
        v = min(left, key=lambda u: (len(left[u]), u))
        k = max(k, len(left[v]))
        core[v] = k
        for u in left[v]:
            left[u].discard(v)
        del left[v]
    return core


def _ds(rows, nblocks=3):
    import ray.data as rd
    t = pa.table({"src": pa.array([r[0] for r in rows], pa.int64()),
                  "dst": pa.array([r[1] for r in rows], pa.int64())})
    return rd.from_arrow(t).repartition(nblocks)


def test_triangle_plus_tail(ray_session):
    from tilemaker_ray.stages.pagerank import kcore_numbers
    rows = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    out = kcore_numbers(_ds(rows))
    got = dict(zip(out["node"].to_pylist(), out["core"].to_pylist()))
    assert got == {1: 2, 2: 2, 3: 2, 4: 1, 5: 1}


def test_clique(ray_session):
    from tilemaker_ray.stages.pagerank import kcore_numbers
    rows = [(i, j) for i in range(5) for j in range(5) if i < j]
    out = kcore_numbers(_ds(rows))
    assert set(out["core"].to_pylist()) == {4}


def test_random_graph_vs_peeling_and_shards(ray_session):
    from tilemaker_ray.stages.pagerank import kcore_numbers
    rng = np.random.RandomState(17)
    ids = rng.choice(10**5, size=40, replace=False).astype(np.int64)
    rows = set()
    for _ in range(300):
        a, b = rng.randint(0, 40, 2)
        if a != b:
            rows.add((int(min(ids[a], ids[b])),
                      int(max(ids[a], ids[b]))))
    rows = sorted(rows)
    want = _brute_core(rows)
    for P in (2, 6):
        out = kcore_numbers(_ds(rows), n_shards=P)
        got = dict(zip(out["node"].to_pylist(),
                       out["core"].to_pylist()))
        assert got == want, P


def test_directed_input_symmetrized(ray_session):
    """Duplicate opposite-direction edges must not double degrees."""
    from tilemaker_ray.stages.pagerank import kcore_numbers
    rows = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3)]
    out = kcore_numbers(_ds(rows, nblocks=2))
    got = dict(zip(out["node"].to_pylist(), out["core"].to_pylist()))
    assert got == {1: 2, 2: 2, 3: 2}
