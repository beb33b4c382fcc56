"""Sigma-BFS (shortest-path counts) oracles: layered brute reference
on random sparse graphs, shard-count invariance, isolated sources,
diamond multiplicities."""

import numpy as np
import pyarrow as pa


def _brute_sigma(rows, srcs, max_hops):
    """Single-process layered BFS with path counting."""
    adj = {}
    for s, d in rows:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in srcs}
    sigma = {s: 1 for s in srcs}
    frontier = dict.fromkeys(srcs, 1)
    for h in range(1, max_hops + 1):
        nxt = {}
        for u, su in frontier.items():
            for v in adj.get(u, []):
                if v in dist and dist[v] < h:
                    continue
                nxt[v] = nxt.get(v, 0) + sigma[u]
        frontier = {}
        for v, sv in nxt.items():
            if v not in dist:
                dist[v] = h
                sigma[v] = sv
                frontier[v] = sv
        if not frontier:
            break
    return dist, sigma


def test_sigma_diamond():
    """s->a,b ; a,b->t : two shortest paths to t."""
    import ray.data as rd
    from tilemaker_ray.stages.pagerank import bfs_path_counts
    rows = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    t = pa.table({"src": pa.array([r[0] for r in rows], pa.int64()),
                  "dst": pa.array([r[1] for r in rows], pa.int64())})
    out = bfs_path_counts(rd.from_arrow(t), [1], max_hops=8)
    got = {n: (h, s) for n, h, s in zip(out["node"].to_pylist(),
                                        out["hop"].to_pylist(),
                                        out["sigma"].to_pylist())}
    assert got == {1: (0, 1), 2: (1, 1), 3: (1, 1), 4: (2, 2),
                   5: (3, 2)}


def test_sigma_random_graph_vs_brute(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.pagerank import bfs_path_counts
    rng = np.random.RandomState(11)
    ids = rng.choice(10**6, size=50, replace=False).astype(np.int64)
    rows = set()
    for _ in range(400):
        a, b = rng.randint(0, 50, 2)
        if a != b:
            rows.add((int(ids[a]), int(ids[b])))
    rows = sorted(rows)
    t = pa.table({"src": pa.array([r[0] for r in rows], pa.int64()),
                  "dst": pa.array([r[1] for r in rows], pa.int64())})
    srcs = [int(ids[0]), int(ids[7])]
    dist, sigma = _brute_sigma(rows, srcs, 6)
    for P in (2, 8):
        out = bfs_path_counts(rd.from_arrow(t).repartition(3), srcs,
                              max_hops=6, n_shards=P)
        got_h = dict(zip(out["node"].to_pylist(),
                         out["hop"].to_pylist()))
        got_s = dict(zip(out["node"].to_pylist(),
                         out["sigma"].to_pylist()))
        assert got_h == dist, P
        assert got_s == sigma, P


def test_sigma_isolated_source(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.pagerank import bfs_path_counts
    t = pa.table({"src": pa.array([1, 2], pa.int64()),
                  "dst": pa.array([2, 3], pa.int64())})
    out = bfs_path_counts(rd.from_arrow(t), [99], max_hops=4)
    got = {n: (h, s) for n, h, s in zip(out["node"].to_pylist(),
                                        out["hop"].to_pylist(),
                                        out["sigma"].to_pylist())}
    assert got == {99: (0, 1)}
