"""Brandes fixed-point dependency oracles: single-process brute
recursion (bit-exact), shard-count invariance, diamond/path shapes,
float-Brandes agreement within truncation bounds."""

import numpy as np
import pyarrow as pa

SCALE = 10**6


def _brute(rows, srcs, max_hops):
    """Forward sigma + backward fixed-point delta, single-process."""
    adj = {}
    for s, d in rows:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in srcs}
    sigma = {s: 1 for s in srcs}
    frontier = dict.fromkeys(srcs, 1)
    for h in range(1, max_hops + 1):
        nxt = {}
        for u in frontier:
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
    delta = dict.fromkeys(dist, 0)
    maxh = max(dist.values()) if dist else 0
    for h in range(maxh, 0, -1):
        for u, w in rows:
            if dist.get(w) == h and dist.get(u) == h - 1:
                delta[u] += sigma[u] * (SCALE + delta[w]) // sigma[w]
    return dist, sigma, delta


def test_path_and_diamond(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.pagerank import betweenness_delta_fp
    rows = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    t = pa.table({"src": pa.array([r[0] for r in rows], pa.int64()),
                  "dst": pa.array([r[1] for r in rows], pa.int64())})
    out = betweenness_delta_fp(rd.from_arrow(t), [1], max_hops=8)
    got = {n: d for n, d in zip(out["node"].to_pylist(),
                                out["delta_fp"].to_pylist())}
    # hand values: delta(5)=0; delta(4)=2·S//2=S (successor 5);
    # delta(2)=delta(3)=1·(S+S)//2=S via the shared sink
    _, _, want = _brute(rows, [1], 8)
    assert got == want
    assert got[5] == 0 and got[4] == SCALE
    assert got[2] == got[3] == SCALE


def test_random_graph_vs_brute_and_shard_invariance(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.pagerank import betweenness_delta_fp
    rng = np.random.RandomState(23)
    ids = rng.choice(10**6, size=40, replace=False).astype(np.int64)
    rows = set()
    for _ in range(250):
        a, b = rng.randint(0, 40, 2)
        if a != b:
            rows.add((int(ids[a]), int(ids[b])))
    rows = sorted(rows)
    t = pa.table({"src": pa.array([r[0] for r in rows], pa.int64()),
                  "dst": pa.array([r[1] for r in rows], pa.int64())})
    srcs = [int(ids[0])]
    dist, sigma, delta = _brute(rows, srcs, 6)
    results = []
    for P in (2, 7):
        out = betweenness_delta_fp(rd.from_arrow(t).repartition(3),
                                   srcs, max_hops=6, n_shards=P)
        got = {n: (h, s, d) for n, h, s, d in zip(
            out["node"].to_pylist(), out["hop"].to_pylist(),
            out["sigma"].to_pylist(), out["delta_fp"].to_pylist())}
        assert got == {v: (dist[v], sigma[v], delta[v])
                       for v in dist}, P
        results.append(got)
    assert results[0] == results[1]


def test_close_to_float_brandes(ray_session):
    """Fixed-point delta within n_edges/SCALE of real-valued Brandes."""
    import ray.data as rd
    from tilemaker_ray.stages.pagerank import betweenness_delta_fp
    rng = np.random.RandomState(5)
    rows = set()
    for _ in range(120):
        a, b = rng.randint(0, 25, 2)
        if a != b:
            rows.add((int(a), int(b)))
    rows = sorted(rows)
    dist, sigma, _ = _brute(rows, [0], 6)
    # real-valued reference
    deltaf = dict.fromkeys(dist, 0.0)
    maxh = max(dist.values())
    for h in range(maxh, 0, -1):
        for u, w in rows:
            if dist.get(w) == h and dist.get(u) == h - 1:
                deltaf[u] += sigma[u] * (1.0 + deltaf[w]) / sigma[w]
    t = pa.table({"src": pa.array([r[0] for r in rows], pa.int64()),
                  "dst": pa.array([r[1] for r in rows], pa.int64())})
    out = betweenness_delta_fp(rd.from_arrow(t), [0], max_hops=6)
    for n, d in zip(out["node"].to_pylist(),
                    out["delta_fp"].to_pylist()):
        assert abs(d / SCALE - deltaf[n]) < 0.01, n


def test_isolated_source(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.pagerank import betweenness_delta_fp
    t = pa.table({"src": pa.array([1], pa.int64()),
                  "dst": pa.array([2], pa.int64())})
    out = betweenness_delta_fp(rd.from_arrow(t), [77], max_hops=4)
    assert out["node"].to_pylist() == [77]
    assert out["delta_fp"].to_pylist() == [0]
