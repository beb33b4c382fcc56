import numpy as np
import pyarrow as pa

from tilemaker_ray.geo.hull import convex_hull


def _gift_wrap(pts):
    """O(n·h) Jarvis march brute reference (strict turns, dedup)."""
    P = sorted(set(map(tuple, pts)))
    if len(P) <= 2:
        return P
    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) \
            - (a[1] - o[1]) * (b[0] - o[0])
    # start at lexicographically smallest, walk CCW picking the point
    # that makes every other point a strict left turn
    start = P[0]
    hull = [start]
    cur = start
    while True:
        cand = None
        for p in P:
            if p == cur:
                continue
            if cand is None:
                cand = p
                continue
            c = cross(cur, cand, p)
            if c < 0 or (c == 0 and
                         (abs(p[0] - cur[0]) + abs(p[1] - cur[1])) >
                         (abs(cand[0] - cur[0]) + abs(cand[1] - cur[1]))):
                cand = p
        hull.append(cand)
        cur = cand
        if cur == start:
            break
    hull = hull[:-1]
    if all(cross(hull[0], hull[1], p) == 0 for p in P) \
            if len(hull) >= 2 else True:
        return [P[0], P[-1]] if len(P) > 1 else P
    return hull


def test_hull_vs_gift_wrap_random():
    rng = np.random.RandomState(5)
    for trial in range(8):
        n = int(rng.randint(3, 120))
        x = rng.randint(-50, 50, n).astype(np.int64)
        y = rng.randint(-50, 50, n).astype(np.int64)
        hx, hy = convex_hull(x, y)
        got = list(zip(hx.tolist(), hy.tolist()))
        want = _gift_wrap(list(zip(x.tolist(), y.tolist())))
        assert got == [tuple(p) for p in want], trial


def test_hull_degenerate():
    # single point / duplicates / all collinear
    hx, hy = convex_hull(np.array([3, 3, 3]), np.array([4, 4, 4]))
    assert hx.tolist() == [3] and hy.tolist() == [4]
    hx, hy = convex_hull(np.array([0, 1, 2, 3]), np.array([0, 1, 2, 3]))
    assert list(zip(hx.tolist(), hy.tolist())) == [(0, 0), (3, 3)]
    hx, hy = convex_hull(np.array([0, 0, 1, 1]), np.array([0, 1, 0, 1]))
    assert list(zip(hx.tolist(), hy.tolist())) \
        == [(0, 0), (1, 0), (1, 1), (0, 1)]


def test_hull_merge_decomposition():
    # hull of union == hull of (hull(A) ∪ hull(B)) — the distributed
    # invariant the query relies on
    rng = np.random.RandomState(9)
    x = rng.randint(-1000, 1000, 400).astype(np.int64)
    y = rng.randint(-1000, 1000, 400).astype(np.int64)
    fx, fy = convex_hull(x, y)
    ax, ay = convex_hull(x[:137], y[:137])
    bx, by = convex_hull(x[137:], y[137:])
    mx, my = convex_hull(np.concatenate([ax, bx]),
                         np.concatenate([ay, by]))
    assert fx.tolist() == mx.tolist() and fy.tolist() == my.tolist()


def test_hull_query_partition_invariance(ray_session):
    from tilemaker_ray.pipelines.queries import QUERIES
    sf = "/root/testdata/sf0.001"
    a = QUERIES["convex_hull_events"](sf).to_pandas()
    b = QUERIES["convex_hull_events"](sf).to_pandas()
    assert a.equals(b) and len(a) >= 3
    # every input point lies inside-or-on the hull: check via cross
    import duckdb
    eid = duckdb.sql(
        f"SELECT event_id FROM read_parquet('{sf}/events.parquet')"
    ).fetchnumpy()["event_id"].astype(np.int64)
    x = (eid * 2654435761) % 360000 - 180000
    y = (eid * 40503) % 170000 - 85000
    hx = a["x_mil"].to_numpy()
    hy = a["y_mil"].to_numpy()
    for i in range(len(hx)):
        j = (i + 1) % len(hx)
        c = (hx[j] - hx[i]) * (y - hy[i]) - (hy[j] - hy[i]) * (x - hx[i])
        assert (c >= 0).all(), i
