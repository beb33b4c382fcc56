"""Brute-force oracle for the Moran's I kernel (stages/spatialstats)."""

import numpy as np
import pyarrow as pa
import pytest

from tilemaker_ray.stages.spatialstats import (geary_finish,
                                               moran_finish,
                                               moran_scalars)


def _brute(x, y, n):
    """O(N^2) rook Moran's I + exact integer sufficient stats."""
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.int64)
    n = np.asarray(n, np.int64)
    N = len(n)
    A = B = W = G = 0
    for i in range(N):
        for j in range(N):
            if abs(int(x[i] - x[j])) + abs(int(y[i] - y[j])) == 1:
                A += int(n[i]) * int(n[j])
                B += int(n[i]) + int(n[j])
                G += (int(n[i]) - int(n[j])) ** 2
                W += 1
    S = int(n.sum())
    SS = int((n.astype(object) ** 2).sum())
    D2 = sum(sum(1 for j in range(N)
                 if abs(int(x[i] - x[j])) +
                    abs(int(y[i] - y[j])) == 1) ** 2
             for i in range(N))
    sc = {"n_tiles": N, "w_pairs": W, "sum_x": S, "sum_xx": SS,
          "cross_a": A, "cross_b": B, "cross_sq": G, "deg_sq": D2}
    if N == 0 or W == 0:
        return sc, None, None
    xbar = S / N
    den = SS - N * xbar * xbar
    if den == 0.0:
        return sc, None, None
    num = sum((int(n[i]) - xbar) * (int(n[j]) - xbar)
              for i in range(N) for j in range(N)
              if abs(int(x[i] - x[j])) + abs(int(y[i] - y[j])) == 1)
    return sc, (N / W) * (num / den), ((N - 1) * G) / (2 * W * den)


def _run(x, y, n, ray_session):
    import ray.data as rd
    t = pa.table({"tile_x": pa.array(x, pa.int64()),
                  "tile_y": pa.array(y, pa.int64()),
                  "n_events": pa.array(n, pa.int64())})
    ds = rd.from_arrow(t).repartition(3)
    sc = moran_scalars(ds)
    return sc, moran_finish(sc), geary_finish(sc)


def test_moran_matches_brute(ray_session):
    rng = np.random.RandomState(7)
    cells = rng.choice(15 * 15, size=60, replace=False)
    x, y = cells // 15, cells % 15
    n = rng.randint(1, 40, size=60)
    sc, mi, gc = _run(x, y, n, ray_session)
    ref_sc, ref_mi, ref_gc = _brute(x, y, n)
    assert sc == ref_sc
    assert mi == pytest.approx(ref_mi, rel=1e-9)
    assert gc == pytest.approx(ref_gc, rel=1e-9)


def test_moran_clustered_vs_dispersed(ray_session):
    # a solid 4x4 block of high counts is positively autocorrelated;
    # a checkerboard of alternating high/low is negatively.
    xs, ys, hi, lo = [], [], [], []
    for i in range(6):
        for j in range(6):
            xs.append(i)
            ys.append(j)
            hi.append(50 if (i < 3 and j < 3) else 1)
            lo.append(50 if (i + j) % 2 == 0 else 1)
    _, mi_hi, gc_hi = _run(xs, ys, hi, ray_session)
    _, mi_lo, gc_lo = _run(xs, ys, lo, ray_session)
    assert mi_hi > 0.3
    assert mi_lo < -0.9
    # Geary: clustered < 1 < dispersed
    assert gc_hi < 1.0 < gc_lo


def test_moran_degenerate(ray_session):
    # no adjacent pairs -> W = 0 -> None
    _, mi, gc = _run([0, 5, 9], [0, 5, 9], [3, 4, 5], ray_session)
    assert mi is None and gc is None
    # constant surface -> zero variance -> None
    _, mi2, gc2 = _run([0, 1, 2], [0, 0, 0], [7, 7, 7], ray_session)
    assert mi2 is None and gc2 is None


def test_moran_two_tiles_exact(ray_session):
    # hand-computed: x = [2, 6] adjacent; xbar = 4, dev = [-2, 2]
    # num = 2 * (-2*2) = -8, den = 8, W = 2, N = 2 -> I = -1
    sc, mi, gc = _run([3, 4], [9, 9], [2, 6], ray_session)
    assert sc["w_pairs"] == 2 and sc["cross_a"] == 24
    assert sc["cross_sq"] == 32
    assert mi == pytest.approx(-1.0)
    # C = (N-1)*G / (2W*den) = 1*32 / (2*2*8) = 1.0
    assert gc == pytest.approx(1.0)


def test_gi_star_matches_brute(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.spatialstats import (gi_star_cells,
                                                   gi_star_finish_fn)
    rng = np.random.RandomState(19)
    cells = rng.choice(12 * 12, size=50, replace=False)
    x, y = (cells // 12).astype(np.int64), (cells % 12).astype(np.int64)
    n = rng.randint(1, 30, size=50).astype(np.int64)
    t = pa.table({"tile_x": pa.array(x, pa.int64()),
                  "tile_y": pa.array(y, pa.int64()),
                  "n_events": pa.array(n, pa.int64())})
    ds = rd.from_arrow(t).repartition(3)
    N, SX, SXX = len(n), int(n.sum()), int((n * n).sum())
    got = (gi_star_cells(ds)
           .map_batches(lambda b: gi_star_finish_fn(b, N, SX, SXX),
                        batch_format="pyarrow")
           .to_pandas().set_index(["tile_x", "tile_y"]).sort_index())
    # brute per cell
    xbar = SX / N
    s = np.sqrt(SXX / N - xbar * xbar)
    for i in range(N):
        nb = [j for j in range(N)
              if abs(int(x[i] - x[j])) + abs(int(y[i] - y[j])) == 1]
        s_i = int(n[i]) + sum(int(n[j]) for j in nb)
        k_i = 1 + len(nb)
        den = s * np.sqrt((N * float(k_i) - float(k_i) * k_i)
                          / (N - 1.0))
        row = got.loc[(x[i], y[i])]
        assert row["s_i"] == s_i and row["k_i"] == k_i
        if den > 0:
            assert row["gi_star"] == pytest.approx(
                (s_i - xbar * k_i) / den, rel=1e-12)
        else:
            assert np.isnan(row["gi_star"])


def test_moran_significance_brute(ray_session):
    import math
    from tilemaker_ray.stages.spatialstats import moran_significance
    rng = np.random.RandomState(23)
    cells = rng.choice(10 * 10, size=40, replace=False)
    x, y = (cells // 10).astype(int), (cells % 10).astype(int)
    n = rng.randint(1, 20, size=40)
    sc, mi, _ = _run(x, y, n, ray_session)
    ei, zi = moran_significance(sc, mi)
    # brute: E and Var under normality with binary symmetric weights
    N = sc["n_tiles"]
    W = sc["w_pairs"]
    deg = {}
    for i in range(N):
        deg[i] = sum(1 for j in range(N)
                     if abs(int(x[i] - x[j])) +
                        abs(int(y[i] - y[j])) == 1)
    S1 = 2 * W
    S2 = 4 * sum(d * d for d in deg.values())
    assert sc["deg_sq"] == sum(d * d for d in deg.values())
    E = -1.0 / (N - 1)
    V = (N * N * S1 - N * S2 + 3 * W * W) / \
        ((N * N - 1) * W * W) - E * E
    assert ei == pytest.approx(E)
    assert zi == pytest.approx((mi - E) / math.sqrt(V), rel=1e-9)


def test_hausdorff_tracks_brute(ray_session, tmp_path):
    # symmetric Hausdorff over the sampled panel == O(U^2 P^2) brute
    import duckdb
    import pandas as pd
    from tilemaker_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["hausdorff_tracks"](sf).to_pandas() \
        .sort_values(["user_a", "user_b"]).reset_index(drop=True)
    ev = duckdb.sql(
        f"SELECT event_id, user_id FROM "
        f"read_parquet('{sf}/events.parquet')").fetchdf()
    ev = ev[ev.user_id % 7 == 0]
    tracks = {}
    for eid, uidv in zip(ev.event_id.astype("int64"),
                         ev.user_id.astype("int64")):
        x = (eid * 2654435761) % 360000 - 180000
        y = (eid * 40503) % 170000 - 85000
        tracks.setdefault(int(uidv), []).append((int(x), int(y)))

    def directed(A, B):
        return max(min((ax - bx) ** 2 + (ay - by) ** 2
                       for bx, by in B) for ax, ay in A)

    users = sorted(tracks)
    rows = []
    for i, a in enumerate(users):
        for b in users[i + 1:]:
            h = max(directed(tracks[a], tracks[b]),
                    directed(tracks[b], tracks[a]))
            rows.append((a, b, h))
    want = pd.DataFrame(rows, columns=["user_a", "user_b",
                                       "hausdorff_d2"])
    assert got.astype("int64").equals(want.astype("int64"))
    # identity: a track vs itself is 0
    A = tracks[users[0]]
    assert directed(A, A) == 0
