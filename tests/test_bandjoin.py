"""Temporal band self-join vs brute force: boundary crossings,
ownership dedup, exact window edge."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.bandjoin import band_self_join


def _brute(rows, w):
    out = set()
    for i, (k1, t1, e1) in enumerate(rows):
        for k2, t2, e2 in rows:
            if k1 == k2 and (t1, e1) < (t2, e2) and t2 - t1 <= w:
                out.add((k1, e1, e2, t2 - t1))
    return out


def _run(rows, w, n_blocks=3):
    import ray.data as rd
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64())})
    ds = rd.from_arrow(t).repartition(n_blocks)
    out = band_self_join(ds, w).to_pandas()
    return {(r.key, r.id_a, r.id_b, r.dt_us) for r in out.itertuples()}


def test_band_join_edges(ray_session):
    w = 100
    rows = [
        (1, 0, 10), (1, 100, 11),     # dt == w: inclusive
        (1, 201, 12),                 # dt 101 from 11: out
        (1, 95, 13), (1, 105, 14),    # crosses cell boundary (cell=0/1)
        (2, 95, 20), (2, 400, 21),    # far apart: no pair
        (3, 50, 30), (3, 50, 31),     # tie ts -> id order, dt 0
    ]
    assert _run(rows, w) == _brute(rows, w)


def test_band_join_random_vs_brute(ray_session):
    rng = np.random.RandomState(4)
    rows = []
    eid = 0
    for _ in range(400):
        rows.append((int(rng.randint(0, 12)),
                     int(rng.randint(0, 3000)), eid))
        eid += 1
    # unique (key, ts) not required; (ts,id) ordering disambiguates
    w = 250
    assert _run(rows, w, n_blocks=5) == _brute(rows, w)


def test_band_join_no_duplicate_pairs(ray_session):
    rng = np.random.RandomState(6)
    rows = [(1, int(rng.randint(0, 1000)), i) for i in range(120)]
    import ray.data as rd
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64())})
    out = band_self_join(rd.from_arrow(t).repartition(4),
                         100).to_pandas()
    assert not out.duplicated(["key", "id_a", "id_b"]).any()


def test_trailing_window_sum_vs_brute(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.bandjoin import trailing_window_sum
    rng = np.random.RandomState(8)
    rows = []
    for i in range(500):
        rows.append((int(rng.randint(0, 10)),
                     int(rng.randint(0, 2000)), i,
                     float(rng.uniform(0, 50))))
    # force equal-ts peers
    rows += [(1, 777, 9001, 5.0), (1, 777, 9002, 7.0),
             (1, 877, 9003, 1.0)]   # exactly W after 777 with W=100
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] for r in rows], pa.float64())})
    w = 100
    out = trailing_window_sum(rd.from_arrow(t).repartition(4), w) \
        .to_pandas()
    got = {r.event_id: (r.trail_cents, r.n_window)
           for r in out.itertuples()}
    cents = {r[2]: int(np.floor(r[3] * 100.0)) for r in rows}
    for k, ts, eid, _v in rows:
        contrib = [cents[e2] for k2, t2, e2, _ in rows
                   if k2 == k and ts - w <= t2 <= ts]
        assert got[eid] == (sum(contrib), len(contrib)), eid
    # peers at equal ts see identical windows (RANGE semantics), and
    # the inclusive ts-W edge keeps both in 9003's window
    assert got[9001] == got[9002]
    assert got[9003][1] >= got[9001][1] + 1
