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
