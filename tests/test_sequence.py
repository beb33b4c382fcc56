"""Funnel + ordered collect vs brute-force oracles (ordering edge
cases: steps out of order, strict-after ties, multi-block users)."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.sequence import collect_ordered, funnel

STEPS = ["view", "click", "purchase"]


def _brute_funnel(rows, steps):
    # rows: (user, ts_us, type)
    out = {}
    for u in {r[0] for r in rows}:
        evs = [(t, ty) for (uu, t, ty) in rows if uu == u]
        t_prev, reached, t_final = None, 0, None
        for k, s in enumerate(steps):
            cand = [t for (t, ty) in evs if ty == s
                    and (k == 0 or (t_prev is not None and t > t_prev))]
            if k > 0 and t_prev is None:
                break
            if not cand:
                break
            t_prev = min(cand)
            reached, t_final = k + 1, t_prev
        out[u] = (reached, t_final)
    return out


def _events_ds(rows, n_blocks=3):
    import ray.data as rd
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
    })
    return rd.from_arrow(t).repartition(n_blocks)


def test_funnel_brute(ray_session):
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),  # full
        (2, 10, "click"), (2, 20, "view"), (2, 30, "purchase"),  # click
        # before view does not count; purchase after view counts only
        # with a click in between -> user 2 reaches 1
        (3, 10, "view"), (3, 10, "click"),                       # tie:
        # click NOT strictly after view -> reached 1
        (4, 5, "purchase"), (4, 6, "view"),                      # 1
        (5, 1, "error"),                                         # 0
        (6, 1, "view"), (6, 2, "click"), (6, 2, "purchase"),     # tie at
        # click/purchase -> purchase not strictly after -> 2
        (7, 1, "view"), (7, 2, "click"), (7, 3, "click"),
        (7, 4, "purchase"),                                      # 3
    ]
    out = funnel(_events_ds(rows), STEPS).to_pandas()
    got = {r.user_id: (r.reached,
                       None if np.isnan(r.ts_final) else int(r.ts_final))
           for r in out.itertuples()}
    want = _brute_funnel(rows, STEPS)
    assert got == want
    assert got[1] == (3, 30) and got[2] == (1, 20)
    assert got[3] == (1, 10) and got[6] == (2, 2) and got[5] == (0, None)


def test_funnel_random_vs_brute(ray_session):
    rng = np.random.RandomState(7)
    types = ["view", "click", "purchase", "error"]
    rows = [(int(rng.randint(0, 40)), int(rng.randint(0, 50)),
             types[rng.randint(0, 4)]) for _ in range(600)]
    # dedupe (user, ts) collisions to keep the brute oracle well-defined
    seen, uniq = set(), []
    for r in rows:
        if (r[0], r[1]) not in seen:
            seen.add((r[0], r[1]))
            uniq.append(r)
    out = funnel(_events_ds(uniq, n_blocks=5), STEPS).to_pandas()
    got = {r.user_id: (r.reached,
                       None if np.isnan(r.ts_final) else int(r.ts_final))
           for r in out.itertuples()}
    assert got == _brute_funnel(uniq, STEPS)


def test_collect_ordered_brute(ray_session):
    rows = [(1, 3, "c"), (1, 1, "a"), (1, 2, "b"),
            (2, 5, "x"), (2, 5, "y"),      # ts tie -> event_id order
            (3, 9, "solo")]
    ds = _events_ds(rows, n_blocks=2)
    out = collect_ordered(ds, value_col="event_type").to_pandas()
    got = {r.user_id: (r.n_events, r.seq) for r in out.itertuples()}
    assert got[1] == (3, "a,b,c")
    assert got[2] == (2, "x,y")            # event_id 3 before 4
    assert got[3] == (1, "solo")
