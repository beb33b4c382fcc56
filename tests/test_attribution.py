"""Brute-force oracle for last-touch attribution (stages/sequence)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from tilemaker_ray.stages.sequence import last_touch_attribution


def _brute(df: pd.DataFrame, touches, conv):
    out = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        last = None  # (event_id, type, ts)
        for _, r in g.iterrows():
            if r.event_type == conv:
                if last is None:
                    out.append((r.event_id, uid, None, None, None))
                else:
                    out.append((r.event_id, uid, last[0], last[1],
                                int(r.ts - last[2])))
            if r.event_type in touches:
                last = (r.event_id, r.event_type, r.ts)
    return sorted(out)


def _run(df, ray_session):
    import ray.data as rd
    t = pa.table({
        "event_id": pa.array(df.event_id, pa.int64()),
        "ts": pa.array(df.ts, pa.timestamp("us")),
        "user_id": pa.array(df.user_id, pa.int64()),
        "event_type": pa.array(df.event_type, pa.string())})
    ds = rd.from_arrow(t).repartition(4)
    res = last_touch_attribution(
        ds, ["view", "click"], "purchase").to_pandas()
    rows = [(r.purchase_id, r.user_id,
             None if pd.isna(r.touch_id) else int(r.touch_id),
             None if pd.isna(r.touch_type) else r.touch_type,
             None if pd.isna(r.lag_us) else int(r.lag_us))
            for r in res.itertuples()]
    return sorted(rows)


def test_attribution_matches_brute(ray_session):
    rng = np.random.RandomState(5)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.randint(0, 500, n).astype(np.int64),
        "user_id": rng.randint(0, 25, n).astype(np.int64),
        "event_type": rng.choice(
            ["view", "click", "purchase", "scroll"], n)})
    assert _run(df, ray_session) == _brute(
        df, {"view", "click"}, "purchase")


def test_attribution_no_prior_touch(ray_session):
    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": [10, 20, 30],
        "user_id": [7, 7, 8],
        "event_type": ["purchase", "view", "purchase"]})
    got = _run(df, ray_session)
    # user 7 purchases BEFORE any touch; user 8 never touches
    assert got == [(1, 7, None, None, None), (3, 8, None, None, None)]


def test_attribution_same_instant_tiebreak(ray_session):
    # touch and purchase share ts: lower event_id (the touch) is
    # "1 PRECEDING" in (ts, event_id) order, so it attributes
    df = pd.DataFrame({
        "event_id": [4, 5],
        "ts": [100, 100],
        "user_id": [1, 1],
        "event_type": ["click", "purchase"]})
    assert _run(df, ray_session) == [(5, 1, 4, "click", 0)]
