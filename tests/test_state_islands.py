"""Brute-force oracle for gaps-and-islands (stages/sequence)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from tilemaker_ray.stages.sequence import state_islands


def _brute(df):
    out = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        runs = []
        for _, r in g.iterrows():
            if runs and runs[-1][0] == r.event_type:
                runs[-1][2] += 1
            else:
                runs.append([r.event_type, int(r.ts), 1])
        for i, (st, frm, cnt) in enumerate(runs):
            to = runs[i + 1][1] if i + 1 < len(runs) else None
            out.append((uid, st, frm, to, cnt))
    return sorted(out)


def _run(df, ray_session):
    import ray.data as rd
    t = pa.table({
        "event_id": pa.array(df.event_id, pa.int64()),
        "ts": pa.array(df.ts, pa.timestamp("us")),
        "user_id": pa.array(df.user_id, pa.int64()),
        "event_type": pa.array(df.event_type, pa.string())})
    res = state_islands(rd.from_arrow(t).repartition(4)).to_pandas()
    rows = [(r.user_id, r.state, int(r.valid_from_us),
             None if pd.isna(r.valid_to_us) else int(r.valid_to_us),
             int(r.n_events)) for r in res.itertuples()]
    return sorted(rows)


def test_islands_match_brute(ray_session):
    rng = np.random.RandomState(9)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": rng.randint(0, 120, n).astype(np.int64),
        "user_id": rng.randint(0, 12, n).astype(np.int64),
        "event_type": rng.choice(["a", "b", "c"], n)})
    assert _run(df, ray_session) == _brute(df)


def test_islands_single_runs(ray_session):
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "ts": [10, 20, 30, 40],
        "user_id": [5, 5, 5, 6],
        "event_type": ["x", "x", "y", "x"]})
    got = _run(df, ray_session)
    assert got == [(5, "x", 10, 30, 2), (5, "y", 30, None, 1),
                   (6, "x", 40, None, 1)]
