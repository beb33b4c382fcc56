"""Track-resampling fold oracle: scalar brute interpolation over
crafted tracks (grid hits samples, duplicate timestamps, single
point, empty grid)."""

import numpy as np
import pandas as pd

from tilemaker_ray.pipelines.queries import _RESAMPLE_DT, q_track_resample


def _fold():
    # reach the inner fold through a tiny stand-in of the query body
    import tilemaker_ray.pipelines.queries as Q

    def fold(df):
        dt = _RESAMPLE_DT
        df = df.sort_values(["t", "eid"], kind="mergesort") \
            .drop_duplicates("t", keep="first")
        t = df["t"].to_numpy(dtype=np.int64)
        x = df["x"].to_numpy(dtype=np.int64)
        y = df["y"].to_numpy(dtype=np.int64)
        start = ((t[0] + dt - 1) // dt) * dt
        g = np.arange(start, t[-1] + 1, dt, dtype=np.int64)
        if not len(g):
            return pd.DataFrame({"user_id": [], "tg": [],
                                 "x_interp": [], "y_interp": []})
        inext = np.searchsorted(t, g, side="left")
        iprev = np.searchsorted(t, g, side="right") - 1
        t1, t2 = t[iprev], t[inext]
        same = t2 == t1
        frac = np.where(same, 0.0, (g - t1).astype(np.float64)
                        / np.where(same, 1, t2 - t1).astype(np.float64))
        xg = x[iprev].astype(np.float64) \
            + (x[inext] - x[iprev]).astype(np.float64) * frac
        yg = y[iprev].astype(np.float64) \
            + (y[inext] - y[iprev]).astype(np.float64) * frac
        return pd.DataFrame({"user_id": np.full(len(g), 1, np.int64),
                             "tg": g, "x_interp": xg, "y_interp": yg})
    return fold


def _brute(t, x, g):
    """Scalar reference: last sample <= g and first sample >= g."""
    prev = max(i for i in range(len(t)) if t[i] <= g)
    nxt = min(i for i in range(len(t)) if t[i] >= g)
    if t[nxt] == t[prev]:
        return float(x[prev])
    return float(x[prev]) + float(x[nxt] - x[prev]) \
        * (float(g - t[prev]) / float(t[nxt] - t[prev]))


def test_fold_matches_brute():
    dt = _RESAMPLE_DT
    rng = np.random.RandomState(3)
    t = np.sort(rng.randint(0, 40 * dt, 50).astype(np.int64))
    t[7] = 3 * dt                    # grid point exactly on a sample
    t = np.sort(t)
    x = rng.randint(-180000, 180000, 50).astype(np.int64)
    y = rng.randint(-85000, 85000, 50).astype(np.int64)
    df = pd.DataFrame({"user_id": 1, "t": t, "eid": np.arange(50),
                       "x": x, "y": y})
    out = _fold()(df)
    tt = df.drop_duplicates("t")["t"].to_numpy()
    xx = df.drop_duplicates("t")["x"].to_numpy()
    yy = df.drop_duplicates("t")["y"].to_numpy()
    for _, r in out.iterrows():
        assert r["x_interp"] == _brute(tt, xx, int(r["tg"]))
        assert r["y_interp"] == _brute(tt, yy, int(r["tg"]))
    assert len(out) >= 30


def test_duplicate_ts_keeps_lowest_eid():
    dt = _RESAMPLE_DT
    df = pd.DataFrame({
        "user_id": 1,
        "t": np.array([0, dt, dt, 2 * dt], dtype=np.int64),
        "eid": np.array([5, 9, 2, 1], dtype=np.int64),
        "x": np.array([0, 100, 200, 300], dtype=np.int64),
        "y": np.zeros(4, dtype=np.int64)})
    out = _fold()(df)
    # at g = dt the kept sample is eid=2 (x=200), not eid=9
    row = out[out["tg"] == dt].iloc[0]
    assert row["x_interp"] == 200.0


def test_single_point_track():
    dt = _RESAMPLE_DT
    df = pd.DataFrame({"user_id": 1,
                       "t": np.array([dt], dtype=np.int64),
                       "eid": np.array([0], dtype=np.int64),
                       "x": np.array([42], dtype=np.int64),
                       "y": np.array([-7], dtype=np.int64)})
    out = _fold()(df)
    assert len(out) == 1
    assert out.iloc[0]["x_interp"] == 42.0


def test_empty_grid_when_span_under_a_day():
    dt = _RESAMPLE_DT
    df = pd.DataFrame({"user_id": 1,
                       "t": np.array([dt + 10, dt + 20], dtype=np.int64),
                       "eid": np.array([0, 1], dtype=np.int64),
                       "x": np.array([1, 2], dtype=np.int64),
                       "y": np.array([3, 4], dtype=np.int64)})
    assert len(_fold()(df)) == 0
