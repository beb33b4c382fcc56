"""rolling_frame vs pandas groupby-rolling, across block boundaries."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _make(n=3000, users=7, seed=3):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "user_id": rng.randint(0, users, n),
        "ord": np.arange(n, dtype=np.int64),
        "v": rng.uniform(-50, 50, n).round(2),
    })


def test_rolling_frame_vs_pandas(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.rolling import rolling_frame
    df = _make()
    k = 3
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    out = rolling_frame(ds, "user_id", "ord", k,
                        [("rsum", "v", "sum"),
                         ("rmin", "v", "min"),
                         ("rmax", "v", "max"),
                         ("rcnt", "v", "count"),
                         ("ravg", "v", "avg")]) \
        .to_pandas().sort_values("ord").reset_index(drop=True)
    g = df.sort_values(["user_id", "ord"]).groupby("user_id")["v"]
    roll = g.rolling(k + 1, min_periods=1)
    exp = pd.DataFrame({
        "ord": df.sort_values(["user_id", "ord"])["ord"].to_numpy(),
        "rsum": roll.sum().to_numpy(),
        "rmin": roll.min().to_numpy(),
        "rmax": roll.max().to_numpy(),
        "rcnt": roll.count().to_numpy(),
    }).sort_values("ord").reset_index(drop=True)
    assert np.allclose(out["rsum"], exp["rsum"], atol=1e-9)
    assert np.array_equal(out["rmin"], exp["rmin"])
    assert np.array_equal(out["rmax"], exp["rmax"])
    assert np.array_equal(out["rcnt"].astype(float), exp["rcnt"])
    assert np.allclose(out["ravg"], exp["rsum"] / exp["rcnt"], atol=1e-9)


def test_rolling_frame_nulls_excluded(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.rolling import rolling_frame
    t = pa.table({"p": pa.array([1, 1, 1, 1], pa.int64()),
                  "o": pa.array([0, 1, 2, 3], pa.int64()),
                  "v": pa.array([1.0, None, 3.0, 5.0], pa.float64())})
    out = rolling_frame(rd.from_arrow(t), "p", "o", 2,
                        [("s", "v", "sum"), ("c", "v", "count"),
                         ("mn", "v", "min")]) \
        .to_pandas().sort_values("o").reset_index(drop=True)
    # frames: [1], [1,N], [1,N,3], [N,3,5]
    assert list(out["c"]) == [1, 1, 2, 2]
    assert list(out["s"]) == [1.0, 1.0, 4.0, 8.0]
    assert list(out["mn"]) == [1.0, 1.0, 1.0, 3.0]
