"""Grouped moments: partition invariance + statistics sanity."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.moments import grouped_moments, moment_stats


def _ds(n_blocks):
    import ray.data as rd
    rng = np.random.RandomState(3)
    n = 4000
    t = pa.table({
        "grp": pa.array(list("ABCD")[0:1] * 0 +
                        [("ABCD")[i % 4] for i in range(n)],
                        pa.string()),
        "x": pa.array(np.round(rng.uniform(1, 50, n), 2)),
        "y": pa.array(np.round(rng.uniform(0, 0.1, n), 2)),
    })
    return rd.from_arrow(t).repartition(n_blocks), t


def test_moments_partition_invariant(ray_session):
    ds1, _ = _ds(1)
    ds7, _ = _ds(7)
    m1 = grouped_moments(ds1, "grp", "x", "y").to_pandas() \
        .sort_values("grp").reset_index(drop=True)
    m7 = grouped_moments(ds7, "grp", "x", "y").to_pandas() \
        .sort_values("grp").reset_index(drop=True)
    assert m1.equals(m7)          # bit-identical under any partitioning


def test_moment_stats_vs_numpy(ray_session):
    ds, t = _ds(5)
    out = moment_stats(grouped_moments(ds, "grp", "x", "y"),
                       "grp").to_pandas().set_index("grp")
    g = np.asarray(t["grp"].to_pylist())
    x = np.floor(t["x"].to_numpy() * 100) / 100.0
    y = np.floor(t["y"].to_numpy() * 100) / 100.0
    for k in "ABCD":
        xs, ys = x[g == k], y[g == k]
        assert out.loc[k, "n"] == len(xs)
        assert abs(out.loc[k, "avg_x"] - xs.mean()) < 1e-9
        assert abs(out.loc[k, "stddev_x"] - xs.std(ddof=1)) < 1e-9
        assert abs(out.loc[k, "corr_xy"]
                   - np.corrcoef(xs, ys)[0, 1]) < 1e-9
