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


def test_zscore_normalize_vs_pandas(ray_session):
    from tilemaker_ray.stages.moments import zscore_normalize
    ds, t = _ds(4)
    m = grouped_moments(ds, "grp", "x", "y")
    out = zscore_normalize(ds, m, "grp", "x").to_pandas()
    g = np.asarray(t["grp"].to_pylist())
    xq = np.floor(t["x"].to_numpy() * 100) / 100.0
    # rows come back unordered; align by (grp, x) value counts instead
    import pandas as pd
    ref = []
    for k in "ABCD":
        xs = xq[g == k]
        ref.append(pd.DataFrame({
            "grp": k, "z_ref": (xs - xs.mean()) / xs.std(ddof=1),
            "x": t["x"].to_numpy()[g == k]}))
    ref = pd.concat(ref)
    mrg = out.sort_values(["grp", "x"]).reset_index(drop=True)
    ref = ref.sort_values(["grp", "x"]).reset_index(drop=True)
    assert np.allclose(mrg["z"].to_numpy(), ref["z_ref"].to_numpy(),
                       atol=1e-9)
    # each group is standardized: mean 0, std 1
    for k in "ABCD":
        zs = out[out["grp"] == k]["z"]
        assert abs(zs.mean()) < 1e-9 and abs(zs.std(ddof=1) - 1) < 1e-9


def test_regression_vs_numpy(ray_session):
    from tilemaker_ray.stages.moments import regression_stats
    ds, t = _ds(6)
    out = regression_stats(grouped_moments(ds, "grp", "x", "y"),
                           "grp").to_pandas().set_index("grp")
    g = np.asarray(t["grp"].to_pylist())
    xq = np.floor(t["x"].to_numpy() * 100) / 100.0
    yq = np.floor(t["y"].to_numpy() * 100) / 100.0
    for k in "ABCD":
        xs, ys = xq[g == k], yq[g == k]
        slope, icept = np.polyfit(xs, ys, 1)
        assert abs(out.loc[k, "slope"] - slope) < 1e-9
        assert abs(out.loc[k, "intercept"] - icept) < 1e-9
        cov = np.cov(xs, ys, ddof=1)[0, 1]
        assert abs(out.loc[k, "cov_xy"] - cov) < 1e-9
