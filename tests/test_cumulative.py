"""Running aggregates (stages/cumulative.py) vs pandas expanding
oracles, with partitions spanning many block boundaries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tilemaker_ray.stages.cumulative import cumulative


@pytest.mark.parametrize("n,n_users,blocks", [
    (2000, 3, 32),    # few giant partitions → every carry path exercised
    (1000, 200, 8),   # many small partitions
    (50, 1, 16),      # single partition, more blocks than rows
])
def test_cumulative_sum_max_min(ray_session, n, n_users, blocks):
    import ray.data as rd
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "i": np.arange(n, dtype=np.int64),
        "u": rng.integers(0, n_users, n).astype(np.int64),
        "v": rng.integers(-50, 50, n).astype(np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
    out = cumulative(ds, "u", ["i"], "v", ops=("sum", "max", "min"),
                     out_cols=["cs", "cm", "cn"]).to_pandas()
    exp = df.sort_values(["u", "i"]).reset_index(drop=True)
    g = exp.groupby("u")["v"]
    exp["cs"] = g.cumsum()
    exp["cm"] = g.cummax()
    exp["cn"] = g.cummin()
    got = out.sort_values(["u", "i"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["i", "u", "v", "cs", "cm", "cn"]],
        exp[["i", "u", "v", "cs", "cm", "cn"]], check_dtype=False)


def test_cumulative_float_max(ray_session):
    import ray.data as rd
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"i": np.arange(500, dtype=np.int64),
                       "u": rng.integers(0, 4, 500).astype(np.int64),
                       "v": rng.normal(size=500)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(16)
    out = cumulative(ds, "u", ["i"], "v", ops=("max",),
                     out_cols=["cm"]).to_pandas()
    exp = df.sort_values(["u", "i"]).reset_index(drop=True)
    exp["cm"] = exp.groupby("u")["v"].cummax()
    got = out.sort_values(["u", "i"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["i", "u", "v", "cm"]],
                                  exp[["i", "u", "v", "cm"]])


def test_cumulative_first_value(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from tilemaker_ray.stages.cumulative import cumulative
    rng = np.random.RandomState(8)
    n = 4000
    df = pd.DataFrame({
        "p": rng.randint(0, 5, n).astype(np.int64),   # giant partitions
        "o": np.arange(n, dtype=np.int64),
        "v": rng.randint(-100, 100, n).astype(np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(12)
    out = cumulative(ds, "p", "o", "v", ops=("first",),
                     out_cols=["fv"]).to_pandas()
    exp = df.sort_values(["p", "o"]).reset_index(drop=True)
    exp["fv"] = exp.groupby("p")["v"].transform("first")
    got = out.sort_values(["p", "o"]).reset_index(drop=True)
    assert np.array_equal(got["fv"].to_numpy(), exp["fv"].to_numpy())
