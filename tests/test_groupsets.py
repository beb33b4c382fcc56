"""rollup_aggregate vs pandas multi-level groupby."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_rollup_vs_pandas(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.groupsets import rollup_aggregate
    rng = np.random.RandomState(2)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 5000),
        "b": rng.choice(["p", "q"], 5000),
        "v": rng.randint(0, 1000, 5000).astype(np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    out = rollup_aggregate(ds, ["a", "b"], ["v"], count_col="n") \
        .to_pandas()
    # finest
    fin = df.groupby(["a", "b"], as_index=False).agg(
        v=("v", "sum"), n=("v", "size"))
    lvl2 = out[out["b"].notna()].sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        lvl2[["a", "b", "v", "n"]],
        fin.sort_values(["a", "b"]).reset_index(drop=True)
        .astype({"n": "int64"}))
    # level 1: b rolled up
    l1 = out[out["b"].isna() & out["a"].notna()] \
        .sort_values("a").reset_index(drop=True)
    e1 = df.groupby("a", as_index=False).agg(v=("v", "sum"),
                                             n=("v", "size"))
    assert list(l1["a"]) == list(e1["a"])
    assert list(l1["v"]) == list(e1["v"])
    assert list(l1["n"]) == list(e1["n"])
    # grand total
    l0 = out[out["a"].isna()]
    assert len(l0) == 1
    assert int(l0["v"].iloc[0]) == int(df["v"].sum())
    assert int(l0["n"].iloc[0]) == len(df)


def test_cube_vs_pandas(ray_session):
    import ray.data as rd
    import numpy as np
    import pyarrow as pa
    from tilemaker_ray.stages.groupsets import cube_aggregate
    rng = np.random.RandomState(12)
    n = 900
    t = pa.table({
        "a": pa.array([("xy")[i % 2] for i in range(n)], pa.string()),
        "b": pa.array([str(rng.randint(0, 3)) for _ in range(n)],
                      pa.string()),
        "v": pa.array(rng.randint(0, 100, n).astype(np.int64))})
    out = cube_aggregate(rd.from_arrow(t).repartition(4),
                         ["a", "b"], ["v"]).to_pandas()
    import pandas as pd
    df = t.to_pandas()
    # four grouping sets
    assert len(out) == (df.groupby(["a", "b"]).ngroups
                        + df["a"].nunique() + df["b"].nunique() + 1)
    gt = out[out["a"].isna() & out["b"].isna()]
    assert len(gt) == 1 and gt["v"].iloc[0] == df["v"].sum() \
        and gt["n"].iloc[0] == n
    bonly = out[out["a"].isna() & out["b"].notna()].set_index("b")
    for k, grp in df.groupby("b"):
        assert bonly.loc[k, "v"] == grp["v"].sum()
        assert bonly.loc[k, "n"] == len(grp)
