"""Global ROW_NUMBER / RANK (stages/rank.py) vs pandas window oracle,
exercising tie runs that span block boundaries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tilemaker_ray.stages.rank import global_rank, partitioned_rank


def _oracle(df, rank_key="v"):
    df = df.sort_values(["v", "i"], ascending=[False, True]).reset_index(drop=True)
    df["rn"] = np.arange(1, len(df) + 1, dtype=np.int64)
    df["rk"] = (df[rank_key].map(
        df.groupby(rank_key)["rn"].min())).astype(np.int64)
    return df


@pytest.mark.parametrize("n,n_vals,blocks", [
    (1000, 7, 16),     # massive ties — every run spans many blocks
    (1000, 1000, 8),   # all unique
    (500, 50, 64),     # many near-empty blocks
    (3, 1, 8),         # single value, more blocks than rows
])
def test_global_rank_matches_window_oracle(ray_session, n, n_vals, blocks):
    import ray.data as rd
    rng = np.random.default_rng(7)
    v = rng.integers(0, n_vals, n).astype(np.float64)
    df = pd.DataFrame({"i": np.arange(n, dtype=np.int64), "v": v})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
    out = global_rank(ds, ["v", "i"], descending=[True, False],
                      rn_col="rn", rank_col="rk", rank_keys=["v"],
                      dense_col="dk").to_pandas()
    exp = _oracle(df)
    exp["dk"] = exp["v"].rank(method="dense", ascending=False).astype(np.int64)
    got = out.sort_values("rn").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["i", "v", "rn", "rk", "dk"]],
        exp[["i", "v", "rn", "rk", "dk"]])


@pytest.mark.parametrize("n,n_users,n_vals,blocks", [
    (2000, 5, 9, 32),    # few huge partitions, heavy ties, block-spanning
    (1000, 300, 1000, 8),  # many small partitions
    (100, 1, 1, 16),     # one partition, one value
])
def test_partitioned_rank_matches_window_oracle(ray_session, n, n_users,
                                                n_vals, blocks):
    import ray.data as rd
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "i": np.arange(n, dtype=np.int64),
        "u": rng.integers(0, n_users, n).astype(np.int64),
        "v": rng.integers(0, n_vals, n).astype(np.float64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
    out = partitioned_rank(ds, "u", ["v", "i"], descending=[True, False],
                           rn_col="rn", rank_col="rk", rank_keys=["v"],
                           dense_col="dk").to_pandas()
    exp = df.sort_values(["u", "v", "i"],
                         ascending=[True, False, True]).reset_index(drop=True)
    exp["rn"] = exp.groupby("u").cumcount() + 1
    exp["rk"] = (exp.groupby(["u", "v"])["rn"].transform("min")).astype(np.int64)
    exp["dk"] = (exp.groupby("u")["v"]
                 .rank(method="dense", ascending=False).astype(np.int64))
    got = out.sort_values(["u", "rn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["i", "u", "v", "rn", "rk", "dk"]],
        exp[["i", "u", "v", "rn", "rk", "dk"]])


def test_row_number_only_no_meta_fetch(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"i": np.arange(100, dtype=np.int64),
                       "v": np.arange(100)[::-1].astype(np.float64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    out = global_rank(ds, ["v"], rn_col="rn", rank_col=None).to_pandas()
    out = out.sort_values("v").reset_index(drop=True)
    assert (out["rn"].to_numpy() == np.arange(1, 101)).all()
    assert "rank" not in out.columns


def _ntile_ref(rn, n, b):
    q, r = divmod(n, b)
    big = r * (q + 1)
    if rn <= big:
        return (rn - 1) // (q + 1) + 1
    return r + (rn - 1 - big) // max(q, 1) + 1


def test_window_distribution_vs_brute(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.rank import window_distribution
    rng = np.random.default_rng(12)
    n = 6000
    df = pd.DataFrame({
        "i": np.arange(n, dtype=np.int64),
        # 3 giant partitions so single-run continuing blocks exercise
        # the backward next-run recurrence
        "u": rng.integers(0, 3, n).astype(np.int64),
        "v": rng.integers(0, 8, n).astype(np.float64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(16)
    out = window_distribution(ds, "u", ["v", "i"], ntile=5,
                              ntile_col="tile", pct_col="pct",
                              cume_col="cume", size_col="n",
                              rank_keys=["v"]).to_pandas()
    exp = df.sort_values(["u", "v", "i"]).reset_index(drop=True)
    exp["n"] = exp.groupby("u")["v"].transform("size").astype(np.int64)
    exp["rn"] = exp.groupby("u").cumcount() + 1
    exp["tile"] = [
        _ntile_ref(rn, nn, 5) for rn, nn in zip(exp["rn"], exp["n"])]
    rk = exp.groupby("u")["v"].rank(method="min")
    mx = exp.groupby("u")["v"].rank(method="max")
    exp["pct"] = (rk - 1) / (exp["n"] - 1)
    exp["cume"] = mx / exp["n"]
    got = out.sort_values(["u", "v", "i"]).reset_index(drop=True)
    for c in ["n", "tile", "pct", "cume"]:
        assert np.array_equal(got[c].to_numpy(), exp[c].to_numpy()), c


def test_window_distribution_single_row_partitions(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.rank import window_distribution
    df = pd.DataFrame({"u": np.arange(10, dtype=np.int64),
                       "v": np.ones(10)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    out = window_distribution(ds, "u", ["v"], pct_col="pct",
                              cume_col="cume", size_col="n").to_pandas()
    assert (out["n"] == 1).all()
    assert (out["pct"] == 0.0).all()   # ANSI: single-row partition
    assert (out["cume"] == 1.0).all()
