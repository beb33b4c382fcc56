"""Distributed LAG/LEAD (stages/shift.py) vs pandas grouped shift,
with partitions spanning many tiny blocks (edge buffers folded across
more than one block)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tilemaker_ray.stages.shift import shifted


@pytest.mark.parametrize("n,n_users,blocks,k", [
    (1000, 3, 64, 3),    # blocks much smaller than some partitions; k=3
    (500, 100, 8, 1),    # many small partitions
    (40, 1, 32, 5),      # blocks smaller than k → multi-block folding
])
def test_shift_matches_pandas(ray_session, n, n_users, blocks, k):
    import ray.data as rd
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "i": np.arange(n, dtype=np.int64),
        "u": rng.integers(0, n_users, n).astype(np.int64),
        "v": rng.integers(0, 1000, n).astype(np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)
    out = shifted(ds, "u", ["i"],
                  [("lag1", "v", 1), ("lagk", "v", k),
                   ("lead1", "v", -1)]).to_pandas()
    exp = df.sort_values(["u", "i"]).reset_index(drop=True)
    g = exp.groupby("u")["v"]
    exp["lag1"] = g.shift(1)
    exp["lagk"] = g.shift(k)
    exp["lead1"] = g.shift(-1)
    got = out.sort_values(["u", "i"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["i", "u", "v", "lag1", "lagk", "lead1"]],
        exp[["i", "u", "v", "lag1", "lagk", "lead1"]],
        check_dtype=False)


def test_shift_string_values(ray_session):
    import ray.data as rd
    df = pd.DataFrame({"i": np.arange(10, dtype=np.int64),
                       "u": np.array([0] * 5 + [1] * 5, dtype=np.int64),
                       "s": [f"x{j}" for j in range(10)]})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    out = (shifted(ds, "u", ["i"], [("prev_s", "s", 1)]).to_pandas()
           .sort_values("i").reset_index(drop=True))
    exp = df["s"].shift(1)
    exp[5] = None
    assert out["prev_s"].where(out["prev_s"].notna(), None).tolist() == \
        exp.where(exp.notna(), None).tolist()
