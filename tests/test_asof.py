"""Distributed as-of join: ties, no-match, cross-key isolation, and
segmented forward-fill correctness."""

import numpy as np
import pyarrow as pa


def test_asof_join_semantics(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.asof import asof_join
    left = pa.table({
        "uid": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "ts": pa.array([10, 20, 4, 15, 30, 7], pa.int64()),
        "tag": pa.array(["a", "b", "c", "d", "e", "f"], pa.string()),
    })
    right = pa.table({
        "uid": pa.array([1, 1, 2, 4], pa.int64()),
        "ts": pa.array([5, 20, 30, 1], pa.int64()),
        "val": pa.array([100.0, 200.0, 300.0, 999.0], pa.float64()),
    })
    out = asof_join(rd.from_arrow(left).repartition(3),
                    rd.from_arrow(right).repartition(2),
                    "uid", "ts", "val").to_pandas()
    got = {t: (None if np.isnan(v) else v)
           for t, v in zip(out["tag"], out["val"])}
    assert got == {
        "a": 100.0,   # uid1 ts10 → right ts5
        "b": 200.0,   # uid1 ts20 → right ts20 (tie is a match, <=)
        "c": None,    # uid1 ts4 → nothing at-or-before
        "d": None,    # uid2 ts15 → right ts30 is later
        "e": 300.0,   # uid2 ts30 → tie
        "f": None,    # uid3 has no right rows (and must NOT see uid2's)
    }
    # left row count preserved (left join)
    assert len(out) == left.num_rows
    # right-side extra columns are dropped; schema = left + val
    assert sorted(out.columns) == ["tag", "ts", "uid", "val"]


def test_asof_right_extras_dropped(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.asof import asof_join
    left = pa.table({"uid": pa.array([1], pa.int64()),
                     "ts": pa.array([10], pa.int64())})
    right = pa.table({"uid": pa.array([1], pa.int64()),
                      "ts": pa.array([5], pa.int64()),
                      "val": pa.array([7.0], pa.float64()),
                      "junk": pa.array(["x"], pa.string())})
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    "uid", "ts", "val").to_pandas()
    assert "junk" not in out.columns
    assert out["val"].tolist() == [7.0]


def test_asof_matches_pandas_merge_asof(ray_session):
    """Random-data equivalence against pandas.merge_asof(by=, direction=
    'backward') — an independent reference implementation."""
    import pandas as pd
    import ray.data as rd
    from tilemaker_ray.stages.asof import asof_join
    rng = np.random.RandomState(9)
    nl, nr = 800, 500
    left = pa.table({
        "uid": pa.array(rng.randint(0, 20, nl), pa.int64()),
        "ts": pa.array(rng.randint(0, 10_000, nl), pa.int64()),
        "row": pa.array(np.arange(nl), pa.int64()),
    })
    # unique (uid, ts) on the right so tie-breaking is well-defined
    ru, rt = np.meshgrid(np.arange(20), rng.choice(10_000, nr // 10,
                                                   replace=False))
    ru, rt = ru.ravel()[:nr], rt.ravel()[:nr]
    right = pa.table({
        "uid": pa.array(ru.astype(np.int64), pa.int64()),
        "ts": pa.array(rt.astype(np.int64), pa.int64()),
        "val": pa.array(rng.rand(len(ru)), pa.float64()),
    })
    got = asof_join(rd.from_arrow(left).repartition(4),
                    rd.from_arrow(right).repartition(3),
                    "uid", "ts", "val").to_pandas() \
        .sort_values("row").reset_index(drop=True)
    exp = pd.merge_asof(
        left.to_pandas().sort_values("ts"),
        right.to_pandas().sort_values("ts"),
        on="ts", by="uid", direction="backward") \
        .sort_values("row").reset_index(drop=True)
    assert ((got["val"] == exp["val"])
            | (got["val"].isna() & exp["val"].isna())).all()
