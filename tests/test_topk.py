"""Distributed top-k vs numpy order statistics."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_top_k_matches_numpy(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.topk import top_k
    rng = np.random.RandomState(4)
    df = pd.DataFrame({"i": np.arange(20000, dtype=np.int64),
                       "v": rng.permutation(20000).astype(np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(16)
    out = top_k(ds, ["v", "i"], 37).to_pandas()
    assert len(out) == 37
    assert set(out["v"]) == set(range(37))
    out_d = top_k(ds, ["v", "i"], 37, descending=[True, False]).to_pandas()
    assert set(out_d["v"]) == set(range(20000 - 37, 20000))


def test_top_k_two_level_and_small_corpus(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.topk import top_k
    df = pd.DataFrame({"v": np.arange(50, dtype=np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    assert len(top_k(ds, "v", 100).to_pandas()) == 50   # k > corpus
    out = top_k(ds, "v", 5, two_level=True).to_pandas()
    assert sorted(out["v"]) == [0, 1, 2, 3, 4]


def test_top_k_string_keys(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.topk import top_k
    df = pd.DataFrame({"s": [f"k{i:04d}" for i in range(300)]})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    out = top_k(ds, "s", 3, descending=True).to_pandas()
    assert sorted(out["s"]) == ["k0297", "k0298", "k0299"]
