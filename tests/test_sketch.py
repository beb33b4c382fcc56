"""Exact distributed quantiles vs numpy order statistics, including
skewed distributions and duplicate-heavy columns."""

import numpy as np
import pyarrow as pa
import pytest


def brute_disc(vals, p):
    """DuckDB quantile_disc: k-th smallest, k = max(1, ceil(p*n))."""
    s = np.sort(vals)
    k = max(1, int(np.ceil(p * len(s))))
    return float(s[k - 1])


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "dupes"])
def test_exact_quantiles(ray_session, dist):
    import ray.data as rd
    from tilemaker_ray.stages.sketch import exact_quantiles
    rng = np.random.RandomState(11)
    if dist == "uniform":
        v = rng.uniform(0, 100, 20000)
    elif dist == "lognormal":
        v = rng.lognormal(0, 2, 20000)  # heavy skew → hot bins
    else:
        v = rng.choice([1.0, 2.0, 2.0, 3.0, 50.0], 20000)
    ds = rd.from_arrow(pa.table({"value": pa.array(v, pa.float64())})) \
        .repartition(8)
    ps = [0.0, 0.01, 0.5, 0.9, 0.999, 1.0]
    out = exact_quantiles(ds, "value", ps).to_pandas()
    for p, got in zip(out["p"], out["value"]):
        assert got == brute_disc(v, p), (dist, p)


@pytest.mark.parametrize("dist", ["uniform", "dupes"])
def test_exact_quantiles_interpolated(ray_session, dist):
    import ray.data as rd
    from tilemaker_ray.stages.sketch import exact_quantiles
    rng = np.random.RandomState(7)
    v = rng.uniform(0, 100, 9999) if dist == "uniform" else \
        rng.choice([1.0, 2.0, 2.0, 3.0, 50.0], 9999)
    ds = rd.from_arrow(pa.table({"value": pa.array(v, pa.float64())})) \
        .repartition(8)
    ps = [0.0, 0.01, 0.5, 0.9, 0.999, 1.0]
    out = exact_quantiles(ds, "value", ps, interpolated=True).to_pandas()
    s = np.sort(v)
    for p, got in zip(out["p"], out["value"]):
        r = p * (len(s) - 1)
        lo, hi = int(np.floor(r)), int(np.ceil(r))
        exp = s[lo] if lo == hi else s[lo] * (hi - r) + s[hi] * (r - lo)
        assert got == exp, (dist, p)


def test_exact_quantiles_empty(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.sketch import exact_quantiles
    ds = rd.from_arrow(pa.table({"value": pa.array([], pa.float64())}))
    out = exact_quantiles(ds, "value", [0.5])
    assert out.num_rows == 0


def test_grouped_quantiles_vs_brute(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.sketch import grouped_quantiles
    rng = np.random.RandomState(5)
    uid = rng.randint(0, 40, 5000)
    v = rng.lognormal(0, 1.5, 5000)
    ds = rd.from_arrow(pa.table({"user_id": pa.array(uid, pa.int64()),
                                 "value": pa.array(v, pa.float64())})) \
        .repartition(6)
    out = grouped_quantiles(ds, "user_id", "value", [0.5, 0.9]) \
        .to_pandas().set_index("user_id")
    for u in np.unique(uid):
        vals = v[uid == u]
        assert out.loc[u, "p50"] == brute_disc(vals, 0.5)
        assert out.loc[u, "p90"] == brute_disc(vals, 0.9)


def test_grouped_quantiles_interpolated_vs_brute(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.sketch import grouped_quantiles
    rng = np.random.RandomState(9)
    uid = rng.randint(0, 30, 4000)
    v = rng.uniform(0, 100, 4000)
    ds = rd.from_arrow(pa.table({"user_id": pa.array(uid, pa.int64()),
                                 "value": pa.array(v, pa.float64())})) \
        .repartition(6)
    out = grouped_quantiles(ds, "user_id", "value", [0.5, 0.9],
                            interpolated=True) \
        .to_pandas().set_index("user_id")
    for u in np.unique(uid):
        s = np.sort(v[uid == u])
        for p, nm in [(0.5, "p50"), (0.9, "p90")]:
            r = p * (len(s) - 1)
            lo, hi = int(np.floor(r)), int(np.ceil(r))
            exp = s[lo] if lo == hi else \
                s[lo] * (hi - r) + s[hi] * (r - lo)
            assert out.loc[u, nm] == exp, (u, p)


def test_grouped_quantiles_ignores_nulls(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.sketch import grouped_quantiles
    t = pa.table({"user_id": pa.array([1, 1, 1, 2], pa.int64()),
                  "value": pa.array([1.0, None, 3.0, None], pa.float64())})
    out = grouped_quantiles(rd.from_arrow(t), "user_id", "value", [0.5]) \
        .to_pandas().set_index("user_id")
    # DuckDB quantile_disc ignores NULLs: median of {1, 3} = 1
    assert out.loc[1, "p50"] == 1.0
    # an all-null group still emits its key, with a null quantile
    assert np.isnan(out.loc[2, "p50"])


def test_hll_error_bound(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.sketch import hll_count_distinct
    # 40k distinct ids, each appearing 1-3 times, across 16 blocks
    rng = np.random.RandomState(17)
    ids = np.repeat(np.arange(40000, dtype=np.int64),
                    rng.randint(1, 4, 40000))
    ds = rd.from_arrow(pa.table({"uid": pa.array(ids, pa.int64())})) \
        .repartition(16)
    out = hll_count_distinct(ds, "uid", p=12).to_pandas()
    est = float(out["n_distinct_est"].iloc[0])
    # 3 sigma at p=12: 3 * 1.04 / sqrt(4096) ~ 4.9%
    assert abs(est - 40000) / 40000 < 0.05, est


def test_hll_partition_invariant_and_small(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.sketch import hll_count_distinct
    ids = np.arange(500, dtype=np.int64)
    t = pa.table({"uid": pa.array(ids, pa.int64())})
    e1 = hll_count_distinct(rd.from_arrow(t).repartition(2), "uid") \
        .to_pandas()["n_distinct_est"].iloc[0]
    e2 = hll_count_distinct(rd.from_arrow(t).repartition(9), "uid") \
        .to_pandas()["n_distinct_est"].iloc[0]
    assert e1 == e2          # register max is partition-invariant
    # linear-counting regime: small cardinalities are near-exact
    assert abs(e1 - 500) / 500 < 0.03


def test_heavy_hitters_exact_topk(ray_session):
    import ray.data as rd
    import pyarrow as pa
    import numpy as np
    from tilemaker_ray.stages.sketch import heavy_hitters_topk
    rng = np.random.RandomState(9)
    # zipf-ish: item i appears ~3000/i times; long uniform tail
    vals = []
    for i in range(1, 20):
        vals += [f"hot{i:02d}"] * (3000 // i)
    vals += [f"tail{j}" for j in rng.randint(0, 5000, 4000)]
    rng.shuffle(vals)
    t = pa.table({"v": pa.array(vals, pa.string())})
    from collections import Counter
    cnt = Counter(vals)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    for blocks in (2, 9):
        ds = rd.from_arrow(t).repartition(blocks)
        out, floor = heavy_hitters_topk(ds, "v", m=64, k=10)
        got = list(zip(out["item"].to_pylist(), out["freq"].to_pylist()))
        assert got == want                     # exact, any partitioning
        assert want[-1][1] > floor             # MG guarantee held


def test_heavy_hitters_guarantee_floor(ray_session):
    import ray.data as rd
    import pyarrow as pa
    from tilemaker_ray.stages.sketch import heavy_hitters_topk
    t = pa.table({"v": pa.array(["a"] * 50 + ["b"] * 30 + ["c"] * 20,
                                pa.string())})
    out, floor = heavy_hitters_topk(rd.from_arrow(t), "v", m=8, k=3)
    assert floor == 100 // 9
    assert out["item"].to_pylist() == ["a", "b", "c"]
    assert out["freq"].to_pylist() == [50, 30, 20]


def test_hll_grouped_error_bound_and_invariance(ray_session):
    import ray.data as rd
    import numpy as np
    import pyarrow as pa
    from tilemaker_ray.stages.sketch import hll_grouped_distinct
    rng = np.random.RandomState(21)
    keys, vals = [], []
    truth = {"a": 500, "b": 3000, "c": 17}
    for k, n in truth.items():
        ids = rng.choice(n * 3, size=n, replace=False) + \
            (hash(k) % 7) * 10**7
        for rep in range(3):                 # duplicates must not count
            keys += [k] * n
            vals += ids.tolist()
    t = pa.table({"g": pa.array(keys, pa.string()),
                  "v": pa.array(vals, pa.int64())})
    outs = []
    for blocks in (2, 8):
        out = hll_grouped_distinct(
            rd.from_arrow(t).repartition(blocks), "g", "v",
            p=12).to_pandas().set_index("g")
        outs.append(out)
        for k in truth:
            est = out.loc[k, "n_distinct_est"]
            exact = len({v for g, v in zip(keys, vals) if g == k})
            assert abs(est - exact) / exact < 5 * 1.04 / np.sqrt(4096)
    assert outs[0]["n_distinct_est"].equals(outs[1]["n_distinct_est"])
