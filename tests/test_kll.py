"""KLL sketch: rank-error bounds vs exact, merge correctness,
serialization roundtrip."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.kll import KLL, kll_quantiles


def _max_rank_err(sk, vals):
    svals = np.sort(vals)
    errs = []
    for phi in np.linspace(0.01, 0.99, 33):
        est = sk.quantile(phi)
        true_rank = np.searchsorted(svals, est, side="right") / len(svals)
        errs.append(abs(true_rank - phi))
    return max(errs)


def test_kll_rank_error_bound_various_distributions():
    rng = np.random.RandomState(3)
    dists = {
        "uniform": rng.uniform(0, 1, 200_000),
        "zipfish": rng.pareto(1.2, 200_000),
        "sorted": np.arange(150_000, dtype=np.float64),
        "dups": np.repeat(rng.uniform(0, 1, 100), 1500),
    }
    for name, vals in dists.items():
        sk = KLL(k=200)
        for chunk in np.array_split(vals, 37):
            sk.update(chunk)
        assert sk.n == len(vals)
        assert _max_rank_err(sk, vals) < 0.025, name


def test_kll_merge_matches_single_sketch_error():
    rng = np.random.RandomState(9)
    vals = rng.normal(size=120_000)
    parts = np.array_split(vals, 16)
    sks = [KLL(k=200).update(p) for p in parts]
    merged = sks[0]
    for s in sks[1:]:
        merged = merged.merge(s)
    assert merged.n == len(vals)
    assert _max_rank_err(merged, vals) < 0.03


def test_kll_serialization_roundtrip():
    rng = np.random.RandomState(1)
    sk = KLL(k=100).update(rng.uniform(0, 10, 50_000))
    back = KLL.from_bytes(sk.to_bytes())
    assert back.n == sk.n
    for phi in (0.1, 0.5, 0.9):
        assert back.quantile(phi) == sk.quantile(phi)
    # tiny / empty sketches survive too
    assert np.isnan(KLL.from_bytes(KLL().to_bytes()).quantile(0.5))


def test_kll_distributed_quantiles(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(5)
    vals = rng.uniform(0, 1000, 80_000)
    t = pa.table({"v": pa.array(vals, pa.float64())})
    out = kll_quantiles(rd.from_arrow(t).repartition(8), "v",
                        [0.25, 0.5, 0.75, 0.99]).to_pandas()
    svals = np.sort(vals)
    for phi, est in zip(out["phi"], out["value"]):
        true_rank = np.searchsorted(svals, est, "right") / len(svals)
        assert abs(true_rank - phi) < 0.03, phi
