"""Brute oracle for the weighted-median kernel: heavy ties + varied
partitioning must reproduce the grouped-by-value definition."""

import numpy as np
import pyarrow as pa


def _brute(v, w):
    order = np.argsort(v, kind="stable")
    vs, ws = v[order], w[order]
    tot = int(ws.sum())
    # grouped-by-value cumulative weight
    uv = np.unique(vs)
    cum = 0
    for val in uv:
        cum += int(ws[vs == val].sum())
        if 2 * cum >= tot:
            return tot, int(val)
    return tot, None


def test_weighted_median_ties(ray_session, monkeypatch):
    import ray.data as rd

    from tilemaker_ray.pipelines import queries as Q

    rng = np.random.RandomState(13)
    n = 500
    # few distinct values -> massive tie runs
    v_cents = rng.choice([100, 250, 250, 700, 900], size=n) \
        .astype(np.int64)
    w = rng.randint(1, 9, size=n).astype(np.int64)
    tbl = pa.table({
        "l_orderkey": pa.array(np.arange(n, dtype=np.int64),
                               pa.int64()),
        "l_linenumber": pa.array(np.ones(n, np.int64), pa.int64()),
        "l_extendedprice": pa.array(v_cents / 100.0, pa.float64()),
        "l_quantity": pa.array(w.astype(np.float64), pa.float64())})
    monkeypatch.setattr(
        Q, "_read",
        lambda sf, t, columns=None, row_filter=None:
        rd.from_arrow(tbl).repartition(5))

    got = Q.q_weighted_median_lineitem("unused").to_pandas()
    tot, med = _brute(v_cents, w)
    assert int(got.total_weight[0]) == tot
    assert int(got.wmedian_cents[0]) == med
