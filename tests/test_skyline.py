"""Skyline operator vs the NOT EXISTS brute-force oracle."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.skyline import (_skyline_mask, skyline_2d,
                                          skyline_reference)


def test_skyline_mask_matches_bruteforce():
    rng = np.random.RandomState(2)
    for trial in range(20):
        n = int(rng.randint(1, 60))
        x = rng.randint(0, 12, n).astype(np.int64)
        y = rng.randint(0, 12, n).astype(np.int64)
        rows = list(zip(x.tolist(), y.tolist()))
        want = sorted(skyline_reference(rows))
        got = sorted((int(a), int(b)) for a, b in
                     zip(x[_skyline_mask(x, y)], y[_skyline_mask(x, y)]))
        assert got == want, trial


def test_skyline_duplicates_survive_with_multiplicity():
    x = np.array([1, 1, 2, 3], dtype=np.int64)
    y = np.array([5, 5, 4, 6], dtype=np.int64)
    # (3,6) has higher x but highest y -> survives; (1,5) twice;
    # (2,4) dominated by (1,5)
    m = _skyline_mask(x, y)
    assert m.tolist() == [True, True, False, True]


def test_skyline_distributed_vs_reference(ray_session):
    import ray.data as rd
    rng = np.random.RandomState(7)
    n = 5000
    x = rng.randint(0, 1000, n).astype(np.int64)
    y = rng.randint(0, 1000, n).astype(np.int64)
    t = pa.table({"price": pa.array(x, pa.int64()),
                  "qty": pa.array(y, pa.int64())})
    want = sorted(skyline_reference(list(zip(x.tolist(), y.tolist()))))
    for n_blocks in (3, 9):
        out = skyline_2d(rd.from_arrow(t).repartition(n_blocks),
                         "price", "qty").to_pandas()
        got = sorted(map(tuple, out[["price", "qty"]].values))
        assert got == want, n_blocks
