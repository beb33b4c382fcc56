"""Triangle counting vs brute-force reference."""

import numpy as np
import pyarrow as pa

from tilemaker_ray.stages.graphstats import (triangle_count,
                                             triangle_count_reference)


def _ds(rows, n_blocks):
    import ray.data as rd
    t = pa.table({"src": pa.array([r[0] for r in rows], pa.int64()),
                  "dst": pa.array([r[1] for r in rows], pa.int64())})
    return rd.from_arrow(t).repartition(n_blocks)


def test_triangles_known_graphs(ray_session):
    # K4: C(4,3)=4 triangles; low-anchored wedges C(3,2)+C(2,2)+0+0
    # = 3+1 = 4 (every low-wedge of K4 closes)
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    out = triangle_count(_ds(k4, 2)).to_pandas()
    assert out["n_triangles"][0] == 4 and out["n_wedges"][0] == 4
    # a path has no triangles
    path = [(0, 1), (1, 2), (2, 3)]
    out = triangle_count(_ds(path, 1)).to_pandas()
    assert out["n_triangles"][0] == 0


def test_triangles_random_vs_reference(ray_session):
    rng = np.random.RandomState(4)
    # sparse node ids exercise the packing
    ids = rng.choice(10**6, size=40, replace=False).astype(np.int64)
    rows = {(int(ids[a]), int(ids[b]))
            for a, b in rng.randint(0, 40, (400, 2)) if a != b}
    rows = sorted(rows)
    want = triangle_count_reference(rows)
    for n_blocks in (2, 6):
        out = triangle_count(_ds(rows, n_blocks)).to_pandas()
        assert (out["n_wedges"][0], out["n_triangles"][0]) == want
    assert want[1] > 0          # the random graph has triangles
