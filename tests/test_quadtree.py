"""Semantic oracle for adaptive quadtree binning: the pyramid-count
"first root-down ancestor with count <= K" rule must equal an explicit
recursive top-down splitter."""

import numpy as np
import pyarrow as pa


def _recursive_split(cells, k, z_max):
    """cells: dict (z10 x, y) -> n. Explicit splitter: start at z0,
    split any node with count > k until <= k or z_max."""
    from collections import defaultdict
    out = {}

    def count_of(z, x, y):
        dz = z_max - z
        return sum(n for (cx, cy), n in cells.items()
                   if cx >> dz == x and cy >> dz == y)

    def rec(z, x, y):
        c = count_of(z, x, y)
        if c == 0:
            return
        if c <= k or z == z_max:
            out[(z, x, y)] = c
            return
        for dx in (0, 1):
            for dy in (0, 1):
                rec(z + 1, x * 2 + dx, y * 2 + dy)

    rec(0, 0, 0)
    return out


def test_quadtree_matches_recursive_splitter(ray_session, monkeypatch):
    import ray.data as rd

    from tilemaker_ray.pipelines import queries as Q

    rng = np.random.RandomState(31)
    pts = rng.choice(1024 * 1024, size=300, replace=True)
    xs, ys = (pts // 1024).astype(np.int64), \
        (pts % 1024).astype(np.int64)
    cells = {}
    for x, y in zip(xs, ys):
        cells[(int(x), int(y))] = cells.get((int(x), int(y)), 0) + 1

    base = pa.table({
        "tile_x": pa.array([c[0] for c in cells], pa.int64()),
        "tile_y": pa.array([c[1] for c in cells], pa.int64()),
        "n_events": pa.array(list(cells.values()), pa.int64())})
    monkeypatch.setattr(
        Q, "q_tile_count_z10",
        lambda sf: rd.from_arrow(base).repartition(3))

    got = Q.q_quadtree_bins_events("unused", k=20).to_pandas()
    got_map = {(int(r.z), int(r.tile_x), int(r.tile_y)):
               int(r.n_events) for r in got.itertuples()}
    ref = _recursive_split(cells, 20, 10)
    assert got_map == ref
    # every leaf obeys the split rule
    assert all(v <= 20 or z == 10 for (z, _, _), v in got_map.items())
