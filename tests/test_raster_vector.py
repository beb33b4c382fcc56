"""Raster→vector: boundary extraction, region labeling, polygonize —
brute-force flood-fill oracle + the area(outline) == n_cells invariant."""

import numpy as np
import pyarrow as pa
import pytest

from tilemaker_ray.stages.raster_vector import (
    _pack, label_regions, polygonize, raster_boundary, rasterize_points,
    trace_region_outline)


def _flood_regions(cells):
    """Brute-force 4-connectivity flood fill → {cell: min-cell label}."""
    todo = set(cells)
    out = {}
    while todo:
        seed = todo.pop()
        comp = {seed}
        stack = [seed]
        while stack:
            x, y = stack.pop()
            for nb in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
                if nb in todo:
                    todo.remove(nb)
                    comp.add(nb)
                    stack.append(nb)
        lbl = min(_pack(np.array([c[0] for c in comp]),
                        np.array([c[1] for c in comp])).tolist())
        for c in comp:
            out[c] = lbl
    return out


def _brute_boundary(cells):
    s = set(cells)
    out = {}
    for (x, y) in s:
        n = sum(1 for nb in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1))
                if nb in s)
        if n < 4:
            out[(x, y)] = n
    return out


def _cells_ds(cells):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "cell_x": pa.array([c[0] for c in cells], pa.int64()),
        "cell_y": pa.array([c[1] for c in cells], pa.int64())}))


def _ring_area(r):
    """Signed shoelace area (y-down grid)."""
    return 0.5 * np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1])


MASKS = {
    "single": [(5, 5)],
    "lshape": [(0, 0), (0, 1), (1, 1)],
    "block": [(0, 0), (1, 0), (0, 1), (1, 1)],
    "ring_hole": [(x, y) for x in range(3) for y in range(3)
                  if (x, y) != (1, 1)],
    "two_regions": [(0, 0), (1, 0), (5, 5), (5, 6), (6, 6)],
    "diag_touch": [(0, 0), (1, 1)],
    "bar": [(x, 0) for x in range(6)],
}


@pytest.mark.parametrize("name", sorted(MASKS))
def test_outline_area_invariant(name):
    cells = MASKS[name]
    regions = {}
    for c, lbl in _flood_regions(cells).items():
        regions.setdefault(lbl, []).append(c)
    for lbl, comp in regions.items():
        xs = np.array([c[0] for c in comp])
        ys = np.array([c[1] for c in comp])
        rings, perim = trace_region_outline(xs, ys)
        assert rings, f"{name}: no rings"
        # outer area minus holes == cell count exactly
        outer = abs(_ring_area(rings[0]))
        holes = sum(abs(_ring_area(r)) for r in rings[1:])
        assert outer - holes == len(comp), name
        # perimeter equals brute boundary-edge count
        s = set(comp)
        brute_perim = sum(
            1 for (x, y) in s
            for nb in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1))
            if nb not in s)
        assert perim == brute_perim, name
        # rings closed
        for r in rings:
            assert (r[0] == r[-1]).all()


def test_outline_random_masks():
    rng = np.random.RandomState(7)
    for trial in range(20):
        n = rng.randint(3, 40)
        cells = {(int(rng.randint(0, 8)), int(rng.randint(0, 8)))
                 for _ in range(n)}
        regions = {}
        for c, lbl in _flood_regions(cells).items():
            regions.setdefault(lbl, []).append(c)
        for comp in regions.values():
            xs = np.array([c[0] for c in comp])
            ys = np.array([c[1] for c in comp])
            rings, _ = trace_region_outline(xs, ys)
            outer = abs(_ring_area(rings[0]))
            holes = sum(abs(_ring_area(r)) for r in rings[1:])
            assert outer - holes == len(comp), sorted(comp)


def test_raster_boundary_matches_brute(ray_session):
    rng = np.random.RandomState(11)
    cells = {(int(rng.randint(0, 10)), int(rng.randint(0, 10)))
             for _ in range(60)}
    got = raster_boundary(_cells_ds(sorted(cells))).to_pandas()
    want = _brute_boundary(cells)
    got_map = {(int(r.cell_x), int(r.cell_y)): int(r.n_neighbors)
               for r in got.itertuples()}
    assert got_map == want


def test_label_regions_matches_flood(ray_session):
    rng = np.random.RandomState(13)
    cells = {(int(rng.randint(0, 12)), int(rng.randint(0, 12)))
             for _ in range(80)}
    got = label_regions(_cells_ds(sorted(cells))).to_pandas()
    want = _flood_regions(cells)
    got_map = {(int(r.cell_x), int(r.cell_y)): int(r.region)
               for r in got.itertuples()}
    assert got_map == want


def test_polygonize_end_to_end(ray_session):
    rng = np.random.RandomState(17)
    cells = {(int(rng.randint(0, 12)), int(rng.randint(0, 12)))
             for _ in range(90)}
    out = polygonize(_cells_ds(sorted(cells))).to_pandas()
    want = _flood_regions(cells)
    # one row per distinct region; n_cells add up to the mask size
    assert sorted(out["region"]) == sorted(set(want.values()))
    assert out["n_cells"].sum() == len(cells)
    # per-region outline area invariant on the emitted WKB
    from tilemaker_ray.geo.wkb import parse_wkb
    for row in out.itertuples():
        comp_cells = [c for c, l in want.items() if l == row.region]
        assert row.n_cells == len(comp_cells)
        kind, rings = parse_wkb(row.geom_wkb)
        assert kind == 3  # POLYGON: [exterior, hole, ...]
        outer = abs(_ring_area(np.asarray(rings[0])))
        holes = sum(abs(_ring_area(np.asarray(r))) for r in rings[1:])
        assert outer - holes == row.n_cells


def test_rasterize_points_threshold(ray_session):
    import ray.data as rd
    # 3 points in one z6 cell, 1 in another → threshold 2 keeps one cell
    lon = pa.array([10.0, 10.01, 10.02, -40.0], pa.float64())
    lat = pa.array([20.0, 20.01, 20.02, -30.0], pa.float64())
    ds = rd.from_arrow(pa.table({"lon": lon, "lat": lat}))
    out = rasterize_points(ds, zoom=6, threshold=2).to_pandas()
    assert len(out) == 1 and int(out.n_points.iloc[0]) == 3
