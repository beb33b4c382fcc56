"""AreaIntersecting (convex clip) + simplify_buildings."""

import numpy as np
import pytest

from tilemaker_ray.geo import clip, pip, simplify, wkb


def square(cx, cy, half):
    return np.array([[cx - half, cy - half], [cx + half, cy - half],
                     [cx + half, cy + half], [cx - half, cy + half],
                     [cx - half, cy - half]])


def diamond(cx, cy, w, h):
    return np.array([[cx - w, cy], [cx, cy - h], [cx + w, cy],
                     [cx, cy + h], [cx - w, cy]])


def grid_area_oracle(subject, other, n=400):
    """Numeric intersection-area oracle by dense grid sampling."""
    xs = np.linspace(subject[:, 0].min(), subject[:, 0].max(), n)
    ys = np.linspace(subject[:, 1].min(), subject[:, 1].max(), n)
    gx, gy = np.meshgrid(xs, ys)
    px, py = gx.ravel(), gy.ravel()
    in_s = pip.points_in_polygon(px, py, [subject])
    in_o = pip.points_in_polygon(px, py, [other])
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    return (in_s & in_o).sum() * cell


def test_convex_clip_area_vs_grid_oracle():
    s = square(0, 0, 4)
    d = diamond(2, 0, 4, 4)
    inter = clip.intersection_area_convex(s, d)
    approx = grid_area_oracle(s, d)
    assert inter == pytest.approx(approx, rel=0.02)
    # fully inside / fully outside
    assert clip.intersection_area_convex(square(0, 0, 1), square(0, 0, 10)) \
        == pytest.approx(4.0)
    assert clip.intersection_area_convex(square(100, 100, 1), square(0, 0, 2)) \
        == 0.0


def test_area_fraction_via_index():
    idx = pip.PolygonIndex([wkb.polygon_wkb(diamond(0, 0, 4, 4))])
    # small square at the diamond center: fully inside
    assert idx.area_fraction([square(0, 0, 0.5)], 0) == pytest.approx(1.0)
    # half-overlapping square
    frac = idx.area_fraction([square(4, 0, 2)], 0)
    oracle = grid_area_oracle(square(4, 0, 2), diamond(0, 0, 4, 4)) / 16.0
    assert frac == pytest.approx(oracle, rel=0.05)
    # far square: 0
    assert idx.area_fraction([square(50, 50, 1)], 0) == 0.0


def test_area_intersects_predicate():
    from tilemaker_ray.stages.join import PIPJoinPairs
    import pyarrow as pa
    poly = pa.table({
        "layer": ["admin"], "name": ["d"], "class": ["b"],
        "minzoom": pa.array([2], pa.int8()),
        "geom_wkb": pa.array([wkb.polygon_wkb(diamond(0, 0, 4, 4))],
                             pa.binary())})
    j = PIPJoinPairs(poly, predicate="area_intersects")
    batch = pa.table({
        "lon": pa.array([0.0, 3.9]), "lat": pa.array([0.0, 0.0]),
        "kind": pa.array([3, 3], pa.int8()),
        "h3_cell": pa.array([0, 0], pa.int64()),
        "geom_wkb": pa.array([wkb.polygon_wkb(square(0, 0, 1)),
                              wkb.polygon_wkb(square(3.9, 0, 1))],
                             pa.binary())})
    # force prefilter pass-through by recomputing cells from lon/lat
    batch = batch.drop_columns(["h3_cell"])
    out = j(batch)
    # first square: fraction 1 → hit; second mostly outside → miss
    assert out.num_rows == 1


def test_simplify_buildings_snaps_and_removes_notch():
    # rectangle with a tiny notch and slightly off-axis edges
    ring = np.array([[0, 0], [10, 0.02], [10, 4], [6, 4.01], [6, 4.2],
                     [5.8, 4.2], [5.8, 4.0], [0, 4], [0, 0]], dtype=float)
    out = simplify.simplify_buildings(ring, tolerance=0.3)
    assert out is not None
    # result is closed, mostly axis-aligned, and smaller than input
    assert (out[0] == out[-1]).all()
    assert len(out) <= len(ring)
    dx = np.abs(np.diff(out[:, 0]))
    dy = np.abs(np.diff(out[:, 1]))
    axis_aligned = ((dx < 1e-9) | (dy < 1e-9)).mean()
    assert axis_aligned >= 0.75
    # area approximately preserved
    a_in = abs(clip.ring_area(ring))
    a_out = abs(clip.ring_area(out))
    assert a_out == pytest.approx(a_in, rel=0.05)


def test_simplify_buildings_degenerate():
    assert simplify.simplify_buildings(np.array([[0, 0], [1, 0], [0, 0]]),
                                       0.1) is None


def test_polygon_intersection_area_concave_exact():
    """General Green's-theorem clipper: concave, holes, shared
    boundaries, vs dense-grid oracle."""
    L = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]],
                 dtype=float)
    sq = square(2, 2, 2)  # covers all of L
    assert clip.polygon_intersection_area([L], [sq]) == pytest.approx(7.0)
    assert clip.polygon_intersection_area([sq], [L]) == pytest.approx(7.0)
    # concave ∩ concave (mirrored L): exact 4.0
    L2 = np.array([[0, 0], [4, 0], [4, 4], [3, 4], [3, 1], [0, 1], [0, 0]],
                  dtype=float)
    assert clip.polygon_intersection_area([L], [L2]) == pytest.approx(4.0)
    # identical polygons / external touching
    assert clip.polygon_intersection_area([L], [L]) == pytest.approx(7.0)
    assert clip.polygon_intersection_area(
        [square(0, 0, 1)], [square(2, 0, 1)]) == 0.0
    # layer polygon with a hole
    big, hole = square(0, 0, 3), square(0, 0, 1)
    half = np.array([[-3, -3], [0, -3], [0, 3], [-3, 3], [-3, -3]], float)
    assert clip.polygon_intersection_area([big, hole], [half]) \
        == pytest.approx(16.0)
    # generic-position concave star vs grid oracle
    ang = np.linspace(0, 2 * np.pi, 13)[:-1]
    rad = np.where(np.arange(12) % 2 == 0, 2.0, 0.7)
    star = np.stack([rad * np.cos(ang), rad * np.sin(ang)], 1)
    star = np.vstack([star, star[:1]])
    got = clip.polygon_intersection_area([star], [square(0.5, 0.2, 1.3)])
    approx = grid_area_oracle(square(0.5, 0.2, 1.3), star, n=900)
    assert got == pytest.approx(approx, rel=0.02)


def test_area_fraction_concave_layer_exact():
    """PolygonIndex.area_fraction is now exact for concave layer
    polygons (the round-1 vertex-fraction approximation is gone)."""
    L = np.array([[0, 0], [4, 0], [4, 1], [1, 1], [1, 4], [0, 4], [0, 0]],
                 dtype=float)
    idx = pip.PolygonIndex([wkb.polygon_wkb(L)])
    # square [0,2]x[0,2]: overlap with L = 2*1 + 1*1 = 3 of area 4
    assert idx.area_fraction([square(1, 1, 1)], 0) == pytest.approx(0.75)
    # vertex-fraction would give 1/4 = 0.25 here (only corner (0.5,0.5)
    # region inside): a square whose 4 corners are mostly outside but
    # with real overlap
    s = square(1.5, 1.5, 1.0)  # [0.5,2.5]^2; overlap = 0.5*1 + 1*... 
    frac = idx.area_fraction([s], 0)
    oracle = grid_area_oracle(s, L, n=800) / 4.0
    assert frac == pytest.approx(oracle, rel=0.02)


def test_area_fraction_subject_with_hole_convex_layer():
    """Review finding: a donut subject against a CONVEX layer polygon
    must use the general clipper (the convex fast path ignored subject
    holes while the denominator subtracted them)."""
    layer = pip.PolygonIndex([wkb.polygon_wkb(square(5, 5, 5))])  # [0,10]^2
    ext = square(10, 5, 5)    # [5,15]x[0,10]
    hole = square(7, 5, 1)    # [6,8]x[4,6]
    frac = layer.area_fraction([ext, hole], 0)
    # subject net area 100-4=96; intersection = [5,10]x[0,10] minus the
    # hole (fully inside) = 50-4=46
    assert frac == pytest.approx(46.0 / 96.0)
