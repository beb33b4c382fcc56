import numpy as np
import pytest

from tilemaker_ray.geo import wkb, pip, clip, simplify, raster


def square(cx, cy, half):
    return np.array([[cx - half, cy - half], [cx + half, cy - half],
                     [cx + half, cy + half], [cx - half, cy + half],
                     [cx - half, cy - half]])


def test_wkb_point_roundtrip():
    b = wkb.point_wkb(13.4, 52.5)
    gt, p = wkb.parse_wkb(b)
    assert gt == wkb.POINT
    assert p[0] == 13.4 and p[1] == 52.5


def test_wkb_points_vectorized():
    lon = np.array([1.0, 2.0, 3.0])
    lat = np.array([4.0, 5.0, 6.0])
    arr = wkb.points_wkb(lon, lat)
    for i in range(3):
        gt, p = wkb.parse_wkb(arr[i])
        assert gt == wkb.POINT and p[0] == lon[i] and p[1] == lat[i]


def test_wkb_polygon_roundtrip():
    ext = square(0, 0, 10)
    hole = square(0, 0, 2)
    b = wkb.polygon_wkb(ext, [hole])
    gt, rings = wkb.parse_wkb(b)
    assert gt == wkb.POLYGON and len(rings) == 2
    np.testing.assert_allclose(rings[0], ext)
    rings2, holes = wkb.wkb_rings(b)
    assert holes == [False, True]
    assert wkb.wkb_bbox(b) == (-10, -10, 10, 10)


def test_wkb_multipolygon():
    b = wkb.multipolygon_wkb([(square(0, 0, 1), []), (square(5, 5, 1), [])])
    gt, polys = wkb.parse_wkb(b)
    assert gt == wkb.MULTIPOLYGON and len(polys) == 2


def test_pip_square_with_hole():
    rings = [square(0, 0, 10), square(0, 0, 2)]
    px = np.array([0.0, 5.0, 11.0, 1.0])
    py = np.array([0.0, 5.0, 0.0, 3.0])
    got = pip.points_in_polygon(px, py, rings)
    # center is inside the hole -> out; (5,5) inside; (11,0) outside; (1,3) inside
    assert list(got) == [False, True, False, True]


def test_pip_concave():
    # C-shape: point in the notch is outside
    ring = np.array([[0, 0], [10, 0], [10, 3], [3, 3], [3, 7], [10, 7],
                     [10, 10], [0, 10], [0, 0]], dtype=float)
    got = pip.points_in_polygon(np.array([5.0, 1.0]), np.array([5.0, 5.0]), [ring])
    assert list(got) == [False, True]


def test_pip_matches_bruteforce_random():
    rng = np.random.default_rng(42)
    # random star-convex polygon
    angles = np.sort(rng.uniform(0, 2 * np.pi, 12))
    radii = rng.uniform(2, 8, 12)
    ring = np.stack([radii * np.cos(angles), radii * np.sin(angles)], axis=1)
    ring = np.vstack([ring, ring[:1]])
    px = rng.uniform(-10, 10, 2000)
    py = rng.uniform(-10, 10, 2000)
    got = pip.points_in_polygon(px, py, [ring])
    # brute-force per-point crossing test (independent scalar impl)
    def brute(x, y):
        c = False
        for i in range(len(ring) - 1):
            x0, y0 = ring[i]
            x1, y1 = ring[i + 1]
            if (y0 <= y) != (y1 <= y):
                xint = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
                if x < xint:
                    c = not c
        return c
    expect = np.array([brute(px[i], py[i]) for i in range(len(px))])
    assert (got == expect).all()


def test_polygon_index_join():
    polys = [wkb.polygon_wkb(square(0, 0, 5)),
             wkb.polygon_wkb(square(8, 8, 5)),   # overlaps first corner region
             wkb.polygon_wkb(square(100, 100, 1))]
    idx = pip.PolygonIndex(polys, names=["a", "b", "c"])
    px = np.array([0.0, 4.0, 100.0, 50.0])
    py = np.array([0.0, 4.0, 100.0, 50.0])
    pts, pls = idx.contains_pairs(px, py)
    pairs = set(zip(pts.tolist(), pls.tolist()))
    # (4,4) is inside both a ([-5,5]²) and b ([3,13]²); (0,0) only a
    assert pairs == {(0, 0), (1, 0), (1, 1), (2, 2)}


def test_line_intersects_and_covered_by():
    idx = pip.PolygonIndex([wkb.polygon_wkb(square(0, 0, 5))])
    crossing = np.array([[-10.0, 0.0], [10.0, 0.0]])
    inside = np.array([[-1.0, -1.0], [1.0, 1.0]])
    outside = np.array([[-10.0, 8.0], [10.0, 8.0]])
    assert idx.line_intersects(crossing, 0)
    assert idx.line_intersects(inside, 0)
    assert not idx.line_intersects(outside, 0)
    assert idx.covered_by(inside, 0)
    assert not idx.covered_by(crossing, 0)


def test_knn_brute_deterministic():
    cx = np.array([0.0, 1.0, 2.0, 10.0])
    cy = np.zeros(4)
    idx, d2 = pip.knn_brute(np.array([0.9]), np.array([0.0]), cx, cy, 3)
    assert idx[0].tolist() == [1, 0, 2]
    # tie: equidistant centers 0 and 2 from x=1 -> lower index first
    idx2, _ = pip.knn_brute(np.array([1.0]), np.array([0.0]), cx, cy, 3)
    assert idx2[0].tolist() == [1, 0, 2]


def test_clip_ring_basic():
    c = clip.clip_ring(square(0, 0, 10), -5, -5, 5, 5)
    assert c is not None
    assert clip.ring_area(c) == pytest.approx(100.0)
    # fully outside collapses
    assert clip.clip_ring(square(100, 100, 1), -5, -5, 5, 5) is None
    # fully inside unchanged area
    c2 = clip.clip_ring(square(0, 0, 2), -5, -5, 5, 5)
    assert abs(clip.ring_area(c2)) == pytest.approx(16.0)


def test_clip_linestring():
    line = np.array([[-10.0, 0.0], [10.0, 0.0]])
    runs = clip.clip_linestring(line, -5, -5, 5, 5)
    assert len(runs) == 1
    np.testing.assert_allclose(runs[0], [[-5, 0], [5, 0]])
    # zig-zag exiting and re-entering -> two runs
    zz = np.array([[-10, 0], [0, 0], [0, 20], [10, 0], [3, 0]], dtype=float)
    runs = clip.clip_linestring(zz, -5, -5, 5, 5)
    assert len(runs) == 2
    np.testing.assert_allclose(runs[1], [[5, 0], [3, 0]])


def test_douglas_peucker():
    # nearly-collinear middle point removed, sharp corner kept
    line = np.array([[0, 0], [5, 0.001], [10, 0], [10, 10]], dtype=float)
    out = simplify.douglas_peucker(line, 0.1)
    np.testing.assert_allclose(out, [[0, 0], [10, 0], [10, 10]])
    out2 = simplify.douglas_peucker(line, 1e-6)
    assert len(out2) == 4


def test_simplify_ring_drop_small():
    r = square(0, 0, 0.001)
    assert simplify.simplify_ring(r, 0.01) is None
    big = square(0, 0, 10)
    out = simplify.simplify_ring(big, 0.01)
    assert out is not None and len(out) == 5


def test_visvalingam():
    line = np.array([[0, 0], [1, 0.01], [2, 0], [3, 5], [4, 0]], dtype=float)
    out = simplify.visvalingam(line, 0.5)
    # tiny triangle at index1 removed; big spike kept
    assert [0, 0] in out.tolist() and [3, 5] in out.tolist()
    assert [1, 0.01] not in out.tolist()


def test_supercover_diagonal():
    tiles = raster.supercover_segment(0.5, 0.5, 3.5, 3.5, 4)
    s = set(map(tuple, tiles.tolist()))
    # diagonal passes through all 4 diagonal tiles plus corner-adjacent ones
    assert {(0, 0), (1, 1), (2, 2), (3, 3)}.issubset(s)
    # contiguous: each consecutive pair differs by one step in x or y
    for a, b in zip(tiles[:-1], tiles[1:]):
        assert abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1


def test_supercover_horizontal():
    tiles = raster.supercover_segment(0.2, 0.5, 5.8, 0.5, 4)
    assert tiles.tolist() == [[i, 0] for i in range(6)]


def test_polygon_tiles_fill():
    # 6x6 tile square: boundary ring + interior fill
    ring = np.array([[0.5, 0.5], [6.5, 0.5], [6.5, 6.5], [0.5, 6.5], [0.5, 0.5]])
    tiles = raster.polygon_tiles([ring], 4)
    s = set(map(tuple, tiles.tolist()))
    assert (3, 3) in s            # interior
    assert (0, 0) in s and (6, 6) in s  # boundary
    assert (7, 3) not in s        # outside
    assert len(s) == 49


def test_polygon_tiles_with_hole():
    ext = np.array([[0.5, 0.5], [8.5, 0.5], [8.5, 8.5], [0.5, 8.5], [0.5, 0.5]])
    hole = np.array([[3.5, 3.5], [5.5, 3.5], [5.5, 5.5], [3.5, 5.5], [3.5, 3.5]])
    tiles = raster.polygon_tiles([ext, hole], 4)
    s = set(map(tuple, tiles.tolist()))
    assert (4, 4) not in s  # strictly inside the hole: not touched
    assert (3, 3) in s      # hole boundary tile is touched
    assert (1, 1) in s
