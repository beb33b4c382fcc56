import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tilemaker_ray.geo import tilemath as tm


def test_lat2latp_known_values():
    # equator fixed point, Mercator square corners
    assert tm.lat2latp(np.array([0.0]))[0] == pytest.approx(0.0, abs=1e-12)
    assert tm.lat2latp(np.array([tm.MAX_LAT]))[0] == pytest.approx(180.0, abs=1e-9)
    assert tm.lat2latp(np.array([-tm.MAX_LAT]))[0] == pytest.approx(-180.0, abs=1e-9)
    # clamping beyond the square
    assert tm.lat2latp(np.array([89.9]))[0] == pytest.approx(180.0, abs=1e-9)


@given(st.floats(-85.0, 85.0))
@settings(max_examples=200, deadline=None)
def test_latp_roundtrip(lat):
    latp = tm.lat2latp(np.array([lat]))
    back = tm.latp2lat(latp)
    assert back[0] == pytest.approx(lat, abs=1e-9)


def test_tilex_closed_form():
    z = 14
    # lon=-180 → x=0; lon just under +180 → last tile; lon=0 → middle
    assert tm.lon2tilex(np.array([-180.0]), z)[0] == 0
    assert tm.lon2tilex(np.array([179.999999]), z)[0] == (1 << z) - 1
    assert tm.lon2tilex(np.array([0.0]), z)[0] == (1 << z) // 2
    # boundary: exact tile edge goes to the east tile (floor semantics)
    edge_lon = tm.tilex2lon(np.int64(100), z)
    assert tm.lon2tilex(np.array([edge_lon]), z)[0] == 100


def test_tiley_closed_form():
    z = 10
    assert tm.lat2tiley(np.array([0.0]), z)[0] == (1 << z) // 2
    assert tm.lat2tiley(np.array([85.06]), z)[0] == 0  # clamped top
    assert tm.lat2tiley(np.array([-85.06]), z)[0] == (1 << z) - 1


@given(st.integers(0, 14), st.integers(0, 2**14 - 1), st.integers(0, 2**14 - 1))
@settings(max_examples=300, deadline=None)
def test_tile_id_roundtrip(z, x, y):
    x, y = x % (1 << z) if z else 0, y % (1 << z) if z else 0
    tid = tm.tile_id(z, np.array([x]), np.array([y]))
    zz, xx, yy = tm.tile_id_decode(tid)
    assert (zz[0], xx[0], yy[0]) == (z, x, y)


def test_tile_id_parent():
    tid = tm.tile_id(14, np.array([12345]), np.array([6789]))
    p = tm.tile_id_parent(tid, 1)
    z, x, y = tm.tile_id_decode(p)
    assert (z[0], x[0], y[0]) == (13, 12345 // 2, 6789 // 2)
    p6 = tm.tile_id_parent(tid, 8)
    z, x, y = tm.tile_id_decode(p6)
    assert (z[0], x[0], y[0]) == (6, 12345 >> 8, 6789 >> 8)


def test_morton_hierarchy_contiguous():
    # all children of a tile form a contiguous morton range
    m = tm.morton_encode(np.array([5]), np.array([9]))[0]
    children_x = np.array([10, 11, 10, 11])
    children_y = np.array([18, 18, 19, 19])
    cm = tm.morton_encode(children_x, children_y)
    assert sorted(cm) == list(range(int(m) * 4, int(m) * 4 + 4))


def test_hex_cell_roundtrip_center():
    lon = np.array([13.4, -74.0, 151.2])
    lat = np.array([52.5, 40.7, -33.9])
    cells = tm.hex_cell(lon, lat, 9)
    cx, cy = tm.hex_center(cells)
    # center of assigned cell is within one circumradius of the point
    latp = tm.lat2latp(lat)
    d = np.hypot(cx - lon, cy - latp)
    assert (d <= tm.hex_radius(9) + 1e-9).all()


def test_hex_cells_in_bbox_covers_points():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-10, 10, 500)
    lat = rng.uniform(40, 55, 500)
    cells = tm.hex_cell(lon, lat, 6)
    cover = set(tm.hex_cells_in_bbox(-10, 40, 10, 55, 6))
    assert set(cells).issubset(cover)


def test_quad_cell_matches_tile():
    lon = np.array([13.4])
    lat = np.array([52.5])
    c = tm.quad_cell(lon, lat, 12)
    z, x, y = tm.tile_id_decode(c)
    assert z[0] == 12
    assert x[0] == tm.lon2tilex(lon, 12)[0]
    assert y[0] == tm.lat2tiley(lat, 12)[0]


def test_haversine_known():
    # Paris -> Berlin ≈ 878 km
    d = tm.haversine_m(2.3522, 48.8566, 13.4050, 52.5200)
    assert 870_000 < float(d) < 890_000
