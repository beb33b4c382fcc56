import duckdb
import numpy as np

from tilemaker_ray.geo.geohash import geohash6, geohash6_int, geohash6_sql


def test_known_vectors():
    # classic spec examples: (57.64911, 10.40744) -> u4pruy...,
    # (42.6, -5.6) -> ezs42...
    got = geohash6(np.array([10.40744, -5.6]),
                   np.array([57.64911, 42.6]))
    assert got.tolist() == [b"u4pruy", b"ezs42e"]


def test_edges_clamp_and_poles():
    lon = np.array([-180.0, 180.0, 0.0, -179.9999999])
    lat = np.array([-90.0, 90.0, 0.0, 89.9999999])
    g = geohash6_int(lon, lat)
    assert ((g >= 0) & (g < (1 << 30))).all()
    # +180/+90 clamp to the last cell, not overflow
    assert geohash6(np.array([180.0]), np.array([90.0])).tolist() \
        == [b"zzzzzz"]
    assert geohash6(np.array([-180.0]), np.array([-90.0])).tolist() \
        == [b"000000"]


def test_sql_mirror_bit_exact():
    rng = np.random.RandomState(3)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    want = [s.decode() for s in geohash6(lon, lat)]
    con = duckdb.connect()
    con.execute("CREATE TABLE pts (lon DOUBLE, lat DOUBLE)")
    con.executemany("INSERT INTO pts VALUES (?, ?)",
                    list(zip(lon.tolist(), lat.tolist())))
    got = [r[0] for r in con.execute(
        f"SELECT {geohash6_sql('lon', 'lat')} FROM pts").fetchall()]
    assert got == want


def test_prefix_property():
    # nearby points share a prefix; the two spec points don't
    a = geohash6(np.array([10.40744, 10.40745]),
                 np.array([57.64911, 57.64912]))
    assert a[0][:4] == a[1][:4]
