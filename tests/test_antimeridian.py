"""Antimeridian splitting: lines/polygons crossing ±180° fan out to
tiles on BOTH sides of the date line, never across the world."""

import gzip

import numpy as np
import pandas as pd
import pyarrow as pa

from tilemaker_ray.config import DEFAULT_CONFIG, EngineConfig, LayerDef
from tilemaker_ray.geo import antimeridian as am, tilemath as tm, wkb
from tilemaker_ray.stages import mvt
from tilemaker_ray.stages.fanout import make_fanout
from tilemaker_ray.stages.tile_encode import encode_subtree


def test_split_line_basic():
    line = np.array([[179.5, 10.0], [-179.5, 11.0]])
    parts = am.split_line(line)
    assert len(parts) == 2
    for p in parts:
        assert (np.abs(p[:, 0]) <= 180).all()
        assert not am.crosses(p)
    # crossing latitude interpolates halfway (symmetric spans;
    # the window edge sits eps inside ±180)
    east = next(p for p in parts if p[0, 0] > 0)
    assert abs(east[-1, 1] - 10.5) < 1e-6 or abs(east[0, 1] - 10.5) < 1e-6
    # non-crossing line untouched
    same = am.split_line(np.array([[10.0, 0.0], [11.0, 1.0]]))
    assert len(same) == 1


def test_split_polygon_two_parts_area_preserved():
    ring = np.array([[179.0, -1.0], [-179.0, -1.0], [-179.0, 1.0],
                     [179.0, 1.0], [179.0, -1.0]])
    polys = am.split_polygon([ring])
    assert len(polys) == 2
    from tilemaker_ray.geo.clip import ring_area
    total = sum(abs(ring_area(p[0])) for p in polys)
    assert total == pytest_approx(4.0, 1e-6)  # 2° lon × 2° lat
    for p in polys:
        assert (np.abs(p[0][:, 0]) <= 180).all()


def pytest_approx(v, tol):
    import pytest
    return pytest.approx(v, abs=tol)


def test_fanout_tiles_on_both_sides():
    """The VERDICT criterion: a crossing line's tile set has tiles in
    both the x≈0 and x≈2^z−1 columns and nothing in mid-world."""
    cfg = DEFAULT_CONFIG
    bz = cfg.basezoom
    line = np.array([[179.9, 5.0], [-179.9, 5.0]])
    batch = pa.table({
        "fuid": pa.array([1], pa.int64()),
        "kind": pa.array([2], pa.int8()),
        "layer": pa.array(["track"], pa.string()),
        "name": pa.array(["x"], pa.string()),
        "minzoom": pa.array([6], pa.int8()),
        "z_order": pa.array([0], pa.int16()),
        "lon": pa.array([179.9], pa.float64()),
        "lat": pa.array([5.0], pa.float64()),
        "geom_wkb": pa.array([wkb.linestring_wkb(line)], pa.binary()),
        "attrs_json": pa.array([""], pa.string()),
        "tile_x": pa.array(
            tm.lon2tilex(np.array([179.9]), bz).astype(np.int64), pa.int64()),
        "tile_y": pa.array(
            tm.lat2tiley(np.array([5.0]), bz).astype(np.int64), pa.int64()),
    })
    out = make_fanout(cfg)(batch)
    assert out.num_rows > 0
    tids = np.concatenate([np.asarray(v) for v in
                           out["base_tiles"].to_pylist()])
    rz = int(out["raster_zoom"][0].as_py())
    _, xs, _ = tm.tile_id_decode(tids)
    n = 1 << rz
    assert (xs <= tm.lon2tilex(np.array([-179.0]), rz)[0]).any(), \
        "no tiles on the west side"
    assert (xs >= tm.lon2tilex(np.array([179.0]), rz)[0]).any(), \
        "no tiles on the east side"
    # nothing in the middle of the world
    mid = (xs > n // 4) & (xs < 3 * n // 4)
    assert not mid.any(), f"world-spanning tiles: {xs[mid]}"


def test_encode_crossing_line_renders_clean():
    """End-to-end: the crossing line renders in an east-side tile as a
    short segment (not a world-wide sliver)."""
    cfg = EngineConfig(layers=(LayerDef("track", minzoom=6),))
    bz = 14
    line = np.array([[179.9995, 5.0], [-179.9995, 5.0]])
    x_east = int(tm.lon2tilex(np.array([179.9995]), bz)[0])
    y = int(tm.lat2tiley(np.array([5.0]), bz)[0])
    tid_east = int(tm.tile_id(bz, np.array([x_east]), np.array([y]))[0])
    rows = pd.DataFrame([
        {"fuid": 1, "kind": 2, "layer": "track", "name": "x", "minzoom": 6,
         "z_order": 0, "lon": 179.9995, "lat": 5.0,
         "geom_wkb": wkb.linestring_wkb(line), "attrs_json": "",
         "base_tiles": [tid_east]},
    ])
    tiles = encode_subtree(rows, cfg, zmin=bz, zmax=bz).to_pandas()
    assert len(tiles) == 1
    dec = mvt.decode_tile(gzip.decompress(tiles.iloc[0]["tile_gz"]))
    feats = dec["track"]["features"]
    assert len(feats) == 1
    parts = mvt.decode_geometry(feats[0]["geometry"])
    # the in-tile geometry stays within the tile+margin, no world sweep
    for p in parts:
        assert np.abs(p).max() < 4096 * 3
