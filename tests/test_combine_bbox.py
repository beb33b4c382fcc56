"""combine_lines endpoint reordering (A7) + --bbox clipping box."""

import gzip

import numpy as np
import pandas as pd
import pytest

from tilemaker_ray.config import DEFAULT_CONFIG, EngineConfig, LayerDef
from tilemaker_ray.geo import tilemath as tm, wkb
from tilemaker_ray.stages import mvt
from tilemaker_ray.stages.tile_encode import (encode_subtree,
                                              reorder_multilinestring)


def test_reorder_multilinestring_links():
    a = np.array([[0, 0], [5, 0]])
    b = np.array([[5, 0], [5, 5]])      # continues a
    c = np.array([[9, 9], [8, 8]])      # separate
    out = reorder_multilinestring([a, b, c])
    assert len(out) == 2
    np.testing.assert_array_equal(out[0], [[0, 0], [5, 0], [5, 5]])
    # reverse-direction link (segment end == cur start)
    d = np.array([[-5, 0], [0, 0]])
    out2 = reorder_multilinestring([a, d])
    assert len(out2) == 1
    np.testing.assert_array_equal(out2[0], [[-5, 0], [0, 0], [5, 0]])


def _line_rows(lines, zord=7):
    """Rows for several track features in the same z14 tile."""
    rows = []
    for i, coords in enumerate(lines):
        lon, lat = coords[0]
        x = tm.lon2tilex(np.array([lon]), 14)
        y = tm.lat2tiley(np.array([lat]), 14)
        rows.append({"fuid": i, "kind": 2, "layer": "track", "name": "t",
                     "minzoom": 9, "z_order": zord, "lon": lon, "lat": lat,
                     "geom_wkb": wkb.linestring_wkb(np.asarray(coords)),
                     "attrs_json": "",
                     "base_tiles": tm.tile_id(14, x, y).tolist()})
    return pd.DataFrame(rows)


def test_combine_lines_in_tile():
    cfg = EngineConfig(layers=(LayerDef("track", minzoom=9,
                                        combine_lines=True),))
    base = (13.4000, 52.5000)
    l1 = [[base[0], base[1]], [base[0] + 0.0004, base[1]]]
    l2 = [[base[0] + 0.0004, base[1]], [base[0] + 0.0004, base[1] + 0.0004]]
    df = _line_rows([l1, l2])
    tiles = encode_subtree(df, cfg, zmin=14, zmax=14).to_pandas()
    assert len(tiles) == 1
    # combined into ONE linestring feature whose single part chains both
    dec = mvt.decode_tile(gzip.decompress(tiles.iloc[0]["tile_gz"]))
    feats = dec["track"]["features"]
    assert len(feats) == 1
    parts = mvt.decode_geometry(feats[0]["geometry"])
    assert len(parts) == 1 and len(parts[0]) == 3


def test_no_combine_when_zorder_differs():
    cfg = EngineConfig(layers=(LayerDef("track", minzoom=9,
                                        combine_lines=True),))
    base = (13.4000, 52.5000)
    l1 = [[base[0], base[1]], [base[0] + 0.0004, base[1]]]
    l2 = [[base[0] + 0.0004, base[1]], [base[0] + 0.0004, base[1] + 0.0004]]
    df = _line_rows([l1])
    df2 = _line_rows([l2], zord=9)
    df2["fuid"] = [100]
    tiles = encode_subtree(pd.concat([df, df2]), cfg,
                           zmin=14, zmax=14).to_pandas()
    dec = mvt.decode_tile(gzip.decompress(tiles.iloc[0]["tile_gz"]))
    assert len(dec["track"]["features"]) == 2


def test_bbox_restricts_tiles(ray_session):
    """A bbox around Berlin: only tiles inside survive."""
    from tilemaker_ray.pipelines import flagship
    from tilemaker_ray.sources import pages
    cfg_box = EngineConfig(layers=DEFAULT_CONFIG.layers,
                           bbox=(12.0, 51.5, 15.0, 53.5))
    ds = pages.pages_dataset(1500, parallelism=4)
    tiles = flagship.tiles_pipeline(ds, cfg_box).to_pandas()
    assert len(tiles) > 0
    # every produced tile intersects the box (check at each tile's zoom)
    for _, r in tiles.iterrows():
        z = int(r["zoom"])
        lon_w = tm.tilex2lon(np.float64(r["x"]), z)
        lon_e = tm.tilex2lon(np.float64(r["x"] + 1), z)
        latp_n = tm.tiley2latp(np.float64(r["y"]), z)
        latp_s = tm.tiley2latp(np.float64(r["y"] + 1), z)
        lat_n = tm.latp2lat(latp_n)
        lat_s = tm.latp2lat(latp_s)
        assert lon_e >= 12.0 - 1e-9 and lon_w <= 15.0 + 1e-9
        assert lat_n >= 51.5 - 1e-9 and lat_s <= 53.5 + 1e-9
    # berlin content exists
    zooms = set(tiles["zoom"])
    assert 14 in zooms


def _poly_rows(polys, layer="lot", zord=7, name="p"):
    """Rows for polygon features anchored in the same z14 tile."""
    rows = []
    for i, ext in enumerate(polys):
        ext = np.asarray(ext)
        lon, lat = float(ext[0, 0]), float(ext[0, 1])
        x = tm.lon2tilex(np.array([lon]), 14)
        y = tm.lat2tiley(np.array([lat]), 14)
        rows.append({"fuid": i, "kind": 3, "layer": layer, "name": name,
                     "minzoom": 9, "z_order": zord, "lon": lon, "lat": lat,
                     "geom_wkb": wkb.polygon_wkb(ext),
                     "attrs_json": "",
                     "base_tiles": tm.tile_id(14, x, y).tolist()})
    return pd.DataFrame(rows)


def _sq_lonlat(base, i0, j0, i1, j1, step=0.0004):
    """Closed lon/lat square on a small grid near ``base``."""
    x0, y0 = base[0] + i0 * step, base[1] + j0 * step
    x1, y1 = base[0] + i1 * step, base[1] + j1 * step
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]


def test_combine_polygons_unions_adjacent_squares():
    """Reference parity (tile_worker.cpp:393-405): two adjacent
    same-attribute squares in a combine_polygons layer dissolve their
    shared border into ONE merged ring, not a two-part multipolygon."""
    cfg = EngineConfig(layers=(LayerDef("lot", minzoom=9,
                                        combine_polygons=True),))
    base = (13.4000, 52.5000)
    p1 = _sq_lonlat(base, 0, 0, 4, 4)
    p2 = _sq_lonlat(base, 4, 0, 8, 4)    # shares the right border of p1
    df = _poly_rows([p1, p2])
    tiles = encode_subtree(df, cfg, zmin=14, zmax=14).to_pandas()
    assert len(tiles) == 1
    dec = mvt.decode_tile(gzip.decompress(tiles.iloc[0]["tile_gz"]))
    feats = dec["lot"]["features"]
    assert len(feats) == 1
    parts = mvt.decode_geometry(feats[0]["geometry"])
    assert len(parts) == 1            # ONE ring: the border dissolved
    ring = np.asarray(parts[0])
    xs = sorted(set(ring[:, 0].tolist()))
    assert len(xs) >= 2               # spans both squares' width


def test_combine_polygons_disjoint_stay_multipolygon():
    cfg = EngineConfig(layers=(LayerDef("lot", minzoom=9,
                                        combine_polygons=True),))
    base = (13.4000, 52.5000)
    p1 = _sq_lonlat(base, 0, 0, 3, 3)
    p2 = _sq_lonlat(base, 6, 6, 9, 9)    # no shared border
    df = _poly_rows([p1, p2])
    tiles = encode_subtree(df, cfg, zmin=14, zmax=14).to_pandas()
    dec = mvt.decode_tile(gzip.decompress(tiles.iloc[0]["tile_gz"]))
    feats = dec["lot"]["features"]
    assert len(feats) == 1            # still one combined FEATURE
    parts = mvt.decode_geometry(feats[0]["geometry"])
    assert len(parts) == 2            # ...with two rings
