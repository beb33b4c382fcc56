"""Tile pipeline tests: MVT codec roundtrip, subtree encoding vs a
brute-force oracle, determinism (double-run hash equality, mirroring
the reference's verify-generated-tiles.py semantic comparison)."""

import gzip

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tilemaker_ray.config import DEFAULT_CONFIG, EngineConfig, LayerDef
from tilemaker_ray.geo import tilemath as tm, wkb
from tilemaker_ray.sources import pages
from tilemaker_ray.stages import mvt
from tilemaker_ray.stages.encode import make_cell_encoder
from tilemaker_ray.stages.extract import ExtractFeatures
from tilemaker_ray.stages.fanout import make_fanout
from tilemaker_ray.stages.tile_encode import encode_subtree


def test_mvt_roundtrip_point():
    lb = mvt.LayerBuilder("place")
    assert lb.add_feature(mvt.GEOM_POINT, [np.array([[100, 200]])],
                          {"name": "berlin"})
    buf = mvt.build_tile([lb])
    dec = mvt.decode_tile(buf)
    assert "place" in dec
    layer = dec["place"]
    assert layer["extent"] == 4096
    assert layer["keys"] == ["name"]
    assert layer["values"] == ["berlin"]
    f = layer["features"][0]
    assert f["type"] == mvt.GEOM_POINT
    parts = mvt.decode_geometry(f["geometry"])
    np.testing.assert_array_equal(parts[0], [[100, 200]])


def test_mvt_roundtrip_polygon():
    ring = np.array([[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]])
    lb = mvt.LayerBuilder("footprint")
    lb.add_feature(mvt.GEOM_POLYGON, [ring], {"name": "x", "n": 3})
    dec = mvt.decode_tile(mvt.build_tile([lb]))
    f = dec["footprint"]["features"][0]
    parts = mvt.decode_geometry(f["geometry"])
    np.testing.assert_array_equal(parts[0], ring)
    # tags decode: n=3 as sint
    vals = dec["footprint"]["values"]
    assert 3 in vals


def test_mvt_multiline_delta_encoding():
    l1 = np.array([[0, 0], [50, 60]])
    l2 = np.array([[500, 500], [400, 300]])
    lb = mvt.LayerBuilder("track")
    lb.add_feature(mvt.GEOM_LINESTRING, [l1, l2], {})
    f = mvt.decode_tile(mvt.build_tile([lb]))["track"]["features"][0]
    parts = mvt.decode_geometry(f["geometry"])
    np.testing.assert_array_equal(parts[0], l1)
    np.testing.assert_array_equal(parts[1], l2)


def _fanout_frame(n_pages=3000):
    """pages → features → encode → fanout, all in-process."""
    t = pages.page_batch({"id": np.arange(n_pages, dtype=np.uint64)})
    feats = ExtractFeatures()(t)
    enc = make_cell_encoder(DEFAULT_CONFIG)(feats)
    fan = make_fanout(DEFAULT_CONFIG)(enc)
    return fan.to_pandas(), enc


def test_fanout_points_banded():
    fan, enc = _fanout_frame(1000)
    pts = fan[fan["kind"] == 1]
    assert (pts["base_tiles"].map(len) == 1).all()
    # one row per band; each shard key is the band-anchor parent
    n_points = enc.filter(
        __import__("pyarrow").compute.equal(enc["kind"], 1)).num_rows
    from tilemaker_ray.stages.fanout import BANDS
    # points (minzoom ≥ 6) skip the low-zoom band
    vis_bands = [b for b in BANDS
                 if (b[1] if b[1] is not None else 14) >= 6]
    assert len(pts) == n_points * len(vis_bands)
    bt = np.asarray([t[0] for t in pts["base_tiles"]])
    sk = pts["shard_key"].to_numpy()
    az = sk >> np.int64(tm.ZOOM_SHIFT)
    for _, _, anchor in BANDS:
        sel = az == anchor
        np.testing.assert_array_equal(
            tm.tile_id_parent(bt[sel], DEFAULT_CONFIG.basezoom - anchor),
            sk[sel])


def test_fanout_lines_cover_more_tiles():
    fan, _ = _fanout_frame(4000)
    lines = fan[fan["kind"] == 2]
    assert len(lines) > 0
    assert lines["base_tiles"].map(len).max() > 1


def test_encode_subtree_oracle_counts():
    """Tile feature membership matches a brute-force per-zoom check."""
    fan, _ = _fanout_frame(1500)
    z13 = fan[(fan["shard_key"].to_numpy() >> tm.ZOOM_SHIFT) == 13]
    one = fan[fan["shard_key"] == z13["shard_key"].mode()[0]]
    tiles = encode_subtree(one, DEFAULT_CONFIG, zmin=13, zmax=14).to_pandas()
    assert len(tiles) > 0
    # oracle: point features at z14 per tile
    cfgz = DEFAULT_CONFIG.basezoom
    pts = one[one["kind"] == 1]
    expect = {}
    for _, r in pts.iterrows():
        if r["minzoom"] <= cfgz:
            for t in r["base_tiles"]:
                expect[t] = expect.get(t, 0) + 1
    got = tiles[(tiles["zoom"] == cfgz)]
    for _, r in got.iterrows():
        tid = r["tile_id"]
        n_points_expected = expect.get(tid, 0)
        # decode the tile and count place-layer point geometries
        body = gzip.decompress(r["tile_gz"])
        dec = mvt.decode_tile(body)
        place = dec.get("place", {"features": []})
        n_got = sum(sum(len(p) for p in mvt.decode_geometry(f["geometry"]))
                    for f in place["features"] if f["type"] == mvt.GEOM_POINT)
        assert n_got == n_points_expected, (tid, n_got, n_points_expected)
    # every expected tile with points is present
    got_ids = set(got["tile_id"])
    assert set(expect).issubset(got_ids)


def _z6_shard(fan, pick=0):
    z6 = fan[(fan["shard_key"].to_numpy() >> tm.ZOOM_SHIFT) == 6]
    key = z6["shard_key"].value_counts().index[pick]
    return fan[fan["shard_key"] == key]


def test_encode_subtree_zoom_rollup():
    """Every tile at z has a parent tile at z-1 containing it."""
    fan, _ = _fanout_frame(800)
    one = _z6_shard(fan)
    tiles = encode_subtree(one, DEFAULT_CONFIG, zmin=6, zmax=14).to_pandas()
    by_zoom = {z: set(g["tile_id"]) for z, g in tiles.groupby("zoom")}
    # only zooms where every feature kind is past its minzoom (place 6,
    # track 9, footprint 11) — below that a child can legally lack a parent
    for z in range(12, 15):
        if z not in by_zoom or (z - 1) not in by_zoom:
            continue
        for tid in by_zoom[z]:
            assert int(tm.tile_id_parent(np.asarray([tid]), 1)[0]) in by_zoom[z - 1]


def test_encode_deterministic_under_row_order():
    """Double-run + shuffled input rows → identical tile hashes
    (the reference's verify-generated-tiles invariant)."""
    fan, _ = _fanout_frame(1200)
    one = _z6_shard(fan)
    a = encode_subtree(one, DEFAULT_CONFIG, zmin=6, zmax=14).to_pandas()\
        .sort_values("tile_id").reset_index(drop=True)
    shuffled = one.sample(frac=1.0, random_state=7)
    b = encode_subtree(shuffled, DEFAULT_CONFIG, zmin=6, zmax=14).to_pandas()\
        .sort_values("tile_id").reset_index(drop=True)
    assert list(a["tile_hash"]) == list(b["tile_hash"])
    assert list(a["n_features"]) == list(b["n_features"])


def test_feature_limit_topk():
    cfg = EngineConfig(layers=(LayerDef("place", minzoom=6, feature_limit=2,
                                        feature_limit_below=15),))
    # 5 point features in the same tile, distinct z_orders
    lon, lat = 13.4, 52.5
    rows = []
    for i in range(5):
        rows.append({"fuid": i, "kind": 1,
                     "layer": "place", "name": f"n{i}", "minzoom": 6,
                     "z_order": i * 10, "lon": lon, "lat": lat,
                     "geom_wkb": wkb.point_wkb(lon, lat),
                     "base_tiles": tm.tile_id(
                         14, tm.lon2tilex(np.array([lon]), 14),
                         tm.lat2tiley(np.array([lat]), 14)).tolist()})
    df = pd.DataFrame(rows)
    tiles = encode_subtree(df, cfg, zmin=14, zmax=14).to_pandas()
    z14 = tiles[tiles["zoom"] == 14]
    assert (z14["n_features"] == 2).all()
    # top-k by z_order desc → names n4, n3 kept
    body = gzip.decompress(z14.iloc[0]["tile_gz"])
    dec = mvt.decode_tile(body)
    assert set(dec["place"]["values"]) == {"n4", "n3"}


def test_banded_shards_equal_monolithic():
    """Union of per-shard banded encoding == one-task full-pyramid
    encoding (skew splitting must not change output bytes)."""
    from tilemaker_ray.stages.tile_encode import encode_shard
    fan, _ = _fanout_frame(1500)
    # monolithic: ALL rows in one task — encode_subtree dedups by fuid
    # and merges base_tiles, yielding each feature's full tile set
    mono = encode_subtree(fan, DEFAULT_CONFIG, zmin=6, zmax=14).to_pandas()\
        .sort_values("tile_id").reset_index(drop=True)
    # banded: encode each shard with its band's zoom range
    parts = [encode_shard(g, DEFAULT_CONFIG).to_pandas()
             for _, g in fan.groupby("shard_key")]
    banded = pd.concat(parts).sort_values("tile_id").reset_index(drop=True)
    assert list(mono["tile_hash"]) == list(banded["tile_hash"])
    assert list(mono["n_features"]) == list(banded["n_features"])
