"""Regression tests for the round-1 code-review findings."""

import gzip
import os
import shutil
import sqlite3

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tilemaker_ray.config import EngineConfig, LayerDef
from tilemaker_ray.geo import tilemath as tm, wkb
from tilemaker_ray.stages import mvt
from tilemaker_ray.stages.join import PIPJoinPairs, PIPTagger
from tilemaker_ray.stages.tile_encode import encode_subtree


def diamond_poly():
    return pa.table({
        "layer": ["admin"], "name": ["d"], "class": ["b"],
        "minzoom": pa.array([2], pa.int8()),
        "geom_wkb": pa.array([wkb.polygon_wkb(np.array(
            [[-4.0, 0.0], [0.0, -4.0], [4.0, 0.0], [0.0, 4.0],
             [-4.0, 0.0]]))], pa.binary())})


def _batch(kind, geom, lon, lat):
    return pa.table({"lon": pa.array([lon]), "lat": pa.array([lat]),
                     "kind": pa.array([kind], pa.int8()),
                     "geom_wkb": pa.array([geom], pa.binary())})


def test_far_vertex_line_still_joins():
    """A line whose FIRST vertex is far away but which crosses the
    polygon must match (the hex prefilter used to drop it)."""
    j = PIPJoinPairs(diamond_poly())
    line = np.array([[30.0, 30.0], [0.0, 0.0]])  # starts 30° away
    out = j(_batch(2, wkb.linestring_wkb(line), 30.0, 30.0))
    assert out.num_rows == 1
    assert out["polygon_name"].to_pylist() == ["d"]


def test_tagger_tests_full_geometry():
    t = PIPTagger(diamond_poly())
    crossing = np.array([[30.0, 30.0], [-30.0, -30.0]])
    outside = np.array([[30.0, 30.0], [30.0, -30.0]])
    batch = pa.table({
        "lon": pa.array([30.0, 30.0]), "lat": pa.array([30.0, 30.0]),
        "kind": pa.array([2, 2], pa.int8()),
        "geom_wkb": pa.array([wkb.linestring_wkb(crossing),
                              wkb.linestring_wkb(outside)], pa.binary())})
    out = t(batch)
    assert out["in_layer"].to_pylist() == [True, False]


def test_multigeometry_probes():
    """Multi-polygon / multi-linestring probes: no crash, correct hits."""
    j = PIPJoinPairs(diamond_poly())
    mp = wkb.multipolygon_wkb([
        (np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0],
                   [0.0, 0.0]]), []),
        (np.array([[50.0, 50.0], [51.0, 50.0], [51.0, 51.0], [50.0, 51.0],
                   [50.0, 50.0]]), [])])
    out = j(_batch(3, mp, 50.0, 50.0))  # rep point far; part 1 inside
    assert out.num_rows == 1
    ml = wkb.multilinestring_wkb([
        np.array([[50.0, 50.0], [51.0, 51.0]]),
        np.array([[-30.0, -30.0], [0.0, 0.0]])])
    out2 = j(_batch(2, ml, 50.0, 50.0))
    assert out2.num_rows == 1
    # fully-outside multis match nothing
    ml_out = wkb.multilinestring_wkb([np.array([[50.0, 50.0], [51.0, 51.0]])])
    assert j(_batch(2, ml_out, 50.0, 50.0)).num_rows == 0


def test_line_and_polygon_never_combine():
    cfg = EngineConfig(layers=(LayerDef("mix", minzoom=6, combine_lines=True,
                                        combine_polygons=True),))
    lon, lat = 13.4, 52.5
    x = tm.lon2tilex(np.array([lon]), 14)
    y = tm.lat2tiley(np.array([lat]), 14)
    tiles_list = tm.tile_id(14, x, y).tolist()
    line = np.array([[lon, lat], [lon + 0.0004, lat]])
    ring = np.array([[lon, lat], [lon + 0.0004, lat],
                     [lon + 0.0004, lat + 0.0004], [lon, lat]])
    rows = pd.DataFrame([
        {"fuid": 1, "kind": 2, "layer": "mix", "name": "n", "minzoom": 6,
         "z_order": 0, "lon": lon, "lat": lat,
         "geom_wkb": wkb.linestring_wkb(line), "attrs_json": "",
         "base_tiles": tiles_list},
        {"fuid": 2, "kind": 3, "layer": "mix", "name": "n", "minzoom": 6,
         "z_order": 0, "lon": lon, "lat": lat,
         "geom_wkb": wkb.polygon_wkb(ring), "attrs_json": "",
         "base_tiles": tiles_list},
    ])
    tiles = encode_subtree(rows, cfg, zmin=14, zmax=14).to_pandas()
    dec = mvt.decode_tile(gzip.decompress(tiles.iloc[0]["tile_gz"]))
    feats = dec["mix"]["features"]
    assert len(feats) == 2
    assert {f["type"] for f in feats} == {mvt.GEOM_LINESTRING,
                                          mvt.GEOM_POLYGON}


def test_archive_dedup_by_bytes(tmp_path):
    """Directory entries point at the right bytes even when lengths
    collide (dedup keys on content, not hash)."""
    from tilemaker_ray.geo import tilemath as tm
    from tilemaker_ray.stages import pmtiles, sinks
    blobs = [b"AAAAAAA", b"BBBBBBB", b"AAAAAAA"]  # same length, 2 distinct
    zs = np.array([1, 1, 1])
    xs = np.array([0, 1, 0])
    ys = np.array([0, 0, 1])
    tids = tm.tile_id(zs.astype(np.int64), xs.astype(np.int64),
                      ys.astype(np.int64))
    t = pa.table({"zoom": pa.array(zs, pa.int32()),
                  "x": pa.array(xs, pa.int32()),
                  "y": pa.array(ys, pa.int32()),
                  "tile_id": pa.array(tids, pa.int64()),
                  "tile_gz": pa.array(blobs, pa.binary())})
    path = str(tmp_path / "a.pmtiles")
    sinks.write_archive(t, path)
    assert sinks.read_archive_tile(path, int(tids[0])) == b"AAAAAAA"
    assert sinks.read_archive_tile(path, int(tids[1])) == b"BBBBBBB"
    assert sinks.read_archive_tile(path, int(tids[2])) == b"AAAAAAA"
    assert pmtiles.read_pmtiles(path, 1, 1, 1) is None
    # content dedup: 2 distinct blobs stored
    assert pmtiles.read_header(path)["n_contents"] == 2


def test_engine_resume_writes_complete_tileset(ray_session, tmp_path):
    """A resumed engine run's sink output contains the reused
    partitions' tiles too (the review-found data-loss bug)."""
    from tilemaker_ray.pipelines import engine
    from tilemaker_ray.sources import pages
    from tilemaker_ray.state import checkpoint as cp
    ckpt = str(tmp_path / "ckpt")
    pages_path = pages.ensure_pages_parquet(1200,
                                            cache_root=str(tmp_path / "c"))
    out1 = str(tmp_path / "full.mbtiles")
    s1 = engine.run(pages_path, out1, checkpoint_dir=ckpt)
    # drop half the partitions → simulate kill; rerun into a new file
    done = sorted(cp.load_completed(ckpt, "tiles"), key=int)
    for k in done[::2]:
        shutil.rmtree(cp.partition_dir(ckpt, k), ignore_errors=True)
        os.remove(os.path.join(cp.manifest_dir(ckpt), f"{k}.parquet"))
    out2 = str(tmp_path / "resumed.mbtiles")
    s2 = engine.run(pages_path, out2, checkpoint_dir=ckpt)
    c1 = sqlite3.connect(out1).execute("select count(*) from tiles").fetchone()[0]
    c2 = sqlite3.connect(out2).execute("select count(*) from tiles").fetchone()[0]
    assert c1 == c2 == s1["tiles"] == s2["tiles"]
