"""Sink tests: MBTiles roundtrip, clustered archive random access,
file tree, GeoJSON, merge mode."""

import gzip
import os
import sqlite3

import numpy as np
import pytest

from tilemaker_ray.pipelines import flagship
from tilemaker_ray.sources import pages
from tilemaker_ray.stages import mvt, sinks


@pytest.fixture(scope="module")
def tiles_ds(ray_session):
    return flagship.tiles_pipeline(
        pages.pages_dataset(800, parallelism=4)).materialize()


def test_mbtiles_roundtrip(tiles_ds, tmp_path):
    path = str(tmp_path / "out.mbtiles")
    n = sinks.write_mbtiles(tiles_ds, path,
                            metadata=sinks.tileset_metadata())
    assert n == tiles_ds.count()
    con = sqlite3.connect(path)
    assert con.execute("select count(*) from tiles").fetchone()[0] == n
    meta = dict(con.execute("select name, value from metadata").fetchall())
    assert meta["format"] == "pbf" and "vector_layers" in meta["json"]
    con.close()
    back = sinks.read_mbtiles(path)
    orig = tiles_ds.to_pandas().sort_values("tile_id").reset_index(drop=True)
    got = back.to_pandas().sort_values("tile_id").reset_index(drop=True)
    assert list(got["tile_id"]) == list(orig["tile_id"])
    assert got["tile_gz"].map(bytes).tolist() == orig["tile_gz"].map(bytes).tolist()


def test_archive_roundtrip(tiles_ds, tmp_path):
    path = str(tmp_path / "out.tmra")
    n = sinks.write_archive(tiles_ds, path)
    assert n == tiles_ds.count()
    df = tiles_ds.to_pandas()
    # random access returns exact bytes for a sample of tiles
    for _, r in df.sample(10, random_state=0).iterrows():
        blob = sinks.read_archive_tile(path, int(r["tile_id"]))
        assert blob == bytes(r["tile_gz"])
    assert sinks.read_archive_tile(path, 123456789) is None
    # dedup: archive smaller than naive sum when identical tiles exist
    assert os.path.getsize(path) <= df["tile_gz"].map(len).sum() + 1_000_000


def test_tile_tree(tiles_ds, tmp_path):
    out = str(tmp_path / "tree")
    n = sinks.write_tile_tree(tiles_ds, out)
    assert n == tiles_ds.count()
    df = tiles_ds.to_pandas().iloc[0]
    p = os.path.join(out, str(df["zoom"]), str(df["x"]), f"{df['y']}.pbf")
    assert os.path.exists(p)
    assert open(p, "rb").read() == bytes(df["tile_gz"])


def test_geojson_writer(ray_session, tmp_path):
    import json
    feats = flagship.features_pipeline(pages.pages_dataset(200, parallelism=2))
    path = str(tmp_path / "debug.geojson")
    n = sinks.write_geojson(feats, path, limit=100)
    gj = json.load(open(path))
    assert gj["type"] == "FeatureCollection"
    assert len(gj["features"]) == n > 10
    types = {f["geometry"]["type"] for f in gj["features"]}
    assert "Point" in types


def test_merge_tile_bytes():
    a = mvt.LayerBuilder("old_only")
    a.add_feature(mvt.GEOM_POINT, [np.array([[1, 2]])], {"name": "a"})
    b = mvt.LayerBuilder("both")
    b.add_feature(mvt.GEOM_POINT, [np.array([[3, 4]])], {"name": "old"})
    old_gz = gzip.compress(mvt.build_tile([a, b]), 6, mtime=0)
    c = mvt.LayerBuilder("both")
    c.add_feature(mvt.GEOM_POINT, [np.array([[5, 6]])], {"name": "new"})
    new_gz = gzip.compress(mvt.build_tile([c]), 6, mtime=0)
    merged = mvt.decode_tile(gzip.decompress(
        sinks.merge_tile_bytes(old_gz, new_gz)))
    assert set(merged) == {"old_only", "both"}
    assert merged["both"]["values"] == ["new"]   # new side wins the layer
    assert merged["old_only"]["values"] == ["a"]


def test_merge_tilesets(tiles_ds, ray_session):
    df = tiles_ds.to_pandas()
    # old tileset = half the tiles with a sentinel layer
    old_rows = df.iloc[: len(df) // 2].copy()
    sent = mvt.LayerBuilder("sentinel")
    sent.add_feature(mvt.GEOM_POINT, [np.array([[0, 0]])], {"name": "s"})
    sentinel_gz = gzip.compress(mvt.build_tile([sent]), 6, mtime=0)
    old_rows["tile_gz"] = [sentinel_gz] * len(old_rows)
    import pyarrow as pa
    old = pa.Table.from_pandas(
        old_rows[["zoom", "x", "y", "tile_id", "tile_gz"]],
        preserve_index=False)
    merged = sinks.merge_tilesets(tiles_ds, old).to_pandas()
    assert len(merged) == len(df)  # same tile universe (old ⊂ new here)
    m = merged.set_index("tile_id")
    for tid in old_rows["tile_id"].iloc[:5]:
        dec = mvt.decode_tile(gzip.decompress(m.loc[tid, "tile_gz"]))
        assert "sentinel" in dec  # old-only layer preserved
        assert len(dec) > 1      # plus the new layers


def test_geojsonl_distributed_writer(ray_session, tmp_path):
    """Distributed GeoJSONL export round-trips through the GeoJSONL
    reader (K4 upgraded from the driver-side debug writer)."""
    import glob

    from tilemaker_ray.sources import geojson, pages as _pages
    from tilemaker_ray.pipelines import flagship
    ds = flagship.features_pipeline(_pages.pages_dataset(400, parallelism=2))
    out = str(tmp_path / "gjl")
    n = sinks.write_geojsonl(ds, out)
    assert n == ds.count() and n > 0
    parts = glob.glob(out + "/part-*.geojsonl")
    assert parts
    back = geojson.read_geojsonl(out)
    assert back.count() == n
    # property round-trip: class/minzoom survive the export
    bt = back.to_pandas()
    ot = ds.to_pandas()
    assert sorted(bt["name"]) == sorted(ot["name"])
    assert set(bt["minzoom"]) == set(ot["minzoom"].astype(bt["minzoom"].dtype))
    # re-export into the same dir: no stale-part accumulation
    n2 = sinks.write_geojsonl(ds, out)
    assert n2 == n and geojson.read_geojsonl(out).count() == n
