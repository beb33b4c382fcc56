"""Low-zoom pyramid (z0-5) + polygon-layer tiling."""

import gzip

import numpy as np
import pytest

from tilemaker_ray.config import DEFAULT_CONFIG
from tilemaker_ray.geo import tilemath as tm, wkb as gwkb, raster
from tilemaker_ray.pipelines import flagship
from tilemaker_ray.sources import pages, polygons
from tilemaker_ray.stages import mvt


@pytest.fixture(scope="module")
def tiles_df(ray_session):
    ds = flagship.tiles_pipeline(pages.pages_dataset(600, parallelism=4),
                                 include_layer_tiles=True)
    return ds.to_pandas()


def test_lowzoom_tiles_exist(tiles_df):
    zooms = set(tiles_df["zoom"].unique())
    assert {2, 3, 4, 5}.issubset(zooms)
    # z0/z1 appear iff a layer's minzoom allows (admin minzoom=2 → no z0/z1)
    assert 0 not in zooms and 1 not in zooms


def test_lowzoom_content_is_layers(tiles_df):
    low = tiles_df[tiles_df["zoom"] <= 5]
    layer_names = set()
    for _, r in low.iterrows():
        dec = mvt.decode_tile(gzip.decompress(r["tile_gz"]))
        layer_names.update(dec.keys())
    assert layer_names.issubset({"admin", "landuse"})
    assert "admin" in layer_names


def test_admin_tile_assignment_oracle(tiles_df):
    """z4 admin tiles == brute-force rasterization of every diamond."""
    expect = set()
    admin = polygons.admin_polygons()
    for buf in admin["geom_wkb"].to_pylist():
        rings, _ = gwkb.wkb_rings(buf)
        rt = [np.stack([tm.lon2tilex_f(r[:, 0], 4),
                        tm.lat2tiley_f(r[:, 1], 4)], axis=1) for r in rings]
        for x, y in raster.polygon_tiles(rt, 4):
            expect.add((int(x), int(y)))
    got = set()
    z4 = tiles_df[tiles_df["zoom"] == 4]
    for _, r in z4.iterrows():
        dec = mvt.decode_tile(gzip.decompress(r["tile_gz"]))
        if "admin" in dec:
            got.add((int(r["x"]), int(r["y"])))
    assert got == expect


def test_layer_attrs_in_tiles(tiles_df):
    low = tiles_df[tiles_df["zoom"] == 5]
    found_class = False
    for _, r in low.iterrows():
        dec = mvt.decode_tile(gzip.decompress(r["tile_gz"]))
        for lname in ("admin", "landuse"):
            if lname in dec and "class" in dec[lname]["keys"]:
                found_class = True
    assert found_class


def test_high_zoom_still_has_pages(tiles_df):
    z14 = tiles_df[tiles_df["zoom"] == 14]
    layer_names = set()
    for _, r in z14.iterrows():
        dec = mvt.decode_tile(gzip.decompress(r["tile_gz"]))
        layer_names.update(dec.keys())
        if "place" in layer_names:
            break
    assert "place" in layer_names
