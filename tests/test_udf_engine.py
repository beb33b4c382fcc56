"""UDF surface (the Lua-API analog) + engine runner + CLI config."""

import gzip
import json
import os

import numpy as np
import pyarrow as pa
import pytest

from tilemaker_ray.pipelines import engine
from tilemaker_ray.sources import pages, polygons
from tilemaker_ray.stages import mvt
from tilemaker_ray.udf import PageContext, UDFExtractor


# the UDF must live in an importable package module — Ray workers
# can't import pytest test modules (they're loaded off sys.path)
from tilemaker_ray.functions.examples import poi_function


def sample_pages(n=300):
    return pages.page_batch({"id": np.arange(n, dtype=np.uint64)})


def test_udf_extractor_emissions():
    ex = UDFExtractor(poi_function, polygons.admin_polygons())
    out = ex(sample_pages(400))
    assert out.num_rows > 100
    layers = set(out["layer"].to_pylist())
    assert {"poi", "route", "building_center"}.issubset(layers)
    # Attribute() landed in attrs_json
    poi = out.filter(pa.compute.equal(out["layer"], "poi"))
    a0 = json.loads(poi["attrs_json"][0].as_py())
    assert "name" in a0 and "lang" in a0
    # admin tag present for points inside their diamond (most)
    with_admin = sum("admin" in json.loads(a) for a in poi["attrs_json"].to_pylist())
    assert with_admin / poi.num_rows > 0.9
    # centroids are points (kind 1) with positive area attribute
    bc = out.filter(pa.compute.equal(out["layer"], "building_center"))
    assert set(bc["kind"].to_pylist()) == {1}
    assert all(json.loads(a)["area_m2"] > 0 for a in bc["attrs_json"].to_pylist())


def test_pagecontext_tagmap_api():
    t = sample_pages(50)
    ctx = PageContext({}, {"k": "v"})
    i = next(i for i, h in enumerate(t["html"].to_pylist())
             if b"geo.position" in h)
    ctx._reset(t["url"][i].as_py(), t["lang"][i].as_py(),
               t["html"][i].as_py(), t["text"][i].as_py())
    assert ctx.Holds("geo.position")
    assert "geo.position" in ctx.AllKeys()
    assert ctx.Find("geo.position") == ctx.AllTags()["geo.position"]
    assert ctx.GetData("k") == "v"
    assert ctx.Id().startswith("https://")
    lat, lon = ctx.FirstPosition()
    assert -90 < lat < 90 and -180 <= lon <= 180


def test_udf_attrs_reach_tiles(ray_session, tmp_path):
    """Attribute() values must survive the tile shuffle into MVT tags."""
    import ray
    import ray.data as rd
    from tilemaker_ray.config import DEFAULT_CONFIG
    from tilemaker_ray.stages.encode import make_cell_encoder
    from tilemaker_ray.stages.fanout import make_fanout
    from tilemaker_ray.stages.tile_encode import encode_shard
    import functools
    poly_ref = ray.put(polygons.admin_polygons())
    ds = pages.pages_dataset(300, parallelism=2)
    feats = ds.map_batches(UDFExtractor, batch_format="pyarrow",
                           batch_size=1024,
                           fn_constructor_args=(poi_function, poly_ref),
                           concurrency=(1, 2))
    feats = feats.map_batches(make_cell_encoder(DEFAULT_CONFIG),
                              batch_format="pyarrow")
    fan = feats.map_batches(make_fanout(DEFAULT_CONFIG), batch_format="pyarrow")
    tiles = fan.groupby("shard_scram").map_groups(
        functools.partial(encode_shard, cfg=DEFAULT_CONFIG),
        batch_format="pyarrow").to_pandas()
    assert len(tiles) > 10
    found_attr = False
    for _, r in tiles.iterrows():
        dec = mvt.decode_tile(gzip.decompress(r["tile_gz"]))
        if "poi" in dec and "lang" in dec["poi"]["keys"]:
            found_attr = True
            break
    assert found_attr


def test_engine_run_and_config(ray_session, tmp_path):
    cfg_path = str(tmp_path / "cfg.json")
    json.dump({"basezoom": 12, "layers": {
        "place": {"minzoom": 6, "feature_limit": 64,
                  "feature_limit_below": 12, "combine_points": True},
        "track": {"minzoom": 8},
        "footprint": {"minzoom": 9}}}, open(cfg_path, "w"))
    cfg = engine.config_from_json(cfg_path)
    assert cfg.basezoom == 12
    assert cfg.layer("place").feature_limit == 64

    pages_path = pages.ensure_pages_parquet(1000,
                                            cache_root=str(tmp_path / "c"))
    out = str(tmp_path / "run.mbtiles")
    summary = engine.run(pages_path, out, config=cfg)
    assert summary["tiles"] > 50 and os.path.exists(out)
    # zoom range respects the config
    import sqlite3
    con = sqlite3.connect(out)
    zmax = con.execute("select max(zoom_level) from tiles").fetchone()[0]
    assert zmax == 12
    con.close()
    # merge run on top of the same file
    summary2 = engine.run(pages_path, out, config=cfg, merge=True)
    assert summary2["tiles"] == summary["tiles"]


def test_relation_iterator_udf_api(ray_session):
    """Accept/NextRelation/RestartRelations/FindInRelation/SetTag/
    ModifyId on the UDF surface (reference
    osm_lua_processing.cpp:1044-1108), end-to-end through
    UDFExtractor."""
    import json

    import ray
    from tilemaker_ray.stages.relations import (postscan_relations_udf,
                                                scan_relations_udf)
    from tilemaker_ray.udf import UDFExtractor

    rel = pa.table({
        "rel_id": pa.array([100, 1, 2, 99], pa.int64()),
        "parent_id": pa.array([None, 100, 100, None], pa.int64()),
        "region_name": pa.array(["EMEA", None, None, "REJECTED"],
                                pa.string()),
    })

    def scan(ctx):
        if ctx.Find("region_name") != "REJECTED":
            ctx.Accept()

    rels = scan_relations_udf(rel, scan)
    assert 99 not in rels and set(rels) == {100, 1, 2}

    def postscan(ctx):
        if not ctx.Find("region_name"):
            while ctx.NextRelation() is not None:
                v = ctx.FindInRelation("region_name")
                if v:
                    ctx.SetTag("region_name", v)
                    break

    rels = postscan_relations_udf(rels, postscan)
    assert rels[1]["tags"]["region_name"] == "EMEA"
    assert rels[2]["tags"]["region_name"] == "EMEA"

    memberships = {"page://a": [(1, "member"), (2, "other")],
                   "page://b": []}

    def page_function(page):
        page.RestartRelations()
        roles = []
        while (nxt := page.NextRelation()) is not None:
            roles.append(nxt[1])
        assert roles in ([], ["member", "other"])
        page.RestartRelations()
        if page.NextRelation() is None:
            return
        page.ModifyId("custom-id-42")
        page.SetTag("injected", "yes")
        page.Layer("poi", point=(1.0, 2.0))
        page.Attribute("region", page.FindInRelation("region_name"))
        page.Attribute("tag", page.Find("injected"))

    ex = UDFExtractor(page_function, relations=rels,
                      memberships=memberships)
    batch = pa.table({
        "url": pa.array(["page://a", "page://b"], pa.string()),
        "lang": pa.array(["", ""], pa.string()),
        "html": pa.array([b"", b""], pa.binary()),
        "text": pa.array(["", ""], pa.string()),
    })
    out = ex(batch)
    assert out.num_rows == 1
    assert out["url"].to_pylist() == ["custom-id-42"]  # ModifyId applied
    attrs = json.loads(out["attrs_json"][0].as_py())
    assert attrs == {"region": "EMEA", "tag": "yes"}


def test_geometry_udf_parity_methods():
    """IsClosed / IsMultiPolygon / AreaIntersecting / Centroid on the
    UDF surface (reference osm_lua_processing.cpp:441-513)."""
    import numpy as np
    import pytest

    from tilemaker_ray.udf import UDFExtractor

    poly_layer = pa.table({
        "layer": pa.array(["admin"], pa.string()),
        "name": pa.array(["zone"], pa.string()),
        "class": pa.array([""], pa.string()),
        "minzoom": pa.array([0], pa.int8()),
        "geom_wkb": pa.array([__import__(
            "tilemaker_ray.geo.wkb", fromlist=["polygon_wkb"]).polygon_wkb(
            np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0],
                      [0.0, 0.0]]))], pa.binary()),
    })
    seen = {}

    def page_function(page):
        seen["closed"] = page.IsClosed()
        seen["multi"] = page.IsMultiPolygon()
        seen["centroid"] = page.Centroid(algorithm="centroid")
        seen["area"] = page.Area()
        seen["inter"] = page.AreaIntersecting("admin")

    ex = UDFExtractor(page_function, polygon_layers=poly_layer)
    # footprint square [0.2,0.6]^2: half of it (lon<... no: fully inside)
    html = b'<meta name="geo.footprint" content="0.2,0.2 0.2,0.6 0.6,0.6 0.6,0.2">'
    batch = pa.table({"url": pa.array(["u://x"], pa.string()),
                      "lang": pa.array([""], pa.string()),
                      "html": pa.array([html], pa.binary()),
                      "text": pa.array([""], pa.string())})
    ex(batch)
    assert seen["closed"] is True and seen["multi"] is False
    lat, lon = seen["centroid"]
    assert lat == pytest.approx(0.4) and lon == pytest.approx(0.4)
    # footprint fully inside the layer polygon → intersecting == Area
    assert seen["inter"] == pytest.approx(seen["area"], rel=1e-9)
    assert seen["area"] > 0

    # half-overlapping footprint: [0.8,1.2]x[0.2,0.6] → fraction 0.5
    html2 = b'<meta name="geo.footprint" content="0.2,0.8 0.2,1.2 0.6,1.2 0.6,0.8">'
    batch2 = pa.table({"url": pa.array(["u://y"], pa.string()),
                       "lang": pa.array([""], pa.string()),
                       "html": pa.array([html2], pa.binary()),
                       "text": pa.array([""], pa.string())})
    ex(batch2)
    assert seen["inter"] == pytest.approx(0.5 * seen["area"], rel=1e-6)

    # open track: not closed
    html3 = b'<meta name="geo.track" content="0,0 1,1 2,2">'
    batch3 = pa.table({"url": pa.array(["u://z"], pa.string()),
                       "lang": pa.array([""], pa.string()),
                       "html": pa.array([html3], pa.binary()),
                       "text": pa.array([""], pa.string())})
    ex(batch3)
    assert seen["closed"] is False
