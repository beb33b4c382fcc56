"""The four round-5 LayerDef knobs: write_to layer aliasing,
simplify_length (meters-based tolerance), simplify_ratio (per-zoom
tolerance growth), combine_below / combine_lines_below /
combine_polygons_below (zoom-gated combining).

Reference semantics: /root/reference/src/shared_data.cpp:313-325 (JSON
parsing + defaults), src/shared_data.cpp:160-175 (write_to grouping),
src/tile_worker.cpp:477-505 (tolerance ladder + combine gates).
"""

import gzip

import numpy as np
import pandas as pd
import pytest

from tilemaker_ray.config import (EngineConfig, LayerDef, combine_lines_at,
                                  combine_polygons_at, resolve_write_to,
                                  simplify_tolerance)
from tilemaker_ray.geo import tilemath as tm, wkb
from tilemaker_ray.stages import mvt
from tilemaker_ray.stages.tile_encode import encode_subtree

BASE = (13.4000, 52.5000)  # Berlin-ish


def _rows(layer, geoms, kind, names=None, fuid0=0):
    """Feature rows anchored in the z14 tile containing BASE."""
    rows = []
    for i, coords in enumerate(geoms):
        coords = np.asarray(coords, dtype=np.float64)
        lon, lat = float(coords[0, 0]), float(coords[0, 1])
        x = tm.lon2tilex(np.array([lon]), 14)
        y = tm.lat2tiley(np.array([lat]), 14)
        if kind == 1:
            g = wkb.point_wkb(lon, lat)
        elif kind == 2:
            g = wkb.linestring_wkb(coords)
        else:
            g = wkb.polygon_wkb(coords)
        rows.append({"fuid": fuid0 + i, "kind": kind, "layer": layer,
                     "name": (names[i] if names else "n"), "minzoom": 0,
                     "z_order": 5, "lon": lon, "lat": lat, "geom_wkb": g,
                     "attrs_json": "",
                     "base_tiles": tm.tile_id(14, x, y).tolist()})
    return pd.DataFrame(rows)


def _decode(tiles_df):
    return mvt.decode_tile(gzip.decompress(tiles_df.iloc[0]["tile_gz"]))


# ---------------------------------------------------------------- write_to

def test_write_to_merges_into_target_layer():
    cfg = EngineConfig(layers=(
        LayerDef("place"),
        LayerDef("poi", write_to="place"),
    ))
    pts_a = [[[BASE[0], BASE[1]]]]
    pts_b = [[[BASE[0] + 0.0003, BASE[1] + 0.0003]]]
    df = pd.concat([_rows("place", pts_a, 1),
                    _rows("poi", pts_b, 1, fuid0=100)])
    tiles = encode_subtree(df, cfg, zmin=14, zmax=14).to_pandas()
    assert len(tiles) == 1
    dec = _decode(tiles)
    # ONE output layer named after the target, holding both features
    assert set(dec.keys()) == {"place"}
    assert len(dec["place"]["features"]) == 2


def test_write_to_source_knobs_still_apply():
    # the redirected layer keeps its own zoom gate: poi minzoom=14 means
    # at z13 only the target layer's own feature is present
    cfg = EngineConfig(layers=(
        LayerDef("place"),
        LayerDef("poi", minzoom=14, write_to="place"),
    ))
    df = pd.concat([_rows("place", [[[BASE[0], BASE[1]]]], 1),
                    _rows("poi", [[[BASE[0] + 0.0003, BASE[1]]]], 1,
                          fuid0=100)])
    tiles = encode_subtree(df, cfg, zmin=13, zmax=14).to_pandas()
    by_zoom = {int(r["zoom"]): r for _, r in tiles.iterrows()}
    dec13 = mvt.decode_tile(gzip.decompress(by_zoom[13]["tile_gz"]))
    dec14 = mvt.decode_tile(gzip.decompress(by_zoom[14]["tile_gz"]))
    assert len(dec13["place"]["features"]) == 1
    assert len(dec14["place"]["features"]) == 2


def test_write_to_missing_target_errors():
    ldefs = {"poi": LayerDef("poi", write_to="nope")}
    with pytest.raises(ValueError, match="doesn't exist"):
        resolve_write_to(ldefs)


def test_write_to_chained_errors():
    ldefs = {"a": LayerDef("a"),
             "b": LayerDef("b", write_to="a"),
             "c": LayerDef("c", write_to="b")}
    with pytest.raises(ValueError, match="chained"):
        resolve_write_to(ldefs)


# ------------------------------------------------- simplify_length / ratio

def test_simplify_tolerance_defaults_match_simplify_level():
    ld = LayerDef("track", simplify_below=14, simplify_level=1.5)
    # default ratio=2 -> constant tile-unit tolerance at every zoom
    for z in (6, 10, 13):
        assert simplify_tolerance(ld, z, y=2000, extent=4096) == 1.5
    # at/above simplify_below: no simplification
    assert simplify_tolerance(ld, 14, y=2000, extent=4096) == 0.0


def test_simplify_length_meters_conversion():
    ld = LayerDef("track", simplify_below=14, simplify_length=50.0)
    z, y, extent = 13, 2753, 4096
    latp = 180.0 - (y + 0.5) * 360.0 / (1 << z)
    expect = (float(tm.meter2degp(50.0, latp)) * (1 << 13) * extent / 360.0)
    got = simplify_tolerance(ld, z, y, extent)
    assert got == pytest.approx(expect, rel=1e-12)
    # rows nearer the pole get a larger degp (same meters) -> larger tol
    assert simplify_tolerance(ld, z, 1000, extent) > got


def test_simplify_ratio_scales_per_zoom():
    ld = LayerDef("track", simplify_below=14, simplify_level=1.0,
                  simplify_ratio=4.0)
    # tile-unit factor (ratio/2)^((below-1)-z): z=13 -> 1, z=12 -> 2, z=11 -> 4
    assert simplify_tolerance(ld, 13, 0, 4096) == pytest.approx(1.0)
    assert simplify_tolerance(ld, 12, 0, 4096) == pytest.approx(2.0)
    assert simplify_tolerance(ld, 11, 0, 4096) == pytest.approx(4.0)


def test_simplify_length_encodes_like_equivalent_level():
    """Encoding with simplify_length must equal encoding with the
    hand-converted simplify_level at the same tile row (byte-identical
    MVT)."""
    z = 13
    # a wiggly line inside one z13 tile
    t = np.linspace(0, 1, 40)
    coords = np.stack([BASE[0] + t * 0.004,
                       BASE[1] + 0.0002 * np.sin(t * 40)], axis=1)
    df = _rows("track", [coords], 2)
    y = int(tm.lat2tiley(np.array([BASE[1]]), z)[0])
    ld_len = LayerDef("track", simplify_below=14, simplify_length=30.0)
    tol = simplify_tolerance(ld_len, z, y, 4096)
    assert tol > 0
    ld_lvl = LayerDef("track", simplify_below=14, simplify_level=tol)
    t1 = encode_subtree(df, EngineConfig(layers=(ld_len,)),
                        zmin=z, zmax=z).to_pandas()
    t2 = encode_subtree(df, EngineConfig(layers=(ld_lvl,)),
                        zmin=z, zmax=z).to_pandas()
    assert len(t1) == 1 and len(t2) == 1
    assert t1.iloc[0]["tile_hash"] == t2.iloc[0]["tile_hash"]
    # and simplification actually did something vs no-simplify
    t0 = encode_subtree(df, EngineConfig(layers=(
        LayerDef("track"),)), zmin=z, zmax=z).to_pandas()
    assert t0.iloc[0]["tile_hash"] != t1.iloc[0]["tile_hash"]


# ------------------------------------------------- zoom-gated combining

def test_combine_gates():
    cfg = EngineConfig(combine_below=12)
    inherit = LayerDef("a")                      # inherits global 12
    explicit = LayerDef("b", combine_lines_below=14)
    always = LayerDef("c", combine_lines=True)
    assert combine_lines_at(inherit, 11, cfg) is True
    assert combine_lines_at(inherit, 12, cfg) is False
    assert combine_lines_at(explicit, 13, cfg) is True
    assert combine_lines_at(explicit, 14, cfg) is False
    assert combine_lines_at(always, 14, cfg) is True
    poly = LayerDef("d", combine_polygons_below=13)
    assert combine_polygons_at(poly, 12, cfg) is True
    # combine_polygons_below does NOT inherit the global line default
    assert combine_polygons_at(inherit, 11, cfg) is False


def test_combine_lines_below_gates_encoding():
    """Two chained segments: one feature at z13 (below gate), two at z14."""
    l1 = [[BASE[0], BASE[1]], [BASE[0] + 0.0004, BASE[1]]]
    l2 = [[BASE[0] + 0.0004, BASE[1]],
          [BASE[0] + 0.0004, BASE[1] + 0.0004]]
    df = _rows("track", [l1, l2], 2)
    cfg = EngineConfig(layers=(LayerDef("track", combine_lines_below=14),))
    tiles = encode_subtree(df, cfg, zmin=13, zmax=14).to_pandas()
    by_zoom = {int(r["zoom"]): r for _, r in tiles.iterrows()}
    dec13 = mvt.decode_tile(gzip.decompress(by_zoom[13]["tile_gz"]))
    dec14 = mvt.decode_tile(gzip.decompress(by_zoom[14]["tile_gz"]))
    assert len(dec13["track"]["features"]) == 1
    assert len(dec14["track"]["features"]) == 2


def test_combine_polygons_below_gates_union():
    """Two adjacent squares (shared border) union below the gate only."""
    d = 0.0004
    sq1 = np.array([[BASE[0], BASE[1]], [BASE[0] + d, BASE[1]],
                    [BASE[0] + d, BASE[1] + d], [BASE[0], BASE[1] + d],
                    [BASE[0], BASE[1]]])
    sq2 = sq1 + [d, 0.0]
    df = _rows("footprint", [sq1, sq2], 3)
    cfg = EngineConfig(layers=(
        LayerDef("footprint", combine_polygons_below=14),))
    tiles = encode_subtree(df, cfg, zmin=13, zmax=14).to_pandas()
    by_zoom = {int(r["zoom"]): r for _, r in tiles.iterrows()}
    dec13 = mvt.decode_tile(gzip.decompress(by_zoom[13]["tile_gz"]))
    dec14 = mvt.decode_tile(gzip.decompress(by_zoom[14]["tile_gz"]))
    # z13: combined into one feature; z14: two separate features
    assert len(dec13["footprint"]["features"]) == 1
    assert len(dec14["footprint"]["features"]) == 2


def test_json_config_roundtrips_new_knobs():
    from tilemaker_ray.pipelines.engine import config_from_json
    cfg = config_from_json({
        "combine_below": 12,
        "layers": {
            "place": {"minzoom": 6},
            "poi": {"write_to": "place", "simplify_below": 13,
                    "simplify_length": 25.0, "simplify_ratio": 1.5,
                    "combine_lines_below": 11},
        }})
    poi = cfg.layer("poi")
    assert poi.write_to == "place"
    assert poi.simplify_length == 25.0
    assert poi.simplify_ratio == 1.5
    assert poi.combine_lines_below == 11
    assert cfg.combine_below == 12
