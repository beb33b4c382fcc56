"""Shapefile source: .shp/.dbf round-trip, ring→polygon assembly per
the reference's sequential rule, attribute remap, and PIP-join parity
with the same polygons loaded from GeoJSON."""

import json

import numpy as np
import pyarrow as pa

from tilemaker_ray.geo import wkb as _wkb
from tilemaker_ray.sources import geojson, shapefile as shp


def square(cx, cy, r, cw=True):
    """Closed square ring. cw=True → ESRI exterior orientation."""
    pts = np.array([[cx - r, cy - r], [cx - r, cy + r], [cx + r, cy + r],
                    [cx + r, cy - r], [cx - r, cy - r]], dtype=np.float64)
    return pts if cw else pts[::-1]


def test_shp_point_roundtrip(tmp_path):
    base = str(tmp_path / "pts")
    shp.write_shapefile(base, [(shp.SHP_POINT, [np.array([[13.4, 52.5]])]),
                               (shp.SHP_POINT, [np.array([[-1.0, 51.0]])])],
                        fields={"NAME": ["berlin", "oxford"]})
    t = shp.read_shapefile(base, "poi", index_name="NAME")
    assert t.num_rows == 2
    assert t["name"].to_pylist() == ["berlin", "oxford"]
    gt, payload = _wkb.parse_wkb(t["geom_wkb"][0].as_py())
    assert gt == _wkb.POINT and tuple(payload) == (13.4, 52.5)


def test_polygon_ring_assembly_rule(tmp_path):
    """exterior, hole, exterior, hole, hole → two polygons with 1 and 2
    holes (shp_processor.cpp:225-250 sequential rule)."""
    parts = [square(0, 0, 10, cw=True), square(0, 0, 3, cw=False),
             square(100, 0, 10, cw=True), square(98, 0, 2, cw=False),
             square(103, 0, 2, cw=False)]
    polys = shp.assemble_polygons(parts)
    assert len(polys) == 2
    assert len(polys[0][1]) == 1 and len(polys[1][1]) == 2
    # round-trip through files
    base = str(tmp_path / "poly")
    shp.write_shapefile(base, [(shp.SHP_POLYGON, parts)],
                        fields={"NAME": ["two"], "CLASS": ["landuse"]})
    t = shp.read_shapefile(base, "lu", index_name="NAME",
                           columns=["CLASS"], attr_remap={"CLASS": "kind"})
    assert t.num_rows == 2           # one row per assembled polygon
    assert set(t["name"].to_pylist()) == {"two"}
    assert t["kind"].to_pylist() == ["landuse", "landuse"]
    gt, rings = _wkb.parse_wkb(t["geom_wkb"][0].as_py())
    assert gt == _wkb.POLYGON and len(rings) == 2  # ext + 1 hole


def test_polyline_and_dbf_types(tmp_path):
    base = str(tmp_path / "line")
    parts = [np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]]),
             np.array([[5.0, 5.0], [6.0, 6.0]])]
    shp.write_shapefile(base, [(shp.SHP_POLYLINE, parts)],
                        fields={"NAME": ["road"]})
    t = shp.read_shapefile(base, "roads", index_name="NAME")
    assert t.num_rows == 2           # one row per part
    gt, coords = _wkb.parse_wkb(t["geom_wkb"][0].as_py())
    assert gt == _wkb.LINESTRING and len(coords) == 3


def test_pip_parity_with_geojson(tmp_path):
    """The same polygons loaded from .shp and from GeoJSON produce
    identical PIP tags (the VERDICT round-2 done-criterion)."""
    ext = square(5, 5, 5, cw=True)
    hole = square(5, 5, 1, cw=False)
    far = square(50, 50, 3, cw=True)

    base = str(tmp_path / "adm")
    shp.write_shapefile(base, [(shp.SHP_POLYGON, [ext, hole]),
                               (shp.SHP_POLYGON, [far])],
                        fields={"NAME": ["near", "far"]})
    t_shp = shp.read_shapefile(base, "admin", index_name="NAME", minzoom=2)

    doc = {"type": "FeatureCollection", "features": [
        {"type": "Feature",
         "geometry": {"type": "Polygon",
                      "coordinates": [ext.tolist(), hole.tolist()]},
         "properties": {"layer": "admin", "name": "near", "class": "",
                        "minzoom": 2}},
        {"type": "Feature",
         "geometry": {"type": "Polygon", "coordinates": [far.tolist()]},
         "properties": {"layer": "admin", "name": "far", "class": "",
                        "minzoom": 2}}]}
    p = tmp_path / "adm.geojson"
    p.write_text(json.dumps(doc))
    t_gj = geojson.read_geojson(str(p))

    from tilemaker_ray.stages.join import PIPTagger
    probes = pa.table({
        "lon": pa.array([5.0, 5.2, 9.9, 50.0, 20.0, 4.5]),
        "lat": pa.array([8.0, 5.1, 9.9, 50.0, 20.0, 5.5])})
    out_shp = PIPTagger(t_shp)(probes)["in_layer"].to_pylist()
    out_gj = PIPTagger(t_gj)(probes)["in_layer"].to_pylist()
    assert out_shp == out_gj
    # semantic spot-checks: inside-hole is NOT in layer
    assert out_shp[0] is True      # inside exterior
    assert out_shp[1] is False     # inside the hole
    assert out_shp[3] is True      # inside the far square
    assert out_shp[4] is False     # nowhere


def test_dbf_deleted_record_keeps_alignment(tmp_path):
    """Review finding: a deleted dbf record must keep dbf row indexes
    aligned 1:1 with shp record numbers."""
    base = str(tmp_path / "del")
    shp.write_shapefile(base, [(shp.SHP_POINT, [np.array([[1.0, 1.0]])]),
                               (shp.SHP_POINT, [np.array([[2.0, 2.0]])]),
                               (shp.SHP_POINT, [np.array([[3.0, 3.0]])])],
                        fields={"NAME": ["a", "b", "c"]})
    # flag record 1 (b) deleted in the dbf
    import struct
    with open(base + ".dbf", "r+b") as f:
        buf = bytearray(f.read())
        hdr_size, rec_size = struct.unpack("<hh", bytes(buf[8:12]))
        buf[hdr_size + rec_size] = ord("*")
        f.seek(0)
        f.write(bytes(buf))
    t = shp.read_shapefile(base, "poi", index_name="NAME")
    assert t.num_rows == 3
    assert t["name"].to_pylist() == ["a", "", "c"]


def test_attribute_function_hook(tmp_path):
    """The reference's attribute_function remap UDF
    (osm_lua_processing.cpp:355-370): user callable rewrites each
    feature's attributes on load."""
    base = str(tmp_path / "af")
    shp.write_shapefile(base, [(shp.SHP_POINT, [np.array([[1.0, 2.0]])])],
                        fields={"NAME": ["park"], "TYPE": ["leisure"]})

    def attribute_function(attrs, layer):
        attrs["class"] = attrs.pop("TYPE", "")
        attrs["minzoom"] = 7
        attrs["source_layer"] = layer
        return attrs

    t = shp.read_shapefile(base, "poi", index_name="NAME",
                           columns=["TYPE"],
                           attribute_function=attribute_function)
    assert t["class"].to_pylist() == ["leisure"]
    assert t["minzoom"].to_pylist() == [7]
    assert t["source_layer"].to_pylist() == ["poi"]
    assert "TYPE" not in t.column_names
    assert t["name"].to_pylist() == ["park"]


def test_attribute_function_edge_cases(tmp_path):
    """Review findings: empty layer keeps the standard schema; a hook
    that mutates in place and returns None still applies."""
    base = str(tmp_path / "empty")
    shp.write_shapefile(base, [], fields={})
    t = shp.read_shapefile(base, "poi",
                           attribute_function=lambda a, l: a)
    assert t.num_rows == 0
    assert set(["layer", "name", "class", "minzoom", "geom_wkb"]) \
        <= set(t.column_names)

    base2 = str(tmp_path / "mut")
    shp.write_shapefile(base2, [(shp.SHP_POINT, [np.array([[1.0, 2.0]])])],
                        fields={"TYPE": ["x"]})

    def mutating(attrs, layer):
        attrs["class"] = attrs.pop("TYPE", "")
        # returns None on purpose

    t2 = shp.read_shapefile(base2, "poi", columns=["TYPE"],
                            attribute_function=mutating)
    assert t2["class"].to_pylist() == ["x"]
    assert "TYPE" not in t2.column_names
