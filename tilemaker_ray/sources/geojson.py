"""GeoJSON / GeoJSONL source (S4 analog).

The reference reads FeatureCollections or newline-delimited GeoJSON
with parallel chunking by newline offsets
(/root/reference/src/geojson_processor.cpp:17-77). Ray-native:
``read_text`` splits JSONL by lines for free; a small FeatureCollection
is parsed driver-side. Output is the engine's polygon-layer table
(layer, name, class, minzoom, geom_wkb) or, for point features, rows
ready for the feature pipeline.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..geo import wkb as _wkb

LAYER_SCHEMA = pa.schema([
    ("layer", pa.string()), ("name", pa.string()), ("class", pa.string()),
    ("minzoom", pa.int8()), ("geom_wkb", pa.binary()),
])


def _geom_to_wkb(geom: dict) -> bytes | None:
    t = geom.get("type")
    c = geom.get("coordinates")
    if t == "Point":
        return _wkb.point_wkb(float(c[0]), float(c[1]))
    if t == "LineString":
        return _wkb.linestring_wkb(np.asarray(c, dtype=np.float64))
    if t == "Polygon":
        rings = [np.asarray(r, dtype=np.float64) for r in c]
        return _wkb.polygon_wkb(rings[0], rings[1:])
    if t == "MultiPolygon":
        polys = [( np.asarray(p[0], dtype=np.float64),
                  [np.asarray(r, dtype=np.float64) for r in p[1:]])
                 for p in c]
        return _wkb.multipolygon_wkb(polys)
    if t == "MultiLineString":
        return _wkb.multilinestring_wkb(
            [np.asarray(l, dtype=np.float64) for l in c])
    return None


def feature_to_row(feat: dict, default_layer: str = "geojson") -> dict | None:
    geom = feat.get("geometry") or {}
    buf = _geom_to_wkb(geom)
    if buf is None:
        return None
    props = feat.get("properties") or {}
    return {"layer": str(props.get("layer", default_layer)),
            "name": str(props.get("name", "")),
            "class": str(props.get("class", "")),
            "minzoom": int(props.get("minzoom", 0)),
            "geom_wkb": buf}


def read_geojson(path: str, default_layer: str = "geojson") -> pa.Table:
    """FeatureCollection file → layer table (driver-side; collections
    are small-side inputs, like the reference's shapefiles)."""
    with open(path) as f:
        doc = json.load(f)
    feats = doc.get("features", []) if doc.get("type") == "FeatureCollection" \
        else [doc]
    rows = [r for r in (feature_to_row(f, default_layer) for f in feats)
            if r is not None]
    return _rows_to_table(rows)


def read_geojsonl(path: str, default_layer: str = "geojson"):
    """Newline-delimited GeoJSON → distributed layer Dataset
    (read_text = the parallel newline chunking the reference hand-rolls,
    include/helpers.h:44-45)."""
    import ray.data as rd

    def parse(batch: dict) -> pa.Table:
        rows = []
        for line in batch["text"]:
            line = line.strip()
            if not line:
                continue
            r = feature_to_row(json.loads(line), default_layer)
            if r is not None:
                rows.append(r)
        return _rows_to_table(rows)

    return rd.read_text(path).map_batches(parse, batch_format="numpy")


def _rows_to_table(rows: list) -> pa.Table:
    cols = {f.name: [r[f.name] for r in rows] for f in LAYER_SCHEMA}
    return pa.table({k: pa.array(v, LAYER_SCHEMA.field(k).type)
                     for k, v in cols.items()}, schema=LAYER_SCHEMA)
