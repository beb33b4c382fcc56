"""Deterministic synthetic polygon layers (admin / landuse).

The analog of tilemaker's external shapefile/GeoJSON layers
(/root/reference/src/shp_processor.cpp:109-278 reads .shp polygons into
the in-RAM ShpMemTiles index; resources/config-openmaptiles.json wires
ocean/urban_areas layers). Small-side tables: built once on the driver,
broadcast via ``ray.put`` into the join actors — never shuffled.

Layers (FIXTURES.md §2 shapes):
- ``admin``: one diamond (|dx|/w + |dy|/h ≤ 1) per city — convex but
  non-rectangular, so the PIP ray-cast is genuinely exercised while an
  ANSI-SQL oracle can still express membership exactly with abs().
- ``landuse``: jittered concave rings + one ring-with-hole + one very
  large irregular polygon (the bitmap-false-positive case,
  /root/reference/src/shp_mem_tiles.cpp:93-121) + overlapping pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import wkb as _wkb
from .pages import CITIES, _splitmix64

# diamond half-widths: irrational-ish so fixture points never sit
# exactly on a boundary (FIXTURES.md §5 boundary-avoidance posture)
ADMIN_W = 0.73
ADMIN_H = 0.53


def diamond_ring(cx: float, cy: float, w: float, h: float) -> np.ndarray:
    return np.array([[cx - w, cy], [cx, cy - h], [cx + w, cy],
                     [cx, cy + h], [cx - w, cy]])


def admin_polygons() -> pa.Table:
    """One diamond per city, name = 'admin_<city>'."""
    rows = {"layer": [], "name": [], "class": [], "minzoom": [], "geom_wkb": []}
    for name, lon, lat in CITIES:
        rows["layer"].append("admin")
        rows["name"].append(f"admin_{name}")
        rows["class"].append("boundary")
        rows["minzoom"].append(2)
        rows["geom_wkb"].append(_wkb.polygon_wkb(diamond_ring(lon, lat, ADMIN_W, ADMIN_H)))
    return pa.table({
        "layer": pa.array(rows["layer"], pa.string()),
        "name": pa.array(rows["name"], pa.string()),
        "class": pa.array(rows["class"], pa.string()),
        "minzoom": pa.array(rows["minzoom"], pa.int8()),
        "geom_wkb": pa.array(rows["geom_wkb"], pa.binary()),
    })


_LANDUSE_CLASSES = ["residential", "forest", "water", "industrial"]


def landuse_polygons() -> pa.Table:
    """Concave/holed/overlapping polygons near the first 24 cities."""
    rows = {"layer": [], "name": [], "class": [], "minzoom": [], "geom_wkb": []}

    def add(name, cls, geom, minzoom=5):
        rows["layer"].append("landuse")
        rows["name"].append(name)
        rows["class"].append(cls)
        rows["minzoom"].append(minzoom)
        rows["geom_wkb"].append(geom)

    for i, (name, lon, lat) in enumerate(CITIES[:24]):
        h = _splitmix64(np.uint64(i * 7919 + 1))
        r = 0.08 + float(h % np.uint64(1000)) / 20000.0
        # concave star ring (8 vertices, alternating radius)
        ang = np.linspace(0, 2 * np.pi, 9)[:-1] + 0.1
        rad = np.where(np.arange(8) % 2 == 0, r, 0.45 * r)
        ring = np.stack([lon + rad * np.cos(ang), lat + rad * np.sin(ang)], axis=1)
        ring = np.vstack([ring, ring[:1]])
        add(f"lu_{name}_star", _LANDUSE_CLASSES[i % 4], _wkb.polygon_wkb(ring))
        if i % 3 == 0:
            # overlapping square pair
            sq = diamond_ring(lon + r, lat, r, r)
            add(f"lu_{name}_ovl", _LANDUSE_CLASSES[(i + 1) % 4], _wkb.polygon_wkb(sq))
        if i % 5 == 0:
            # ring with hole
            ext = diamond_ring(lon - 2 * r, lat, 2 * r, 2 * r)
            hole = diamond_ring(lon - 2 * r, lat, 0.5 * r, 0.5 * r)
            add(f"lu_{name}_hole", "water", _wkb.polygon_wkb(ext, [hole]))
    # one very large irregular polygon spanning many tiles
    big = np.array([[-30.0, 30.0], [40.0, 28.0], [45.0, 60.0], [10.0, 70.0],
                    [-25.0, 62.0], [-30.0, 30.0]])
    add("lu_bigregion", "forest", _wkb.polygon_wkb(big), minzoom=2)
    return pa.table({
        "layer": pa.array(rows["layer"], pa.string()),
        "name": pa.array(rows["name"], pa.string()),
        "class": pa.array(rows["class"], pa.string()),
        "minzoom": pa.array(rows["minzoom"], pa.int8()),
        "geom_wkb": pa.array(rows["geom_wkb"], pa.binary()),
    })


def all_layers() -> pa.Table:
    return pa.concat_tables([admin_polygons(), landuse_polygons()])


def layers_as_features(poly_table: pa.Table | None = None) -> pa.Table:
    """External polygon layers → engine feature rows, so they tile like
    any other feature (the reference indexes shapefile layers into the
    same OutputObject stream, /root/reference/src/shp_processor.cpp:145-174).
    Carries per-feature minzoom (the ``_minzoom`` attribute analog)."""
    import json

    from ..geo import wkb as _gwkb
    from ..stages.extract import FEATURE_SCHEMA, feature_uid
    t = poly_table if poly_table is not None else all_layers()
    rows = {f.name: [] for f in FEATURE_SCHEMA}
    for i in range(t.num_rows):
        name = t["name"][i].as_py()
        buf = t["geom_wkb"][i].as_py()
        gt, payload = _gwkb.parse_wkb(buf)
        first = (payload[0][0] if gt == _gwkb.POLYGON else payload[0][0][0])
        url = f"layer://{t['layer'][i].as_py()}/{name}"
        rows["url"].append(url)
        rows["fuid"].append(feature_uid(url, 0))
        rows["feature_seq"].append(0)
        rows["kind"].append(3)
        rows["layer"].append(t["layer"][i].as_py())
        rows["name"].append(name)
        rows["lang"].append("")
        rows["lon"].append(float(first[0]))
        rows["lat"].append(float(first[1]))
        rows["geom_wkb"].append(buf)
        rows["minzoom"].append(int(t["minzoom"][i].as_py()))
        rows["z_order"].append(0)
        rows["attrs_json"].append(json.dumps(
            {"class": t["class"][i].as_py()}, sort_keys=True))
    return pa.table({k: pa.array(v, FEATURE_SCHEMA.field(k).type)
                     for k, v in rows.items()}, schema=FEATURE_SCHEMA)
