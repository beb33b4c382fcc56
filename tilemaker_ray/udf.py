"""User-defined processing API — the Lua UDF surface, in Python.

The reference exposes 34 Lua functions to user scripts
(/root/reference/src/osm_lua_processing.cpp:255-306; hooks
node_function/way_function/relation_function etc., §2.11 of SURVEY.md).
This module is the equivalent extension surface for web pages: the
user writes

    def page_function(page: PageContext):
        if page.Holds("geo.position"):
            lat, lon = page.FirstPosition()
            if page.Intersects("admin"):
                page.Layer("poi", point=(lon, lat))
                page.Attribute("name", page.Slug())
                page.MinZoom(8)
                page.ZOrder(10)

and runs it through :class:`UDFExtractor` — an actor-pool map_batches
stage that parses each page's machine-readable signals into a tag map
(the TagMap analog, /root/reference/include/tag_map.h), invokes the
UDF per record exactly like the reference's per-entity Lua calls, and
collects emissions into the engine's feature schema.

API parity map (reference function → here):
  Id → page.Id()                 Find → page.Find(key)
  Holds → page.Holds(key)        AllKeys → page.AllKeys()
  AllTags → page.AllTags()       Intersects → page.Intersects(layer)
  FindIntersecting → page.FindIntersecting(layer)
  CoveredBy → page.CoveredBy(layer)
  FindCovering → page.FindCovering(layer)
  Layer → page.Layer(...)        LayerAsCentroid → page.LayerAsCentroid(...)
  Attribute* → page.Attribute / AttributeNumeric / AttributeBoolean /
               AttributeInteger
  MinZoom → page.MinZoom         ZOrder → page.ZOrder
  SetData/GetData (T6 global KV) → read-only broadcast dict
               page.GetData(key) (writes happen in a setup phase on the
               driver — mutable cross-worker state is not a thing in a
               share-nothing engine)
  init_function/exit_function → UDFExtractor.__init__ / __del__
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from .geo import measures as _measures
from .geo import pip as _pip
from .geo import wkb as _wkb
from .stages.extract import FEATURE_SCHEMA, feature_uid
from .stages.join import _resolve, build_polygon_state

_META_RE = re.compile(rb'<meta name="([^"]+)" content="([^"]*)">')


class PageContext:
    """One page, presented to the UDF. Mutable emission state mirrors
    the reference's OsmLuaProcessing object (one per worker, reset per
    record)."""

    __slots__ = ("_url", "_lang", "_html", "_text", "_tags", "_emissions",
                 "_current", "_indexes", "_kv", "_seq", "_reltags",
                 "_memberships", "_rel_list", "_rel_sub", "_id_override")

    def __init__(self, indexes, kv, reltags=None, memberships=None):
        self._indexes = indexes
        self._kv = kv or {}
        self._reltags = reltags or {}        # rel_id -> {"tags": {...}}
        self._memberships = memberships or {}  # url -> [(rel_id, role)]

    def _reset(self, url, lang, html, text):
        self._url = url
        self._lang = lang
        self._html = html
        self._text = text
        self._tags = None
        self._emissions = []
        self._current = None
        self._seq = 0
        self._rel_list = self._memberships.get(url, [])
        self._rel_sub = -1
        self._id_override = None

    # -- metadata (Id/Find/Holds/AllKeys/AllTags/HasTags) ------------------
    def Id(self) -> str:
        return self._url

    def Slug(self) -> str:
        m = re.match(r"https?://[^/]+/([^/]+)/", self._url)
        return m.group(1) if m else ""

    def Lang(self) -> str:
        return self._lang

    def Text(self) -> str:
        return self._text

    def _tagmap(self) -> dict:
        if self._tags is None:
            tags: dict[str, list] = {}
            for m in _META_RE.finditer(self._html):
                tags.setdefault(m.group(1).decode(), []).append(
                    m.group(2).decode())
            self._tags = tags
        return self._tags

    def Find(self, key: str) -> str:
        v = self._tagmap().get(key)
        return v[0] if v else ""

    def FindAll(self, key: str) -> list:
        return list(self._tagmap().get(key, []))

    def Holds(self, key: str) -> bool:
        return key in self._tagmap()

    def HasTags(self) -> bool:
        return bool(self._tagmap())

    def AllKeys(self) -> list:
        return list(self._tagmap().keys())

    def AllTags(self) -> dict:
        return {k: v[0] for k, v in self._tagmap().items()}

    # -- positions ----------------------------------------------------------
    def Positions(self) -> list:
        """(lat, lon) tuples from geo.position metas."""
        out = []
        for v in self.FindAll("geo.position"):
            lat, lon = v.split(";")
            out.append((float(lat), float(lon)))
        return out

    def FirstPosition(self):
        p = self.Positions()
        return p[0] if p else None

    # -- spatial queries (Intersects/CoveredBy + Find* variants) ------------
    def _query(self, layer: str, lon, lat, covering: bool):
        idx = self._indexes.get(layer)
        if idx is None:
            return []
        pts, polys = idx.contains_pairs(np.asarray([lon]), np.asarray([lat]))
        return [idx.names[p] for p in polys]

    def Intersects(self, layer: str) -> bool:
        p = self.FirstPosition()
        return bool(p) and bool(self._query(layer, p[1], p[0], False))

    def FindIntersecting(self, layer: str) -> list:
        p = self.FirstPosition()
        return self._query(layer, p[1], p[0], False) if p else []

    def CoveredBy(self, layer: str) -> bool:
        # point semantics: covered == contained
        return self.Intersects(layer)

    def FindCovering(self, layer: str) -> list:
        return self.FindIntersecting(layer)

    # -- geometry helpers (Area/Length/Centroid/IsClosed/…) -----------------
    def IsClosed(self) -> bool:
        """True iff the page geometry is an area (footprint) or a track
        whose endpoints coincide (reference IsClosed,
        osm_lua_processing.cpp:505-508)."""
        g = self._geom_of_page()
        if g is None:
            return False
        if g[0] == _wkb.POLYGON:
            return True
        c = g[1]
        return len(c) >= 3 and bool((c[0] == c[-1]).all())

    def IsMultiPolygon(self) -> bool:
        """Pages emit single polygons (one footprint meta per emission);
        a multipolygon page geometry does not exist in this data model
        (reference: way∧relation, osm_lua_processing.cpp:511-513)."""
        return False

    def AreaIntersecting(self, layer: str) -> float:
        """Σ intersection area of the page's footprint with the layer's
        polygons, in m² (reference intersectsArea,
        osm_lua_processing.cpp:441-484): exact planar intersection
        fraction (concave-safe Green's-theorem clipper) × the
        footprint's spherical area."""
        g = self._geom_of_page()
        if g is None or g[0] != _wkb.POLYGON:
            return 0.0
        idx = self._indexes.get(layer)
        if idx is None:
            return 0.0
        from .geo import clip as _clip
        ring = g[1][0]
        total = abs(_clip.ring_area(ring))
        if total == 0:
            return 0.0
        x0, y0 = float(ring[:, 0].min()), float(ring[:, 1].min())
        x1, y1 = float(ring[:, 0].max()), float(ring[:, 1].max())
        frac = 0.0
        for p in idx.bbox_candidates(x0, y0, x1, y1):
            frac += _clip.polygon_intersection_area(g[1],
                                                    idx.rings[int(p)]) / total
        return min(1.0, frac) * self.Area()

    def Centroid(self, algorithm: str = "polylabel"):
        """(lat, lon) centroid of the page geometry — polylabel default
        for areas like the reference (osm_lua_processing.cpp:865-943);
        falls back to the first geo.position for point-only pages."""
        g = self._geom_of_page()
        if g is None:
            return self.FirstPosition()
        if g[0] == _wkb.POLYGON:
            if algorithm == "polylabel":
                cx, cy = _measures.polylabel(g[1])
            else:
                cx, cy = _measures.centroid_xy(g[1])
        else:
            cx, cy = float(g[1][:, 0].mean()), float(g[1][:, 1].mean())
        return (cy, cx)

    def Area(self) -> float:
        g = self._geom_of_page()
        if g is None or g[0] != _wkb.POLYGON:
            return 0.0
        return _measures.polygon_area_sq_m(g[1])

    def Length(self) -> float:
        g = self._geom_of_page()
        if g is None or g[0] != _wkb.LINESTRING:
            return 0.0
        return _measures.line_length_m(g[1])

    def _geom_of_page(self):
        t = self._tagmap()
        if "geo.track" in t:
            coords = _parse_latlon(t["geo.track"][0])
            return (_wkb.LINESTRING, coords)
        if "geo.footprint" in t:
            coords = _parse_latlon(t["geo.footprint"][0])
            ring = np.vstack([coords, coords[:1]])
            return (_wkb.POLYGON, [ring])
        return None

    # -- emission (Layer/LayerAsCentroid/Attribute*/MinZoom/ZOrder) ---------
    def Layer(self, name: str, point=None):
        """Start a feature in ``name``. point=(lon, lat) emits a point;
        with no point the page's own track/footprint geometry is used
        (IsClosed semantics decided by the tag kind)."""
        if point is not None:
            lon, lat = float(point[0]), float(point[1])
            geom = _wkb.point_wkb(lon, lat)
            kind = 1
        else:
            g = self._geom_of_page()
            if g is None:
                return
            if g[0] == _wkb.LINESTRING:
                geom = _wkb.linestring_wkb(g[1])
                kind = 2
                lon, lat = float(g[1][0, 0]), float(g[1][0, 1])
            else:
                geom = _wkb.polygon_wkb(g[1][0])
                kind = 3
                lon, lat = float(g[1][0][0, 0]), float(g[1][0][0, 1])
        uid_src = self._id_override if self._id_override is not None \
            else self._url
        self._current = {
            "url": uid_src, "fuid": feature_uid(uid_src, self._seq),
            "feature_seq": self._seq, "kind": kind, "layer": name,
            "name": self.Slug(), "lang": self._lang, "lon": lon, "lat": lat,
            "geom_wkb": geom, "minzoom": 0, "z_order": 0,
            "attrs_json": "",
        }
        self._seq += 1
        self._emissions.append(self._current)

    def LayerAsCentroid(self, name: str, algorithm: str = "polylabel"):
        """Emit the page geometry's centroid as a point feature
        (reference: Centroid with polylabel default for areas,
        osm_lua_processing.cpp:865-943)."""
        g = self._geom_of_page()
        if g is None:
            p = self.FirstPosition()
            if p is None:
                return
            self.Layer(name, point=(p[1], p[0]))
            return
        if g[0] == _wkb.POLYGON:
            if algorithm == "polylabel":
                cx, cy = _measures.polylabel(g[1])
            else:
                cx, cy = _measures.centroid_xy(g[1])
        else:
            cx, cy = float(g[1][:, 0].mean()), float(g[1][:, 1].mean())
        self.Layer(name, point=(cx, cy))

    def Attribute(self, key: str, value):
        """Applies to the most recent Layer() — the reference's
        ordering-dependent semantics (osm_lua_processing.cpp:955-979)."""
        if self._current is not None:
            import json
            attrs = json.loads(self._current["attrs_json"] or "{}")
            attrs[key] = value if isinstance(value, (int, float, bool)) \
                else str(value)
            self._current["attrs_json"] = json.dumps(attrs, sort_keys=True)

    def AttributeNumeric(self, key: str, value):
        self.Attribute(key, float(value))

    def AttributeInteger(self, key: str, value):
        self.Attribute(key, int(value))

    def AttributeBoolean(self, key: str, value):
        self.Attribute(key, bool(value))

    def MinZoom(self, z: int):
        if self._current is not None:
            self._current["minzoom"] = int(z)

    def ZOrder(self, z: float):
        if self._current is not None:
            from .stages.extract import compress_z_order
            self._current["z_order"] = compress_z_order(z)

    # -- relation iterator (the Lua relation API,
    #    /root/reference/src/osm_lua_processing.cpp:1044-1062 NextRelation /
    #    RestartRelations / FindInRelation; 950 SetTag; 969 ModifyId) -------
    def NextRelation(self):
        """Advance over this page's accepted-relation memberships →
        (rel_id, role), or None when exhausted."""
        self._rel_sub += 1
        if self._rel_sub >= len(self._rel_list):
            return None
        rid, role = self._rel_list[self._rel_sub]
        return rid, role

    def RestartRelations(self):
        self._rel_sub = -1

    def FindInRelation(self, key: str) -> str:
        """Tag lookup in the CURRENT relation of the iterator."""
        if not (0 <= self._rel_sub < len(self._rel_list)):
            return ""
        rid = self._rel_list[self._rel_sub][0]
        r = self._reltags.get(rid)
        tags = r.get("tags", r) if isinstance(r, dict) else {}
        v = tags.get(key)
        return "" if v is None else str(v)

    def SetTag(self, key: str, value: str):
        """Mutate the page's own tag map (visible to subsequent
        Find/Holds, exactly like the reference's currentTags write)."""
        self._tagmap()[key] = [str(value)]

    def ModifyId(self, new_id):
        """Override the feature id base for subsequent Layer() calls
        (the reference rewrites originalOsmID)."""
        self._id_override = str(new_id)

    # -- global KV (T6) ------------------------------------------------------
    def GetData(self, key: str):
        return self._kv.get(key)


def _parse_latlon(content: str) -> np.ndarray:
    vals = np.array([float(v) for pair in content.split(" ")
                     for v in pair.split(",")])
    ll = vals.reshape(-1, 2)
    return np.stack([ll[:, 1], ll[:, 0]], axis=1)


class UDFExtractor:
    """Actor-pool stage hosting a user page_function. Polygon layers
    (for Intersects) and the KV dict arrive as broadcast refs; indexes
    are built once per actor (init_function analog)."""

    def __init__(self, page_function, polygon_layers=None, kv=None,
                 hex_res: int = 9, relations=None, memberships=None):
        self.fn = page_function
        indexes = {}
        if polygon_layers is not None:
            poly = _resolve(polygon_layers)
            for layer_name in set(poly["layer"].to_pylist()):
                mask = pa.compute.equal(poly["layer"], layer_name)
                sub = poly.filter(mask)
                idx, _, _ = build_polygon_state(sub, hex_res)
                indexes[layer_name] = idx
        self.ctx = PageContext(
            indexes, _resolve(kv) if kv is not None else {},
            reltags=_resolve(relations) if relations is not None else {},
            memberships=_resolve(memberships)
            if memberships is not None else {})

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for url, lang, html, text in zip(batch["url"].to_pylist(),
                                         batch["lang"].to_pylist(),
                                         batch["html"].to_pylist(),
                                         batch["text"].to_pylist()):
            self.ctx._reset(url, lang, html, text)
            self.fn(self.ctx)
            rows.extend(self.ctx._emissions)
        cols = {f.name: [] for f in FEATURE_SCHEMA}
        for r in rows:
            for f in FEATURE_SCHEMA:
                cols[f.name].append(r.get(f.name))
        return pa.table({k: pa.array(v, FEATURE_SCHEMA.field(k).type)
                         for k, v in cols.items()}, schema=FEATURE_SCHEMA)
