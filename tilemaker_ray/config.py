"""Layer configuration — the analog of tilemaker's JSON layer config
(/root/reference/src/shared_data.cpp:248-357, docs/CONFIGURATION.md:23-131).

A :class:`LayerDef` carries the same per-layer processing policy knobs
the reference parses from JSON: zoom range, simplification, small-part
filtering, per-tile feature caps, combine policies, and z-order
direction. The engine's tile encoder consumes these in
``map_groups`` exactly where the reference's ProcessLayer does
(/root/reference/src/tile_worker.cpp:438-505).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class LayerDef:
    name: str
    minzoom: int = 0
    maxzoom: int = 14
    # simplify features below this zoom with DP tolerance
    # simplify_level × tile-units (reference: simplify_below/simplify_level)
    simplify_below: int = 0
    simplify_level: float = 1.0
    simplify_algorithm: str = "douglas_peucker"  # or "visvalingam" / "buildings"
    # drop polygon parts below filter_area (tile-unit²) below filter_below zoom
    filter_below: int = 0
    filter_area: float = 0.0
    # keep at most feature_limit features per tile below feature_limit_below
    feature_limit: int = 0
    feature_limit_below: int = 99
    combine_points: bool = False
    combine_lines: bool = False
    combine_polygons: bool = False
    z_order_ascending: bool = False


@dataclass(frozen=True)
class EngineConfig:
    basezoom: int = 14
    minzoom: int = 0
    maxzoom: int = 14
    tile_extent: int = 4096       # MVT grid units (reference default)
    tile_margin: float = 1.0 / 200.0  # clip margin (src/coordinates_geom.cpp:20-25)
    hex_res: int = 9
    quad_level: int = 16
    knn_k: int = 3
    compress_tiles: bool = True
    # skew handling: groups larger than this are salted into sub-groups
    hot_tile_rows: int = 50_000
    # optional clipping box (lon_w, lat_s, lon_e, lat_n): only tiles
    # intersecting it are produced (reference --bbox,
    # src/tilemaker.cpp:130-165)
    bbox: tuple | None = None
    # large-object guard: a feature whose bbox would fan out to more
    # base-zoom tiles than this gets its raster zoom coarsened (it stops
    # appearing beyond that zoom) — the bounded-fan-out replacement for
    # the reference's large-object R-tree path (src/tile_data.cpp:524-531)
    max_raster_tiles: int = 16384
    layers: tuple = field(default_factory=tuple)

    def layer(self, name: str) -> LayerDef:
        for l in self.layers:
            if l.name == name:
                return l
        return LayerDef(name=name)


DEFAULT_LAYERS = (
    LayerDef("place", minzoom=6, feature_limit=256, feature_limit_below=13,
             combine_points=True),
    LayerDef("track", minzoom=9, simplify_below=14, simplify_level=1.0,
             feature_limit=512, feature_limit_below=13, combine_lines=True),
    LayerDef("footprint", minzoom=11, simplify_below=14, simplify_level=0.5,
             filter_below=13, filter_area=4.0,
             feature_limit=512, feature_limit_below=13, combine_polygons=True),
    LayerDef("admin", minzoom=2, simplify_below=12, simplify_level=1.0),
    LayerDef("landuse", minzoom=5, simplify_below=13, simplify_level=1.0,
             filter_below=12, filter_area=8.0),
)

DEFAULT_CONFIG = EngineConfig(layers=DEFAULT_LAYERS)
