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
    # meters-based tolerance: when > 0 it overrides simplify_level and is
    # converted per tile row via meter2degp at the row-center latitude
    # (reference src/tile_worker.cpp:481-483)
    simplify_length: float = 0.0
    # per-zoom tolerance growth below simplify_below: tolerance at zoom z
    # is scaled by ratio^((simplify_below-1)-z) in the reference's degree
    # frame (src/tile_worker.cpp:486). This engine's tolerances live in
    # tile units, where the reference default ratio=2 is exactly
    # "constant tile-unit tolerance across zooms" — so the tile-unit
    # scale factor is (simplify_ratio/2)^((simplify_below-1)-z) and the
    # default changes nothing.
    simplify_ratio: float = 2.0
    # drop polygon parts below filter_area (tile-unit²) below filter_below zoom
    filter_below: int = 0
    filter_area: float = 0.0
    # keep at most feature_limit features per tile below feature_limit_below
    feature_limit: int = 0
    feature_limit_below: int = 99
    combine_points: bool = False
    combine_lines: bool = False
    combine_polygons: bool = False
    # zoom-gated combining (reference combine_lines_below /
    # combine_polygons_below, shared_data.cpp:324-325): when set,
    # features combine at zooms strictly below the threshold even if the
    # plain boolean is off. combine_lines_below=None inherits the global
    # EngineConfig.combine_below (the reference's settings.combine_below
    # default chain); combine_polygons_below=None means 0 (off).
    combine_lines_below: int | None = None
    combine_polygons_below: int | None = None
    z_order_ascending: bool = False
    # write this layer's features into another layer's output vector-tile
    # layer (reference write_to, shared_data.cpp:315,160-175): processing
    # knobs stay per source layer, only the MVT layer name/position are
    # the target's.
    write_to: str = ""


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
    # global default for LayerDef.combine_lines_below (reference
    # settings.combine_below, shared_data.cpp:267)
    combine_below: int = 0
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


def resolve_write_to(ldefs: dict) -> dict:
    """Map each layer name to the MVT layer it writes into.

    Mirrors the reference's addLayer grouping
    (/root/reference/src/shared_data.cpp:160-175): a ``write_to`` target
    must be a previously-declared layer that is not itself redirected
    (the reference silently drops a chained write_to from layerOrder;
    here it is an explicit error)."""
    out = {}
    for name, ld in ldefs.items():
        tgt = ld.write_to
        if not tgt:
            out[name] = name
            continue
        target = ldefs.get(tgt)
        if target is None:
            raise ValueError(
                f"write_to: the layer to write, named {tgt!r}, doesn't exist")
        if target.write_to:
            raise ValueError(
                f"write_to: target layer {tgt!r} is itself redirected "
                f"(chained write_to is not supported)")
        out[name] = tgt
    return out


def combine_lines_at(ldef: LayerDef, z: int, cfg: EngineConfig) -> bool:
    """Reference: combine lines when zoom < combineLinesBelow
    (tile_worker.cpp:505), default = global settings.combine_below."""
    below = (ldef.combine_lines_below if ldef.combine_lines_below is not None
             else cfg.combine_below)
    return ldef.combine_lines or z < below


def combine_polygons_at(ldef: LayerDef, z: int, cfg: EngineConfig) -> bool:
    below = (ldef.combine_polygons_below
             if ldef.combine_polygons_below is not None else 0)
    return ldef.combine_polygons or z < below


def simplify_tolerance(ldef: LayerDef, z: int, y: int, extent: int) -> float:
    """Effective DP/Visvalingam tolerance in TILE UNITS at (z, tile row y).

    0.0 means "do not simplify at this zoom". Reproduces the reference's
    tolerance ladder (src/tile_worker.cpp:477-486) transposed into the
    tile-unit frame this engine simplifies in:

      reference (degrees):  tol = base_degp * ratio^((below-1)-z)
      tile units:           tol_tile = tol_degp * 2^z * extent / 360
                                     = base_tile * (ratio/2)^((below-1)-z)

    where base_tile = simplify_level (already tile units) or, when
    simplify_length > 0, meter2degp(length, latp of the tile-row
    center) * 2^(below-1) * extent / 360. With the default ratio=2 the
    scale factor is 1, i.e. constant tile-unit tolerance per zoom —
    exactly this engine's historical behavior."""
    if not ldef.simplify_below or z >= ldef.simplify_below:
        return 0.0
    if ldef.simplify_length > 0:
        from .geo import tilemath as _tm
        # row-center latp: (tiley2latp(y,z) + tiley2latp(y+1,z)) / 2
        latp = 180.0 - (y + 0.5) * 360.0 / (1 << z)
        base = (float(_tm.meter2degp(ldef.simplify_length, latp))
                * (1 << (ldef.simplify_below - 1)) * extent / 360.0)
    else:
        base = ldef.simplify_level
    if ldef.simplify_ratio != 2.0:
        base *= (ldef.simplify_ratio / 2.0) ** ((ldef.simplify_below - 1) - z)
    return float(base)
