"""Per-z6-subtree tile encoding — the engine's main `map_groups` body.

One group = one z6 subtree (shuffle key ``z6_id`` from
stages.fanout). The group task derives every (zoom, x, y) tile of the
subtree for zooms 6..basezoom by halving the base-zoom tile sets (the
reference's bitmap rollup, /root/reference/src/tile_data.cpp:151-185),
then per tile runs the reference's ProcessObjects ladder
(/root/reference/src/tile_worker.cpp:303-505):

  canonical sort → adjacent dedup → feature_limit top-k →
  clip to tile(+margin) → quantize to the extent grid →
  simplify (DP / Visvalingam below simplify_below) →
  drop small parts (filter_area) → combine_points/lines/polygons →
  MVT encode → gzip.

Determinism: the per-tile sort key (layer, z_order, kind, name, url,
feature_seq) is total, so output bytes are independent of block
arrival order and of salting (mirrors the canonical sort in
src/tile_sorting.cpp:76-96 that makes the reference's double-run tile
hashes match).

Salted groups: when the shuffle key is (z6_id, salt) for hot subtrees,
each salted task emits *feature-list* rows instead of tiles, and a
second, small groupby(tile) merges + encodes — output is byte-identical
to the unsalted path because the merge re-sorts canonically.
"""

from __future__ import annotations

import gzip
import hashlib

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..geo import clip as _clip
from ..geo import simplify as _simplify
from ..geo import tilemath as tm
from ..geo import wkb as _wkb
from . import mvt


def encode_subtree(group: pd.DataFrame, cfg: EngineConfig = DEFAULT_CONFIG,
                   zmin: int | None = None, zmax: int | None = None) -> pd.DataFrame:
    """map_groups body: all fan-out rows of one z6 subtree → tile rows
    (zoom, x, y, tile_id, n_features, tile_gz, tile_hash)."""
    basezoom = cfg.basezoom
    zmin = max(cfg.minzoom, 6) if zmin is None else zmin
    zmax = basezoom if zmax is None else zmax

    # 1. dedup features (a feature may arrive once per z6 tile it
    #    touches; within one group its rows are duplicates except when
    #    salted inputs were merged — concat their base_tiles)
    feats = _dedup_features(group)

    # 2. explode (feature, base_tile)
    fi = np.repeat(np.arange(len(feats)), [len(t) for t in feats["base_tiles"]])
    bt = (np.concatenate(list(feats["base_tiles"]))
          if len(feats) else np.empty(0, dtype=np.int64))

    out_rows = []
    minzooms = feats["minzoom"].to_numpy() if len(feats) else np.empty(0, dtype=np.int8)
    for z in range(zmin, zmax + 1):
        keys = tm.tile_id_parent(bt, basezoom - z) if len(bt) else bt
        # unique (tile, feature) pairs, honoring per-feature minzoom
        ok = minzooms[fi] <= z
        pairs = np.unique(np.stack([keys[ok], fi[ok]], axis=1), axis=0) \
            if ok.any() else np.empty((0, 2), dtype=np.int64)
        if len(pairs) == 0:
            continue
        tile_keys = pairs[:, 0]
        bounds = np.flatnonzero(np.diff(tile_keys)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(pairs)]])
        for s, e in zip(starts, ends):
            tid = int(tile_keys[s])
            rows = pairs[s:e, 1]
            row = _encode_tile(tid, z, feats, rows, cfg)
            if row["n_features"] > 0:  # skip empty tiles (reference: only
                out_rows.append(row)   # populated tiles are enumerated)
    if not out_rows:
        return _empty_tiles()
    return pd.DataFrame(out_rows)


def _dedup_features(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(["url", "feature_seq"], kind="stable")
    dup = g.duplicated(["url", "feature_seq"], keep=False)
    if not dup.any():
        return g.reset_index(drop=True)
    # merge base_tiles of duplicate (salted / multi-z6) rows
    agg = {c: "first" for c in g.columns if c not in ("url", "feature_seq", "base_tiles")}
    merged = (g.groupby(["url", "feature_seq"], as_index=False, sort=True)
              .agg({**agg, "base_tiles": lambda ts: np.unique(np.concatenate(list(ts)))}))
    return merged


def _canonical_order(feats: pd.DataFrame, rows: np.ndarray,
                     cfg: EngineConfig) -> np.ndarray:
    """Total per-tile sort (src/tile_sorting.cpp:76-96 analog):
    (layer, ±z_order, kind, name, url, feature_seq)."""
    sub = feats.iloc[rows]
    zord = sub["z_order"].to_numpy(dtype=np.int64)
    # per-layer z-order direction
    zdir = np.asarray([1 if cfg.layer(l).z_order_ascending else -1
                       for l in sub["layer"]])
    keys = np.lexsort((sub["feature_seq"].to_numpy(), sub["url"].to_numpy(),
                       sub["name"].to_numpy(), sub["kind"].to_numpy(),
                       zord * zdir, sub["layer"].to_numpy()))
    return rows[keys]


_KIND_TO_MVT = {1: mvt.GEOM_POINT, 2: mvt.GEOM_LINESTRING, 3: mvt.GEOM_POLYGON}


def _encode_tile(tid: int, z: int, feats: pd.DataFrame, rows: np.ndarray,
                 cfg: EngineConfig) -> dict:
    _, xs, ys = tm.tile_id_decode(np.asarray([tid]))
    x, y = int(xs[0]), int(ys[0])
    extent = cfg.tile_extent
    margin = cfg.tile_margin * extent

    rows = _canonical_order(feats, rows, cfg)
    sub = feats.iloc[rows]

    # feature_limit top-k per layer (after canonical sort → deterministic,
    # src/tile_worker.cpp:495)
    kept_parts = []
    per_layer_seen: dict[str, int] = {}
    n_encoded = 0
    layers: dict[str, mvt.LayerBuilder] = {}
    for _, f in sub.iterrows():
        ldef = cfg.layer(f["layer"])
        if not (ldef.minzoom <= z <= ldef.maxzoom):
            continue
        if ldef.feature_limit and z < ldef.feature_limit_below:
            seen = per_layer_seen.get(f["layer"], 0)
            if seen >= ldef.feature_limit:
                continue
        parts, gtype = _tile_geometry(f, z, x, y, extent, margin, ldef)
        if not parts:
            continue
        per_layer_seen[f["layer"]] = per_layer_seen.get(f["layer"], 0) + 1
        kept_parts.append((f["layer"], gtype, parts,
                           {"name": f["name"]}, int(f["z_order"])))
    # combine_* passes: merge adjacent compatible features
    kept_parts = _combine(kept_parts, cfg)
    for layer_name, gtype, parts, attrs, _z in kept_parts:
        lb = layers.get(layer_name)
        if lb is None:
            lb = layers[layer_name] = mvt.LayerBuilder(layer_name, extent)
        if lb.add_feature(gtype, parts, attrs):
            n_encoded += 1
    ordered = [layers[l.name] for l in cfg.layers if l.name in layers]
    ordered += [v for k, v in layers.items() if all(l.name != k for l in cfg.layers)]
    body = mvt.build_tile(ordered)
    gz = gzip.compress(body, 6, mtime=0) if cfg.compress_tiles else body
    return {"zoom": np.int32(z), "x": np.int32(x), "y": np.int32(y),
            "tile_id": np.int64(tid), "n_features": np.int32(n_encoded),
            "tile_gz": gz,
            "tile_hash": hashlib.md5(body).hexdigest()}


def _tile_geometry(f, z: int, x: int, y: int, extent: int, margin: float,
                   ldef) -> tuple:
    """WKB → clipped, quantized, simplified tile-grid parts."""
    gt, payload = _wkb.parse_wkb(f["geom_wkb"])

    def to_grid(coords: np.ndarray) -> np.ndarray:
        u = (tm.lon2tilex_f(coords[:, 0], z) - x) * extent
        v = (tm.lat2tiley_f(coords[:, 1], z) - y) * extent
        return np.stack([u, v], axis=1)

    if gt == _wkb.POINT:
        g = to_grid(payload.reshape(1, 2))
        if not (-margin <= g[0, 0] <= extent + margin
                and -margin <= g[0, 1] <= extent + margin):
            return [], 0
        return [np.round(g).astype(np.int64)], mvt.GEOM_POINT

    if gt in (_wkb.LINESTRING, _wkb.MULTILINESTRING):
        lines = [payload] if gt == _wkb.LINESTRING else payload
        parts = []
        for line in lines:
            g = to_grid(line)
            for run in _clip.clip_linestring(g, -margin, -margin,
                                             extent + margin, extent + margin):
                if ldef.simplify_below and z < ldef.simplify_below:
                    run = _simplify_part(run, ldef)
                q = _quantize(run)
                if len(q) >= 2:
                    parts.append(q)
        return parts, mvt.GEOM_LINESTRING

    polys = [payload] if gt == _wkb.POLYGON else payload
    parts = []
    for rings in polys:
        for i, ring in enumerate(rings):
            g = to_grid(ring)
            c = _clip.clip_ring(g, -margin, -margin, extent + margin, extent + margin)
            if c is None:
                continue
            if ldef.simplify_below and z < ldef.simplify_below:
                c2 = _simplify.simplify_ring(c, ldef.simplify_level)
                if c2 is None:
                    continue
                c = c2
            if ldef.filter_below and z < ldef.filter_below \
                    and abs(_clip.ring_area(c)) < ldef.filter_area:
                continue  # RemovePartsBelowSize (tile_worker.cpp:79-96)
            q = _quantize(c, close=True)
            if len(q) >= 4:
                # enforce winding: exterior CW, holes CCW in tile coords
                # (y grows down → CW on screen = positive shoelace here)
                area = _clip.ring_area(q.astype(np.float64))
                is_hole = i > 0
                if (area > 0) != is_hole:
                    q = q[::-1]
                parts.append(q)
    return parts, mvt.GEOM_POLYGON


def _simplify_part(run: np.ndarray, ldef) -> np.ndarray:
    if ldef.simplify_algorithm == "visvalingam":
        return _simplify.visvalingam(run, ldef.simplify_level ** 2)
    return _simplify.douglas_peucker(run, ldef.simplify_level)


def _quantize(coords: np.ndarray, close: bool = False) -> np.ndarray:
    q = np.round(coords).astype(np.int64)
    keep = np.ones(len(q), dtype=bool)
    keep[1:] = np.abs(np.diff(q, axis=0)).sum(axis=1) > 0
    q = q[keep]
    if close and len(q) >= 3 and (q[0] != q[-1]).any():
        q = np.vstack([q, q[:1]])
    return q


def _combine(kept: list, cfg: EngineConfig) -> list:
    """combine_points → one multipoint per (layer, attrs, z_order) run;
    combine_lines → one multilinestring; combine_polygons → one
    multipolygon (src/tile_worker.cpp:323-405 analog, over the
    canonically sorted run so output is deterministic)."""
    out = []
    i = 0
    while i < len(kept):
        layer, gtype, parts, attrs, zord = kept[i]
        ldef = cfg.layer(layer)
        do = ((gtype == mvt.GEOM_POINT and ldef.combine_points)
              or (gtype == mvt.GEOM_LINESTRING and ldef.combine_lines)
              or (gtype == mvt.GEOM_POLYGON and ldef.combine_polygons))
        if not do:
            out.append(kept[i])
            i += 1
            continue
        j = i + 1
        merged = list(parts)
        while j < len(kept) and kept[j][0] == layer and kept[j][1] == gtype \
                and kept[j][3] == attrs and kept[j][4] == zord:
            merged.extend(kept[j][2])
            j += 1
        out.append((layer, gtype, merged, attrs, zord))
        i = j
    return out


def _empty_tiles() -> pd.DataFrame:
    return pd.DataFrame({"zoom": pd.Series(dtype=np.int32),
                         "x": pd.Series(dtype=np.int32),
                         "y": pd.Series(dtype=np.int32),
                         "tile_id": pd.Series(dtype=np.int64),
                         "n_features": pd.Series(dtype=np.int32),
                         "tile_gz": pd.Series(dtype=object),
                         "tile_hash": pd.Series(dtype=object)})
