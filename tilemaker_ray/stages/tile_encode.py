"""Per-shard tile encoding — the engine's main `map_groups` body.

One group = one zoom-band shard (shuffle key ``shard_key`` from
stages.fanout: a z6/z10/z12 anchor tile id that selects both the
subtree and the zoom band to encode). The task derives every
(zoom, x, y) tile of its band by halving the base-zoom tile sets (the
reference's bitmap rollup, /root/reference/src/tile_data.cpp:151-185),
then per tile runs the reference's ProcessObjects ladder
(/root/reference/src/tile_worker.cpp:303-505):

  canonical sort → dedup → feature_limit top-k → clip to tile(+margin)
  → quantize to the extent grid → simplify below simplify_below →
  drop small parts (filter_area) → combine_points/lines/polygons →
  MVT encode → gzip.

Hot-path layout (what matters at 100 TB):
- input arrives as a zero-copy Arrow table (``batch_format="pyarrow"``
  in the groupby — pandas group conversion measured 10× slower);
- the base_tiles list column is consumed through its Arrow
  offsets/values buffers, no per-row Python;
- canonical sort, feature_limit cumcount and point grid transforms
  are single numpy passes over all (tile, feature) pairs of a zoom;
- non-point WKB is parsed ONCE per feature per shard (the
  share-nothing analog of the reference's geometry cache,
  include/geometry_cache.h); whole-geometry-inside-tile skips
  clipping entirely (the clip-cache dividend, include/clip_cache.h).

Determinism: the per-tile sort key (layer, ±z_order, kind, name, fuid)
is total (fuid = per-feature uid), so output bytes are independent of
block arrival order and of shard banding (mirrors the canonical sort
in src/tile_sorting.cpp:76-96).
"""

from __future__ import annotations

import gzip
import hashlib

import numpy as np
import pyarrow as pa

from ..config import (DEFAULT_CONFIG, EngineConfig, combine_lines_at,
                      combine_polygons_at, resolve_write_to,
                      simplify_tolerance)
from ..geo import antimeridian as _antimeridian
from ..geo import clip as _clip
from ..geo import dissolve as _dissolve
from ..geo import polyunion as _polyunion
from ..geo import simplify as _simplify
from ..geo import tilemath as tm
from ..geo import wkb as _wkb
from . import mvt

TILE_SCHEMA = pa.schema([
    ("zoom", pa.int32()), ("x", pa.int32()), ("y", pa.int32()),
    ("tile_id", pa.int64()), ("n_features", pa.int32()),
    ("tile_gz", pa.binary()), ("tile_hash", pa.string()),
])


def encode_shard(group, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """map_groups body for the zoom-banded shuffle: the shard key's own
    zoom selects which zoom band this task encodes (stages.fanout)."""
    from .fanout import band_for_anchor_zoom
    group = _as_table(group)
    if group.num_rows == 0:
        return _empty_tiles()
    anchor_zoom = int(group["shard_key"][0].as_py()) >> tm.ZOOM_SHIFT
    zmin, zmax = band_for_anchor_zoom(anchor_zoom, cfg.basezoom)
    return encode_subtree(group, cfg, zmin=max(zmin, cfg.minzoom),
                          zmax=min(zmax, cfg.basezoom))


def _as_table(group) -> pa.Table:
    if isinstance(group, pa.Table):
        return group
    import pandas as pd
    if isinstance(group, pd.DataFrame):
        return pa.Table.from_pandas(group, preserve_index=False)
    raise TypeError(type(group))


def encode_subtree(group, cfg: EngineConfig = DEFAULT_CONFIG,
                   zmin: int | None = None, zmax: int | None = None) -> pa.Table:
    basezoom = cfg.basezoom
    zmin = max(cfg.minzoom, 6) if zmin is None else zmin
    zmax = basezoom if zmax is None else zmax

    t = _dedup_features(_as_table(group))
    n = t.num_rows
    if n == 0:
        return _empty_tiles()

    # ---- per-feature columns as flat arrays (one-time, mostly zero-copy) ----
    fuids = t["fuid"].to_numpy(zero_copy_only=False)
    kinds = t["kind"].to_numpy(zero_copy_only=False)
    names = np.asarray(t["name"].to_pylist(), dtype=object)
    minzooms = t["minzoom"].to_numpy(zero_copy_only=False)
    zorders = t["z_order"].to_numpy(zero_copy_only=False).astype(np.int64)
    lons = t["lon"].to_numpy(zero_copy_only=False)
    lats = t["lat"].to_numpy(zero_copy_only=False)
    layer_names = np.asarray(t["layer"].to_pylist(), dtype=object)
    attrs_json = (np.asarray(t["attrs_json"].to_pylist(), dtype=object)
                  if "attrs_json" in t.column_names
                  else np.asarray([""] * n, dtype=object))
    attrs_json = np.asarray(["" if a is None else a for a in attrs_json],
                            dtype=object)

    # base_tiles through Arrow list offsets — no per-row Python
    bt_col = t["base_tiles"].combine_chunks()
    if isinstance(bt_col, pa.ChunkedArray):
        bt_col = bt_col.chunk(0)
    offsets = bt_col.offsets.to_numpy(zero_copy_only=False)
    bt_all = bt_col.values.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offsets)
    fi_all = np.repeat(np.arange(n), counts)
    bt_all = bt_all & ((1 << tm.ZOOM_SHIFT) - 1)  # strip zoom bits → morton
    # per-feature raster zoom (large objects rasterize coarser and stop
    # appearing beyond it; default = basezoom)
    rzs = (t["raster_zoom"].to_numpy(zero_copy_only=False).astype(np.int64)
           if "raster_zoom" in t.column_names
           else np.full(n, basezoom, dtype=np.int64))

    # layer policy lookup tables
    layer_order = {l.name: i for i, l in enumerate(cfg.layers)}
    ldefs = {l.name: l for l in cfg.layers}
    for ln in set(layer_names.tolist()):
        if ln not in ldefs:
            from ..config import LayerDef
            ldefs[ln] = LayerDef(name=ln)
            layer_order[ln] = len(layer_order)
    # write_to aliasing: features of a redirected layer are encoded into
    # the target's MVT layer (policy knobs stay per source layer)
    out_layer = resolve_write_to(ldefs)
    layer_rank = np.asarray([layer_order[l] for l in layer_names], dtype=np.int64)
    zdir = np.asarray([1 if ldefs[l].z_order_ascending else -1
                       for l in layer_names], dtype=np.int64)
    lay_minz = np.asarray([ldefs[l].minzoom for l in layer_names], dtype=np.int8)
    lay_maxz = np.asarray([ldefs[l].maxzoom for l in layer_names], dtype=np.int8)
    lay_limit = np.asarray([ldefs[l].feature_limit or 1 << 30
                            for l in layer_names], dtype=np.int64)
    lay_limit_below = np.asarray([ldefs[l].feature_limit_below
                                  for l in layer_names], dtype=np.int8)

    # canonical feature order within any tile (total: fuid unique)
    canon = np.lexsort((fuids, names, kinds, zorders * zdir, layer_rank))
    canon_rank = np.empty(n, dtype=np.int64)
    canon_rank[canon] = np.arange(n)

    # parsed non-point geometry cache (feature idx → parsed payload)
    geom_cache: dict[int, tuple] = {}
    wkb_py = None

    def parsed(fi: int):
        nonlocal wkb_py
        g = geom_cache.get(fi)
        if g is None:
            if wkb_py is None:
                wkb_py = t["geom_wkb"].to_pylist()
            gt, payload = _wkb.parse_wkb(wkb_py[fi])
            # split antimeridian-crossing geometries before any tile
            # math (no-op for the overwhelming non-crossing case)
            g = geom_cache[fi] = _antimeridian.normalize_payload(gt, payload)
        return g

    ring_class_memo: dict = {}  # id(source ring) → 0/1/2, see _ring_class

    out = {k: [] for k in ("zoom", "x", "y", "tile_id", "n_features",
                           "tile_gz", "tile_hash")}

    for z in range(zmin, zmax + 1):
        shift = 2 * (rzs[fi_all] - z)
        keys = bt_all >> np.maximum(shift, 0)
        vis = (shift >= 0) & (minzooms[fi_all] <= z) & (lay_minz[fi_all] <= z) \
            & (lay_maxz[fi_all] >= z)
        if not vis.any():
            continue
        # dedup (tile, feature) pairs — pack into one int64 so unique
        # runs a single scalar sort (axis=0 unique void-sorts rows,
        # measured 3-4x slower on hot shards); morton keys are ≤ 2^28
        # and n < 2^34, so key*n+fi cannot overflow int64
        packed = np.unique(keys[vis] * np.int64(n) + fi_all[vis])
        tkey, fidx = packed // np.int64(n), packed % np.int64(n)

        order = np.lexsort((canon_rank[fidx], tkey))
        tkey, fidx = tkey[order], fidx[order]

        # feature_limit: cumcount within (tile, layer) runs
        run_break = np.empty(len(tkey), dtype=bool)
        run_break[0] = True
        run_break[1:] = (np.diff(tkey) != 0) | (np.diff(layer_rank[fidx]) != 0)
        idx = np.arange(len(tkey))
        start = np.maximum.accumulate(np.where(run_break, idx, 0))
        cum = idx - start
        limit_applies = z < lay_limit_below[fidx]
        keep = ~limit_applies | (cum < lay_limit[fidx])
        tkey, fidx = tkey[keep], fidx[keep]
        if len(tkey) == 0:
            continue

        tx, ty = tm.morton_decode(tkey.astype(np.uint64))
        tx = tx.astype(np.int64)
        ty = ty.astype(np.int64)

        extent = cfg.tile_extent
        margin = cfg.tile_margin * extent
        is_pt = kinds[fidx] == 1
        ui = np.zeros(len(tkey), dtype=np.int64)
        vi = np.zeros(len(tkey), dtype=np.int64)
        in_tile = np.ones(len(tkey), dtype=bool)
        if is_pt.any():
            pf = fidx[is_pt]
            u = (tm.lon2tilex_f(lons[pf], z) - tx[is_pt]) * extent
            v = (tm.lat2tiley_f(lats[pf], z) - ty[is_pt]) * extent
            ui[is_pt] = np.round(u).astype(np.int64)
            vi[is_pt] = np.round(v).astype(np.int64)
            in_tile[is_pt] = ((u >= -margin) & (u <= extent + margin)
                              & (v >= -margin) & (v <= extent + margin))

        bounds = np.flatnonzero(np.diff(tkey)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(tkey)]])
        for s, e in zip(starts, ends):
            row = _assemble_tile(
                z, int(tx[s]), int(ty[s]), slice(s, e), fidx, is_pt, in_tile,
                ui, vi, kinds, layer_names, names, zorders, attrs_json,
                parsed, ldefs, layer_order, cfg, ring_class_memo, out_layer)
            if row is not None:
                out["zoom"].append(z)
                out["x"].append(int(tx[s]))
                out["y"].append(int(ty[s]))
                out["tile_id"].append(int(tm.tile_id(z, np.asarray([tx[s]]),
                                                     np.asarray([ty[s]]))[0]))
                out["n_features"].append(row[0])
                out["tile_gz"].append(row[1])
                out["tile_hash"].append(row[2])

    if not out["zoom"]:
        return _empty_tiles()
    return pa.table({k: pa.array(v, TILE_SCHEMA.field(k).type)
                     for k, v in out.items()}, schema=TILE_SCHEMA)


def _assemble_tile(z, x, y, sl, fidx, is_pt, in_tile, ui, vi, kinds,
                   layer_names, names, zorders, attrs_json, parsed,
                   ldefs, layer_order, cfg, ring_class_memo=None,
                   out_layer=None):
    """Build one tile's MVT from precomputed pair arrays (already in
    canonical order, already feature-limited)."""
    extent = cfg.tile_extent
    margin = cfg.tile_margin * extent
    idxs = np.arange(sl.start, sl.stop)
    layers: dict[str, mvt.LayerBuilder] = {}
    n_encoded = 0
    if out_layer is None:
        out_layer = {l: l for l in ldefs}
    # per-(layer, z, y) effective simplify tolerance in tile units
    # (meters-based simplify_length varies per tile row)
    tol_memo: dict[str, float] = {}

    def tol_of(lname: str) -> float:
        tl = tol_memo.get(lname)
        if tl is None:
            tl = tol_memo[lname] = simplify_tolerance(
                ldefs[lname], z, y, extent)
        return tl

    f_sl = fidx[idxs]
    pt_sl = is_pt[idxs]
    kd_sl = kinds[f_sl]  # TRUE kind: a line and a polygon must never
    # merge into one feature (they'd corrupt the MVT geometry type)
    ln_sl = layer_names[f_sl]
    nm_sl = names[f_sl]
    zo_sl = zorders[f_sl]
    aj_sl = attrs_json[f_sl]
    # a run = adjacent compatible features of a combining layer; the
    # combine knob that applies depends on the geometry kind (and, for
    # lines/polygons, the zoom-gated combine_*_below thresholds)
    combine_ok = np.asarray(
        [(ldefs[l].combine_points if pt_sl[i] else
          (combine_lines_at(ldefs[l], z, cfg)
           or combine_polygons_at(ldefs[l], z, cfg)))
         for i, l in enumerate(ln_sl)])
    brk = np.ones(len(idxs), dtype=bool)
    if len(idxs) > 1:
        same = ((ln_sl[1:] == ln_sl[:-1]) & (nm_sl[1:] == nm_sl[:-1])
                & (zo_sl[1:] == zo_sl[:-1]) & (aj_sl[1:] == aj_sl[:-1])
                & (kd_sl[1:] == kd_sl[:-1]) & combine_ok[1:] & combine_ok[:-1])
        brk[1:] = ~same
    run_starts = np.flatnonzero(brk)
    run_ends = np.concatenate([run_starts[1:], [len(idxs)]])

    for s, e in zip(run_starts, run_ends):
        fi = f_sl[s]
        lname = ln_sl[s]
        ldef = ldefs[lname]
        oname = out_layer.get(lname, lname)
        if pt_sl[s]:
            run_a = idxs[s:e]
            ok = in_tile[run_a]
            if ok.any():
                pts = np.stack([ui[run_a[ok]], vi[run_a[ok]]], axis=1)
                lb = layers.get(oname)
                if lb is None:
                    lb = layers[oname] = mvt.LayerBuilder(oname, extent)
                if lb.add_feature(mvt.GEOM_POINT, [pts],
                                  _attrs_of(nm_sl[s], aj_sl[s])):
                    n_encoded += 1
            continue
        # non-point: clip/simplify each feature of the run; combining
        # layers merge the run's parts into one multi-geometry feature
        # (combine_lines → ReorderMultiLinestring endpoint linking,
        # src/tile_worker.cpp:29-77,381-405)
        all_parts: list = []
        feature_parts: list = []
        gtype = 0
        for j in range(s, e):
            gt, payload = parsed(int(f_sl[j]))
            parts, gtype = _geom_parts(gt, payload, z, x, y, extent,
                                       margin, ldef, tol_of(lname),
                                       ring_class_memo=ring_class_memo)
            all_parts.extend(parts)
            if parts:
                feature_parts.append(parts)
        if all_parts:
            if gtype == mvt.GEOM_LINESTRING \
                    and combine_lines_at(ldef, z, cfg) \
                    and len(all_parts) > 1:
                all_parts = reorder_multilinestring(all_parts)
            elif gtype == mvt.GEOM_POLYGON \
                    and combine_polygons_at(ldef, z, cfg) \
                    and len(feature_parts) > 1:
                # geometric union of the run (reference
                # tile_worker.cpp:393-405 union_many): adjacent
                # same-attribute polygons dissolve shared borders;
                # None → keep the concatenated parts
                u = _polyunion.union_polygon_runs(feature_parts)
                if u is not None:
                    all_parts = u
            lb = layers.get(oname)
            if lb is None:
                lb = layers[oname] = mvt.LayerBuilder(oname, extent)
            if lb.add_feature(gtype, all_parts,
                              _attrs_of(nm_sl[s], aj_sl[s])):
                n_encoded += 1

    if n_encoded == 0:
        return None
    ordered = sorted(layers.values(), key=lambda lb: layer_order[lb.name])
    body = mvt.build_tile(ordered)
    gz = gzip.compress(body, 6, mtime=0) if cfg.compress_tiles else body
    return n_encoded, gz, hashlib.md5(body).hexdigest()


def _ring_self_intersects(ring: np.ndarray, max_check: int = 64,
                          max_pairs: int = 262144) -> bool:
    """Non-adjacent segment crossing test.

    Small rings (≤ ``max_check`` segments) test all pairs in one
    broadcast call; larger rings bucket segments on a uniform grid
    sized so the expected bucket occupancy is O(1) and test only
    co-bucketed pairs — the analog of the reference's R-tree guard
    (/root/reference/src/geom.cpp:17-138), near-linear instead of the
    former hard skip past 64 segments.  Only a pathological ring whose
    candidate-pair count exceeds ``max_pairs`` (everything stacked in
    one cell) skips the guard."""
    p = ring[:-1] if len(ring) and (ring[0] == ring[-1]).all() else ring
    n = len(p)
    if n < 4:
        return False
    from ..geo.pip import segments_cross
    a0 = p
    a1 = np.roll(p, -1, axis=0)
    if n <= max_check:
        # all non-adjacent segment pairs in ONE broadcast call (the
        # former per-i Python loop dominated low-zoom shard encode):
        # triu k=2 minus the wrap-adjacent (0, n-1) pair
        i, j = np.triu_indices(n, k=2)
    else:
        i, j = _grid_candidate_pairs(a0, a1, n, max_pairs)
        if i is None:
            return False
    keep = ~(((i == 0) & (j == n - 1)) | (j == i + 1))
    i, j = i[keep], j[keep]
    if len(i) == 0:
        return False
    hit = np.asarray(segments_cross(
        a0[i, 0], a0[i, 1], a1[i, 0], a1[i, 1],
        a0[j, 0], a0[j, 1], a1[j, 0], a1[j, 1]))
    if not hit.any():
        return False
    # segments_cross counts touches; contacts that are exactly a shared
    # vertex between the two segments are fine
    hi, hj = i[hit], j[hit]
    shared = (np.all(a0[hi] == a0[hj], axis=1)
              | np.all(a0[hi] == a1[hj], axis=1)
              | np.all(a1[hi] == a0[hj], axis=1)
              | np.all(a1[hi] == a1[hj], axis=1))
    return bool((~shared).any())


def _grid_candidate_pairs(a0: np.ndarray, a1: np.ndarray, n: int,
                          max_pairs: int):
    """Candidate non-adjacent segment pairs sharing a grid cell.

    Cell size = bbox diagonal scale / √n, so uniformly distributed
    segments land ~O(1) per cell.  Each segment registers in every
    cell its own bbox covers (conservative superset of the cells it
    touches).  Returns (i, j) index arrays with i < j, deduplicated,
    or (None, None) when the pair count blows past ``max_pairs``."""
    lo = np.minimum(a0, a1)
    hi = np.maximum(a0, a1)
    span = float(max(hi[:, 0].max() - lo[:, 0].min(),
                     hi[:, 1].max() - lo[:, 1].min(), 1e-9))
    cell = span / max(np.sqrt(n), 1.0)
    cx0 = np.floor(lo[:, 0] / cell).astype(np.int64)
    cy0 = np.floor(lo[:, 1] / cell).astype(np.int64)
    cx1 = np.floor(hi[:, 0] / cell).astype(np.int64)
    cy1 = np.floor(hi[:, 1] / cell).astype(np.int64)
    buckets: dict = {}
    # cap REGISTRATIONS too, not just pairs: a long diagonal segment's
    # bbox can cover O(n) cells, making registration itself O(n²)
    # before the pair cap could ever fire
    max_reg = 32 * n
    n_reg = 0
    for s in range(n):
        n_reg += (cx1[s] - cx0[s] + 1) * (cy1[s] - cy0[s] + 1)
        if n_reg > max_reg:
            return None, None
        for gx in range(cx0[s], cx1[s] + 1):
            for gy in range(cy0[s], cy1[s] + 1):
                buckets.setdefault((gx, gy), []).append(s)
    pairs = set()
    for members in buckets.values():
        m = len(members)
        if m < 2:
            continue
        for ii in range(m):
            si = members[ii]
            for jj in range(ii + 1, m):
                sj = members[jj]
                pairs.add((si, sj) if si < sj else (sj, si))
        if len(pairs) > max_pairs:
            return None, None
    if not pairs:
        return (np.empty(0, dtype=np.int64),) * 2
    arr = np.asarray(sorted(pairs), dtype=np.int64)
    return arr[:, 0], arr[:, 1]


def reorder_multilinestring(parts: list, max_pts: int = 6000) -> list:
    """Link linestring parts end-to-start where endpoints coincide
    (ReorderMultiLinestring, /root/reference/src/tile_worker.cpp:29-77;
    size-capped like the reference). Greedy, deterministic (input order
    is canonical)."""
    if sum(len(p) for p in parts) > max_pts:
        return parts
    segs = [np.asarray(p) for p in parts]
    out = []
    while segs:
        cur = segs.pop(0)
        linked = True
        while linked:
            linked = False
            for i, sgm in enumerate(segs):
                if (sgm[0] == cur[-1]).all():
                    cur = np.vstack([cur, sgm[1:]])
                elif (sgm[-1] == cur[0]).all():
                    cur = np.vstack([sgm, cur[1:]])
                else:
                    continue
                segs.pop(i)
                linked = True
                break
        out.append(cur)
    return out


def _attrs_of(name, attrs_json_str):
    """MVT attributes: the canonical name plus UDF-supplied extras
    (sorted-key JSON → deterministic key order)."""
    attrs = {"name": name}
    if attrs_json_str:
        import json
        attrs.update(json.loads(attrs_json_str))
    return attrs


RING_CONVEX, RING_CONCAVE, RING_SELFX = 0, 1, 2


def _ring_class(ring: np.ndarray, memo: dict | None) -> int:
    """Classify a SOURCE ring once per shard (memo by array identity —
    the parsed-WKB cache reuses the same objects across every tile and
    zoom the feature lands in, so this runs once per feature-ring, not
    once per feature-tile-zoom; measured 45% of sustained throughput):
    convex rings stay simple under box clipping (skip the repair ladder
    entirely), simple concave rings only need it when actually clipped
    (Sutherland–Hodgman can introduce crossings), self-intersecting
    rings always dissolve.

    Classification runs in PROJECTED (lon, latp) space, not lon/lat:
    the per-zoom tile-grid transform is an affine map of (lon, latp),
    and crossings/convexity are affine-invariant — while a ring that is
    simple in lon/lat can self-cross once latitudes warp (review-found
    with a wide-latitude quad)."""
    if memo is None:
        return RING_SELFX  # no memo → always run the full ladder
    key = id(ring)
    c = memo.get(key)
    if c is None:
        w = np.stack([ring[:, 0], tm.lat2latp(ring[:, 1])], axis=1)
        if _dissolve._is_convex(w):
            c = RING_CONVEX
        elif _ring_self_intersects(w):
            c = RING_SELFX
        else:
            c = RING_CONCAVE
        memo[key] = c
    return c


def _geom_parts(gt, payload, z: int, x: int, y: int, extent: int,
                margin: float, ldef, tol: float = -1.0,
                ring_class_memo: dict | None = None) -> tuple:
    # tol = effective simplify tolerance in tile units at this (z, y)
    # (config.simplify_tolerance: simplify_length / simplify_ratio
    # aware); -1 = compute from ldef (direct-call convenience)
    if tol < 0:
        tol = simplify_tolerance(ldef, z, y, extent)
    def to_grid(coords: np.ndarray) -> np.ndarray:
        u = (tm.lon2tilex_f(coords[:, 0], z) - x) * extent
        v = (tm.lat2tiley_f(coords[:, 1], z) - y) * extent
        return np.stack([u, v], axis=1)

    def inside(g: np.ndarray) -> bool:
        return bool((g[:, 0] >= -margin).all() and (g[:, 0] <= extent + margin).all()
                    and (g[:, 1] >= -margin).all() and (g[:, 1] <= extent + margin).all())

    if gt in (_wkb.LINESTRING, _wkb.MULTILINESTRING):
        lines = [payload] if gt == _wkb.LINESTRING else payload
        parts = []
        for line in lines:
            g = to_grid(line)
            runs = [g] if inside(g) else _clip.clip_linestring(
                g, -margin, -margin, extent + margin, extent + margin)
            for run in runs:
                if tol > 0:
                    run = _simplify_part(run, ldef, tol)
                q = _quantize(run)
                if len(q) >= 2:
                    parts.append(q)
        return parts, mvt.GEOM_LINESTRING

    polys = [payload] if gt == _wkb.POLYGON else payload
    parts = []
    for rings in polys:
        for i, ring in enumerate(rings):
            cls = _ring_class(ring, ring_class_memo)
            g = to_grid(ring)
            was_inside = inside(g)
            c0 = g if was_inside else _clip.clip_ring(
                g, -margin, -margin, extent + margin, extent + margin)
            if c0 is None:
                continue
            # repair ladder (reference tile_data.cpp:380-426 +
            # geom.cpp:140-224): dissolve a self-intersecting ring into
            # simple lobes, accept only if ≥50% of the shoelace area
            # survives, else keep the invalid ring (never drop). The
            # per-feature ring class gates the O(n²) work: convex rings
            # cannot self-intersect under box clipping, simple concave
            # rings only after an actual clip.
            if cls == RING_SELFX or (cls == RING_CONCAVE
                                     and not was_inside):
                ring_parts = _dissolve.repair_ring(c0,
                                                   _ring_self_intersects)
            else:
                ring_parts = (c0,)
            for c in ring_parts:
                q = _finish_ring(c, i, z, ldef, tol, ring_cls=cls)
                if q is not None:
                    parts.append(q)
    return parts, mvt.GEOM_POLYGON


def _finish_ring(c: np.ndarray, i: int, z: int, ldef, tol: float = -1.0,
                 ring_cls: int = RING_SELFX) -> np.ndarray | None:
    """Simplify / size-filter / quantize / orient one (simple) ring;
    ``i`` is the source ring's exterior(0)/hole(>0) role."""
    if tol < 0:
        tol = simplify_tolerance(ldef, z, 0, 4096)
    if tol > 0:
        if ldef.simplify_algorithm == "buildings":
            c2 = _simplify.simplify_buildings(c, tol)
        else:
            c2 = _simplify.simplify_ring(
                c, tol, algorithm=ldef.simplify_algorithm)
        if c2 is None:
            return None
        # self-intersection guard (the reference's DP refuses removals
        # that create crossings, src/geom.cpp:17-138; here: reject the
        # simplified ring and keep the original if it crosses itself).
        # Gated: a convex source ring stays convex under box clip + DP
        # (cannot self-cross), and an output identical to its input
        # needs no re-test — the guard only runs where a removal could
        # have introduced a crossing (hot-path win: this was the last
        # unconditional O(n²) test per ring per tile).
        if ring_cls == RING_CONVEX or len(c2) == len(c):
            c = c2
        else:
            c = c2 if not _ring_self_intersects(c2) else c
    if ldef.filter_below and z < ldef.filter_below \
            and abs(_clip.ring_area(c)) < ldef.filter_area:
        return None  # RemovePartsBelowSize (tile_worker.cpp:79-96)
    q = _quantize(c, close=True)
    if len(q) < 4:
        return None
    area = _clip.ring_area(q.astype(np.float64))
    if (area > 0) != (i > 0):  # winding: ext vs hole
        q = q[::-1]
    return q


def _simplify_part(run: np.ndarray, ldef, tol: float) -> np.ndarray:
    if ldef.simplify_algorithm == "visvalingam":
        return _simplify.visvalingam(run, tol ** 2)
    return _simplify.douglas_peucker(run, tol)


def _quantize(coords: np.ndarray, close: bool = False) -> np.ndarray:
    q = np.round(coords).astype(np.int64)
    keep = np.ones(len(q), dtype=bool)
    keep[1:] = np.abs(np.diff(q, axis=0)).sum(axis=1) > 0
    q = q[keep]
    # remove_spikes (reference geom cleanups, src/tile_worker.cpp:239-244):
    # collapse A-B-A zero-width spikes created by quantization
    while len(q) >= 3:
        spike = np.zeros(len(q), dtype=bool)
        spike[1:-1] = (q[:-2] == q[2:]).all(axis=1)
        if not spike.any():
            break
        q = q[~spike]
        keep = np.ones(len(q), dtype=bool)
        keep[1:] = np.abs(np.diff(q, axis=0)).sum(axis=1) > 0
        q = q[keep]
    if close and len(q) >= 3 and (q[0] != q[-1]).any():
        q = np.vstack([q, q[:1]])
    return q


def _dedup_features(t: pa.Table) -> pa.Table:
    """Within one shard each fuid appears once by construction; if a
    caller hands merged/legacy rows, collapse duplicates by merging
    their base_tiles (salt-merge semantics)."""
    fuids = t["fuid"].to_numpy(zero_copy_only=False)
    uniq, first, cnt = np.unique(fuids, return_index=True, return_counts=True)
    if len(uniq) == t.num_rows:
        return t
    import pandas as pd
    df = t.to_pandas()
    agg = {c: "first" for c in df.columns if c not in ("fuid", "base_tiles")}
    merged = (df.groupby("fuid", as_index=False, sort=True)
              .agg({**agg,
                    "base_tiles": lambda ts: np.unique(np.concatenate(
                        [np.asarray(v, dtype=np.int64) for v in ts]))}))
    merged["base_tiles"] = merged["base_tiles"].map(lambda a: a.tolist())
    return pa.Table.from_pandas(merged[ [c for c in df.columns] ],
                                preserve_index=False)


def _empty_tiles() -> pa.Table:
    return pa.table({f.name: pa.array([], f.type) for f in TILE_SCHEMA},
                    schema=TILE_SCHEMA)
