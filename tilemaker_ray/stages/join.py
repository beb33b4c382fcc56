"""Spatial join stages: PIP (point/line/polygon ⋈ polygon layer) + kNN.

This is the engine's version of tilemaker's spatial-query path — Lua
``Intersects``/``FindIntersecting``/``CoveredBy``/``FindCovering``
(/root/reference/src/osm_lua_processing.cpp:409-502) backed by
ShpMemTiles' R-tree + bitmap prefilter
(/root/reference/src/shp_mem_tiles.cpp:21-127) — restructured for Ray:

- the polygon layer is the SMALL side: built once on the driver,
  broadcast with ``ray.put``, never shuffled;
- each actor builds a :class:`PolygonIndex` + hex-cell cover ONCE in
  ``__init__`` (the reference builds its R-tree once at load,
  shp_mem_tiles.cpp:129-228) and reuses it for every batch;
- the hex-cell cover plays the z6/z15 bitmap's role: a vectorized
  np.isin drop of batch rows that can't possibly match, before any
  exact test;
- exact predicates are the vectorized even-odd kernels in geo.pip.

Scale note (100 TB): broadcast-side size is bounded (admin/landuse
layers are ~10⁴-10⁶ small polygons); the probe side streams through
the actor pool with backpressure — no all-to-all shuffle anywhere in
the join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG
from ..geo import pip as _pip
from ..geo import tilemath as tm
from ..geo import wkb as _wkb


def _resolve(table_or_ref):
    """Accept a pyarrow Table or a ray ObjectRef of one."""
    try:
        import ray
        if isinstance(table_or_ref, ray.ObjectRef):
            return ray.get(table_or_ref)
    except ImportError:
        pass
    return table_or_ref


def build_polygon_state(poly_table: pa.Table, hex_res: int):
    """(PolygonIndex, sorted hex-cover cells, per-cell poly ids). Called
    in actor __init__."""
    wkbs = poly_table["geom_wkb"].to_pylist()
    names = poly_table["name"].to_pylist()
    classes = poly_table["class"].to_pylist()
    idx = _pip.PolygonIndex(wkbs, names=names)
    cover_cells = []
    for buf in wkbs:
        x0, y0, x1, y1 = _wkb.wkb_bbox(buf)
        cover_cells.append(tm.hex_cells_in_bbox(x0, y0, x1, y1, hex_res))
    all_cells = (np.unique(np.concatenate(cover_cells)) if cover_cells
                 else np.empty(0, dtype=np.int64))
    return idx, all_cells, classes


GEO_PAD_CELLS = 2   # small-geometry prefilter pad, in hex circumradii
GEO_RES_OFFSET = 3  # geometry prefilter runs 3 resolutions coarser than
                    # the point prefilter: ~64x fewer cover cells to
                    # build per worker, pad stays >> typical geometry


def geo_cover_res(hex_res: int) -> int:
    return max(2, hex_res - GEO_RES_OFFSET)


def build_geo_cover(poly_table: pa.Table, hex_res: int) -> set:
    """Expanded hex cover for prefiltering SMALL non-point geometries:
    cells within each polygon's bbox + pad, where pad = GEO_PAD_CELLS
    hex radii at the (coarser) geometry-cover resolution. Sound for
    geometries whose bbox fits within pad: an intersecting geometry's
    bbox-center cell is then always in this cover (center within pad of
    the intersection point, cell center within one radius of it)."""
    res = geo_cover_res(hex_res)
    pad = tm.hex_radius(res) * GEO_PAD_CELLS
    cells: set = set()
    for buf in poly_table["geom_wkb"].to_pylist():
        x0, y0, x1, y1 = _wkb.wkb_bbox(buf)
        cells.update(tm.hex_cells_in_bbox(x0 - pad, max(y0 - pad, -85.05),
                                          x1 + pad, min(y1 + pad, 85.05),
                                          res).tolist())
    return cells


def _normalize_geom(buf: bytes):
    """WKB → (lines, polys, all_coords): lines = list of (N,2) arrays,
    polys = list of ring-lists; handles single and multi geometries
    uniformly (multi probes previously crashed on np.vstack of ragged
    nested payloads)."""
    gt, payload = _wkb.parse_wkb(buf)
    lines: list = []
    polys: list = []
    if gt == _wkb.LINESTRING:
        lines = [payload]
    elif gt == _wkb.MULTILINESTRING:
        lines = list(payload)
    elif gt == _wkb.POLYGON:
        polys = [payload]
    elif gt == _wkb.MULTIPOLYGON:
        polys = list(payload)
    elif gt in (_wkb.POINT,):
        lines = [payload.reshape(1, 2)]
    coords = np.vstack([c for c in lines]
                       + [r for rings in polys for r in rings])
    return lines, polys, coords


def _bulk_wkb_bboxes(wkbs: list) -> np.ndarray | None:
    """Vectorized bboxes for a batch of UNIFORM single-ring polygon
    WKBs (generated probe footprints/squares share one layout): one
    frombuffer + reshape + min/max instead of a per-row parse
    (~20 µs/row → ~0.2 µs/row). Returns (n, 4) [xmin, ymin, xmax,
    ymax] or None when the batch isn't uniform."""
    n = len(wkbs)
    if n == 0:
        return None
    first = wkbs[0]
    if len(first) < 13 or first[:5] != b"\x01\x03\x00\x00\x00":
        return None
    if int.from_bytes(first[5:9], "little") != 1:
        return None
    npts = int.from_bytes(first[9:13], "little")
    L = 13 + 16 * npts
    hdr = first[:13]
    if len(first) != L or any(len(b) != L or b[:13] != hdr for b in wkbs):
        return None
    flat = np.frombuffer(b"".join(wkbs), dtype=np.uint8).reshape(n, L)
    coords = np.ascontiguousarray(flat[:, 13:]).view("<f8") \
        .reshape(n, npts, 2)
    return np.stack([coords[:, :, 0].min(axis=1),
                     coords[:, :, 1].min(axis=1),
                     coords[:, :, 0].max(axis=1),
                     coords[:, :, 1].max(axis=1)], axis=1)


class _GeomTester:
    """Mixin: exact predicate over normalized (lines, polys)."""

    def _geom_prefilter_bulk(self, bbs: np.ndarray):
        """Vectorized version of _geom_prefilter_pass over an (n, 4)
        bbox array → boolean pass mask. Same decisions by construction:
        both paths now delegate to tm.lat2latp + tm.hex_cell_xy."""
        res = geo_cover_res(self.hex_res)
        R = tm.hex_radius(res)
        pad = R * GEO_PAD_CELLS
        y0 = tm.lat2latp(np.clip(bbs[:, 1], -tm.MAX_LAT, tm.MAX_LAT))
        y1 = tm.lat2latp(np.clip(bbs[:, 3], -tm.MAX_LAT, tm.MAX_LAT))
        small = ((bbs[:, 2] - bbs[:, 0]) <= pad) & ((y1 - y0) <= pad)
        passes = np.ones(len(bbs), dtype=bool)
        idx = np.flatnonzero(small)
        if len(idx):
            cells = tm.hex_cell_xy((bbs[idx, 0] + bbs[idx, 2]) / 2.0,
                                   (y0[idx] + y1[idx]) / 2.0, res)
            ok = np.fromiter((int(c) in self.geo_cover for c in cells),
                             dtype=bool, count=len(cells))
            passes[idx] = ok
        return passes

    def _geom_prefilter_pass(self, buf: bytes):
        """Cheap drop test for non-point geometries: a SMALL geometry
        (bbox within the pad) whose bbox-center cell is outside the
        expanded cover cannot intersect any polygon. Large geometries
        always pass (they go to the bbox-candidates walk). Returns the
        geometry bbox when passing (reused by the caller), else None.
        Rare fallback for non-uniform probe batches — uniform batches
        take the vectorized _geom_prefilter_bulk; both delegate the
        cell math to tm.hex_cell_xy so they cannot drift."""
        bb = _wkb.wkb_bbox(buf)
        res = geo_cover_res(self.hex_res)
        R = tm.hex_radius(res)
        pad = R * GEO_PAD_CELLS
        yy = tm.lat2latp(np.clip(np.asarray([bb[1], bb[3]]),
                                 -tm.MAX_LAT, tm.MAX_LAT))
        y0, y1 = float(yy[0]), float(yy[1])
        if (bb[2] - bb[0]) <= pad and (y1 - y0) <= pad:
            cell = int(tm.hex_cell_xy(
                np.asarray([(bb[0] + bb[2]) / 2.0]),
                np.asarray([(y0 + y1) / 2.0]), res)[0])
            if cell not in self.geo_cover:
                return None
        return bb

    def _test_geom(self, lines, polys, coords, p: int) -> bool:
        if self.predicate == "covered_by":
            return self.index.covered_by(coords, p)
        if self.predicate == "area_intersects":
            # AreaIntersecting: majority of the subject's total area
            # inside (osm_lua_processing.cpp:488-502); multipolygon =
            # area-weighted over members
            if not polys:
                return False
            from ..geo import clip as _clip
            tot = inter = 0.0
            for rings in polys:
                ext = rings[0]
                closed = ext if np.array_equal(ext[0], ext[-1]) \
                    else np.vstack([ext, ext[:1]])
                a = abs(_clip.ring_area(closed))
                tot += a
                inter += a * self.index.area_fraction(rings, p)
            return tot > 0 and inter / tot > 0.5
        for line in lines:
            if self.index.line_intersects(line, p):
                return True
        for rings in polys:
            if self.index.polygon_intersects(rings, p):
                return True
        return False



class PIPJoinPairs(_GeomTester):
    """FindIntersecting analog — flat-map each feature to its matching
    polygons: output = feature columns + (polygon_name, polygon_class).

    ``predicate``: 'intersects' (default) or 'covered_by'
    (FindCovering). Points use the exact PIP kernel; lines/polygons use
    the vertex+edge-crossing tests on bbox candidates.
    """

    def __init__(self, polygons, hex_res: int = DEFAULT_CONFIG.hex_res,
                 predicate: str = "intersects"):
        poly = _resolve(polygons)
        self.index, self.cover, self.classes = build_polygon_state(poly, hex_res)
        self.geo_cover = build_geo_cover(poly, hex_res)
        self.hex_res = hex_res
        self.predicate = predicate

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0 or len(self.index.rings) == 0:
            return _empty_pairs(batch)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        kinds = (batch["kind"].to_numpy(zero_copy_only=False)
                 if "kind" in batch.column_names else np.ones(n, dtype=np.int8))
        # bitmap-analog prefilter — POINTS ONLY: a line/polygon's
        # representative vertex can sit far from the part that
        # intersects, so non-point rows always reach the bbox test
        if "h3_cell" in batch.column_names:
            cells = batch["h3_cell"].to_numpy(zero_copy_only=False)
        else:
            cells = tm.hex_cell(lon, lat, self.hex_res)
        maybe = np.isin(cells, self.cover) | (kinds != 1)
        cand_rows = np.flatnonzero(maybe)
        if len(cand_rows) == 0:
            return _empty_pairs(batch)

        pt_rows = cand_rows[kinds[cand_rows] == 1]
        out_rows, out_polys = [], []
        if len(pt_rows):
            pts, polys = self.index.contains_pairs(lon[pt_rows], lat[pt_rows])
            out_rows.append(pt_rows[pts])
            out_polys.append(polys)
        # non-point geometries: per-candidate exact test
        geo_rows = cand_rows[kinds[cand_rows] != 1]
        if len(geo_rows):
            wkbs = batch["geom_wkb"].take(pa.array(geo_rows)).to_pylist()
            bulk = _bulk_wkb_bboxes(wkbs)
            if bulk is not None:
                passes = self._geom_prefilter_bulk(bulk)
            for i, (row, buf) in enumerate(zip(geo_rows, wkbs)):
                if bulk is not None:
                    if not passes[i]:
                        continue
                    bb = tuple(bulk[i])
                else:
                    bb = self._geom_prefilter_pass(buf)
                    if bb is None:
                        continue
                cands = self.index.bbox_candidates(*bb)
                if len(cands) == 0:
                    continue
                lines, polys_g, coords = _normalize_geom(buf)
                for p in cands:
                    hit = self._test_geom(lines, polys_g, coords, int(p))
                    if hit:
                        out_rows.append(np.array([row]))
                        out_polys.append(np.array([int(p)]))
        if not out_rows:
            return _empty_pairs(batch)
        rows = np.concatenate(out_rows)
        polys = np.concatenate(out_polys)
        order = np.lexsort((polys, rows))  # deterministic output order
        rows, polys = rows[order], polys[order]
        out = batch.take(pa.array(rows))
        names = np.asarray(self.index.names, dtype=object)[polys]
        classes = np.asarray(self.classes, dtype=object)[polys]
        return (out.append_column("polygon_name", pa.array(names, pa.string()))
                   .append_column("polygon_class", pa.array(classes, pa.string())))


def _empty_pairs(batch: pa.Table) -> pa.Table:
    empty = batch.slice(0, 0)
    return (empty.append_column("polygon_name", pa.array([], pa.string()))
                 .append_column("polygon_class", pa.array([], pa.string())))


class PIPTagger(_GeomTester):
    """Intersects/CoveredBy boolean analog — adds ``n_matches`` (int32)
    and ``in_layer`` (bool) columns instead of fanning out rows.
    (Lua ``Intersects(layer)`` returns a boolean,
    osm_lua_processing.cpp:409-423.)"""

    predicate = "intersects"

    def __init__(self, polygons, hex_res: int = DEFAULT_CONFIG.hex_res):
        poly = _resolve(polygons)
        self.index, self.cover, _ = build_polygon_state(poly, hex_res)
        self.geo_cover = build_geo_cover(poly, hex_res)
        self.hex_res = hex_res

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        counts = np.zeros(n, dtype=np.int32)
        if n and len(self.index.rings):
            lon = batch["lon"].to_numpy(zero_copy_only=False)
            lat = batch["lat"].to_numpy(zero_copy_only=False)
            kinds = (batch["kind"].to_numpy(zero_copy_only=False)
                     if "kind" in batch.column_names
                     else np.ones(n, dtype=np.int8))
            cells = (batch["h3_cell"].to_numpy(zero_copy_only=False)
                     if "h3_cell" in batch.column_names
                     else tm.hex_cell(lon, lat, self.hex_res))
            maybe = np.flatnonzero(np.isin(cells, self.cover) & (kinds == 1))
            if len(maybe):
                pts, _polys = self.index.contains_pairs(lon[maybe], lat[maybe])
                np.add.at(counts, maybe[pts], 1)
            # non-point features: test the FULL geometry (the
            # representative-vertex shortcut missed crossing lines)
            geo_rows = np.flatnonzero(kinds != 1)
            if len(geo_rows) and "geom_wkb" in batch.column_names:
                wkbs = batch["geom_wkb"].take(pa.array(geo_rows)).to_pylist()
                bulk = _bulk_wkb_bboxes(wkbs)
                if bulk is not None:
                    passes = self._geom_prefilter_bulk(bulk)
                for i, (row, buf) in enumerate(zip(geo_rows, wkbs)):
                    if bulk is not None:
                        if not passes[i]:
                            continue
                        bb = tuple(bulk[i])
                    else:
                        bb = self._geom_prefilter_pass(buf)
                        if bb is None:
                            continue
                    cands = self.index.bbox_candidates(*bb)
                    if len(cands) == 0:
                        continue
                    lines, polys_g, coords = _normalize_geom(buf)
                    for p in cands:
                        if self._test_geom(lines, polys_g, coords, int(p)):
                            counts[row] += 1
        return (batch.append_column("n_matches", pa.array(counts, pa.int32()))
                     .append_column("in_layer", pa.array(counts > 0, pa.bool_())))


_STATE_CACHE: dict = {}


def make_tagger_fn(poly_ref, hex_res: int = DEFAULT_CONFIG.hex_res):
    """Stateless-task variant of PIPTagger: the polygon index is built
    once per WORKER PROCESS (module-global cache keyed by the broadcast
    ref) instead of once per actor — same amortization, but the stage
    fuses with its neighbors and needs no actor-pool spin-up."""
    key = ("tagger", str(poly_ref), hex_res)

    def tag_batch(batch: pa.Table) -> pa.Table:
        tagger = _STATE_CACHE.get(key)
        if tagger is None:
            tagger = _STATE_CACHE[key] = PIPTagger(poly_ref, hex_res)
        return tagger(batch)

    return tag_batch


def make_pip_pairs_fn(poly_ref, hex_res: int = DEFAULT_CONFIG.hex_res,
                      predicate: str = "intersects"):
    """Stateless-task variant of PIPJoinPairs (worker-global index)."""
    key = ("pairs", str(poly_ref), hex_res, predicate)

    def pip_pairs_batch(batch: pa.Table) -> pa.Table:
        j = _STATE_CACHE.get(key)
        if j is None:
            j = _STATE_CACHE[key] = PIPJoinPairs(poly_ref, hex_res, predicate)
        return j(batch)

    return pip_pairs_batch


def make_knn_fn(centers_ref, k: int = DEFAULT_CONFIG.knn_k):
    """Stateless-task variant of KNNJoin (worker-global centers)."""
    key = ("knn", str(centers_ref), k)

    def knn_batch(batch: pa.Table) -> pa.Table:
        j = _STATE_CACHE.get(key)
        if j is None:
            j = _STATE_CACHE[key] = KNNJoin(centers_ref, k)
        return j(batch)

    return knn_batch


class KNNJoin:
    """k-nearest-neighbor join against a broadcast set of reference
    points (no tilemaker analog — a north-rule requirement). Brute-force
    vectorized distance per batch; ties broken by reference index, so
    output is deterministic.

    Output: input columns + rank (1..k), neighbor_name, neighbor_dist2.
    """

    def __init__(self, centers, k: int = DEFAULT_CONFIG.knn_k,
                 lon_col: str = "lon", lat_col: str = "lat"):
        c = _resolve(centers)
        self.cx = np.asarray(c["lon"].to_pylist() if isinstance(c, pa.Table) else c["lon"],
                             dtype=np.float64)
        self.cy = np.asarray(c["lat"].to_pylist() if isinstance(c, pa.Table) else c["lat"],
                             dtype=np.float64)
        names = c["name"].to_pylist() if isinstance(c, pa.Table) else c["name"]
        self.names = np.asarray(names, dtype=object)
        self.k = k
        self.lon_col, self.lat_col = lon_col, lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0 or len(self.cx) == 0:
            empty = batch.slice(0, 0)
            return (empty.append_column("rank", pa.array([], pa.int32()))
                    .append_column("neighbor_name", pa.array([], pa.string()))
                    .append_column("neighbor_dist2", pa.array([], pa.float64())))
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        idx, d2 = _pip.knn_brute(lon, lat, self.cx, self.cy, self.k)
        k = idx.shape[1]
        rows = np.repeat(np.arange(n), k)
        out = batch.take(pa.array(rows))
        return (out.append_column("rank", pa.array(np.tile(np.arange(1, k + 1), n), pa.int32()))
                .append_column("neighbor_name", pa.array(self.names[idx.ravel()], pa.string()))
                .append_column("neighbor_dist2", pa.array(d2.ravel(), pa.float64())))
