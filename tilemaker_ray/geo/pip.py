"""Point-in-polygon, spatial index, and kNN kernels (pure numpy).

This replaces the reference's spatial-query machinery — per-layer boost
R-tree plus two-level z6/z15 bitmap prefilter
(/root/reference/src/shp_mem_tiles.cpp:21-127,199-228) and the exact
boost::geometry predicates behind Lua ``Intersects`` / ``CoveredBy``
(/root/reference/src/osm_lua_processing.cpp:409-502) — with a
share-nothing design: a :class:`PolygonIndex` is built once per join
actor from the broadcast polygon table (uniform grid buckets standing
in for the R-tree; hex-cell covers standing in for the bitmap), and all
exact tests are vectorized even-odd ray casts.

Boundary semantics: even-odd crossing with half-open edges — a point
exactly on an edge may land either side at float precision, matching
the reference's "don't rely on exact-boundary points" posture (its
fixtures avoid them; ours do too, FIXTURES.md §5).
"""

from __future__ import annotations

import numpy as np

from . import wkb as _wkb


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Even-odd crossing test of N points against one ring.

    Vectorized over points × edges: O(N·E) float ops, no Python loop
    over points.
    """
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    # edge straddles the horizontal ray at py (half-open to dodge
    # double-counting at shared vertices)
    straddle = (y0 <= py[:, :]) != (y1 <= py[:, :])
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / np.where(y1 == y0, 1.0, y1 - y0)
    cross = straddle & (px < xint)
    return (cross.sum(axis=1) % 2).astype(bool)


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings: list) -> np.ndarray:
    """Even-odd over all rings (exterior + holes) — holes fall out of
    the parity automatically."""
    inside = np.zeros(len(px), dtype=np.int64)
    for ring in rings:
        inside += points_in_ring(px, py, ring).astype(np.int64)
    return (inside % 2).astype(bool)


def segments_cross(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) -> np.ndarray:
    """Proper/improper intersection test for two batches of segments
    (broadcastable shapes). Returns boolean array."""
    def orient(ox, oy, px_, py_, qx, qy):
        return (px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox)

    d1 = orient(ax0, ay0, ax1, ay1, bx0, by0)
    d2 = orient(ax0, ay0, ax1, ay1, bx1, by1)
    d3 = orient(bx0, by0, bx1, by1, ax0, ay0)
    d4 = orient(bx0, by0, bx1, by1, ax1, ay1)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
    # collinear-touching cases: endpoint on the other segment
    def on_seg(ox, oy, px_, py_, qx, qy, d):
        return (d == 0) & (np.minimum(ox, px_) <= qx) & (qx <= np.maximum(ox, px_)) \
               & (np.minimum(oy, py_) <= qy) & (qy <= np.maximum(oy, py_))
    touch = (on_seg(ax0, ay0, ax1, ay1, bx0, by0, d1)
             | on_seg(ax0, ay0, ax1, ay1, bx1, by1, d2)
             | on_seg(bx0, by0, bx1, by1, ax0, ay0, d3)
             | on_seg(bx0, by0, bx1, by1, ax1, ay1, d4))
    return proper | touch


def line_crosses_rings(coords: np.ndarray, rings: list) -> bool:
    """Does any segment of ``coords`` intersect any ring edge?"""
    ax0, ay0 = coords[:-1, 0], coords[:-1, 1]
    ax1, ay1 = coords[1:, 0], coords[1:, 1]
    for ring in rings:
        bx0, by0 = ring[:-1, 0], ring[:-1, 1]
        bx1, by1 = ring[1:, 0], ring[1:, 1]
        hit = segments_cross(ax0[:, None], ay0[:, None], ax1[:, None], ay1[:, None],
                             bx0[None, :], by0[None, :], bx1[None, :], by1[None, :])
        if hit.any():
            return True
    return False


class PolygonIndex:
    """Immutable spatial index over a small polygon layer.

    Built ONCE per join actor (``__init__`` of the actor-pool callable)
    from the broadcast polygon table; queried per batch. Stand-in for
    ShpMemTiles' R-tree + bitmap (/root/reference/src/shp_mem_tiles.cpp:129-228):
    a uniform grid over the layer's bbox buckets polygon ids by the grid
    cells their bbox touches, so a point probes exactly one bucket.
    """

    def __init__(self, wkbs, names=None, attrs=None, grid: int = 64):
        self.rings = []      # per polygon: list of (N,2) rings
        self.bboxes = np.empty((len(wkbs), 4), dtype=np.float64)
        self.names = list(names) if names is not None else [str(i) for i in range(len(wkbs))]
        self.attrs = attrs
        for i, buf in enumerate(wkbs):
            rings, _ = _wkb.wkb_rings(bytes(buf))
            self.rings.append(rings)
            ext = np.vstack([r for r in rings])
            self.bboxes[i] = (ext[:, 0].min(), ext[:, 1].min(),
                              ext[:, 0].max(), ext[:, 1].max())
        if len(wkbs):
            self.x0 = float(self.bboxes[:, 0].min())
            self.y0 = float(self.bboxes[:, 1].min())
            self.x1 = float(self.bboxes[:, 2].max())
            self.y1 = float(self.bboxes[:, 3].max())
        else:
            self.x0 = self.y0 = 0.0
            self.x1 = self.y1 = 1.0
        self.grid = grid
        self.gw = max(self.x1 - self.x0, 1e-12) / grid
        self.gh = max(self.y1 - self.y0, 1e-12) / grid
        # bucket -> array of polygon ids
        buckets: dict[int, list] = {}
        for i in range(len(wkbs)):
            bx0, by0, bx1, by1 = self.bboxes[i]
            cx0, cy0 = self._cell(bx0, by0)
            cx1, cy1 = self._cell(bx1, by1)
            for cy in range(cy0, cy1 + 1):
                for cx in range(cx0, cx1 + 1):
                    buckets.setdefault(cy * grid + cx, []).append(i)
        self.buckets = {k: np.asarray(v, dtype=np.int64) for k, v in buckets.items()}

    def _cell(self, x, y):
        # pure-python clamps: numpy scalar clip cost ~7µs/call and this
        # runs 2× per bbox_candidates probe
        cx = int((x - self.x0) / self.gw)
        cy = int((y - self.y0) / self.gh)
        g = self.grid - 1
        return (0 if cx < 0 else (g if cx > g else cx),
                0 if cy < 0 else (g if cy > g else cy))

    def _cells_of_points(self, px, py):
        cx = np.clip(((px - self.x0) / self.gw).astype(np.int64), 0, self.grid - 1)
        cy = np.clip(((py - self.y0) / self.gh).astype(np.int64), 0, self.grid - 1)
        return cy * self.grid + cx

    def candidates(self, px: np.ndarray, py: np.ndarray):
        """Grid-prefiltered candidate (point_idx, polygon_idx) pairs with
        a per-pair bbox check — the analog of R-tree box query before the
        exact predicate (/root/reference/src/shp_mem_tiles.cpp:21-46)."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        outside = (px < self.x0) | (px > self.x1) | (py < self.y0) | (py > self.y1)
        keys = self._cells_of_points(px, py)
        keys[outside] = -1
        order = np.argsort(keys, kind="stable")
        pt_idx_all, poly_idx_all = [], []
        sorted_keys = keys[order]
        bounds = np.flatnonzero(np.diff(sorted_keys)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(keys)]])
        for s, e in zip(starts, ends):
            k = sorted_keys[s]
            if k < 0:
                continue
            polys = self.buckets.get(int(k))
            if polys is None:
                continue
            pts = order[s:e]
            # bbox refine, vectorized over (pts × polys)
            bb = self.bboxes[polys]
            ok = ((px[pts][:, None] >= bb[None, :, 0]) & (px[pts][:, None] <= bb[None, :, 2])
                  & (py[pts][:, None] >= bb[None, :, 1]) & (py[pts][:, None] <= bb[None, :, 3]))
            pi, qi = np.nonzero(ok)
            pt_idx_all.append(pts[pi])
            poly_idx_all.append(polys[qi])
        if not pt_idx_all:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
        return np.concatenate(pt_idx_all), np.concatenate(poly_idx_all)

    def contains_pairs(self, px: np.ndarray, py: np.ndarray):
        """Exact PIP join: (point_idx, polygon_idx) pairs where the point
        is inside the polygon. Candidates grouped by polygon so each
        polygon's edges are tested against all its candidate points in
        one vectorized call."""
        pts, polys = self.candidates(px, py)
        if len(pts) == 0:
            return pts, polys
        order = np.argsort(polys, kind="stable")
        pts, polys = pts[order], polys[order]
        keep = np.zeros(len(pts), dtype=bool)
        bounds = np.flatnonzero(np.diff(polys)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(polys)]])
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        for s, e in zip(starts, ends):
            poly = polys[s]
            sel = pts[s:e]
            keep[s:e] = points_in_polygon(px[sel], py[sel], self.rings[poly])
        return pts[keep], polys[keep]

    def line_intersects(self, coords: np.ndarray, poly_idx: int) -> bool:
        """Linestring ∩ polygon (Intersects semantics): any vertex
        inside, or any segment crossing a ring edge."""
        rings = self.rings[poly_idx]
        if points_in_polygon(coords[:, 0], coords[:, 1], rings).any():
            return True
        return line_crosses_rings(coords, rings)

    def bbox_candidates(self, xmin, ymin, xmax, ymax) -> np.ndarray:
        """Polygon ids whose bbox overlaps the query bbox (grid walk +
        bbox refine) — candidate generation for non-point geometries."""
        cx0, cy0 = self._cell(xmin, ymin)
        cx1, cy1 = self._cell(xmax, ymax)
        if xmax < self.x0 or xmin > self.x1 or ymax < self.y0 or ymin > self.y1:
            return np.empty(0, dtype=np.int64)
        ids = []
        for cy in range(cy0, cy1 + 1):
            for cx in range(cx0, cx1 + 1):
                b = self.buckets.get(cy * self.grid + cx)
                if b is not None:
                    ids.append(b)
        if not ids:
            return np.empty(0, dtype=np.int64)
        cand = np.unique(np.concatenate(ids))
        bb = self.bboxes[cand]
        ok = (bb[:, 0] <= xmax) & (bb[:, 2] >= xmin) & (bb[:, 1] <= ymax) & (bb[:, 3] >= ymin)
        return cand[ok]

    def area_fraction(self, rings: list, poly_idx: int) -> float:
        """AreaIntersecting analog
        (/root/reference/src/osm_lua_processing.cpp:488-502): fraction
        of the subject polygon's area inside this layer polygon. Exact
        for ANY layer polygon: Sutherland–Hodgman on the convex fast
        path, Green's-theorem general clipping
        (clip.polygon_intersection_area) for concave — including layer
        polygons with holes."""
        from . import clip as _clip
        subject = rings[0]
        a_subj = sum(_clip.ring_area(r)
                     for r in _clip._normalize_rings(rings))
        if a_subj <= 0:
            return 0.0
        if self._is_convex(poly_idx) and len(self.rings[poly_idx]) == 1 \
                and len(rings) == 1:
            inter = _clip.intersection_area_convex(subject,
                                                   self.rings[poly_idx][0])
        else:
            inter = _clip.polygon_intersection_area(rings,
                                                    self.rings[poly_idx])
        return min(1.0, inter / a_subj)

    def _is_convex(self, poly_idx: int) -> bool:
        cached = getattr(self, "_convex_cache", None)
        if cached is None:
            cached = self._convex_cache = {}
        v = cached.get(poly_idx)
        if v is None:
            ring = self.rings[poly_idx][0]
            p = ring[:-1] if np.array_equal(ring[0], ring[-1]) else ring
            nxt = np.roll(p, -1, axis=0)
            nxt2 = np.roll(p, -2, axis=0)
            cross = ((nxt[:, 0] - p[:, 0]) * (nxt2[:, 1] - nxt[:, 1])
                     - (nxt[:, 1] - p[:, 1]) * (nxt2[:, 0] - nxt[:, 0]))
            v = bool((cross >= -1e-12).all() or (cross <= 1e-12).all())
            v = v and len(self.rings[poly_idx]) == 1  # no holes
            cached[poly_idx] = v
        return v

    def polygon_intersects(self, rings: list, poly_idx: int) -> bool:
        """Polygon ∩ polygon (Intersects/AreaIntersecting candidate
        semantics): any vertex of A in B, any vertex of B in A, or any
        edge crossing."""
        mine = self.rings[poly_idx]
        for r in rings:
            if points_in_polygon(r[:, 0], r[:, 1], mine).any():
                return True
            if line_crosses_rings(r, mine):
                return True
        allpts = np.vstack(mine)
        return points_in_polygon(allpts[:, 0], allpts[:, 1], rings).any()

    def covered_by(self, coords: np.ndarray, poly_idx: int) -> bool:
        """CoveredBy semantics: all vertices inside and no edge crossing
        (/root/reference/src/osm_lua_processing.cpp:467-502 analog)."""
        rings = self.rings[poly_idx]
        if not points_in_polygon(coords[:, 0], coords[:, 1], rings).all():
            return False
        return not line_crosses_rings(coords, rings)


def knn_brute(px: np.ndarray, py: np.ndarray, cx: np.ndarray, cy: np.ndarray,
              k: int):
    """Brute-force k-nearest centers for each point (squared planar
    distance; ties broken by center index — deterministic).

    Returns (indices (N,k) int64, sq_dists (N,k) float64). This is the
    baseline kNN the north rule asks for; batch it inside map_batches
    against a broadcast center matrix for scale.
    """
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    d2 = (px - cx[None, :]) ** 2 + (py - cy[None, :]) ** 2
    k = min(k, d2.shape[1])
    # argpartition then stable ordering by (distance, index) for determinism
    part = np.argpartition(d2, k - 1, axis=1)[:, :k]
    pd = np.take_along_axis(d2, part, axis=1)
    order = np.lexsort((part, pd), axis=1)
    idx = np.take_along_axis(part, order, axis=1)
    return idx.astype(np.int64), np.take_along_axis(pd, order, axis=1)
