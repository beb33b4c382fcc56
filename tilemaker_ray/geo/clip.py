"""Clipping kernels: Sutherland–Hodgman polygon clip and segment-wise
linestring clip against axis-aligned boxes.

Decision structure mirrors the reference's fast_clip
(/root/reference/src/geom.cpp:296-383) and the linestring keep/split
clip (/root/reference/src/tile_data.cpp:254-293): clip rings
half-plane by half-plane, drop rings that collapse (<4 points), and
split linestrings into the sub-runs inside the box.
"""

from __future__ import annotations

import numpy as np


def clip_ring(ring: np.ndarray, xmin: float, ymin: float, xmax: float,
              ymax: float) -> np.ndarray | None:
    """Sutherland–Hodgman clip of one ring to a box. Returns the clipped
    ring (closed, (N,2)) or None if it collapses (<3 distinct points,
    the reference's ring-collapse drop, src/geom.cpp:334-340)."""
    pts = np.asarray(ring, dtype=np.float64)
    if len(pts) and np.array_equal(pts[0], pts[-1]):
        pts = pts[:-1]
    for axis, bound, keep_leq in ((0, xmin, False), (0, xmax, True),
                                  (1, ymin, False), (1, ymax, True)):
        if len(pts) == 0:
            return None
        cur = pts[:, axis]
        inside = cur <= bound if keep_leq else cur >= bound
        prev = np.roll(inside, 1)
        prev_pts = np.roll(pts, 1, axis=0)
        out = []
        denom = cur - prev_pts[:, axis]
        with np.errstate(divide="ignore", invalid="ignore",
                         over="ignore"):
            t = np.where(denom == 0, 0.0, (bound - prev_pts[:, axis]) / denom)
            # a crossing's parameter is in [0,1] by construction; clamp so
            # degenerate numerics (overflowing deltas at float64 extremes)
            # cannot fling the interpolated point off the segment
            t = np.clip(t, 0.0, 1.0)
            inter = prev_pts + t[:, None] * (pts - prev_pts)
        # the crossing lies exactly on the clip line — pin it (kills the
        # residual drift of the interpolation and any inf on this axis)
        inter[:, axis] = bound
        # vectorized emit: build per-vertex output (crossing point, vertex)
        for i in range(len(pts)):
            if inside[i]:
                if not prev[i]:
                    out.append(inter[i])
                out.append(pts[i])
            elif prev[i]:
                out.append(inter[i])
        pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
    if len(pts) < 3:
        return None
    # dedup consecutive identical points (quantization collapse guard,
    # src/coordinates_geom.cpp:34-48 analog)
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = (np.abs(np.diff(pts, axis=0)).sum(axis=1) > 0)
    pts = pts[keep]
    if len(pts) < 3:
        return None
    return np.vstack([pts, pts[:1]])


def clip_polygon(rings: list, xmin, ymin, xmax, ymax) -> list:
    """Clip all rings of a polygon; dropped rings vanish. Returns list
    (possibly empty)."""
    out = []
    for ring in rings:
        c = clip_ring(ring, xmin, ymin, xmax, ymax)
        if c is not None:
            out.append(c)
    return out


def clip_linestring(coords: np.ndarray, xmin, ymin, xmax, ymax) -> list:
    """Clip a linestring to a box → list of sub-linestrings (each (N,2),
    N≥2). Segment-wise Liang–Barsky parametric clip, vectorized over
    segments; consecutive surviving segments are stitched into runs."""
    p = np.asarray(coords, dtype=np.float64)
    if len(p) < 2:
        return []
    p0, p1 = p[:-1], p[1:]
    d = p1 - p0
    t0 = np.zeros(len(p0))
    t1 = np.ones(len(p0))
    ok = np.ones(len(p0), dtype=bool)
    for axis, lo, hi in ((0, xmin, xmax), (1, ymin, ymax)):
        di = d[:, axis]
        pi = p0[:, axis]
        with np.errstate(divide="ignore", invalid="ignore",
                         over="ignore"):
            tlo = np.where(di != 0, (lo - pi) / np.where(di == 0, 1, di), -np.inf)
            thi = np.where(di != 0, (hi - pi) / np.where(di == 0, 1, di), np.inf)
        tin = np.minimum(tlo, thi)
        tout = np.maximum(tlo, thi)
        # parallel segments fully outside the slab
        ok &= ~((di == 0) & ((pi < lo) | (pi > hi)))
        t0 = np.maximum(t0, np.where(di != 0, tin, 0.0))
        t1 = np.minimum(t1, np.where(di != 0, tout, 1.0))
    ok &= t0 <= t1
    runs = []
    cur = []
    for i in range(len(p0)):
        if not ok[i]:
            if len(cur) >= 2:
                runs.append(np.asarray(cur))
            cur = []
            continue
        a = p0[i] + t0[i] * d[i]
        b = p0[i] + t1[i] * d[i]
        if cur and np.allclose(cur[-1], a):
            cur.append(b)
        else:
            if len(cur) >= 2:
                runs.append(np.asarray(cur))
            cur = [a, b]
    if len(cur) >= 2:
        runs.append(np.asarray(cur))
    return [r for r in runs if len(r) >= 2 and np.abs(np.diff(r, axis=0)).sum() > 0]


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (planar, in coordinate units²)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def clip_ring_convex(subject: np.ndarray, convex: np.ndarray) -> np.ndarray | None:
    """Sutherland–Hodgman clip of ``subject`` against an arbitrary CONVEX
    clip ring (counter-clockwise). Generalizes the box clip; backs the
    AreaIntersecting predicate when the layer polygons are convex
    (reference AreaIntersecting: exact intersection area,
    src/osm_lua_processing.cpp:488-502)."""
    pts = np.asarray(subject, dtype=np.float64)
    if len(pts) and (pts[0] == pts[-1]).all():
        pts = pts[:-1]
    cv = np.asarray(convex, dtype=np.float64)
    if len(cv) and (cv[0] == cv[-1]).all():
        cv = cv[:-1]
    if ring_area(np.vstack([cv, cv[:1]])) < 0:
        cv = cv[::-1]  # ensure CCW so "inside" = left of each edge
    for i in range(len(cv)):
        a, b = cv[i], cv[(i + 1) % len(cv)]
        if len(pts) == 0:
            return None
        ex, ey = b[0] - a[0], b[1] - a[1]
        # signed side: >0 left (inside)
        side = ex * (pts[:, 1] - a[1]) - ey * (pts[:, 0] - a[0])
        inside = side >= 0
        prev = np.roll(inside, 1)
        prev_pts = np.roll(pts, 1, axis=0)
        prev_side = np.roll(side, 1)
        out = []
        for j in range(len(pts)):
            if inside[j]:
                if not prev[j]:
                    t = prev_side[j] / (prev_side[j] - side[j])
                    out.append(prev_pts[j] + t * (pts[j] - prev_pts[j]))
                out.append(pts[j])
            elif prev[j]:
                t = prev_side[j] / (prev_side[j] - side[j])
                out.append(prev_pts[j] + t * (pts[j] - prev_pts[j]))
        pts = np.asarray(out, dtype=np.float64).reshape(-1, 2)
    if len(pts) < 3:
        return None
    return np.vstack([pts, pts[:1]])


def intersection_area_convex(subject: np.ndarray, convex: np.ndarray) -> float:
    """|subject ∩ convex| for a simple subject ring vs a convex ring."""
    c = clip_ring_convex(subject, convex)
    return abs(ring_area(c)) if c is not None else 0.0


# -- exact general polygon ∩ polygon area ------------------------------------

def _close(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) and not (r[0] == r[-1]).all():
        r = np.vstack([r, r[:1]])
    return r


def _normalize_rings(rings: list) -> list:
    """Exterior CCW (positive area), holes CW — the orientation under
    which summing each ring's Green integral yields the polygon's net
    area (even-odd semantics)."""
    out = []
    for i, ring in enumerate(rings):
        r = _close(ring)
        if len(r) < 4:
            continue
        a = ring_area(r)
        want_ccw = (i == 0)
        if (a > 0) != want_ccw and a != 0:
            r = r[::-1]
        out.append(r)
    return out


def _edges(rings: list):
    P = np.concatenate([r[:-1] for r in rings])
    Q = np.concatenate([r[1:] for r in rings])
    return P, Q


def _portion_integral(rings_from: list, rings_region: list, eps: float,
                      primary: bool) -> float:
    """Σ over edges of ``rings_from`` of ∮(x dy − y dx) along the edge
    portions belonging to ∂(A∩B). Each edge is split at its
    intersections with the region's edges, then each sub-segment's
    midpoint is tested DISPLACED by ±eps along the edge's left normal
    (interior side — rings are normalized so the polygon interior is
    left of every edge):

    - primary pass (∂A vs B): count iff the interior-side displaced
      midpoint is inside B — handles strictly-inside pieces and
      boundary-coincident pieces (counted exactly when the interiors
      locally agree), and rejects external touching;
    - secondary pass (∂B vs A): count iff BOTH displaced midpoints are
      inside A — i.e. strictly interior pieces only, so coincident
      pieces (already decided in the primary pass) are not
      double-counted.
    """
    from .pip import points_in_polygon
    P, Q = _edges(rings_from)
    A, B = _edges(rings_region)
    total = 0.0
    for i in range(len(P)):
        p, q = P[i], Q[i]
        d = q - p
        L = np.hypot(d[0], d[1])
        if L == 0:
            continue
        nrm = np.array([-d[1], d[0]]) / L  # left normal (interior side)
        e = B - A
        denom = d[0] * e[:, 1] - d[1] * e[:, 0]
        w = A - p
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (w[:, 0] * e[:, 1] - w[:, 1] * e[:, 0]) / denom
            s = (w[:, 0] * d[1] - w[:, 1] * d[0]) / denom
        ok = (denom != 0) & (t > 0) & (t < 1) & (s >= 0) & (s <= 1)
        ts = np.sort(t[ok])
        cuts = np.concatenate([[0.0], ts, [1.0]])
        mids = p[None, :] + (0.5 * (cuts[:-1] + cuts[1:]))[:, None] * d[None, :]
        m_in = mids + eps * nrm[None, :]
        inside = points_in_polygon(m_in[:, 0], m_in[:, 1], rings_region)
        if not primary:
            m_out = mids - eps * nrm[None, :]
            inside &= points_in_polygon(m_out[:, 0], m_out[:, 1],
                                        rings_region)
        if not inside.any():
            continue
        t0 = cuts[:-1][inside]
        t1 = cuts[1:][inside]
        # ∫ x dy − y dx over p+t·d for t∈[t0,t1] = (t1−t0)·cross(p, d)
        total += float(np.sum(t1 - t0)) * (p[0] * d[1] - p[1] * d[0])
    return total


def polygon_intersection_area(rings_a: list, rings_b: list) -> float:
    """Exact |A ∩ B| for two simple polygons with optional holes
    (even-odd), concave or convex — Green's theorem over the boundary
    of A∩B, which is (∂A inside B) ∪ (∂B strictly inside A), with
    boundary-coincident pieces resolved by local interior agreement
    (displaced-midpoint tests, see _portion_integral). Backs
    AreaIntersecting exactly like the reference
    (src/osm_lua_processing.cpp:488-502 via boost::geometry)."""
    ra = _normalize_rings(rings_a)
    rb = _normalize_rings(rings_b)
    if not ra or not rb:
        return 0.0
    span = max(float(np.abs(np.concatenate(ra + rb)).max()), 1.0)
    eps = 1e-9 * span
    total = (_portion_integral(ra, rb, eps, primary=True)
             + _portion_integral(rb, ra, eps, primary=False))
    return max(0.0, 0.5 * total)
