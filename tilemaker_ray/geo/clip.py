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
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(denom == 0, 0.0, (bound - prev_pts[:, axis]) / denom)
        inter = prev_pts + t[:, None] * (pts - prev_pts)
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
        with np.errstate(divide="ignore", invalid="ignore"):
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
