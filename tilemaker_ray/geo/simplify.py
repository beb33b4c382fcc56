"""Line simplification: Douglas–Peucker and Visvalingam–Whyatt.

Same algorithms as the reference (DP with ring-collapse guard,
/root/reference/src/geom.cpp:17-138; Visvalingam min-heap,
/root/reference/src/visvalingam.cpp) implemented fresh from the
published algorithm descriptions. The reference's R-tree
self-intersection guard is replaced by a post-simplify validity check
in the tile encoder (cheap at per-tile scale).
"""

from __future__ import annotations

import heapq

import numpy as np


def douglas_peucker(coords: np.ndarray, tolerance: float) -> np.ndarray:
    """Iterative DP with an explicit stack; perpendicular distances are
    computed vectorized per split interval."""
    pts = np.asarray(coords, dtype=np.float64)
    n = len(pts)
    if n <= 2 or tolerance <= 0:
        return pts
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    tol2 = tolerance * tolerance
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        seg = pts[b] - pts[a]
        mid = pts[a + 1:b] - pts[a]
        seg_len2 = seg @ seg
        if seg_len2 == 0:
            d2 = (mid ** 2).sum(axis=1)
        else:
            cross = mid[:, 0] * seg[1] - mid[:, 1] * seg[0]
            d2 = cross * cross / seg_len2
        i = int(np.argmax(d2))
        if d2[i] > tol2:
            idx = a + 1 + i
            keep[idx] = True
            stack.append((a, idx))
            stack.append((idx, b))
    return pts[keep]


def simplify_ring(ring: np.ndarray, tolerance: float,
                  min_perimeter_factor: float = 3.0,
                  algorithm: str = "douglas-peucker") -> np.ndarray | None:
    """Simplify a closed ring with the configured algorithm
    (``douglas-peucker`` or ``visvalingam``); drops rings whose
    perimeter is below ``min_perimeter_factor × tolerance`` (the
    reference's small-ring drop rule, src/geom.cpp:79-96) or that
    collapse below 4 points."""
    ring = np.asarray(ring, dtype=np.float64)
    perim = float(np.abs(np.diff(ring, axis=0)).sum())
    if perim < min_perimeter_factor * tolerance:
        return None
    if algorithm == "visvalingam":
        out = visvalingam(ring, tolerance ** 2)
    else:
        out = douglas_peucker(ring, tolerance)
    if len(out) < 4:  # closed ring: 3 distinct + closing point
        return None
    return out


def simplify_buildings(ring: np.ndarray, tolerance: float) -> np.ndarray | None:
    """Rectilinearity-preserving building-outline simplification
    (reference: src/simplify_buildings.cpp, reimplemented from the
    behavior, not the code): snap nearly-axis-aligned edges to exact
    axis alignment, then remove notches/jogs whose span is below
    ``tolerance`` by merging the neighboring collinear edges. Returns
    the simplified closed ring, or None if it collapses."""
    p = np.asarray(ring, dtype=np.float64)
    if len(p) and (p[0] == p[-1]).all():
        p = p[:-1]
    if len(p) < 4:
        return None
    # 1. snap near-axis edges: if |dx| or |dy| of an edge is below
    #    tolerance, make it exactly 0 by averaging the coordinates
    for _ in range(2):
        n = len(p)
        q = p.copy()
        for i in range(n):
            j = (i + 1) % n
            dx = abs(p[j, 0] - p[i, 0])
            dy = abs(p[j, 1] - p[i, 1])
            if 0 < dx <= tolerance and dy > tolerance:
                m = (p[i, 0] + p[j, 0]) / 2.0
                q[i, 0] = q[j, 0] = m
            elif 0 < dy <= tolerance and dx > tolerance:
                m = (p[i, 1] + p[j, 1]) / 2.0
                q[i, 1] = q[j, 1] = m
        p = q
        # 2. drop duplicate + collinear vertices
        keep = []
        n = len(p)
        for i in range(n):
            a, b, c = p[(i - 1) % n], p[i], p[(i + 1) % n]
            if (b == a).all():
                continue
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            if abs(cross) < 1e-12:
                continue
            keep.append(i)
        p = p[keep]
        if len(p) < 4:
            return None
    return np.vstack([p, p[:1]])


def visvalingam(coords: np.ndarray, min_area: float) -> np.ndarray:
    """Visvalingam–Whyatt: repeatedly remove the vertex forming the
    smallest triangle until all remaining triangles ≥ min_area."""
    pts = np.asarray(coords, dtype=np.float64)
    n = len(pts)
    if n <= 2 or min_area <= 0:
        return pts
    prev = np.arange(-1, n - 1)
    nxt = np.arange(1, n + 1)
    alive = np.ones(n, dtype=bool)
    version = np.zeros(n, dtype=np.int64)

    def tri_area(i):
        a, b, c = pts[prev[i]], pts[i], pts[nxt[i]]
        return 0.5 * abs((b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]))

    heap = [(tri_area(i), i, 0) for i in range(1, n - 1)]
    heapq.heapify(heap)
    alive_count = n
    while heap:
        area, i, ver = heapq.heappop(heap)
        if not alive[i] or ver != version[i]:
            continue
        if area >= min_area:
            break
        alive[i] = False
        alive_count -= 1
        if alive_count <= 2:
            break
        p, q = prev[i], nxt[i]
        nxt[p], prev[q] = q, p
        for j in (p, q):
            if 0 < j < n - 1 and alive[j]:
                version[j] += 1
                heapq.heappush(heap, (tri_area(j), j, version[j]))
    return pts[alive]
