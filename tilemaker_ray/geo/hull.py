"""Convex hull (Andrew's monotone chain) over integer coordinates.

Exact int64 cross products (coords ≤ ~10⁶ → cross ≤ ~10¹², no
overflow), strict turns only (collinear boundary points dropped), so
the vertex set is the unique minimal hull and the result is a pure
function of the POINT SET — the distributed decomposition
hull(S₁ ∪ S₂) = hull(hull(S₁) ∪ hull(S₂)) is therefore exact and
partition-layout-invariant.

Output order: counter-clockwise in a y-up plane, starting from the
lexicographically smallest (x, y) vertex.
"""

from __future__ import annotations

import numpy as np


def _cross(ox, oy, ax, ay, bx, by) -> int:
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def convex_hull(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray,
                                                       np.ndarray]:
    """Hull vertices (x, y int64 arrays) in CCW order from the
    lexicographically smallest point. Degenerate inputs: a single
    point or all-collinear points return the (deduped) extreme
    points."""
    pts = np.unique(np.stack([np.asarray(x, dtype=np.int64),
                              np.asarray(y, dtype=np.int64)], axis=1),
                    axis=0)  # sorted lexicographically by (x, y)
    n = len(pts)
    if n <= 2:
        return pts[:, 0], pts[:, 1]
    P = [(int(a), int(b)) for a, b in pts]
    lower: list = []
    for p in P:
        while len(lower) >= 2 and _cross(lower[-2][0], lower[-2][1],
                                         lower[-1][0], lower[-1][1],
                                         p[0], p[1]) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(P):
        while len(upper) >= 2 and _cross(upper[-2][0], upper[-2][1],
                                         upper[-1][0], upper[-1][1],
                                         p[0], p[1]) <= 0:
            upper.pop()
        upper.append(p)
    if len(lower) == 2 and len(upper) == 2:
        ring = lower  # all collinear: keep the two extremes
    else:
        ring = lower[:-1] + upper[:-1]
    arr = np.asarray(ring, dtype=np.int64)
    return arr[:, 0], arr[:, 1]
