"""Self-intersection dissolve + the area-preserving repair ladder.

The analog of the reference's repair path
(/root/reference/src/geom.cpp:140-224 ``repair_multi_polygon`` /
``repair_one_polygon``, driven from src/tile_data.cpp:380-426): an
invalid (self-intersecting) ring is DISSOLVED into simple sub-rings;
the repair is accepted only if it preserves at least half the
original's shoelace area (the reference's ``minArea = 0.5·|area|``
guard), otherwise the original ring is kept as-is — an invalid ring
renders with a small local artifact, but an area is never silently
dropped from the map.

Dissolve algorithm (no geometry library): split every edge at its
crossings with non-adjacent edges (pairwise; rings here are small,
post-clip tile-local), then walk the augmented vertex cycle with a
stack — whenever a point repeats, the loop between the two visits pops
out as one simple sub-ring. A figure-eight becomes its two lobes; a
ring with a pinched spur sheds the spur loop.
"""

from __future__ import annotations

import numpy as np

from .clip import ring_area as _signed_area


def _split_edges_at_crossings(p: np.ndarray) -> list:
    """Open ring vertices → vertex sequence with every non-adjacent
    edge crossing inserted (the same intersection point object lands in
    both edges, so repeated-point detection is exact)."""
    n = len(p)
    extra: dict = {i: [] for i in range(n)}  # edge idx -> [(t, (x, y))]
    for i in range(n - 1):
        a0, a1 = p[i], p[(i + 1) % n]
        d = a1 - a0
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent around the wrap
            b0, b1 = p[j], p[(j + 1) % n]
            e = b1 - b0
            denom = d[0] * e[1] - d[1] * e[0]
            if denom == 0:
                continue
            w = b0 - a0
            t = (w[0] * e[1] - w[1] * e[0]) / denom
            s = (w[0] * d[1] - w[1] * d[0]) / denom
            if 0 < t < 1 and 0 < s < 1:
                pt = (float(a0[0] + t * d[0]), float(a0[1] + t * d[1]))
                extra[i].append((t, pt))
                extra[j].append((s, pt))
    # T-junctions: a vertex lying in another edge's interior is a
    # touch, not a proper crossing — split the edge there too, so the
    # stack walk sees the repeated point and sheds the degenerate loop
    scale = float(np.abs(p).max()) or 1.0
    eps = 1e-12 * scale * scale
    for i in range(n):
        a0, a1 = p[i], p[(i + 1) % n]
        d = a1 - a0
        L2 = float(d[0] * d[0] + d[1] * d[1])
        if L2 == 0:
            continue
        for j in range(n):
            if j == i or j == (i + 1) % n:
                continue
            w = p[j] - a0
            if abs(d[0] * w[1] - d[1] * w[0]) > eps:
                continue
            t = float(d[0] * w[0] + d[1] * w[1]) / L2
            if 1e-12 < t < 1 - 1e-12:
                extra[i].append((t, (float(p[j][0]), float(p[j][1]))))
    seq = []
    for i in range(n):
        seq.append((float(p[i][0]), float(p[i][1])))
        for _, pt in sorted(extra[i], key=lambda kv: kv[0]):
            seq.append(pt)
    return seq


def dissolve_ring(ring: np.ndarray) -> list:
    """Self-intersecting closed ring → list of simple closed sub-rings
    (numpy (N,2), first == last). A ring that is already simple comes
    back as itself (single element)."""
    p = np.asarray(ring, dtype=np.float64)
    if len(p) and (p[0] == p[-1]).all():
        p = p[:-1]
    if len(p) < 3:
        return []
    seq = _split_edges_at_crossings(p)
    # stack walk: pop a loop whenever a point repeats
    stack: list = []
    index: dict = {}
    out = []
    for pt in seq + [seq[0]]:
        k = (round(pt[0], 9), round(pt[1], 9))
        if k in index:
            i0 = index[k]
            loop = stack[i0:]
            if len(loop) >= 3:
                r = np.asarray(loop + [loop[0]], dtype=np.float64)
                out.append(r)
            for q in stack[i0:]:
                kk = (round(q[0], 9), round(q[1], 9))
                if index.get(kk, -1) >= i0:
                    del index[kk]
            del stack[i0:]
            # the repeated point stays as the junction
            index[k] = len(stack)
            stack.append(pt)
        else:
            index[k] = len(stack)
            stack.append(pt)
    if len(stack) > 3:  # leftover open chain incl. the closing repeat
        r = np.asarray(stack + [stack[0]], dtype=np.float64)
        if len(r) >= 4:
            out.append(r)
    return [r for r in out if abs(_signed_area(r)) > 0]


def _is_convex(ring: np.ndarray) -> bool:
    """Vectorized convexity pre-filter: a convex ring cannot
    self-intersect, so the O(n²) crossing test is skipped for the
    overwhelmingly common simple quads/boxes the clipper emits.
    Collinear runs (zero cross) are tolerated — they cannot introduce a
    crossing either way.

    Same-sign cross products alone are NOT sufficient (a pentagram
    winds twice with uniformly-signed turns); true convex traversal
    additionally changes x- and y-direction at most twice around the
    cycle, which a winding>1 ring cannot satisfy."""
    p = ring[:-1] if len(ring) and (ring[0] == ring[-1]).all() else ring
    n = len(p)
    if n < 4:
        return True
    e = np.diff(np.vstack([p, p[:1]]), axis=0)
    z = e[:-1, 0] * e[1:, 1] - e[:-1, 1] * e[1:, 0]
    zw = e[-1, 0] * e[0, 1] - e[-1, 1] * e[0, 0]
    if not (bool((z >= 0).all() and zw >= 0)
            or bool((z <= 0).all() and zw <= 0)):
        return False
    for axis in (0, 1):
        s = np.sign(e[:, axis])
        s = s[s != 0]
        if len(s) and int((s != np.roll(s, 1)).sum()) > 2:
            return False
    return True


def repair_ring(ring: np.ndarray, self_intersects) -> list:
    """The repair ladder for ONE ring: if it self-intersects, dissolve;
    accept the dissolved set iff its total area preserves ≥50% of the
    original shoelace area (geom.cpp:206-216), else keep the original
    ring unchanged (never drop). ``self_intersects`` is the caller's
    crossing test (size-capped in the encoder)."""
    r = np.asarray(ring, dtype=np.float64)
    if _is_convex(r) or not self_intersects(r):
        return [r]
    parts = dissolve_ring(r)
    if not parts:
        return [r]
    orig = abs(_signed_area(r if (r[0] == r[-1]).all()
                            else np.vstack([r, r[:1]])))
    repaired = sum(abs(_signed_area(p)) for p in parts)
    if repaired >= 0.5 * orig:
        return parts
    return [r]
