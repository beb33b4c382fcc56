"""Geometric union of compatible polygon runs (combine_polygons).

The reference unions successive compatible multipolygons inside a tile
run via bbox union-find + pairwise boost::geometry::union_
(/root/reference/src/tile_worker.cpp:393-405, src/geom.cpp:232-290
``union_many``).  This module provides the Ray-side analog for the
dominant map case — INTERIOR-DISJOINT polygons sharing borders
(adjacent landuse / water parcels drawn from the same source ways):
shared border segments appear as opposite directed edges and are
dissolved exactly in integer tile-grid arithmetic.

Algorithm (exact, no geometry library):

1. bbox union-find over the run's features (mirrors geom.cpp:232-258);
   singleton components pass through untouched.
2. Per component, an EXACT integer interior-overlap screen
   (_interiors_overlap_exact: proper boundary crossings + edge
   midpoints strictly inside another feature, both in doubled-integer
   arithmetic): genuinely overlapping features fall back to
   concatenation — the pre-existing behavior — because edge
   cancellation is only exact for interior-disjoint inputs.  This is
   the documented parity gap vs the reference's full boolean union;
   rendering output for overlapping same-attribute fills is identical,
   tile bytes differ.
3. Edge cancellation: every directed boundary edge carries polygon
   coverage on its RIGHT (exterior rings negative shoelace, holes
   positive — the _finish_ring convention).  Collinear edges are
   bucketed by their reduced line equation and split at each other's
   endpoints (all splits land on existing integer vertices — exact),
   then opposite directed sub-edges cancel.  A surviving |net| > 1
   means coverage jumped by 2 (overlap the screen missed) → fallback.
4. The surviving darts are stitched into rings with an exact
   integer-angle face walk (at a pinch vertex take the first dart
   counter-clockwise from the reversed incoming dart, so touching
   lobes come out as separate simple rings, not a figure-eight).
5. Output rings keep the input convention and are ordered
   deterministically: exteriors by smallest vertex, each followed by
   its contained holes.

Any structural failure (unbalanced degrees, open walks, unassignable
hole, oversize input) returns ``None`` and the caller keeps the
concatenated parts — the union is an optimization of the tile bytes,
never a correctness gamble.
"""

from __future__ import annotations

from math import gcd

import numpy as np

from .clip import ring_area

# beyond this many edges the O(pairs) overlap screen and per-line
# splits stop being tile-local noise; fall back to concatenation
# (size-capped like reorder_multilinestring / the reference's repair
# bounds)
MAX_UNION_EDGES = 4096


def _bbox(rings: list) -> tuple:
    pts = np.concatenate(rings)
    return (int(pts[:, 0].min()), int(pts[:, 1].min()),
            int(pts[:, 0].max()), int(pts[:, 1].max()))


def _bbox_intersects(a: tuple, b: tuple) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def _find(parent: list, x: int) -> int:
    while parent[x] != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x


def _strict_inside_mask(pts2: np.ndarray, rings: list) -> np.ndarray:
    """Even-odd membership for DOUBLED integer points ``pts2`` in the
    region of ``rings`` (feature = exteriors minus holes), EXACT
    integer arithmetic; points on any boundary count as NOT strictly
    inside."""
    m = len(pts2)
    inside = np.zeros(m, dtype=np.int64)
    onb = np.zeros(m, dtype=bool)
    px = pts2[:, 0][:, None]
    py = pts2[:, 1][:, None]
    for r in rings:
        a = (r[:-1].astype(np.int64) * 2)
        b = (r[1:].astype(np.int64) * 2)
        x1, y1 = a[:, 0][None, :], a[:, 1][None, :]
        x2, y2 = b[:, 0][None, :], b[:, 1][None, :]
        cr = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        within = ((np.minimum(x1, x2) <= px) & (px <= np.maximum(x1, x2))
                  & (np.minimum(y1, y2) <= py)
                  & (py <= np.maximum(y1, y2)))
        onb |= ((cr == 0) & within).any(axis=1)
        cond = (y1 > py) != (y2 > py)
        dy = y2 - y1
        lhs = (px - x1) * dy
        rhs = (py - y1) * (x2 - x1)
        lt = np.where(dy > 0, lhs < rhs, lhs > rhs)
        inside += (cond & lt).sum(axis=1)
    return (inside % 2 == 1) & ~onb


def _interiors_overlap_exact(members: list,
                             max_edges: int = 1024) -> bool:
    """EXACT integer overlap screen for a component, replacing the
    earlier float-area heuristic a review broke with a sub-half-cell
    crossing sliver.  Interiors of two valid features overlap iff
    (a) their boundaries properly cross, or (b) a boundary piece of
    one runs strictly inside the other — detected by edge MIDPOINTS
    (doubled coordinates keep everything integer-exact; midpoints ON
    the other boundary are the legitimate shared-border case).  The
    remaining overlap class, same-direction collinear boundary runs,
    is caught downstream by the |net| > 1 cancellation backstop.
    Components over ``max_edges`` are declared un-unionable."""
    segs = []
    for fi, rings in enumerate(members):
        for r in rings:
            a = r[:-1].astype(np.int64)
            b = r[1:].astype(np.int64)
            keep = (a != b).any(axis=1)
            segs.append((a[keep], b[keep],
                         np.full(int(keep.sum()), fi, np.int64)))
    A = np.concatenate([s[0] for s in segs])
    B = np.concatenate([s[1] for s in segs])
    F = np.concatenate([s[2] for s in segs])
    n = len(A)
    if n > max_edges:
        return True  # too big to certify disjoint → force fallback
    # (a) proper boundary crossings between different features
    i, j = np.triu_indices(n, k=1)
    m = F[i] != F[j]
    loi = np.minimum(A, B)
    hii = np.maximum(A, B)
    m &= ~((hii[i, 0] < loi[j, 0]) | (hii[j, 0] < loi[i, 0])
           | (hii[i, 1] < loi[j, 1]) | (hii[j, 1] < loi[i, 1]))
    i, j = i[m], j[m]
    if len(i):
        def orient(p, q, r):
            return ((q[:, 0] - p[:, 0]) * (r[:, 1] - p[:, 1])
                    - (q[:, 1] - p[:, 1]) * (r[:, 0] - p[:, 0]))

        d1 = orient(A[i], B[i], A[j])
        d2 = orient(A[i], B[i], B[j])
        d3 = orient(A[j], B[j], A[i])
        d4 = orient(A[j], B[j], B[i])
        proper = (((d1 > 0) & (d2 < 0) | (d1 < 0) & (d2 > 0))
                  & ((d3 > 0) & (d4 < 0) | (d3 < 0) & (d4 > 0)))
        if proper.any():
            return True
    # (b) an edge midpoint of one feature strictly inside another
    mids2 = A + B          # doubled midpoints, exact integers
    for fj, rings in enumerate(members):
        pts = mids2[F != fj]
        if len(pts) and _strict_inside_mask(pts, rings).any():
            return True
    return False


def _line_key(u: tuple, v: tuple) -> tuple:
    """Reduced (a, b, c) of the line a·x + b·y = c through u, v with a
    canonical sign — collinear edges share the key exactly."""
    a = v[1] - u[1]
    b = u[0] - v[0]
    c = a * u[0] + b * u[1]
    g = gcd(gcd(abs(a), abs(b)), abs(c)) or 1
    a, b, c = a // g, b // g, c // g
    if a < 0 or (a == 0 and b < 0):
        a, b, c = -a, -b, -c
    return (a, b, c)


def _split_collinear(edges: list) -> list:
    """Split each directed edge at every other collinear edge's
    endpoints that fall strictly inside its span (exact: all split
    points are existing integer vertices)."""
    by_line: dict = {}
    for e in edges:
        by_line.setdefault(_line_key(*e), []).append(e)
    out = []
    for key, group in by_line.items():
        if len(group) == 1:
            out.append(group[0])
            continue
        # 1-D positions along the line direction (exact ints)
        a, b, _ = key
        d = (-b, a)  # direction vector of the line

        def pos(p):
            return p[0] * d[0] + p[1] * d[1]

        stops = sorted({pos(p) for e in group for p in e})
        stop_pt = {}
        for e in group:
            for p in e:
                stop_pt[pos(p)] = p
        for u, v in group:
            pu, pv = pos(u), pos(v)
            lo, hi = (pu, pv) if pu < pv else (pv, pu)
            inner = [s for s in stops if lo < s < hi]
            if not inner:
                out.append((u, v))
                continue
            seq = ([u] + [stop_pt[s] for s in
                          (inner if pu < pv else reversed(inner))] + [v])
            for i in range(len(seq) - 1):
                out.append((seq[i], seq[i + 1]))
    return out


def _angle_from(rev: tuple, d: tuple) -> tuple:
    """Sort key for the CCW angle of ``d`` measured from ``rev`` in
    (0, 2π), exact in integers: (sector, within-sector comparator is
    handled by pairwise cross in _pick_next)."""
    cr = rev[0] * d[1] - rev[1] * d[0]
    dt = rev[0] * d[0] + rev[1] * d[1]
    if cr > 0:
        return (0,)
    if cr == 0 and dt < 0:
        return (1,)
    if cr < 0:
        return (2,)
    return (3,)  # parallel same direction — cannot happen post-cancel


def _pick_next(rev: tuple, cands: list) -> int:
    """Index of the candidate direction first CCW from ``rev``."""
    best = 0
    for i in range(1, len(cands)):
        sa, sb = _angle_from(rev, cands[best]), _angle_from(rev, cands[i])
        if sb < sa:
            best = i
        elif sb == sa and sb[0] in (0, 2):
            # same open half-plane sector: within it angles differ by
            # < π, so cands[i] is EARLIER CCW iff cross(best, i) < 0
            d1, d2 = cands[best], cands[i]
            if d1[0] * d2[1] - d1[1] * d2[0] < 0:
                best = i
    return best


def _stitch(darts: list) -> list | None:
    """Closed-ring extraction from the surviving darts via the exact
    face walk; returns vertex-array rings or None on any open walk."""
    out_map: dict = {}
    for u, v in darts:
        out_map.setdefault(u, []).append(v)
    for u in out_map:
        out_map[u].sort()
    in_deg: dict = {}
    for u, v in darts:
        in_deg[v] = in_deg.get(v, 0) + 1
    for u, vs in out_map.items():
        if in_deg.get(u, 0) != len(vs):
            return None
    rings = []
    remaining = {u: list(vs) for u, vs in out_map.items()}
    starts = sorted(remaining)
    for s in starts:
        while remaining.get(s):
            v0 = remaining[s].pop(0)
            ring = [s, v0]
            cur, prev = v0, s
            guard = 0
            while cur != s or len(ring) < 3:
                outs = remaining.get(cur)
                if not outs:
                    return None
                rev = (prev[0] - cur[0], prev[1] - cur[1])
                if len(outs) == 1:
                    nxt = outs.pop(0)
                else:
                    dirs = [(w[0] - cur[0], w[1] - cur[1]) for w in outs]
                    nxt = outs.pop(_pick_next(rev, dirs))
                ring.append(nxt)
                prev, cur = cur, nxt
                guard += 1
                if guard > MAX_UNION_EDGES:
                    return None
            # ring closes at s: drop the duplicated closing step walk
            # artifact (ring already ends with s)
            rings.append(np.asarray(ring, dtype=np.int64))
    if any(remaining.get(u) for u in remaining):
        return None
    return rings


def _point_in_ring(px: float, py: float, ring: np.ndarray) -> bool:
    """Even-odd with on-boundary counting as inside."""
    x, y = ring[:-1, 0].astype(np.float64), ring[:-1, 1].astype(np.float64)
    x2, y2 = ring[1:, 0].astype(np.float64), ring[1:, 1].astype(np.float64)
    # on-segment test
    cross = (x2 - x) * (py - y) - (y2 - y) * (px - x)
    dot = (px - x) * (px - x2) + (py - y) * (py - y2)
    if bool(((cross == 0) & (dot <= 0)).any()):
        return True
    cond = (y > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = x + (py - y) * (x2 - x) / (y2 - y)
    return bool(np.count_nonzero(cond & (px < xs)) % 2 == 1)


def _order_rings(rings: list) -> list | None:
    """Deterministic MVT ordering: each exterior (negative area,
    sorted by smallest vertex) followed by its holes."""
    exts, holes = [], []
    for r in rings:
        (holes if ring_area(r.astype(np.float64)) > 0 else exts).append(r)
    if not exts:
        return None
    exts.sort(key=lambda r: sorted(map(tuple, r[:-1]))[0])
    assigned: list = [[] for _ in exts]
    for h in holes:
        mx = 0.5 * float(h[0, 0] + h[1, 0])
        my = 0.5 * float(h[0, 1] + h[1, 1])
        best, best_area = -1, None
        for i, e in enumerate(exts):
            if _point_in_ring(mx, my, e):
                a = abs(ring_area(e.astype(np.float64)))
                if best_area is None or a < best_area:
                    best, best_area = i, a
        if best < 0:
            return None
        assigned[best].append(h)
    out = []
    for i, e in enumerate(exts):
        out.append(e)
        assigned[i].sort(key=lambda r: sorted(map(tuple, r[:-1]))[0])
        out.extend(assigned[i])
    return out


def _union_component(features: list) -> list | None:
    """Edge-cancellation union of interior-disjoint features."""
    edges = []
    for rings in features:
        for r in rings:
            pts = [tuple(map(int, p)) for p in r]
            for i in range(len(pts) - 1):
                if pts[i] != pts[i + 1]:
                    edges.append((pts[i], pts[i + 1]))
    if len(edges) > MAX_UNION_EDGES:
        return None
    sub = _split_collinear(edges)
    net: dict = {}
    for u, v in sub:
        if (v, u) in net and net[(v, u)] > 0:
            net[(v, u)] -= 1
        else:
            net[(u, v)] = net.get((u, v), 0) + 1
    darts = []
    for (u, v), n in net.items():
        if n > 1:
            return None  # coverage-2 edge: not interior-disjoint
        if n == 1:
            darts.append((u, v))
    if not darts:
        return None
    rings = _stitch(darts)
    if rings is None:
        return None
    rings = [r for r in rings if len(r) >= 4]
    if not rings:
        return None
    return _order_rings(rings)


def union_polygon_runs(features: list) -> list | None:
    """Union a combine_polygons run.

    ``features``: one entry per run feature, each a list of CLOSED
    integer rings in the _finish_ring convention (exterior negative
    shoelace, holes positive).  Returns the unioned flat ring list in
    the same convention, or ``None`` if the caller should keep the
    concatenated parts.
    """
    feats = [f for f in features if f]
    if len(feats) < 2:
        return None
    n_edges = sum(len(r) - 1 for f in feats for r in f)
    if n_edges > MAX_UNION_EDGES:
        return None
    boxes = [_bbox(f) for f in feats]
    parent = list(range(len(feats)))
    for i in range(len(feats)):
        for j in range(i):
            if _bbox_intersects(boxes[i], boxes[j]):
                ri, rj = _find(parent, i), _find(parent, j)
                if ri != rj:
                    parent[ri] = rj
    comps: dict = {}
    for i in range(len(feats)):
        comps.setdefault(_find(parent, i), []).append(i)
    out: list = []
    changed = False
    for root in sorted(comps, key=lambda r: min(comps[r])):
        idxs = comps[root]
        members = [feats[i] for i in idxs]
        if len(members) == 1:
            out.extend(members[0])
            continue
        overlap = _interiors_overlap_exact(members)
        u = None if overlap else _union_component(members)
        if u is None:
            for m in members:
                out.extend(m)
        else:
            out.extend(u)
            changed = True
    return out if changed else None
