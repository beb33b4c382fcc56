"""HMM map matching (Newson–Krumm style Viterbi) over a road lattice.

Geospatial-tier operator the reference lacks (tilemaker renders ways;
it never snaps noisy GPS tracks back onto them): match each user's
observation sequence to road segments by minimizing

    cost = d²(obs, segment)                     (emission)
         + BETA · |route_d1(snap_t, snap_{t-1})
                   − d1(obs_t, obs_{t-1})|      (transition)

with d² the exact squared snap distance and d1 manhattan distance —
ALL integer millidegrees, so the DP is bit-deterministic and a brute
path-enumeration oracle can certify it exactly (tests/test_mapmatch.py).
Ties break toward the lower (prev_candidate, segment_id) pair via
stable argmin over id-sorted candidates.

Scale shape: the road network is built once per worker (or broadcast
via ray.put for a real planet network) and indexed by lattice cell;
tracks are matched independently per user inside ONE groupby exchange
(groupby(user).map_groups), each user's Viterbi being O(T · C²) with
C ≤ ~8 local candidates. Nothing quadratic in users or roads shuffles.
"""

from __future__ import annotations

import numpy as np

GRID_N = 50            # lattice: intersections at i*BLOCK, |i| <= GRID_N
BLOCK = 1000           # millidegrees per block edge
NOISE = 150            # observation noise amplitude (< BLOCK/2)
RADIUS = 420           # candidate search radius (covers noise + snap)
BETA = 50              # transition weight (scales d1 vs d² emission)


def _hash64(*vals: int) -> int:
    h = 1469598103934665603                      # FNV-1a, 64-bit wrap
    for v in vals:
        h = ((h ^ (v & 0xFFFFFFFFFFFFFFFF)) * 1099511628211) \
            & 0xFFFFFFFFFFFFFFFF
    return h


def build_grid_segments():
    """Axis-aligned unit-block road segments of the lattice.

    Returns int64 arrays (seg_id, x1, y1, x2, y2) with x1<=x2, y1<=y2.
    Horizontal segments get even ids, vertical odd — ids are stable
    under any build order.
    """
    xs, ys, xe, ye, sid = [], [], [], [], []
    n = GRID_N
    for j in range(-n, n + 1):          # horizontal: y = j*BLOCK
        for i in range(-n, n):
            sid.append(2 * ((j + n) * (2 * n) + (i + n)))
            xs.append(i * BLOCK)
            ys.append(j * BLOCK)
            xe.append((i + 1) * BLOCK)
            ye.append(j * BLOCK)
    base = 2 * (2 * n + 1) * (2 * n)
    for i in range(-n, n + 1):          # vertical: x = i*BLOCK
        for j in range(-n, n):
            sid.append(2 * ((i + n) * (2 * n) + (j + n)) + 1 + base)
            xs.append(i * BLOCK)
            ys.append(j * BLOCK)
            xe.append(i * BLOCK)
            ye.append((j + 1) * BLOCK)
    return (np.asarray(sid, np.int64), np.asarray(xs, np.int64),
            np.asarray(ys, np.int64), np.asarray(xe, np.int64),
            np.asarray(ye, np.int64))


class RoadIndex:
    """Cell-bucketed segment index (built once per worker/actor)."""

    def __init__(self):
        self.sid, self.x1, self.y1, self.x2, self.y2 = \
            build_grid_segments()
        self.cells: dict = {}
        cx = ((self.x1 + self.x2) // 2) // BLOCK
        cy = ((self.y1 + self.y2) // 2) // BLOCK
        for k in range(len(self.sid)):
            self.cells.setdefault((int(cx[k]), int(cy[k])), []).append(k)

    def candidates(self, px: int, py: int) -> np.ndarray:
        """Indices of segments within RADIUS (snap distance), sorted
        by segment id for deterministic tie-breaking."""
        cx, cy = px // BLOCK, py // BLOCK
        ks = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ks.extend(self.cells.get((cx + dx, cy + dy), ()))
        ks = np.asarray(sorted(set(ks)), dtype=np.int64)
        if not len(ks):
            return ks
        sx, sy, d2 = self.snap(ks, px, py)
        keep = d2 <= RADIUS * RADIUS
        ks = ks[keep]
        order = np.argsort(self.sid[ks], kind="stable")
        return ks[order]

    def snap(self, ks: np.ndarray, px: int, py: int):
        """Exact integer snap of (px, py) onto axis-aligned segments."""
        sx = np.clip(px, self.x1[ks], self.x2[ks])
        sy = np.clip(py, self.y1[ks], self.y2[ks])
        d2 = (sx - px) ** 2 + (sy - py) ** 2
        return sx, sy, d2


_EDGE_KEY_CACHE: list = []


def _edge_key() -> dict:
    """(x1,y1,x2,y2) → seg_id lookup, built once per process."""
    if not _EDGE_KEY_CACHE:
        sid, x1, y1, x2, y2 = build_grid_segments()
        _EDGE_KEY_CACHE.append(
            {(int(x1[k]), int(y1[k]), int(x2[k]), int(y2[k])):
             int(sid[k]) for k in range(len(sid))})
    return _EDGE_KEY_CACHE[0]


def synth_track(user_id: int, n_steps: int):
    """Deterministic noisy walk along lattice edges.

    Returns (obs_x, obs_y, true_seg_ids) int64 arrays of length
    n_steps: the true path moves one block per step; each observation
    is the traversed edge's midpoint plus hash noise in [-NOISE, NOISE].
    """
    n = GRID_N
    ix = _hash64(user_id, 1) % (n) - n // 2
    iy = _hash64(user_id, 2) % (n) - n // 2
    key = _edge_key()
    ox, oy, ts = [], [], []
    heading = _hash64(user_id, 3) % 4
    for step in range(n_steps):
        r = _hash64(user_id, 10 + step)
        # mostly keep heading (momentum) so tracks look like routes
        if r % 4 == 0:
            heading = (heading + (1 if r % 8 < 4 else 3)) % 4
        dx, dy = ((1, 0), (0, 1), (-1, 0), (0, -1))[heading]
        if not (-n <= ix + dx <= n) or not (-n <= iy + dy <= n):
            heading = (heading + 2) % 4
            dx, dy = -dx, -dy
        jx, jy = ix + dx, iy + dy
        a = (min(ix, jx) * BLOCK, min(iy, jy) * BLOCK,
             max(ix, jx) * BLOCK, max(iy, jy) * BLOCK)
        ts.append(key[a])
        mx = (a[0] + a[2]) // 2
        my = (a[1] + a[3]) // 2
        ox.append(mx + _hash64(user_id, 100 + step) % (2 * NOISE + 1)
                  - NOISE)
        oy.append(my + _hash64(user_id, 200 + step) % (2 * NOISE + 1)
                  - NOISE)
        ix, iy = jx, jy
    return (np.asarray(ox, np.int64), np.asarray(oy, np.int64),
            np.asarray(ts, np.int64))


def viterbi_match(index: RoadIndex, obs_x: np.ndarray,
                  obs_y: np.ndarray):
    """Min-cost HMM path. Returns (seg_ids, snap_x, snap_y, d2) int64
    arrays; points with no candidate in RADIUS get seg_id = -1 and
    break the chain (transition restarts)."""
    T = len(obs_x)
    out_sid = np.full(T, -1, dtype=np.int64)
    out_sx = np.asarray(obs_x, np.int64).copy()
    out_sy = np.asarray(obs_y, np.int64).copy()
    out_d2 = np.zeros(T, dtype=np.int64)
    cand, snaps = [], []
    for t in range(T):
        ks = index.candidates(int(obs_x[t]), int(obs_y[t]))
        cand.append(ks)
        snaps.append(index.snap(ks, int(obs_x[t]), int(obs_y[t])))
    # segment runs of non-empty candidate sets
    t = 0
    while t < T:
        if not len(cand[t]):
            t += 1
            continue
        t0 = t
        while t < T and len(cand[t]):
            t += 1
        _run_viterbi(index, obs_x, obs_y, cand, snaps, t0, t,
                     out_sid, out_sx, out_sy, out_d2)
    return out_sid, out_sx, out_sy, out_d2


def _run_viterbi(index, obs_x, obs_y, cand, snaps, t0, t1,
                 out_sid, out_sx, out_sy, out_d2):
    prev_cost = snaps[t0][2].astype(np.int64)
    back = []
    for t in range(t0 + 1, t1):
        sx, sy, d2 = snaps[t]
        px, py, _ = snaps[t - 1]
        obs_d1 = abs(int(obs_x[t]) - int(obs_x[t - 1])) \
            + abs(int(obs_y[t]) - int(obs_y[t - 1]))
        # route distance ≈ manhattan on the lattice (exact for the
        # unit-block grid when consecutive snaps share a corridor)
        route = (np.abs(sx[:, None] - px[None, :])
                 + np.abs(sy[:, None] - py[None, :]))
        trans = BETA * np.abs(route - obs_d1)
        total = prev_cost[None, :] + trans          # (cur, prev)
        bp = np.argmin(total, axis=1)               # first min = lowest
        prev_cost = total[np.arange(len(sx)), bp] + d2
        back.append(bp)
    # backtrack
    path = np.empty(t1 - t0, dtype=np.int64)
    path[-1] = int(np.argmin(prev_cost))
    for i in range(len(back) - 1, -1, -1):
        path[i] = back[i][path[i + 1]]
    for i, t in enumerate(range(t0, t1)):
        k = int(cand[t][path[i]])
        out_sid[t] = int(index.sid[k])
        sx, sy, d2 = snaps[t]
        out_sx[t] = int(sx[path[i]])
        out_sy[t] = int(sy[path[i]])
        out_d2[t] = int(d2[path[i]])


def brute_match(index: RoadIndex, obs_x, obs_y):
    """Exhaustive min-cost path (oracle; small T only). Identical cost
    model, ties broken toward the lexicographically smaller candidate
    path — the same order Viterbi's first-min argmin realizes."""
    import itertools
    T = len(obs_x)
    cand = [index.candidates(int(obs_x[t]), int(obs_y[t]))
            for t in range(T)]
    assert all(len(c) for c in cand), "oracle expects full coverage"
    snaps = [index.snap(cand[t], int(obs_x[t]), int(obs_y[t]))
             for t in range(T)]
    best, best_cost = None, None
    for combo in itertools.product(*[range(len(c)) for c in cand]):
        cost = int(snaps[0][2][combo[0]])
        for t in range(1, T):
            sx, sy, _ = snaps[t]
            px, py, _ = snaps[t - 1]
            obs_d1 = abs(int(obs_x[t]) - int(obs_x[t - 1])) \
                + abs(int(obs_y[t]) - int(obs_y[t - 1]))
            route = abs(int(sx[combo[t]]) - int(px[combo[t - 1]])) \
                + abs(int(sy[combo[t]]) - int(py[combo[t - 1]]))
            cost += BETA * abs(route - obs_d1) \
                + int(snaps[t][2][combo[t]])
        if best_cost is None or cost < best_cost:
            best, best_cost = combo, cost
    return np.asarray([int(index.sid[cand[t][best[t]]])
                       for t in range(T)], np.int64), best_cost
