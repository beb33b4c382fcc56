"""Map-matching oracles: exact-integer snap, Viterbi vs exhaustive
path enumeration (cost-exact; path-exact when the optimum is unique),
noise-free identifiability, chain breaks, determinism."""

import numpy as np

from tilemaker_ray.stages.mapmatch import (BETA, BLOCK, GRID_N, NOISE,
                                           RADIUS, RoadIndex,
                                           brute_match, synth_track,
                                           viterbi_match)


def _index():
    if not hasattr(_index, "idx"):
        _index.idx = RoadIndex()
    return _index.idx


def test_snap_is_exact_clamp():
    idx = _index()
    # horizontal segment through the origin: (0,0)-(1000,0)
    ks = idx.candidates(500, 120)
    assert len(ks)
    sx, sy, d2 = idx.snap(ks, 500, 120)
    on_axis = (idx.y1[ks] == 0) & (idx.y2[ks] == 0) & (idx.x1[ks] == 0)
    assert on_axis.any()
    j = int(np.flatnonzero(on_axis)[0])
    assert (sx[j], sy[j], d2[j]) == (500, 0, 120 * 120)


def test_candidates_within_radius_and_sorted():
    idx = _index()
    ks = idx.candidates(250, 250)
    assert len(ks)
    sx, sy, d2 = idx.snap(ks, 250, 250)
    assert (d2 <= RADIUS * RADIUS).all()
    assert (np.diff(idx.sid[ks]) > 0).all()


def test_viterbi_matches_brute_cost():
    idx = _index()
    n_unique_checked = 0
    for uid in range(40):
        ox, oy, true_sid = synth_track(uid, 5)
        sid, sx, sy, d2 = viterbi_match(idx, ox, oy)
        assert (sid >= 0).all()
        bsid, bcost = brute_match(idx, ox, oy)
        # recompute the viterbi path's cost with the brute formula
        cost = int(d2[0])
        for t in range(1, len(ox)):
            obs_d1 = abs(int(ox[t]) - int(ox[t - 1])) \
                + abs(int(oy[t]) - int(oy[t - 1]))
            route = abs(int(sx[t]) - int(sx[t - 1])) \
                + abs(int(sy[t]) - int(sy[t - 1]))
            cost += BETA * abs(route - obs_d1) + int(d2[t])
        assert cost == bcost, uid
        if np.array_equal(sid, bsid):
            n_unique_checked += 1
    # the optimum is unique for the overwhelming majority of tracks
    assert n_unique_checked >= 35


def test_small_noise_recovers_true_path():
    """Observations at edge midpoints ± small noise must match back to
    the traversed edges themselves."""
    idx = _index()
    hits = total = 0
    for uid in range(30):
        ox, oy, true_sid = synth_track(uid, 12)
        sid, _, _, _ = viterbi_match(idx, ox, oy)
        hits += int((sid == true_sid).sum())
        total += len(sid)
    assert hits / total >= 0.97, hits / total


def test_no_candidate_breaks_chain():
    idx = _index()
    # a point in the middle of a block, > RADIUS from every street
    far = GRID_N * BLOCK + 10 * BLOCK
    ox = np.array([500, far, 500], dtype=np.int64)
    oy = np.array([120, far, -90], dtype=np.int64)
    sid, sx, sy, d2 = viterbi_match(idx, ox, oy)
    assert sid[1] == -1 and sx[1] == far and d2[1] == 0
    assert sid[0] >= 0 and sid[2] >= 0


def test_determinism():
    idx = _index()
    ox, oy, _ = synth_track(7, 20)
    a = viterbi_match(idx, ox, oy)
    b = viterbi_match(RoadIndex(), ox.copy(), oy.copy())
    for u, v in zip(a, b):
        assert np.array_equal(u, v)


def test_synth_track_stays_on_lattice():
    key_span = GRID_N * BLOCK
    for uid in (0, 3, 11):
        ox, oy, sid = synth_track(uid, 25)
        assert (np.abs(ox) <= key_span + NOISE).all()
        assert (np.abs(oy) <= key_span + NOISE).all()
        assert (sid >= 0).all()
