"""Marching-squares isoline kernel (geo/isolines.py): semantic oracles
on hand-built fields + the topological invariants contours must obey."""

import numpy as np
import pytest

from tilemaker_ray.geo.isolines import MS_SEGMENTS, marching_squares


def _seg_set(seg: np.ndarray) -> set:
    return {tuple(r) for r in seg.tolist()}


def test_uniform_fields_emit_nothing():
    assert marching_squares(np.zeros((5, 5), int)).shape == (0, 4)
    assert marching_squares(np.ones((5, 5), int)).shape == (0, 4)


def test_single_hot_node_is_a_closed_diamond():
    b = np.zeros((7, 7), int)
    b[3, 3] = 1
    seg = marching_squares(b)
    # four segments, one per adjacent square (cases 1/2/4/8)
    assert len(seg) == 4
    # they close into a loop: every endpoint appears exactly twice
    pts = {}
    for x0, y0, x1, y1 in seg.tolist():
        assert (x0, y0) != (x1, y1)
        pts[(x0, y0)] = pts.get((x0, y0), 0) + 1
        pts[(x1, y1)] = pts.get((x1, y1), 0) + 1
    assert sorted(pts.values()) == [2, 2, 2, 2]
    # the diamond surrounds the hot node at doubled coords (6, 6)
    assert set(pts) == {(5, 6), (6, 5), (7, 6), (6, 7)}


def test_half_plane_is_a_straight_line():
    b = np.zeros((6, 4), int)
    b[:3, :] = 1  # x < 3 inside: vertical boundary between x=2 and 3
    seg = marching_squares(b)
    # one segment per row of squares, all on the doubled line x=5
    assert len(seg) == 3
    assert all(x0 == 5 and x1 == 5 for x0, _, x1, _ in seg.tolist())
    assert _seg_set(seg) == {(5, 0, 5, 2), (5, 2, 5, 4), (5, 4, 5, 6)}


def test_saddle_cases_split_per_corner():
    # case 5: SW + NE inside → two segments hugging those corners
    b5 = np.array([[1, 0], [0, 1]])
    assert _seg_set(marching_squares(b5)) == {(0, 1, 1, 0), (1, 2, 2, 1)}
    # case 10: SE + NW inside
    b10 = np.array([[0, 1], [1, 0]])
    assert _seg_set(marching_squares(b10)) == {(1, 0, 2, 1), (0, 1, 1, 2)}


def test_case_table_complement_symmetry_except_saddles():
    # inverting the field gives the same geometry for every NON-saddle
    # case (k and 15-k share segment sets). Saddles are the classic MS
    # ambiguity: the per-corner convention hugs the inside corners, so
    # 5 (SW+NE) and 10 (SE+NW) cut differently by design.
    for k in range(1, 15):
        if k in (5, 10):
            continue
        assert sorted(MS_SEGMENTS[k]) == sorted(MS_SEGMENTS[15 - k])
    assert sorted(MS_SEGMENTS[5]) != sorted(MS_SEGMENTS[10])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_field_invariants(seed):
    rng = np.random.RandomState(seed)
    b = (rng.rand(12, 9) < 0.4).astype(int)
    seg = marching_squares(b)
    segi = marching_squares(1 - b)
    # complement symmetry holds outside saddle squares: the two runs
    # may differ only in segments emitted by squares whose case is
    # 5/10 in either field (5 ↔ 10 under complement)
    cases = (b[:-1, :-1] + 2 * b[1:, :-1] + 4 * b[1:, 1:]
             + 8 * b[:-1, 1:])
    saddles = {(int(i), int(j))
               for i, j in zip(*np.nonzero((cases == 5)
                                           | (cases == 10)))}

    def non_saddle(s):
        # owning square of a segment: endpoint-sum // 4 in each axis
        # (exact for all six midpoint-segment shapes)
        return {tuple(r) for r in s.tolist()
                if ((r[0] + r[2]) // 4, (r[1] + r[3]) // 4)
                not in saddles}

    assert non_saddle(seg) == non_saddle(segi)
    # every interior vertex has even degree (contours are closed or
    # end on the raster border)
    deg = {}
    for x0, y0, x1, y1 in seg.tolist():
        deg[(x0, y0)] = deg.get((x0, y0), 0) + 1
        deg[(x1, y1)] = deg.get((x1, y1), 0) + 1
    nx2, ny2 = 2 * (b.shape[0] - 1), 2 * (b.shape[1] - 1)
    for (x, y), d in deg.items():
        if 0 < x < nx2 and 0 < y < ny2:
            assert d % 2 == 0, (x, y, d)
    # segment count equals the number of inside/outside sign changes
    # along all lattice edges of the interior squares grid
    changes = int(np.sum(b[:-1, 1:-1] != b[1:, 1:-1]))   # vertical-ish
    changes += int(np.sum(b[1:-1, :-1] != b[1:-1, 1:]))  # horizontal
    # each boundary crossing of an interior edge is used by exactly 2
    # squares; border-edge crossings by 1. Count via per-square cases:
    per_square = int(np.sum([len(MS_SEGMENTS.get(c, []))
                             for c in ((b[:-1, :-1] + 2 * b[1:, :-1]
                                        + 4 * b[1:, 1:]
                                        + 8 * b[:-1, 1:]).ravel())]))
    assert len(seg) == per_square
