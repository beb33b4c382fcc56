"""Unit tests for the combine_polygons geometric union
(geo/polyunion.py) — reference semantics: adjacent compatible
polygons dissolve shared borders into one ring
(/root/reference/src/tile_worker.cpp:393-405, src/geom.cpp:232-290)."""

import numpy as np
import pytest

from tilemaker_ray.geo.polyunion import union_polygon_runs
from tilemaker_ray.geo.clip import ring_area


def sq(x0, y0, x1, y1):
    """Closed exterior ring in the _finish_ring convention
    (negative shoelace)."""
    r = np.asarray([[x0, y0], [x0, y1], [x1, y1], [x1, y0], [x0, y0]],
                   dtype=np.int64)
    assert ring_area(r.astype(np.float64)) < 0
    return r


def hole(x0, y0, x1, y1):
    """Closed hole ring (positive shoelace)."""
    return sq(x0, y0, x1, y1)[::-1].copy()


def total_area(rings):
    return sum(ring_area(r.astype(np.float64)) for r in rings)


def test_two_adjacent_squares_merge_to_one_ring():
    a, b = sq(0, 0, 10, 10), sq(10, 0, 20, 10)
    out = union_polygon_runs([[a], [b]])
    assert out is not None and len(out) == 1
    ring = out[0]
    assert ring_area(ring.astype(np.float64)) == -200.0
    # the dissolved border (x=10) is gone
    assert not ((ring[:, 0] == 10) & (ring[:, 1] > 0)
                & (ring[:, 1] < 10)).any()


def test_partial_shared_border_with_t_junction():
    # b's border spans only half of a's right edge -> collinear split
    a, b = sq(0, 0, 10, 10), sq(10, 0, 20, 5)
    out = union_polygon_runs([[a], [b]])
    assert out is not None and len(out) == 1
    assert ring_area(out[0].astype(np.float64)) == -(100 + 50)


def test_disjoint_squares_pass_through_unchanged():
    a, b = sq(0, 0, 10, 10), sq(100, 100, 110, 110)
    out = union_polygon_runs([[a], [b]])
    # nothing to dissolve -> None tells the caller to keep concat
    assert out is None


def test_corner_touching_squares_stay_two_simple_rings():
    a, b = sq(0, 0, 10, 10), sq(10, 10, 20, 20)
    out = union_polygon_runs([[a], [b]])
    # bboxes touch -> same component; no shared border edges -> the
    # stitch reproduces both rings (valid either as None or 2 rings)
    if out is not None:
        assert len(out) == 2
        assert total_area(out) == -200.0


def test_three_in_a_row_union_find_transitivity():
    out = union_polygon_runs([[sq(0, 0, 10, 10)], [sq(20, 0, 30, 10)],
                              [sq(10, 0, 20, 10)]])
    assert out is not None and len(out) == 1
    assert ring_area(out[0].astype(np.float64)) == -300.0


def test_ring_of_squares_creates_hole():
    # 3x3 grid of unit-10 squares minus the center -> donut: one
    # exterior + one hole
    feats = []
    for i in range(3):
        for j in range(3):
            if (i, j) != (1, 1):
                feats.append([sq(i * 10, j * 10, i * 10 + 10,
                                 j * 10 + 10)])
    out = union_polygon_runs(feats)
    assert out is not None and len(out) == 2
    areas = sorted(ring_area(r.astype(np.float64)) for r in out)
    assert areas == [-900.0, 100.0]
    # MVT order: exterior first, its hole after
    assert ring_area(out[0].astype(np.float64)) < 0


def test_hole_preserved_through_union():
    # a donut next to a plain square sharing the donut's outer border
    donut = [sq(0, 0, 30, 30), hole(10, 10, 20, 20)]
    plain = [sq(30, 0, 40, 30)]
    out = union_polygon_runs([donut, plain])
    assert out is not None and len(out) == 2
    assert total_area(out) == -(900 - 100 + 300)


def test_overlapping_squares_fall_back_to_concat():
    a, b = sq(0, 0, 10, 10), sq(5, 0, 15, 10)
    out = union_polygon_runs([[a], [b]])
    assert out is None


def test_shared_border_with_mismatched_vertices():
    # a's right border has an extra vertex at (10,5); b's doesn't —
    # collinear splitting still cancels the full border
    a = np.asarray([[0, 0], [0, 10], [10, 10], [10, 5], [10, 0],
                    [0, 0]], dtype=np.int64)
    assert ring_area(a.astype(np.float64)) < 0
    out = union_polygon_runs([[a], [sq(10, 0, 20, 10)]])
    assert out is not None and len(out) == 1
    assert ring_area(out[0].astype(np.float64)) == -200.0


def test_determinism():
    feats = [[sq(0, 0, 10, 10)], [sq(10, 0, 20, 10)],
             [sq(0, 10, 10, 20)], [sq(40, 40, 50, 50)]]
    r1 = union_polygon_runs([list(f) for f in feats])
    r2 = union_polygon_runs([list(f) for f in feats])
    assert r1 is not None
    assert len(r1) == len(r2)
    for x, y in zip(r1, r2):
        assert (x == y).all()


def test_oversize_run_falls_back():
    from tilemaker_ray.geo import polyunion
    big = np.asarray([[i, (i * 7919) % 4096] for i in range(3000)]
                     + [[0, 0]], dtype=np.int64)
    out = union_polygon_runs([[big], [big.copy()],
                              [sq(0, 0, 1, 1)]])
    assert out is None  # > MAX_UNION_EDGES


def test_crossing_sliver_overlap_falls_back():
    """Review-found: a sub-half-cell crossing sliver slipped past the
    float area screen and produced a spurious extra ring. The exact
    proper-crossing test must force the concat fallback."""
    a = sq(0, 0, 10, 10)
    b = np.asarray([[10, 0], [10, 4], [9, 5], [10, 5], [10, 10],
                    [20, 10], [20, 0], [10, 0]], dtype=np.int64)
    assert ring_area(b.astype(np.float64)) < 0
    out = union_polygon_runs([[a], [b]])
    assert out is None          # overlap detected -> keep concat
