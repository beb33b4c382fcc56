"""Marching-squares isoline extraction (binary field, no
interpolation).

The raster→vector inverse of the engine's vector→raster tiling path
(the reference rasterizes geometry into tile grids,
/root/reference/src/coordinates_geom.cpp:111-189; GIS pipelines also
run contour extraction the other way). Vertices are edge midpoints, so
in DOUBLED grid coordinates every endpoint is an exact integer — both
the numpy walk here and the SQL VALUES-lookup oracle in
pipelines/queries.py emit identical rows.

Case id for the square with SW corner (i, j):
``b[i,j] + 2·b[i+1,j] + 4·b[i+1,j+1] + 8·b[i,j+1]``; midpoints in
square-local doubled coords are W=(0,1) S=(1,0) E=(2,1) N=(1,2).
Saddle cases 5/10 split per inside-corner (the standard
no-center-sample default), so output is a pure function of the field.
"""

from __future__ import annotations

import numpy as np

# per case: up to two (dx0, dy0, dx1, dy1) segments, endpoints in
# canonical (lexicographic) order within each segment
MS_SEGMENTS: dict[int, list[tuple[int, int, int, int]]] = {
    1: [(0, 1, 1, 0)], 2: [(1, 0, 2, 1)], 3: [(0, 1, 2, 1)],
    4: [(1, 2, 2, 1)], 5: [(0, 1, 1, 0), (1, 2, 2, 1)],
    6: [(1, 0, 1, 2)], 7: [(0, 1, 1, 2)], 8: [(0, 1, 1, 2)],
    9: [(1, 0, 1, 2)], 10: [(1, 0, 2, 1), (0, 1, 1, 2)],
    11: [(1, 2, 2, 1)], 12: [(0, 1, 2, 1)], 13: [(1, 0, 2, 1)],
    14: [(0, 1, 1, 0)]}


def marching_squares(b: np.ndarray) -> np.ndarray:
    """Boundary segments of the binary field ``b`` (shape (nx, ny),
    0/1 samples on lattice nodes). Returns an (n, 4) int64 array of
    (x0_2, y0_2, x1_2, y1_2) in doubled grid coordinates."""
    b = np.asarray(b, dtype=np.int64)
    cases = (b[:-1, :-1] + 2 * b[1:, :-1]
             + 4 * b[1:, 1:] + 8 * b[:-1, 1:])
    out = []
    for cs, segs in MS_SEGMENTS.items():
        ii, jj = np.nonzero(cases == cs)
        if not len(ii):
            continue
        for dx0, dy0, dx1, dy1 in segs:
            out.append(np.stack([2 * ii + dx0, 2 * jj + dy0,
                                 2 * ii + dx1, 2 * jj + dy1], axis=1))
    if not out:
        return np.empty((0, 4), np.int64)
    return np.concatenate(out, axis=0).astype(np.int64)
