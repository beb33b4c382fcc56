"""Tile rasterization: which tiles does a geometry touch?

The fan-out kernel behind the tile shuffle — the analog of
``insertIntermediateTiles`` (supercover line traversal,
/root/reference/src/coordinates_geom.cpp:111-189) and
``fillCoveredTiles`` (polygon interior fill,
/root/reference/src/coordinates.cpp:52, src/tile_data.cpp). Fresh
implementation: Amanatides–Woo grid traversal for segments; interior
fill = boundary supercover ∪ tiles whose center is inside (exactly the
set of tiles intersecting the polygon, because a tile not crossed by
the boundary is either fully inside — center inside — or fully
outside).

All coordinates here are in *fractional tile units* at a fixed zoom
(x = lon2tilex_f, y = lat2tiley_f), so tile assignment inherits the
reference's floor-truncation semantics exactly.
"""

from __future__ import annotations

import numpy as np

from .pip import points_in_polygon


def supercover_segment(x0: float, y0: float, x1: float, y1: float,
                       zmax: int) -> np.ndarray:
    """All (tx, ty) integer tiles a segment passes through, in traversal
    order. Amanatides–Woo; endpoints in fractional tile units."""
    n = (1 << zmax) - 1
    tx = min(max(int(np.floor(x0)), 0), n)
    ty = min(max(int(np.floor(y0)), 0), n)
    tx1 = min(max(int(np.floor(x1)), 0), n)
    ty1 = min(max(int(np.floor(y1)), 0), n)
    out = [(tx, ty)]
    dx, dy = x1 - x0, y1 - y0
    step_x = 1 if dx > 0 else -1
    step_y = 1 if dy > 0 else -1
    if dx != 0:
        t_max_x = ((tx + (step_x > 0)) - x0) / dx
        t_dx = abs(1.0 / dx)
    else:
        t_max_x, t_dx = np.inf, np.inf
    if dy != 0:
        t_max_y = ((ty + (step_y > 0)) - y0) / dy
        t_dy = abs(1.0 / dy)
    else:
        t_max_y, t_dy = np.inf, np.inf
    # guard: at most the Manhattan tile distance + slack steps
    max_steps = abs(tx1 - tx) + abs(ty1 - ty) + 2
    for _ in range(max_steps):
        if tx == tx1 and ty == ty1:
            break
        if t_max_x < t_max_y:
            t_max_x += t_dx
            tx += step_x
        else:
            t_max_y += t_dy
            ty += step_y
        tx = min(max(tx, 0), n)
        ty = min(max(ty, 0), n)
        out.append((tx, ty))
    return np.asarray(out, dtype=np.int64).reshape(-1, 2)


def line_tiles(coords_tile: np.ndarray, zmax: int) -> np.ndarray:
    """Distinct (tx, ty) tiles touched by a polyline (fractional tile
    units). Supercover per segment, deduped."""
    segs = [supercover_segment(coords_tile[i, 0], coords_tile[i, 1],
                               coords_tile[i + 1, 0], coords_tile[i + 1, 1], zmax)
            for i in range(len(coords_tile) - 1)]
    if not segs:
        return np.empty((0, 2), dtype=np.int64)
    allt = np.vstack(segs)
    return np.unique(allt, axis=0)


def polygon_tiles(rings_tile: list, zmax: int) -> np.ndarray:
    """Distinct tiles intersecting a polygon (rings in fractional tile
    units): boundary supercover ∪ interior tiles (center-in-polygon over
    the bbox grid). Matches the reference's boundary-walk + fill
    (src/tile_data.cpp:546-608 semantics)."""
    boundary = [line_tiles(r, zmax) for r in rings_tile]
    btiles = np.vstack(boundary) if boundary else np.empty((0, 2), dtype=np.int64)
    allc = np.vstack(rings_tile)
    n = (1 << zmax) - 1
    tx0 = int(np.clip(np.floor(allc[:, 0].min()), 0, n))
    tx1 = int(np.clip(np.floor(allc[:, 0].max()), 0, n))
    ty0 = int(np.clip(np.floor(allc[:, 1].min()), 0, n))
    ty1 = int(np.clip(np.floor(allc[:, 1].max()), 0, n))
    xs = np.arange(tx0, tx1 + 1, dtype=np.int64)
    ys = np.arange(ty0, ty1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    cx = gx.ravel().astype(np.float64) + 0.5
    cy = gy.ravel().astype(np.float64) + 0.5
    inside = points_in_polygon(cx, cy, rings_tile)
    interior = np.stack([gx.ravel()[inside], gy.ravel()[inside]], axis=1)
    allt = np.vstack([btiles, interior])
    if len(allt) == 0:
        return allt
    return np.unique(allt, axis=0)
