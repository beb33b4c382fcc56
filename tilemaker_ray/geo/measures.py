"""Geometry measures: spherical area, haversine length, centroid,
pole of inaccessibility.

Reference semantics (/root/reference/src/osm_lua_processing.cpp:529-943
— ``Area()``, ``Length()``, ``Centroid(algorithm)``;
include/polylabel.h — the default "polylabel" centroid for areas):
fresh implementations from the published formulas (spherical excess /
haversine / Mapbox's polylabel grid algorithm), vectorized numpy.
"""

from __future__ import annotations

import heapq

import numpy as np

from .pip import points_in_polygon
from .tilemath import EARTH_RADIUS_M, haversine_m


def ring_area_sq_m(ring: np.ndarray) -> float:
    """Signed spherical polygon area (m²) via the spherical excess
    formula over longitudes/latitudes in degrees (same approach as the
    reference's boost::geometry spherical strategy)."""
    lon = np.radians(ring[:, 0])
    lat = np.radians(ring[:, 1])
    if len(lon) < 3:
        return 0.0
    # shoelace on the sphere: sum of (λ2-λ1)·(2+sin φ1+sin φ2)
    s = np.sum((lon[1:] - lon[:-1]) * (2.0 + np.sin(lat[:-1]) + np.sin(lat[1:])))
    return -s * EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0


def polygon_area_sq_m(rings: list) -> float:
    """|exterior| − |holes| (multipolygon = Σ members, reference
    osm_lua_processing.cpp:529-546)."""
    if not rings:
        return 0.0
    total = abs(ring_area_sq_m(rings[0]))
    for h in rings[1:]:
        total -= abs(ring_area_sq_m(h))
    return total


def line_length_m(coords: np.ndarray) -> float:
    """Haversine polyline length (Length(), reference
    osm_lua_processing.cpp:581-590)."""
    if len(coords) < 2:
        return 0.0
    return float(haversine_m(coords[:-1, 0], coords[:-1, 1],
                             coords[1:, 0], coords[1:, 1]).sum())


def centroid_xy(rings: list) -> tuple:
    """Planar area-weighted centroid of a polygon (boost centroid
    analog). Falls back to vertex mean for degenerate area."""
    ext = rings[0]
    x, y = ext[:-1, 0], ext[:-1, 1]
    x1, y1 = ext[1:, 0], ext[1:, 1]
    cross = x * y1 - x1 * y
    a = cross.sum() / 2.0
    if abs(a) < 1e-12:
        return float(ext[:, 0].mean()), float(ext[:, 1].mean())
    cx = ((x + x1) * cross).sum() / (6.0 * a)
    cy = ((y + y1) * cross).sum() / (6.0 * a)
    return float(cx), float(cy)


def polylabel(rings: list, precision: float = 1e-4) -> tuple:
    """Pole of inaccessibility (Mapbox polylabel grid algorithm —
    the reference vendors the same published algorithm,
    include/polylabel.h): the interior point farthest from the
    boundary. Returns (x, y)."""
    allc = np.vstack(rings)
    minx, miny = allc[:, 0].min(), allc[:, 1].min()
    maxx, maxy = allc[:, 0].max(), allc[:, 1].max()
    w, h = maxx - minx, maxy - miny
    cell = min(w, h)
    if cell == 0:
        return float((minx + maxx) / 2), float((miny + maxy) / 2)
    half = cell / 2.0

    def dist(px, py):
        """Signed distance point→polygon boundary (positive inside)."""
        inside = points_in_polygon(np.asarray([px]), np.asarray([py]), rings)[0]
        d = np.inf
        for ring in rings:
            ax, ay = ring[:-1, 0], ring[:-1, 1]
            bx, by = ring[1:, 0], ring[1:, 1]
            dx, dy = bx - ax, by - ay
            ln = dx * dx + dy * dy
            with np.errstate(divide="ignore", invalid="ignore"):
                t = np.clip(np.where(ln > 0, ((px - ax) * dx + (py - ay) * dy)
                                     / np.where(ln == 0, 1, ln), 0), 0, 1)
            qx, qy = ax + t * dx, ay + t * dy
            d = min(d, float(np.hypot(px - qx, py - qy).min()))
        return d if inside else -d

    # seed: grid of cells + the centroid cell
    heap = []
    x = minx
    while x < maxx:
        y = miny
        while y < maxy:
            c = (x + half, y + half)
            d = dist(*c)
            heapq.heappush(heap, (-(d + half * np.sqrt(2)), half, c, d))
            y += cell
        x += cell
    cx, cy = centroid_xy(rings)
    d = dist(cx, cy)
    best, best_d = (cx, cy), d
    while heap:
        neg_max, hh, c, d = heapq.heappop(heap)
        if d > best_d:
            best, best_d = c, d
        if -neg_max - best_d <= precision:
            continue
        hh2 = hh / 2.0
        for dx in (-hh2, hh2):
            for dy in (-hh2, hh2):
                nc = (c[0] + dx, c[1] + dy)
                nd = dist(*nc)
                heapq.heappush(heap, (-(nd + hh2 * np.sqrt(2)), hh2, nc, nd))
    return float(best[0]), float(best[1])
