"""±180° antimeridian splitting.

Web-mercator tile math is periodic in longitude; a segment recorded as
179.9 → −179.9 is a short hop across the date line, but mapped
linearly it sweeps the whole world width — wrong tile fan-out and a
world-wide sliver in the encoder. The fix (no reference analog — the
reference inherits the defect): unwrap longitudes to a continuous
coordinate (successive deltas forced into ±180), then clip the
geometry to each 360°-wide world window it touches and shift every
part back into [−180, 180].

``normalize_payload`` is the single entry point both the fan-out
rasterizer and the tile encoder call right after WKB parse; geometries
that do not cross (the overwhelming case) are returned unchanged with
one vectorized check.
"""

from __future__ import annotations

import numpy as np

from . import clip as _clip
from . import wkb as _wkb

_LAT_INF = 1e9
# keep split endpoints a hair inside the window so lon2tilex never
# lands exactly on the 2^z boundary tile
_EPS = 1e-9


def unwrap_lons(lons: np.ndarray) -> np.ndarray:
    """Continuous longitudes: each successive delta folded into ±180."""
    d = np.diff(lons)
    adj = np.zeros_like(lons)
    adj[1:] = np.cumsum(np.where(d > 180, -360.0, np.where(d < -180, 360.0,
                                                           0.0)))
    return lons + adj


def crosses(coords: np.ndarray) -> bool:
    """Any successive-lon jump > 180°?"""
    if len(coords) < 2:
        return False
    return bool((np.abs(np.diff(coords[:, 0])) > 180).any())


def _windows(lons: np.ndarray):
    lo, hi = float(lons.min()), float(lons.max())
    k0 = int(np.floor((lo + 180.0) / 360.0))
    k1 = int(np.floor((hi + 180.0) / 360.0))
    return range(k0, k1 + 1)


def split_line(coords: np.ndarray) -> list:
    """Line (lon, lat) → list of parts, each within [−180, 180]."""
    c = np.asarray(coords, dtype=np.float64)
    if not crosses(c):
        return [c]
    u = c.copy()
    u[:, 0] = unwrap_lons(c[:, 0])
    out = []
    for k in _windows(u[:, 0]):
        x0 = -180.0 + 360.0 * k + _EPS
        x1 = 180.0 + 360.0 * k - _EPS
        for run in _clip.clip_linestring(u, x0, -_LAT_INF, x1, _LAT_INF):
            part = run.copy()
            part[:, 0] -= 360.0 * k
            out.append(part)
    return out


def split_polygon(rings: list) -> list:
    """Polygon (list of rings, ring 0 exterior) → list of (rings per
    window) polygons, each within [−180, 180]. Rings are unwrapped
    relative to the exterior's first vertex so holes stay aligned."""
    ext = np.asarray(rings[0], dtype=np.float64)
    if not any(crosses(np.asarray(r, dtype=np.float64)) for r in rings):
        return [rings]
    base = ext[0, 0]
    urings = []
    for r in rings:
        u = np.asarray(r, dtype=np.float64).copy()
        u[:, 0] = unwrap_lons(u[:, 0])
        # align the ring's start into the same continuous frame as the
        # exterior (a hole fully on the far side starts ±360 away)
        shift = np.round((u[0, 0] - base) / 360.0) * 360.0
        u[:, 0] -= shift
        urings.append(u)
    out = []
    for k in _windows(np.concatenate([u[:, 0] for u in urings])):
        x0 = -180.0 + 360.0 * k + _EPS
        x1 = 180.0 + 360.0 * k - _EPS
        parts = []
        for u in urings:
            cpart = _clip.clip_ring(u, x0, -_LAT_INF, x1, _LAT_INF)
            if cpart is not None and len(cpart) >= 4:
                p = cpart.copy()
                p[:, 0] -= 360.0 * k
                parts.append(p)
        if parts:
            out.append(parts)
    return out


def normalize_payload(gt: int, payload):
    """(geom type, parsed payload) → same, with any antimeridian-
    crossing parts split; non-crossing input returns unchanged."""
    if gt == _wkb.LINESTRING:
        parts = split_line(payload)
        if len(parts) == 1:
            return gt, parts[0]
        return _wkb.MULTILINESTRING, parts
    if gt == _wkb.MULTILINESTRING:
        if not any(crosses(p) for p in payload):
            return gt, payload
        out = []
        for p in payload:
            out.extend(split_line(p))
        return gt, out
    if gt == _wkb.POLYGON:
        polys = split_polygon(payload)
        if len(polys) == 1:
            return gt, polys[0]
        return _wkb.MULTIPOLYGON, polys
    if gt == _wkb.MULTIPOLYGON:
        if not any(crosses(np.asarray(r)) for rings in payload
                   for r in rings):
            return gt, payload
        out = []
        for rings in payload:
            out.extend(split_polygon(rings))
        return gt, out
    return gt, payload
