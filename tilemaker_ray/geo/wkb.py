"""Minimal WKB codec (little-endian, 2D) for geometry columns.

Geometries travel between Ray Data stages as WKB in Arrow binary
columns (zero-copy through the object store) — the role played by the
reference's in-process geometry stores
(/root/reference/include/tile_data.h:246-258), which a share-nothing
engine replaces with inline serialized geometry.

Supported types: Point(1) LineString(2) Polygon(3) MultiPoint(4)
MultiLineString(5) MultiPolygon(6). Coordinates are (lon, lat) WGS84
float64 unless a docstring says (lon, latp).
"""

from __future__ import annotations

import struct

import numpy as np

POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 4, 5, 6

_HDR = struct.Struct("<BI")
_U32 = struct.Struct("<I")


def point_wkb(lon: float, lat: float) -> bytes:
    return _HDR.pack(1, POINT) + struct.pack("<dd", lon, lat)


def points_wkb(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Vectorized: N points → object array of N WKB byte strings."""
    n = len(lon)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1
    buf[:, 1:5] = np.frombuffer(_U32.pack(POINT), dtype=np.uint8)
    buf[:, 5:13] = np.asarray(lon, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.asarray(lat, dtype="<f8").view(np.uint8).reshape(n, 8)
    return np.array([b.tobytes() for b in buf], dtype=object)


def linestring_wkb(coords: np.ndarray) -> bytes:
    """coords: (N, 2) float64."""
    c = np.ascontiguousarray(coords, dtype="<f8")
    return _HDR.pack(1, LINESTRING) + _U32.pack(len(c)) + c.tobytes()


def _ring_bytes(ring: np.ndarray) -> bytes:
    r = np.asarray(ring, dtype="<f8")
    if len(r) and not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return _U32.pack(len(r)) + np.ascontiguousarray(r).tobytes()


def polygon_wkb(exterior: np.ndarray, holes: list | None = None) -> bytes:
    rings = [exterior] + list(holes or [])
    return (_HDR.pack(1, POLYGON) + _U32.pack(len(rings))
            + b"".join(_ring_bytes(r) for r in rings))


def multipolygon_wkb(polygons: list) -> bytes:
    """polygons: list of (exterior, holes) tuples."""
    body = b"".join(polygon_wkb(ext, holes) for ext, holes in polygons)
    return _HDR.pack(1, MULTIPOLYGON) + _U32.pack(len(polygons)) + body


def multilinestring_wkb(lines: list) -> bytes:
    body = b"".join(linestring_wkb(l) for l in lines)
    return _HDR.pack(1, MULTILINESTRING) + _U32.pack(len(lines)) + body


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u32(self) -> int:
        v = _U32.unpack_from(self.buf, self.pos)[0]
        self.pos += 4
        return v

    def coords(self, n: int) -> np.ndarray:
        a = np.frombuffer(self.buf, dtype="<f8", count=2 * n, offset=self.pos)
        self.pos += 16 * n
        return a.reshape(n, 2)


def parse_wkb(buf: bytes):
    """WKB → (geom_type, payload).

    - POINT           → (1, (2,) array)
    - LINESTRING      → (2, (N,2) array)
    - POLYGON         → (3, [ring0, ring1, ...] each (N,2); ring0 exterior)
    - MULTIPOINT      → (4, (N,2) array)
    - MULTILINESTRING → (5, [line, ...])
    - MULTIPOLYGON    → (6, [[rings...], ...])
    """
    r = _Reader(buf)
    return _parse_one(r)


def _parse_one(r: _Reader):
    endian = r.u8()
    if endian != 1:
        raise ValueError("big-endian WKB not supported")
    gt = r.u32() & 0xFF  # mask off SRID/Z flags
    if gt == POINT:
        return gt, r.coords(1)[0]
    if gt == LINESTRING:
        return gt, r.coords(r.u32())
    if gt == POLYGON:
        return gt, [r.coords(r.u32()) for _ in range(r.u32())]
    if gt == MULTIPOINT:
        n = r.u32()
        pts = np.empty((n, 2))
        for i in range(n):
            _, p = _parse_one(r)
            pts[i] = p
        return gt, pts
    if gt == MULTILINESTRING:
        return gt, [_parse_one(r)[1] for _ in range(r.u32())]
    if gt == MULTIPOLYGON:
        return gt, [_parse_one(r)[1] for _ in range(r.u32())]
    raise ValueError(f"unsupported WKB geometry type {gt}")


def wkb_rings(buf: bytes) -> list:
    """All rings of a POLYGON/MULTIPOLYGON (exteriors + holes), plus a
    parallel list of is_hole flags."""
    gt, payload = parse_wkb(buf)
    rings, holes = [], []
    if gt == POLYGON:
        polys = [payload]
    elif gt == MULTIPOLYGON:
        polys = payload
    else:
        raise ValueError("not a polygon")
    for p in polys:
        for i, ring in enumerate(p):
            rings.append(ring)
            holes.append(i > 0)
    return rings, holes


def wkb_bbox(buf: bytes):
    """(xmin, ymin, xmax, ymax) of any supported geometry."""
    gt, payload = parse_wkb(buf)
    if gt == POINT:
        x, y = payload
        return (x, y, x, y)
    if gt in (LINESTRING, MULTIPOINT):
        return (payload[:, 0].min(), payload[:, 1].min(),
                payload[:, 0].max(), payload[:, 1].max())
    if gt == POLYGON:
        ext = payload[0]
        return (ext[:, 0].min(), ext[:, 1].min(), ext[:, 0].max(), ext[:, 1].max())
    if gt == MULTILINESTRING:
        allc = np.vstack(payload)
        return (allc[:, 0].min(), allc[:, 1].min(), allc[:, 0].max(), allc[:, 1].max())
    if gt == MULTIPOLYGON:
        allc = np.vstack([p[0] for p in payload])
        return (allc[:, 0].min(), allc[:, 1].min(), allc[:, 0].max(), allc[:, 1].max())
    raise ValueError(f"unsupported geometry type {gt}")
