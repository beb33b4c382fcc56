"""Web-Mercator tile math + hierarchical tile ids + cell indexes.

Semantics follow the reference tilemaker coordinate kernel
(/root/reference/src/coordinates.cpp:23-41 — ``lat2latp``,
``lon2tilex``, ``latp2tiley`` and inverses;
/root/reference/include/coordinates.h:72-99 — clamping) but are
re-implemented from the published Web-Mercator formulas as vectorized
numpy, not ported line-by-line.

Key conventions (identical to the reference):

- "latp" is the spherical-Mercator-projected latitude in degrees,
  range (-180, 180); lat ±85.0511° maps to latp ±180.
- Tile (x, y) at zoom z: x grows east from lon=-180, y grows SOUTH
  from latp=+180 (top of the Mercator square), both in [0, 2^z).
- A point exactly on a tile edge belongs to the tile with the larger
  index (floor semantics), matching the reference's integer
  truncation.

Tile ids are packed ``(z << 58) | morton(x, y)`` so that the parent of
a tile at zoom z-dz is ``((z-dz) << 58) | (morton >> 2*dz)`` — a pure
bit-shift, mirroring the reference's zoom-halving rollup
(/root/reference/src/tile_data.cpp:169-174) without re-shuffling.
"""

from __future__ import annotations

import numpy as np

MAX_LAT = 85.0511287798066  # atan(sinh(pi)) in degrees; Mercator square edge
ZOOM_SHIFT = 58  # tile_id layout: 6 bits zoom | 58 bits morton(x, y)


def clamp_lat(lat: np.ndarray) -> np.ndarray:
    """Clamp latitudes into the Mercator square (reference clamps at
    ±85.06, include/coordinates.h:94-95)."""
    return np.clip(lat, -MAX_LAT, MAX_LAT)


def lat2latp(lat: np.ndarray) -> np.ndarray:
    """Project geographic latitude → Mercator latitude ("latp"), degrees."""
    lat = clamp_lat(np.asarray(lat, dtype=np.float64))
    return np.degrees(np.log(np.tan(np.radians(lat) / 2.0 + np.pi / 4.0)))


def latp2lat(latp: np.ndarray) -> np.ndarray:
    latp = np.asarray(latp, dtype=np.float64)
    return np.degrees(2.0 * np.arctan(np.exp(np.radians(latp))) - np.pi / 2.0)


def lon2tilex_f(lon: np.ndarray, z: int) -> np.ndarray:
    """Fractional tile x (float), [0, 2^z]."""
    return (np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * float(1 << z)


def latp2tiley_f(latp: np.ndarray, z: int) -> np.ndarray:
    """Fractional tile y (float); y grows south from latp=+180."""
    return (180.0 - np.asarray(latp, dtype=np.float64)) / 360.0 * float(1 << z)


def lat2tiley_f(lat: np.ndarray, z: int) -> np.ndarray:
    return latp2tiley_f(lat2latp(lat), z)


def _floor_clamp(f: np.ndarray, z: int) -> np.ndarray:
    n = (1 << z) - 1
    return np.clip(np.floor(f), 0, n).astype(np.int64)


def lon2tilex(lon: np.ndarray, z: int) -> np.ndarray:
    return _floor_clamp(lon2tilex_f(lon, z), z)


def latp2tiley(latp: np.ndarray, z: int) -> np.ndarray:
    return _floor_clamp(latp2tiley_f(latp, z), z)


def lat2tiley(lat: np.ndarray, z: int) -> np.ndarray:
    return _floor_clamp(lat2tiley_f(lat, z), z)


def tilex2lon(x: np.ndarray, z: int) -> np.ndarray:
    """West edge longitude of tile column x."""
    return np.asarray(x, dtype=np.float64) / float(1 << z) * 360.0 - 180.0


def tiley2latp(y: np.ndarray, z: int) -> np.ndarray:
    """North edge Mercator latitude of tile row y."""
    return 180.0 - np.asarray(y, dtype=np.float64) / float(1 << z) * 360.0


def tile_bbox_latp(x: int, y: int, z: int, margin: float = 0.0):
    """(lon_w, latp_s, lon_e, latp_n) of a tile in (lon, latp) space,
    optionally expanded by ``margin`` fractions of the tile size on each
    side (the reference uses 1/200, src/coordinates_geom.cpp:20-25)."""
    size = 360.0 / float(1 << z)
    lon_w = tilex2lon(np.float64(x), z)
    latp_n = tiley2latp(np.float64(y), z)
    m = size * margin
    return (lon_w - m, latp_n - size - m, lon_w + size + m, latp_n + m)


# ---------------------------------------------------------------------------
# Morton (Z-order) interleave — hierarchical tile ids
# ---------------------------------------------------------------------------

def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 29 bits of v so bit i lands at position 2i."""
    v = np.asarray(v, dtype=np.uint64) & np.uint64((1 << 29) - 1)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _unpart1by1(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


def morton_encode(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Interleave x (even bits) and y (odd bits) → uint64."""
    return _part1by1(x) | (_part1by1(y) << np.uint64(1))


def morton_decode(m: np.ndarray):
    m = np.asarray(m, dtype=np.uint64)
    return _unpart1by1(m), _unpart1by1(m >> np.uint64(1))


def tile_id(z, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Pack (z, x, y) into int64: (z << 58) | morton(x, y).

    Morton keeps the z6→z14 hierarchy contiguous exactly like the
    reference's clustering sort (src/tile_sorting.cpp:8-60): all
    descendants of a tile form one contiguous id range.
    """
    z_arr = np.asarray(z, dtype=np.uint64)
    tid = (z_arr << np.uint64(ZOOM_SHIFT)) | morton_encode(x, y)
    return tid.astype(np.int64)


def tile_id_decode(tid: np.ndarray):
    """tile_id → (z, x, y) int64 arrays."""
    t = np.asarray(tid, dtype=np.uint64)
    z = (t >> np.uint64(ZOOM_SHIFT)).astype(np.int64)
    x, y = morton_decode(t & np.uint64((1 << ZOOM_SHIFT) - 1))
    return z, x.astype(np.int64), y.astype(np.int64)


def tile_id_parent(tid: np.ndarray, dz: int = 1) -> np.ndarray:
    """Parent tile id dz zooms up — pure bit arithmetic (the rollup key
    for per-zoom distinct-tile aggregation, src/tile_data.cpp:151-176)."""
    t = np.asarray(tid, dtype=np.uint64)
    z = t >> np.uint64(ZOOM_SHIFT)
    m = t & np.uint64((1 << ZOOM_SHIFT) - 1)
    return (((z - np.uint64(dz)) << np.uint64(ZOOM_SHIFT))
            | (m >> np.uint64(2 * dz))).astype(np.int64)


def point_tiles(lon: np.ndarray, lat: np.ndarray, z: int):
    """(tile_x, tile_y) of points at zoom z (latpLon2index analog,
    src/coordinates.cpp:38-41)."""
    return lon2tilex(lon, z), lat2tiley(lat, z)


# ---------------------------------------------------------------------------
# Quadtree cell index ("s2_cell" column) — S2-style hierarchical cell id
# ---------------------------------------------------------------------------
# Real S2 uses 6 cube faces + a Hilbert curve; neither library is
# available here, so this is an original single-face quadtree over the
# Mercator square with Morton ordering. It provides the same contract
# the pipeline needs: hierarchical prefix-compatible cell ids where a
# parent id is derivable by bit-shift.

def quad_cell(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """S2-style quadtree cell id at ``level`` (0..29)."""
    x = lon2tilex(lon, level)
    y = lat2tiley(lat, level)
    return tile_id(level, x, y)


# ---------------------------------------------------------------------------
# Hexagonal cell index ("h3_cell" column) — H3-style hex binning
# ---------------------------------------------------------------------------
# Original implementation of hexagonal binning over the (lon, latp)
# plane (pointy-top axial coordinates + cube rounding, the standard
# published hex-grid algorithm). Not Uber H3's exact ids (no h3 lib in
# this environment) but a true hexagonal partition usable as a join
# prefilter key; resolution r halves the circumradius per step.

_HEX_BASE_R = 45.0  # circumradius at resolution 0, degrees in (lon, latp)
_HEX_OFF = np.int64(1 << 27)
_SQRT3 = np.sqrt(3.0)


def hex_radius(res: int) -> float:
    return _HEX_BASE_R / float(1 << res)


def hex_cell_xy(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    """Hex cell id from PROJECTED (lon, latp) coords — the single
    implementation of the axial math + bit layout (callers that already
    hold latp values use this directly; drift between copies would
    silently break prefilter/cover agreement)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    R = hex_radius(res)
    # pointy-top axial fractional coords
    qf = (_SQRT3 / 3.0 * x - y / 3.0) / R
    rf = (2.0 / 3.0 * y) / R
    q, r = _cube_round(qf, rf)
    cell = ((np.uint64(res) << np.uint64(56))
            | ((q + _HEX_OFF).astype(np.uint64) << np.uint64(28))
            | (r + _HEX_OFF).astype(np.uint64))
    return cell.astype(np.int64)


def hex_cell(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """H3-style hex cell id at resolution ``res`` (0..20).

    Layout: (res << 56) | ((q + 2^27) << 28) | (r + 2^27) with (q, r)
    the axial coordinates of the containing hexagon.
    """
    return hex_cell_xy(np.asarray(lon, dtype=np.float64), lat2latp(lat),
                       res)


def hex_cell_decode(cell: np.ndarray):
    """hex cell id → (res, q, r)."""
    c = np.asarray(cell, dtype=np.uint64)
    res = (c >> np.uint64(56)).astype(np.int64)
    q = ((c >> np.uint64(28)) & np.uint64((1 << 28) - 1)).astype(np.int64) - _HEX_OFF
    r = (c & np.uint64((1 << 28) - 1)).astype(np.int64) - _HEX_OFF
    return res, q, r


def hex_center(cell: np.ndarray):
    """(lon, latp) centers of hex cells."""
    res, q, r = hex_cell_decode(cell)
    R = _HEX_BASE_R / (1 << res).astype(np.float64)
    x = R * _SQRT3 * (q.astype(np.float64) + r.astype(np.float64) / 2.0)
    y = R * 1.5 * r.astype(np.float64)
    return x, y


def _cube_round(qf: np.ndarray, rf: np.ndarray):
    """Round fractional axial coords to the nearest hex (cube rounding)."""
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def hex_cells_in_bbox(lon_min: float, lat_min: float, lon_max: float,
                      lat_max: float, res: int) -> np.ndarray:
    """All hex cells whose center lies within the bbox expanded by one
    circumradius — a conservative cover: every point inside the bbox has
    its containing cell in this set (cell centers are ≤ R from any point
    of the cell). Used to precompute polygon cell covers for the PIP
    join prefilter (analog of the z6/z15 bitmap index,
    /root/reference/src/shp_mem_tiles.cpp:65-127)."""
    R = hex_radius(res)
    y_min = float(lat2latp(np.float64(lat_min))) - R
    y_max = float(lat2latp(np.float64(lat_max))) + R
    x_min, x_max = lon_min - R, lon_max + R
    # axial r range from y, q range from x given r
    r_lo = int(np.floor((y_min / 1.5) / R)) - 1
    r_hi = int(np.ceil((y_max / 1.5) / R)) + 1
    rows = []
    for r in range(r_lo, r_hi + 1):
        y = R * 1.5 * r
        q_lo = int(np.floor((x_min / (_SQRT3 * R)) - r / 2.0)) - 1
        q_hi = int(np.ceil((x_max / (_SQRT3 * R)) - r / 2.0)) + 1
        q = np.arange(q_lo, q_hi + 1, dtype=np.int64)
        x = R * _SQRT3 * (q + r / 2.0)
        keep = (x >= x_min) & (x <= x_max) & (y >= y_min) & (y <= y_max)
        q = q[keep]
        if len(q):
            rows.append((q, np.full(len(q), r, dtype=np.int64)))
    if not rows:
        # degenerate: return the cell containing the bbox center
        return hex_cell(np.array([(lon_min + lon_max) / 2.0]),
                        np.array([(lat_min + lat_max) / 2.0]), res)
    qs = np.concatenate([a for a, _ in rows])
    rs = np.concatenate([b for _, b in rows])
    cell = ((np.uint64(res) << np.uint64(56))
            | ((qs + _HEX_OFF).astype(np.uint64) << np.uint64(28))
            | (rs + _HEX_OFF).astype(np.uint64))
    return cell.astype(np.int64)


# ---------------------------------------------------------------------------
# Distance / scale helpers (degp2meter analog, src/coordinates.cpp:43-50)
# ---------------------------------------------------------------------------

EARTH_RADIUS_M = 6371008.8


def degp2meter(degp: np.ndarray, latp: np.ndarray) -> np.ndarray:
    """Mercator-projected degrees → meters at the given projected lat."""
    lat = latp2lat(latp)
    return (np.pi * EARTH_RADIUS_M / 180.0) * degp * np.cos(np.radians(lat))


def meter2degp(m: np.ndarray, latp: np.ndarray) -> np.ndarray:
    lat = latp2lat(latp)
    return m / ((np.pi * EARTH_RADIUS_M / 180.0) * np.cos(np.radians(lat)))


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters (Length() analog,
    /root/reference/src/osm_lua_processing.cpp:581-590)."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(np.asarray(lon2, dtype=np.float64) - np.asarray(lon1, dtype=np.float64))
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))
