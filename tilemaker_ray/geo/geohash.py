"""Geohash encoding (Niemeyer 2008, public domain spec) — vectorized.

The classic base-32 spatial key: quantize lon to 2^ceil(b/2) cells and
lat to 2^floor(b/2) cells, bit-interleave MSB-first starting with lon,
emit 5-bit groups through the geohash alphabet. The same prefix-tree
property tilemaker gets from z/x/y tiles (reference tile_id Morton
keys, src/coordinates.h) — geohash is the third cell family next to
the hex and quadtree cells in this repo, kept because web corpora
(GeoNames, CC geo-extractions) key on it.

Float math is a single (v + off) / span * 2^k then floor — mirrored
op-for-op by ``geohash6_sql`` so DuckDB hashes match bit-exactly.
"""

from __future__ import annotations

import numpy as np

ALPHABET = b"0123456789bcdefghjkmnpqrstuvwxyz"
_ALPHA_ARR = np.frombuffer(ALPHABET, dtype=np.uint8)


def _spread15(v: np.ndarray) -> np.ndarray:
    """Insert a zero bit after each of the low 15 bits (int64 in/out)."""
    v = v.astype(np.int64)
    v = (v | (v << 16)) & 0x0000FFFF0000FFFF
    v = (v | (v << 8)) & 0x00FF00FF00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0F
    v = (v | (v << 2)) & 0x3333333333333333
    v = (v | (v << 1)) & 0x5555555555555555
    return v


def geohash6_int(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """The 30-bit geohash-6 integer code (15 lon bits, 15 lat bits,
    lon first / MSB first)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = np.clip(np.floor((lon + 180.0) / 360.0 * 32768.0),
                0, 32767).astype(np.int64)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * 32768.0),
                0, 32767).astype(np.int64)
    # MSB-first interleave starting with lon: even bit positions
    # (from the top) take lon bits
    return (_spread15(x) << 1) | _spread15(y)


def geohash6(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Vectorized geohash-6 strings (numpy 'S6' array)."""
    g = geohash6_int(lon, lat)
    out = np.empty((len(g), 6), dtype=np.uint8)
    for k in range(6):
        out[:, k] = _ALPHA_ARR[(g >> (25 - 5 * k)) & 31]
    return out.view("S6").ravel()


def geohash6_sql(lon_sql: str, lat_sql: str) -> str:
    """ANSI-SQL mirror of ``geohash6``: the same quantization, the
    same 30-term interleave, the same alphabet lookup — so a DuckDB
    oracle reproduces the strings bit-exactly."""
    x = (f"CAST(least(greatest(floor(({lon_sql} + 180.0) / 360.0 "
         f"* 32768.0), 0), 32767) AS BIGINT)")
    y = (f"CAST(least(greatest(floor(({lat_sql} + 90.0) / 180.0 "
         f"* 32768.0), 0), 32767) AS BIGINT)")
    terms = []
    for i in range(30):  # bit i from the top of the 30-bit code
        src, j = (x, 14 - i // 2) if i % 2 == 0 else (y, 14 - i // 2)
        terms.append(f"(((({src}) >> {j}) & 1) << {29 - i})")
    g = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{ALPHABET.decode()}', "
        f"CAST((({g} >> {25 - 5 * k}) & 31) AS INTEGER) + 1, 1)"
        for k in range(6)]
    return "(" + " || ".join(chars) + ")"
