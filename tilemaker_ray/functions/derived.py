"""Deterministic geo columns derived from the driver's TPC-H-ish tables.

The driver's correctness gate compares each Ray query against ANSI SQL
run by DuckDB over the same parquet views (region nation customer
supplier part orders lineitem events documents embeddings). Those
tables carry no coordinates, so geospatial queries derive (lon, lat)
from integer keys with EXACT integer arithmetic followed by a single
division — bit-identical between numpy float64 and DuckDB DOUBLE, so
value hashes match.

The same formulas exist twice by design: vectorized numpy here, ANSI
SQL strings in ``oracle_sql_fragments`` — keep them in lockstep.
"""

from __future__ import annotations

import numpy as np

# events → points: lat ∈ (-85, 85), lon ∈ (-180, 180), lattice of
# 1/1000° steps (never exactly on a tile boundary at the zooms used)
EV_LON_SQL = "(((e.event_id * 2654435761) % 360000) / 1000.0 - 180.0)"
EV_LAT_SQL = "(((e.event_id * 40503) % 170000) / 1000.0 - 85.0)"


def event_lonlat(event_id: np.ndarray):
    eid = np.asarray(event_id, dtype=np.int64)
    lon = ((eid * 2654435761) % 360000) / 1000.0 - 180.0
    lat = ((eid * 40503) % 170000) / 1000.0 - 85.0
    return lon, lat


# customers → points (used by the kNN query)
CU_LON_SQL = "(((c.c_custkey * 48271) % 360000) / 1000.0 - 180.0)"
CU_LAT_SQL = "(((c.c_custkey * 16807) % 170000) / 1000.0 - 85.0)"


def customer_lonlat(custkey: np.ndarray):
    ck = np.asarray(custkey, dtype=np.int64)
    lon = ((ck * 48271) % 360000) / 1000.0 - 180.0
    lat = ((ck * 16807) % 170000) / 1000.0 - 85.0
    return lon, lat


# nations → diamond admin regions (PIP small side) and kNN centers.
# Half-widths chosen so lattice points never sit exactly on an edge.
NA_LON_SQL = "((((n.n_nationkey * 47) % 340) - 170) + 7.3)"
NA_LAT_SQL = "((((n.n_nationkey * 31) % 140) - 70) + 3.7)"
NA_W = 8.6
NA_H = 6.2


def nation_lonlat(nationkey: np.ndarray):
    nk = np.asarray(nationkey, dtype=np.int64)
    lon = ((nk * 47) % 340) - 170 + 7.3
    lat = ((nk * 31) % 140) - 70 + 3.7
    return lon.astype(np.float64), lat.astype(np.float64)


def tilex_sql(lon_sql: str, z: int) -> str:
    """SQL mirror of geo.tilemath.lon2tilex (floor semantics)."""
    n = 1 << z
    return (f"CAST(least(greatest(floor(({lon_sql} + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT)")


def tiley_sql(lat_sql: str, z: int) -> str:
    """SQL mirror of geo.tilemath.lat2tiley: latp projection + floor.

    numpy: degrees(log(tan(radians(lat)/2 + pi/4))); DuckDB spells the
    identical double-precision expression.
    """
    n = 1 << z
    latp = f"degrees(ln(tan(radians({lat_sql}) / 2.0 + pi() / 4.0)))"
    return (f"CAST(least(greatest(floor((180.0 - {latp}) / 360.0 * {n}), 0), {n - 1}) AS BIGINT)")
