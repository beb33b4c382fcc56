"""Tile fan-out: feature → (z6 subtree, base-zoom tile list) rows.

The analog of the reference's feature→tile indexing
(insertIntermediateTiles supercover + fillCoveredTiles,
/root/reference/src/coordinates_geom.cpp:111-189,
src/coordinates.cpp:52) and its z6-bucket clustering
(/root/reference/include/tile_data.h:279-288): every feature is
rasterized ONCE at the base zoom, and the resulting tile set is keyed
by its z6 ancestor(s). The tile shuffle then groups by ``z6_id`` so one
``map_groups`` task owns an entire z6 subtree — giving the same
clip/sort locality the reference gets from its clustering sort
(src/tile_sorting.cpp:8-60) and clip cache (include/clip_cache.h).

Lower-zoom tile sets (z6..basezoom-1) derive EXACTLY from the
base-zoom set by halving tile coords (a z-tile intersects the geometry
iff one of its base-zoom descendants does), mirroring
src/tile_data.cpp:169-174 — so rasterization happens once, not per
zoom.

Skew handling: features in a z6 subtree whose row count exceeds
``hot_tile_rows`` can be salted into ``(z6_id, salt)`` sub-groups by a
deterministic url hash; the encode stage merges salted sub-groups
before the per-tile sort so output is independent of salting (see
tile_encode.merge_salted).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..geo import raster, tilemath as tm
from ..geo import wkb as _wkb

FANOUT_FIELDS = ["url", "feature_seq", "kind", "layer", "name", "minzoom",
                 "z_order", "geom_wkb"]


def make_fanout(cfg: EngineConfig = DEFAULT_CONFIG):
    """map_batches body: encoded features → fan-out rows with
    ``z6_id`` (shuffle key) and ``base_tiles`` (list<int64> of
    base-zoom tile ids inside that z6 subtree)."""
    basezoom = cfg.basezoom
    dz = basezoom - 6

    def fanout(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        kinds = batch["kind"].to_numpy(zero_copy_only=False)
        xs = batch["tile_x"].to_numpy(zero_copy_only=False)
        ys = batch["tile_y"].to_numpy(zero_copy_only=False)

        feat_rows: list[int] = []
        z6_ids: list[int] = []
        base_tiles: list[np.ndarray] = []

        # points: single tile, fully vectorized
        pt = np.flatnonzero(kinds == 1)
        if len(pt):
            tid = tm.tile_id(basezoom, xs[pt], ys[pt])
            z6 = tm.tile_id_parent(tid, dz)
            feat_rows.extend(pt.tolist())
            z6_ids.extend(z6.tolist())
            base_tiles.extend(np.asarray([t]) for t in tid.tolist())

        # lines/polygons: rasterize, then split tile set by z6 ancestor
        geo = np.flatnonzero(kinds != 1)
        if len(geo):
            wkbs = batch["geom_wkb"].take(pa.array(geo)).to_pylist()
            for row, buf in zip(geo.tolist(), wkbs):
                gt, payload = _wkb.parse_wkb(buf)
                if gt == _wkb.LINESTRING:
                    coords = payload
                    ft = np.stack([tm.lon2tilex_f(coords[:, 0], basezoom),
                                   tm.lat2tiley_f(coords[:, 1], basezoom)], axis=1)
                    tiles = raster.line_tiles(ft, basezoom)
                else:
                    rings = [np.stack([tm.lon2tilex_f(r[:, 0], basezoom),
                                       tm.lat2tiley_f(r[:, 1], basezoom)], axis=1)
                             for r in payload]
                    tiles = raster.polygon_tiles(rings, basezoom)
                if len(tiles) == 0:
                    continue
                tids = tm.tile_id(basezoom, tiles[:, 0], tiles[:, 1])
                z6 = tm.tile_id_parent(tids, dz)
                for z6v in np.unique(z6):
                    feat_rows.append(row)
                    z6_ids.append(int(z6v))
                    base_tiles.append(tids[z6 == z6v])

        if not feat_rows:
            out = batch.slice(0, 0).select(FANOUT_FIELDS)
            return (out.append_column("z6_id", pa.array([], pa.int64()))
                       .append_column("base_tiles", pa.array([], pa.list_(pa.int64()))))
        out = batch.take(pa.array(feat_rows)).select(FANOUT_FIELDS)
        return (out.append_column("z6_id", pa.array(z6_ids, pa.int64()))
                   .append_column("base_tiles",
                                  pa.array([t.tolist() for t in base_tiles],
                                           pa.list_(pa.int64()))))

    return fanout


def add_salt(batch: pa.Table, hot_z6: dict, n_salt: int = 4) -> pa.Table:
    """Add a ``salt`` column: 0 everywhere except rows whose z6_id is in
    ``hot_z6`` (a broadcast dict of hot subtree ids), which spread over
    ``n_salt`` deterministic buckets by url hash. The shuffle key then
    becomes (z6_id, salt) — the data-driven version of the reference's
    hand-tuned geographic shards (src/sharded_node_store.cpp:52-83)."""
    z6 = batch["z6_id"].to_numpy(zero_copy_only=False)
    salt = np.zeros(len(z6), dtype=np.int32)
    if hot_z6:
        hot = np.isin(z6, np.fromiter(hot_z6.keys(), dtype=np.int64))
        if hot.any():
            urls = np.asarray(batch["url"].to_pylist(), dtype=object)[hot]
            h = np.asarray([_fnv(u) % n_salt for u in urls], dtype=np.int32)
            salt[hot] = h
    return batch.append_column("salt", pa.array(salt, pa.int32()))


def _fnv(s: str) -> int:
    h = 2166136261
    for b in s.encode():
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h
