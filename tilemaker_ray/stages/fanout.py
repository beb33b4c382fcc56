"""Tile fan-out: feature → (zoom-band shard, base-zoom tile list) rows.

The analog of the reference's feature→tile indexing
(insertIntermediateTiles supercover + fillCoveredTiles,
/root/reference/src/coordinates_geom.cpp:111-189,
src/coordinates.cpp:52) and its z6-bucket clustering with low-zoom
copies (/root/reference/include/tile_data.h:26-66 — the reference also
duplicates features into per-zoom lists at finalize). Every feature is
rasterized ONCE at the base zoom; lower-zoom tile sets derive EXACTLY
by halving tile coords (src/tile_data.cpp:169-174).

Skew handling — zoom-banded sharding: one z6 subtree of a dense city
(zipf head) would serialize the whole pyramid in one task. Instead the
zoom range is split into bands, each keyed at a finer anchor zoom:

    band 0: zooms 6..10  keyed by the z6 ancestor
    band 1: zooms 11..12 keyed by the z11 ancestor
    band 2: zooms 13..basezoom keyed by the z13 ancestor

Low bands are cheap because feature_limit caps dense tiles; high bands
are uncapped but finely partitioned — so no single shard holds more
than a z12-subtree's worth of uncapped work. The shard key is the
anchor tile id itself (zoom is embedded), so one groupby covers all
bands. This is the data-driven replacement for the reference's
hand-tuned geographic store shards (src/sharded_node_store.cpp:52-83)
and zoom-weighted tile batches (src/tilemaker.cpp:463-481).

Shuffle volume cost: one row per feature per band (≈3× the feature
count, each row a slim reference + WKB) — the same trade the reference
makes materializing low-zoom copies of every feature.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..geo import antimeridian as _am
from ..geo import raster, tilemath as tm
from ..geo import wkb as _wkb

FANOUT_FIELDS = ["fuid", "kind", "layer", "name", "minzoom",
                 "z_order", "lon", "lat", "geom_wkb", "attrs_json"]

# (zmin, zmax, anchor_zoom) per band; basezoom fills the last band's zmax.
# The uncapped high band anchors at z13 (not z12): 4× more shards, so the
# densest city-core shard stays under ~1s of encode work.
# Band (0,5,0) is the low-zoom pyramid: a single z0-anchored shard fed
# ONLY by features whose minzoom ≤ 5 (the external polygon layers) —
# the analog of the reference's heavyweight low-zoom tile batches
# (weight 1000, src/tilemaker.cpp:463-481).
# MEASURED TRADE (800k pages): splitting the mid bands one-anchor-per-
# zoom ((6,8),(9,10),(11),(12)) cut the max encode task but cost ~30%
# more total CPU (extra fan-out rows + lost cross-zoom parse/clip-cache
# reuse inside a shard) — a net loss at low parallelism. The encode
# tail is instead handled by 4× reduce partitions in tiles_pipeline
# (a reduce task sums several shards; more partitions shrink the sum
# without touching per-shard work).
BANDS = ((0, 5, 0), (6, 10, 6), (11, 12, 11), (13, None, 13))


def band_for_anchor_zoom(az: int, basezoom: int):
    for zmin, zmax, anchor in BANDS:
        if anchor == az:
            return zmin, (zmax if zmax is not None else basezoom)
    raise ValueError(f"no band anchored at zoom {az}")


def make_fanout(cfg: EngineConfig = DEFAULT_CONFIG):
    """map_batches body: encoded features → fan-out rows with
    ``shard_key`` (anchor tile id; the shuffle key) and ``base_tiles``
    (list<int64> of base-zoom tile ids inside that shard)."""
    basezoom = cfg.basezoom

    max_tiles = cfg.max_raster_tiles
    lay_maxz = {l.name: l.maxzoom for l in cfg.layers}

    # clipping box → inclusive base-zoom tile range (reference --bbox
    # restricts the tile set, src/tilemaker.cpp:366-458)
    if cfg.bbox is not None:
        bx0, by0, bx1, by1 = cfg.bbox
        tx_lo = int(tm.lon2tilex(np.float64(bx0), basezoom))
        tx_hi = int(tm.lon2tilex(np.float64(bx1), basezoom))
        ty_lo = int(tm.lat2tiley(np.float64(by1), basezoom))
        ty_hi = int(tm.lat2tiley(np.float64(by0), basezoom))
    else:
        tx_lo = ty_lo = 0
        tx_hi = ty_hi = (1 << basezoom) - 1

    def in_box(txa: np.ndarray, tya: np.ndarray) -> np.ndarray:
        return ((txa >= tx_lo) & (txa <= tx_hi)
                & (tya >= ty_lo) & (tya <= ty_hi))

    def raster_zoom_for_bbox(x0, y0, x1, y1, layer) -> int:
        """Finest zoom ≤ min(basezoom, layer maxzoom) whose bbox tile
        fan-out stays under the large-object cap."""
        rz = min(basezoom, lay_maxz.get(layer, basezoom))
        while rz > 0:
            nx = int(tm.lon2tilex(np.float64(x1), rz)
                     - tm.lon2tilex(np.float64(x0), rz)) + 1
            ny = int(tm.lat2tiley(np.float64(y0), rz)
                     - tm.lat2tiley(np.float64(y1), rz)) + 1
            if nx * ny <= max_tiles:
                return rz
            rz -= 1
        return 0

    def raster_zoom_for(gt, payload, layer) -> int:
        """Raster zoom from the (antimeridian-normalized) payload:
        coarsest of the per-part answers, so a date-line-split feature
        is capped per part rather than by a world-spanning bbox."""
        if gt in (_wkb.LINESTRING, _wkb.MULTILINESTRING):
            parts = [payload] if gt == _wkb.LINESTRING else payload
        else:
            polys = [payload] if gt == _wkb.POLYGON else payload
            parts = [rings[0] for rings in polys]
        rz = basezoom
        for p in parts:
            rz = min(rz, raster_zoom_for_bbox(
                float(p[:, 0].min()), float(p[:, 1].min()),
                float(p[:, 0].max()), float(p[:, 1].max()), layer))
        return rz

    def fanout(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        kinds = batch["kind"].to_numpy(zero_copy_only=False)
        minzooms = batch["minzoom"].to_numpy(zero_copy_only=False)
        layers = batch["layer"].to_pylist()
        xs = batch["tile_x"].to_numpy(zero_copy_only=False)
        ys = batch["tile_y"].to_numpy(zero_copy_only=False)

        feat_rows: list[int] = []
        shard_keys: list[int] = []
        base_tiles: list[np.ndarray] = []
        raster_zooms: list[int] = []

        # points: single tile → one row per band, fully vectorized keys
        pt = np.flatnonzero(kinds == 1)
        if len(pt) and cfg.bbox is not None:
            pt = pt[in_box(xs[pt], ys[pt])]
        if len(pt):
            tid = tm.tile_id(basezoom, xs[pt], ys[pt])
            for _zmin, zmax, anchor in BANDS:
                zmax = basezoom if zmax is None else zmax
                # skip bands entirely above the feature's minzoom
                sel = minzooms[pt] <= zmax
                if not sel.any():
                    continue
                anc = tm.tile_id_parent(tid[sel], basezoom - anchor)
                feat_rows.extend(pt[sel].tolist())
                shard_keys.extend(anc.tolist())
                base_tiles.extend(np.asarray([t]) for t in tid[sel].tolist())
                raster_zooms.extend([basezoom] * int(sel.sum()))

        # lines/polygons: rasterize ONCE at the feature's raster zoom,
        # split the tile set per band anchor
        geo = np.flatnonzero(kinds != 1)
        if len(geo):
            wkbs = batch["geom_wkb"].take(pa.array(geo)).to_pylist()
            for row, buf in zip(geo.tolist(), wkbs):
                gt, payload = _am.normalize_payload(*_wkb.parse_wkb(buf))
                rz = raster_zoom_for(gt, payload, layers[row])
                if rz < minzooms[row]:
                    continue  # coarsened below its own minzoom → invisible
                if gt in (_wkb.LINESTRING, _wkb.MULTILINESTRING):
                    lines = [payload] if gt == _wkb.LINESTRING else payload
                    tiles = [raster.line_tiles(
                        np.stack([tm.lon2tilex_f(l[:, 0], rz),
                                  tm.lat2tiley_f(l[:, 1], rz)], axis=1),
                        rz) for l in lines]
                    tiles = np.unique(np.vstack(tiles), axis=0)
                else:
                    polys = [payload] if gt == _wkb.POLYGON else payload
                    tiles = [raster.polygon_tiles(
                        [np.stack([tm.lon2tilex_f(r[:, 0], rz),
                                   tm.lat2tiley_f(r[:, 1], rz)], axis=1)
                         for r in rings], rz) for rings in polys]
                    tiles = np.unique(np.vstack(tiles), axis=0)
                if len(tiles) == 0:
                    continue
                if cfg.bbox is not None:
                    sh = basezoom - rz
                    keep = (((tiles[:, 0] << sh) <= tx_hi)
                            & ((((tiles[:, 0] + 1) << sh) - 1) >= tx_lo)
                            & ((tiles[:, 1] << sh) <= ty_hi)
                            & ((((tiles[:, 1] + 1) << sh) - 1) >= ty_lo))
                    tiles = tiles[keep]
                    if len(tiles) == 0:
                        continue
                tids = tm.tile_id(rz, tiles[:, 0], tiles[:, 1])
                for _zmin, zmax, anchor in BANDS:
                    zmax = basezoom if zmax is None else zmax
                    if minzooms[row] > zmax or anchor > rz:
                        continue
                    anc = tm.tile_id_parent(tids, rz - anchor)
                    for av in np.unique(anc):
                        feat_rows.append(row)
                        shard_keys.append(int(av))
                        base_tiles.append(tids[anc == av])
                        raster_zooms.append(rz)

        if not feat_rows:
            out = batch.slice(0, 0).select(FANOUT_FIELDS)
            return (out.append_column("shard_key", pa.array([], pa.int64()))
                       .append_column("shard_scram", pa.array([], pa.int64()))
                       .append_column("raster_zoom", pa.array([], pa.int8()))
                       .append_column("base_tiles",
                                      pa.array([], pa.list_(pa.int64()))))
        out = batch.take(pa.array(feat_rows)).select(FANOUT_FIELDS)
        sk = np.asarray(shard_keys, dtype=np.int64)
        return (out.append_column("shard_key", pa.array(sk, pa.int64()))
                   .append_column("shard_scram",
                                  pa.array(_scramble(sk), pa.int64()))
                   .append_column("raster_zoom",
                                  pa.array(raster_zooms, pa.int8()))
                   .append_column("base_tiles",
                                  pa.array([t.tolist() for t in base_tiles],
                                           pa.list_(pa.int64()))))

    return fanout


def _scramble(keys: np.ndarray) -> np.ndarray:
    """Bijective mix of the shard key. The tile shuffle RANGE-partitions
    its sort key; morton shard keys of a dense city are adjacent, so
    un-mixed they pile into one reduce partition and re-serialize the
    skew that banding just split. Scrambling spreads hot shards evenly
    while keeping group identity 1:1."""
    x = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x.astype(np.int64)
