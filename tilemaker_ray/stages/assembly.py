"""Entity-assembly joins — the OSM-store path re-expressed on Ray.

The reference resolves way node-refs against the NodeStore
(/root/reference/src/pbf_processor.cpp:123-146 — J1) and stitches
relation member ways into rings (src/osm_store.cpp:65-160 — J2); scan
passes mark used nodes/ways so stores stay small
(src/pbf_processor.cpp:176-259 — J6). In a share-nothing engine these
are joins, not lookup services (SURVEY.md §2.4 T1):

- J1  way ⋈ node:  distributed hash join (Dataset.join) of the
      membership table against the node table, then
      groupby(way_id).map_groups reassembly sorted by seq;
- J6  used-node semi-join: distinct membership keys (the bloom/semi
      filter that would precede a node-store load);
- J2  ring stitching: pure-python endpoint matching per relation group
      (the per-group reduce inside map_groups).

The driver fixture maps TPC-H-ish tables onto the entity model:
``part`` plays nodes (node_id = p_partkey, coords derived from the
key), ``lineitem`` plays way membership (way_id = l_orderkey, seq =
l_linenumber, node ref = l_partkey) — structurally identical to
OSM ways (p50 ≈ 4 members, like OSM's p50 ≈ 7 nodes/way).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .common import mix_bucket

# node coordinates derived from the node id — exact lattice arithmetic,
# mirrored in SQL by queries.ORACLE_SQL (keep in lockstep)
ND_LON_SQL = "(((p.p_partkey * 69621) % 360000) / 1000.0 - 180.0)"
ND_LAT_SQL = "(((p.p_partkey * 10007) % 170000) / 1000.0 - 85.0)"


def node_lonlat(node_id: np.ndarray):
    nid = np.asarray(node_id, dtype=np.int64)
    lon = ((nid * 69621) % 360000) / 1000.0 - 180.0
    lat = ((nid * 10007) % 170000) / 1000.0 - 85.0
    return lon, lat


def assemble_ways(members_ds, num_buckets: int = 256):
    """J1: membership rows (way_id, seq, node_id) → assembled ways
    (way_id, n_points, length_um) where length_um = Σ per-segment
    planar length in integer micro-degrees (exact across engines:
    sqrt is correctly rounded, the integer sum is associative).

    Shuffle shape: groupby a BUCKET of way ids (way_id % num_buckets),
    then one vectorized multi-way segment reduction per bucket — one
    pandas/python group per ~thousand ways instead of per way (per-group
    overhead dominated the naive groupby(way_id) by 10×).
    """
    def coords(batch: pa.Table) -> pa.Table:
        lon, lat = node_lonlat(batch["node_id"].to_numpy())
        bucket = batch["way_id"].to_numpy() % num_buckets
        return (batch.append_column("lon", pa.array(lon, pa.float64()))
                     .append_column("lat", pa.array(lat, pa.float64()))
                     .append_column("bucket", pa.array(bucket, pa.int64())))

    withc = members_ds.map_batches(coords, batch_format="pyarrow")
    return withc.groupby("bucket").map_groups(_reduce_ways_bucket,
                                              batch_format="pyarrow")


def assemble_ways_join(members_ds, nodes_ds, num_partitions: int = 16,
                       num_buckets: int = 256):
    """J1 with a real distributed hash join: membership ⋈ nodes on
    node_id (both sides shuffled by key), then bucketed reassembly."""
    joined = members_ds.join(nodes_ds, join_type="inner",
                             num_partitions=num_partitions,
                             on=("node_id",))

    def bucket(batch: pa.Table) -> pa.Table:
        b = batch["way_id"].to_numpy() % num_buckets
        return batch.append_column("bucket", pa.array(b, pa.int64()))

    return (joined.map_batches(bucket, batch_format="pyarrow")
            .groupby("bucket").map_groups(_reduce_ways_bucket,
                                          batch_format="pyarrow"))


def _reduce_ways_bucket(g: pa.Table) -> pa.Table:
    """Vectorized reduction of ALL ways in one bucket: lexsort by
    (way_id, seq, node_id) — the same total tie-break order as the SQL
    oracle — then segment math with boundary masks."""
    way = g["way_id"].to_numpy(zero_copy_only=False)
    seq = g["seq"].to_numpy(zero_copy_only=False)
    nid = g["node_id"].to_numpy(zero_copy_only=False)
    lon = g["lon"].to_numpy(zero_copy_only=False)
    lat = g["lat"].to_numpy(zero_copy_only=False)
    order = np.lexsort((nid, seq, way))
    way, nid, lon, lat = way[order], nid[order], lon[order], lat[order]
    same_way = np.empty(len(way), dtype=bool)
    same_way[0] = False
    same_way[1:] = way[1:] == way[:-1]
    seg_um = np.zeros(len(way), dtype=np.int64)
    if len(way) > 1:
        d = np.sqrt(np.diff(lon) ** 2 + np.diff(lat) ** 2)
        seg_um[1:] = np.where(same_way[1:],
                              np.floor(d * 1_000_000).astype(np.int64), 0)
    starts = np.flatnonzero(~same_way)
    ends = np.concatenate([starts[1:], [len(way)]])
    length_um = np.add.reduceat(seg_um, starts)
    return pa.table({
        "way_id": pa.array(way[starts], pa.int64()),
        "n_points": pa.array((ends - starts).astype(np.int64), pa.int64()),
        "first_node": pa.array(nid[starts], pa.int64()),
        "last_node": pa.array(nid[ends - 1], pa.int64()),
        "length_um": pa.array(length_um, pa.int64()),
    })


def used_nodes(members_ds):
    """J6: the semi-join key set — distinct node ids referenced by any
    way (what the reference's pre-scan marks in its bitsets).
    Partial-distinct inside map_batches first (ways reference the same
    nodes heavily), so the distinct shuffle moves only each block's
    unique keys — the combiner pattern the 100-TB brief demands."""

    def partial_distinct(b: pa.Table) -> pa.Table:
        u = np.unique(b["node_id"].to_numpy(zero_copy_only=False))
        return pa.table({"node_id": pa.array(u, pa.int64())})

    return (members_ds.select_columns(["node_id"])
            .map_batches(partial_distinct, batch_format="pyarrow")
            .groupby("node_id").count().select_columns(["node_id"]))


def stitch_rings(segments: list) -> list:
    """J2 ring stitching: join open segments end-to-start into closed
    rings (src/osm_store.cpp:65-160 semantics: match endpoints exactly,
    reverse segments when needed, drop unclosable leftovers).

    segments: list of (N,2) arrays. Returns list of closed rings.
    """
    segs = [np.asarray(s, dtype=np.float64) for s in segments if len(s) >= 2]
    rings = []
    while segs:
        cur = segs.pop(0)
        progress = True
        while progress and not _closed(cur):
            progress = False
            for i, s in enumerate(segs):
                if np.array_equal(s[0], cur[-1]):
                    cur = np.vstack([cur, s[1:]])
                elif np.array_equal(s[-1], cur[-1]):
                    cur = np.vstack([cur, s[::-1][1:]])
                elif np.array_equal(s[-1], cur[0]):
                    cur = np.vstack([s, cur[1:]])
                elif np.array_equal(s[0], cur[0]):
                    cur = np.vstack([s[::-1], cur[1:]])
                else:
                    continue
                segs.pop(i)
                progress = True
                break
        if _closed(cur) and len(cur) >= 4:
            rings.append(cur)
    return rings


def _closed(c: np.ndarray) -> bool:
    return len(c) >= 3 and np.array_equal(c[0], c[-1])


def assemble_relations(members_ds, ways_geoms_ds):
    """J2 full path: relation members (rel_id, role, way_id) ⋈ way
    geometries → per-relation multipolygon via ring stitching. Outer
    rings from role='outer', holes from role='inner'. Way geometry
    travels as WKB linestrings (Arrow hash join does not support
    nested-list payload columns — binary is the join-safe encoding,
    same reason the tile shuffle carries WKB)."""
    from ..geo import wkb as _wkb
    joined = members_ds.join(ways_geoms_ds, join_type="inner",
                             num_partitions=8, on=("way_id",))

    def bucket(b: pa.Table) -> pa.Table:
        rid = b["rel_id"].to_numpy(zero_copy_only=False)
        return b.append_column("bkt", pa.array(
            mix_bucket(rid, 256), pa.int64()))

    def build_bucket(g: pa.Table) -> pa.Table:
        """ALL relations of one bucket in one pass (the repo's bucket
        pattern — per-relation map_groups costs ~100 µs/group): sort by
        rel_id, stitch each run's segments."""
        rid = g["rel_id"].to_numpy(zero_copy_only=False)
        roles = np.asarray(g["role"].to_pylist())
        wkbs = g["geom_wkb"].combine_chunks()
        order = np.argsort(rid, kind="stable")
        rid = rid[order]
        out_r, out_o, out_i = [], [], []
        s = 0
        n = len(rid)
        while s < n:
            e = s
            while e < n and rid[e] == rid[s]:
                e += 1
            rows = order[s:e]
            outers = stitch_rings(
                [_wkb.parse_wkb(wkbs[int(r)].as_py())[1]
                 for r in rows if roles[r] == "outer"])
            inners = stitch_rings(
                [_wkb.parse_wkb(wkbs[int(r)].as_py())[1]
                 for r in rows if roles[r] == "inner"])
            out_r.append(int(rid[s]))
            out_o.append(len(outers))
            out_i.append(len(inners))
            s = e
        return pa.table({"rel_id": pa.array(out_r, pa.int64()),
                         "n_outer": pa.array(out_o, pa.int64()),
                         "n_inner": pa.array(out_i, pa.int64())})

    return (joined.map_batches(bucket, batch_format="pyarrow")
            .groupby("bkt").map_groups(build_bucket,
                                       batch_format="pyarrow"))
