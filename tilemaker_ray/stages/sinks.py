"""Tile sinks + merge: MBTiles, PMTiles-style archive, file tree,
GeoJSON debug, tileset metadata.

Mapping from the reference (SURVEY.md §2.2):
- K1 MBTiles writer (/root/reference/src/mbtiles.cpp:58-101): sqlite
  insert-or-replace in one transaction. Here a sequential driver-side
  packaging pass over the already-distributed tile table — the
  reference also serializes sqlite writes behind a lock
  (src/tilemaker.cpp:355), so this stage is inherently single-writer;
  the distributed work (encode) happened upstream.
- K2 PMTiles writer (/root/reference/src/pmtiles.cpp:16-173): clustered
  archive with a sorted directory and deduplication of identical tile
  blobs (the reference RLEs runs of identical tiles). Implemented as a
  simplified but real clustered format: header + sorted (tile_id →
  offset, length) directory + blob section with content dedup.
- K3 file-tree writer (/root/reference/src/tile_worker.cpp:568-583):
  out/z/x/y.pbf — DISTRIBUTED (each map_batches task writes its own
  files; no driver bottleneck).
- K4 GeoJSON debug writer (include/geojson_writer.h).
- K5 metadata JSON / vector_layers manifest (src/shared_data.cpp:50-138).
- J5 merge mode (src/tile_worker.cpp:533-537, src/mbtiles.cpp:103-140):
  re-encode tiles present in an existing tileset by unioning layers;
  expressed as a groupby(tile_id) over the tagged union of old + new
  tile tables — the Ray-native left-join-and-replay.
"""

from __future__ import annotations

import gzip
import json
import os
import sqlite3

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from . import mvt as _mvt


def write_mbtiles(tiles_ds, path: str, metadata: dict | None = None,
                  batch_size: int = 4096) -> int:
    """Package a tile Dataset into an MBTiles sqlite file. Streaming
    driver-side pass (iter_batches) — bounded memory, single writer.
    Returns the number of tiles written. MBTiles uses TMS row order:
    row = 2^z - 1 - y (flip), per the public spec."""
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    cur = con.cursor()
    cur.execute("CREATE TABLE metadata (name text, value text)")
    cur.execute("CREATE TABLE tiles (zoom_level integer, tile_column integer,"
                " tile_row integer, tile_data blob)")
    cur.execute("CREATE UNIQUE INDEX tile_index ON tiles "
                "(zoom_level, tile_column, tile_row)")
    meta = {"name": "tilemaker_ray", "format": "pbf", "scheme": "tms",
            **(metadata or {})}
    cur.executemany("INSERT INTO metadata VALUES (?, ?)",
                    list(meta.items()))
    n = 0
    for batch in tiles_ds.iter_batches(batch_size=batch_size,
                                       batch_format="pyarrow"):
        z = batch["zoom"].to_numpy(zero_copy_only=False)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        rows = ((1 << z) - 1 - y)  # TMS flip
        blobs = batch["tile_gz"].to_pylist()
        cur.executemany(
            "INSERT OR REPLACE INTO tiles VALUES (?, ?, ?, ?)",
            [(int(z[i]), int(x[i]), int(rows[i]), blobs[i])
             for i in range(batch.num_rows)])
        n += batch.num_rows
    con.commit()
    con.close()
    return n


def read_mbtiles(path: str) -> pa.Table:
    """MBTiles → tile table (zoom, x, y, tile_gz) — the merge-mode
    reader (readTileAndUncompress analog keeps bytes compressed here;
    decode happens in the merge task)."""
    con = sqlite3.connect(path)
    rows = con.execute("SELECT zoom_level, tile_column, tile_row, tile_data"
                       " FROM tiles").fetchall()
    con.close()
    z = np.asarray([r[0] for r in rows], dtype=np.int32)
    x = np.asarray([r[1] for r in rows], dtype=np.int32)
    y = ((1 << z) - 1 - np.asarray([r[2] for r in rows])).astype(np.int32)
    from ..geo import tilemath as tm
    tid = tm.tile_id(z.astype(np.int64), x.astype(np.int64),
                     y.astype(np.int64))
    return pa.table({"zoom": pa.array(z, pa.int32()),
                     "x": pa.array(x, pa.int32()),
                     "y": pa.array(y, pa.int32()),
                     "tile_id": pa.array(tid, pa.int64()),
                     "tile_gz": pa.array([r[3] for r in rows], pa.binary())})


# -- PMTiles archive (spec v3 — see stages/pmtiles.py) -----------------------

def write_archive(tiles_ds, path: str, metadata: dict | None = None) -> int:
    """Spec-compliant PMTiles v3 archive (replaces the round-1 custom
    "TMRA" layout): Hilbert tile ids, varint delta directories with RLE
    of identical adjacent tiles, root+leaf split, gzip'd sections.
    Streaming build — distributed sort + iter_batches, tile bytes
    spooled, never the full tile table on the driver."""
    from . import pmtiles
    return pmtiles.write_pmtiles(tiles_ds, path, metadata)


def read_archive_tile(path: str, tile_id: int) -> bytes | None:
    """Random access by the repo's morton tile id (decoded to z/x/y,
    then looked up via the spec Hilbert directory)."""
    from ..geo import tilemath as tm
    from . import pmtiles
    z, x, y = tm.tile_id_decode(np.asarray([tile_id], dtype=np.int64))
    return pmtiles.read_pmtiles(path, int(z[0]), int(x[0]), int(y[0]))


# -- distributed file tree ---------------------------------------------------

def write_tile_tree(tiles_ds, out_dir: str) -> int:
    """out_dir/z/x/y.pbf, written IN PARALLEL by map_batches tasks
    (K3; unlike sqlite there is no single-writer constraint)."""
    def write_batch(batch: pa.Table) -> pa.Table:
        z = batch["zoom"].to_numpy(zero_copy_only=False)
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        blobs = batch["tile_gz"].to_pylist()
        for i in range(batch.num_rows):
            d = os.path.join(out_dir, str(int(z[i])), str(int(x[i])))
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, f".{int(y[i])}.tmp")
            with open(tmp, "wb") as f:
                f.write(blobs[i])
            os.replace(tmp, os.path.join(d, f"{int(y[i])}.pbf"))
        return pa.table({"written": pa.array([batch.num_rows], pa.int64())})

    out = tiles_ds.map_batches(write_batch, batch_format="pyarrow")
    return int(sum(v for b in out.iter_batches(batch_format="pyarrow")
                   for v in b["written"].to_pylist()))


# -- GeoJSON debug writer ----------------------------------------------------

def _wkb_to_geojson_geom(gt: int, payload) -> dict:
    """Parsed WKB payload → GeoJSON geometry dict (single conversion
    shared by both GeoJSON writers)."""
    from ..geo import wkb as _wkb
    if gt == _wkb.POINT:
        return {"type": "Point", "coordinates": list(payload)}
    if gt == _wkb.LINESTRING:
        return {"type": "LineString", "coordinates": payload.tolist()}
    if gt == _wkb.POLYGON:
        return {"type": "Polygon",
                "coordinates": [r.tolist() for r in payload]}
    if gt == _wkb.MULTILINESTRING:
        return {"type": "MultiLineString",
                "coordinates": [p.tolist() for p in payload]}
    return {"type": "MultiPolygon",
            "coordinates": [[r.tolist() for r in rings]
                            for rings in payload]}


def _feature_properties(r: dict) -> dict:
    """Round-trippable properties: whatever feature columns exist that
    the GeoJSONL reader knows how to restore."""
    props = {"layer": r.get("layer", ""), "name": r.get("name", "")}
    for k in ("class", "minzoom"):
        if r.get(k) is not None:
            props[k] = r[k]
    if r.get("attrs_json"):
        props["attrs_json"] = r["attrs_json"]
    return props


def write_geojson(features_ds, path: str, limit: int = 10000) -> int:
    """Dump extracted features as GeoJSON FeatureCollection (K4 debug
    path; driver-side, bounded by limit)."""
    from ..geo import wkb as _wkb
    rows = features_ds.limit(limit).take_all()
    feats = []
    for r in rows:
        gt, payload = _wkb.parse_wkb(r["geom_wkb"])
        feats.append({"type": "Feature",
                      "geometry": _wkb_to_geojson_geom(gt, payload),
                      "properties": _feature_properties(r)})
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": feats}, f)
    return len(feats)


def write_hash_parts(ds, out_dir: str, ext: str, serialize) -> int:
    """Shared distributed part-file sink: each map_batches task
    serializes its batch with ``serialize(batch) -> (bytes, salt)``
    and writes one ``part-<hash>.<ext>`` named by the content hash
    (xor'd with ``salt`` when provided), via a pid-suffixed tmp +
    atomic rename. Ray task retries/lineage re-execution therefore
    overwrite idempotently instead of duplicating. PRECONDITION: two
    DIFFERENT batches must never serialize byte-identically with the
    same salt (they would collapse to one part — silent record loss);
    callers salt with a per-row-unique column when the payload alone
    can repeat. Any parts from a previous export into the same
    directory are removed first. Returns row count."""
    import glob
    import hashlib

    os.makedirs(out_dir, exist_ok=True)
    for old in glob.glob(os.path.join(out_dir, f"part-*.{ext}")) \
            + glob.glob(os.path.join(out_dir, "part-*.tmp")):
        os.remove(old)

    def write_batch(batch: pa.Table) -> pa.Table:
        body, salt = serialize(batch)
        h = hashlib.md5(body.encode() if isinstance(body, str)
                        else body)
        if salt is not None:
            h.update(salt)
        part = os.path.join(out_dir, f"part-{h.hexdigest()[:16]}.{ext}")
        tmp = f"{part}.{os.getpid()}.tmp"
        mode = "wb" if isinstance(body, (bytes, bytearray)) else "w"
        with open(tmp, mode) as f:
            f.write(body)
        os.replace(tmp, part)
        return pa.table({"written": pa.array([batch.num_rows],
                                             pa.int64())})

    out = ds.map_batches(write_batch, batch_format="pyarrow")
    return int(sum(v for b in out.iter_batches(batch_format="pyarrow")
                   for v in b["written"].to_pylist()))


def write_geojsonl(features_ds, out_dir: str) -> int:
    """Distributed GeoJSONL export via :func:`write_hash_parts`
    (content-hash parts salted with the batch's fuids — unique per
    feature by construction, so distinct batches can never collapse).
    Returns feature count."""
    import json as _json

    from ..geo import wkb as _wkb

    def serialize(batch: pa.Table):
        lines = []
        wkbs = batch["geom_wkb"].combine_chunks()
        cols = {c: batch[c].to_pylist()
                for c in ("layer", "name", "class", "minzoom", "attrs_json")
                if c in batch.column_names}
        for i in range(batch.num_rows):
            gt, payload = _wkb.parse_wkb(wkbs[i].as_py())
            r = {c: v[i] for c, v in cols.items()}
            lines.append(_json.dumps(
                {"type": "Feature",
                 "geometry": _wkb_to_geojson_geom(gt, payload),
                 "properties": _feature_properties(r)}))
        body = "\n".join(lines) + ("\n" if lines else "")
        salt = batch["fuid"].to_numpy(zero_copy_only=False).tobytes() \
            if "fuid" in batch.column_names else None
        return body, salt

    return write_hash_parts(features_ds, out_dir, "geojsonl", serialize)


# -- metadata ----------------------------------------------------------------

def tileset_metadata(cfg: EngineConfig = DEFAULT_CONFIG,
                     bounds=(-180.0, -85.0511, 180.0, 85.0511)) -> dict:
    """vector_layers manifest (K5; src/shared_data.cpp:50-138 analog)."""
    return {
        "format": "pbf",
        "minzoom": str(cfg.minzoom),
        "maxzoom": str(cfg.basezoom),
        "bounds": ",".join(str(b) for b in bounds),
        "json": json.dumps({"vector_layers": [
            {"id": l.name, "minzoom": l.minzoom, "maxzoom": l.maxzoom,
             "fields": {"name": "String"}} for l in cfg.layers]}),
    }


# -- merge mode (J5) ---------------------------------------------------------

def merge_tile_bytes(old_gz: bytes, new_gz: bytes) -> bytes:
    """Union the layers of two tiles; layers present in BOTH take the
    new side (the reference skips replaying layers it is writing,
    src/tile_worker.cpp:453-465). Returns gzipped MVT."""
    old = _mvt.decode_tile(gzip.decompress(old_gz))
    new_body = gzip.decompress(new_gz)
    new_layers = _mvt.decode_tile(new_body)
    keep = [name for name in old if name not in new_layers]
    if not keep:
        return new_gz
    # re-encode kept old layers and append to the new tile body
    parts = [new_body]
    for name in keep:
        lb = _relayer(old[name], name)
        parts.append(_mvt._len_delim(3, lb.build()))
    return gzip.compress(b"".join(parts), 6, mtime=0)


def _relayer(layer: dict, name: str) -> "_mvt.LayerBuilder":
    lb = _mvt.LayerBuilder(name, layer["extent"])
    for f in layer["features"]:
        parts = _mvt.decode_geometry(f["geometry"])
        tags = f["tags"]
        attrs = {layer["keys"][tags[i]]: layer["values"][tags[i + 1]]
                 for i in range(0, len(tags), 2)}
        lb.add_feature(f["type"], parts, attrs, feature_id=f.get("id"))
    return lb


def merge_tilesets(new_tiles_ds, old_tiles: pa.Table):
    """Distributed merge: tag + union + groupby(tile_id). Tiles only in
    one side pass through; tiles in both are merged per
    merge_tile_bytes. Returns a tile Dataset."""
    import ray.data as rd

    def tag(src):
        def f(b: pa.Table) -> pa.Table:
            cols = ["zoom", "x", "y", "tile_id", "tile_gz"]
            b = b.select([c for c in cols if c in b.column_names])
            return b.append_column("src", pa.array([src] * b.num_rows,
                                                   pa.int8()))
        return f

    old_ds = rd.from_arrow(old_tiles).map_batches(tag(0),
                                                  batch_format="pyarrow")
    new_ds = new_tiles_ds.map_batches(tag(1), batch_format="pyarrow")

    def merge_group(g: pa.Table) -> pa.Table:
        srcs = g["src"].to_numpy(zero_copy_only=False)
        if g.num_rows == 1 or len(set(srcs.tolist())) == 1:
            pick = int(np.argmax(srcs))  # prefer new side
            out = g.slice(pick, 1)
        else:
            new_i = int(np.flatnonzero(srcs == 1)[0])
            old_i = int(np.flatnonzero(srcs == 0)[0])
            merged = merge_tile_bytes(g["tile_gz"][old_i].as_py(),
                                      g["tile_gz"][new_i].as_py())
            out = g.slice(new_i, 1).set_column(
                g.column_names.index("tile_gz"), "tile_gz",
                pa.array([merged], pa.binary()))
        return out.drop_columns(["src"])

    return old_ds.union(new_ds).groupby("tile_id").map_groups(
        merge_group, batch_format="pyarrow")
