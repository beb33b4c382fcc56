"""PMTiles v3 writer/reader — the public single-file tile-archive spec
(github.com/protomaps/PMTiles, spec/v3). The reference writes the same
format through its vendored pmtiles.hpp (/root/reference/src/pmtiles.cpp:
16-173, include/pmtiles.h:16-50: header + root directory in the first
16 KiB, optional leaf directories, RLE of identical adjacent tiles,
varint-encoded delta directories, gzip'd sections).

Layout written here (all offsets absolute):

    header (127 B) | root directory (gzip) | metadata (gzip JSON) |
    leaf directories (gzip each) | tile data

Build is STREAMING: tiles are sorted by PMTiles tile id with a
distributed ``Dataset.sort`` and consumed with ``iter_batches``; tile
bytes go to a spool file as they arrive and are concatenated into the
final archive with a chunked copy. Driver memory holds only the
directory entries (tens of bytes per distinct tile run), never the tile
table — the fix for the round-1 ``_collect_sorted`` full
materialization.

Tile ids: cumulative tile count below zoom z — (4^z - 1) / 3 — plus the
Hilbert-curve index of (x, y) at order z, exactly as the spec defines.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import struct

import numpy as np
import pyarrow as pa

MAGIC = b"PMTiles"
SPEC_VERSION = 3
HEADER_SIZE = 127

COMPRESSION_NONE = 1
COMPRESSION_GZIP = 2
TILETYPE_MVT = 1

# entries per leaf directory; root holds everything below the cutover
# (the reference cuts over at ROOT_ONLY=2200 entries, include/pmtiles.h:24)
ROOT_ONLY_MAX = 2200
LEAF_SIZE = 4096


# ---------------------------------------------------------------------------
# tile ids (Hilbert)
# ---------------------------------------------------------------------------

def zxy_to_tileid(z, x, y) -> np.ndarray:
    """(z, x, y) → PMTiles tile id, vectorized. z may be scalar or
    array; the Hilbert rotation loop runs per bit, numpy inside."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    z, x, y = np.broadcast_arrays(z, x, y)
    x, y = x.copy(), y.copy()
    base = (np.left_shift(np.int64(1), 2 * z) - 1) // 3  # (4^z - 1)/3
    d = np.zeros_like(x)
    maxz = int(z.max()) if z.size else 0
    for k in range(maxz - 1, -1, -1):
        s = np.int64(1) << k
        active = z > k  # this bit participates for tiles with z > k
        rx = ((x & s) > 0) & active
        ry = ((y & s) > 0) & active
        d += np.where(active,
                      s * s * ((3 * rx.astype(np.int64)) ^ ry.astype(np.int64)),
                      0)
        # rotate quadrant (only where ry == 0)
        flip = active & ~ry & rx
        x = np.where(flip, s - 1 - x, x)
        y = np.where(flip, s - 1 - y, y)
        swap = active & ~ry
        x2 = np.where(swap, y, x)
        y2 = np.where(swap, x, y)
        x, y = x2, y2
    return base + d


def tileid_to_zxy(tid: int) -> tuple:
    """Inverse of zxy_to_tileid (scalar; used by readers/tests)."""
    tid = int(tid)
    z = 0
    acc = 0
    while acc + (1 << (2 * z)) <= tid:
        acc += 1 << (2 * z)
        z += 1
    d = tid - acc
    x = y = 0
    s = 1
    while s < (1 << z):
        rx = 1 & (d // 2)
        ry = 1 & (d ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        d //= 4
        s *= 2
    return z, x, y


# ---------------------------------------------------------------------------
# directory codec (spec: varint deltas, RLE, contiguous-offset 0s)
# ---------------------------------------------------------------------------

def _varint(v: int) -> bytes:
    out = bytearray()
    v = int(v)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, i: int):
    v = shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def serialize_directory(entries: list) -> bytes:
    """entries: list of (tile_id, offset, length, run_length), sorted by
    tile_id. Spec order: count, id deltas, run lengths, lengths,
    offsets (0 = contiguous with previous)."""
    out = bytearray(_varint(len(entries)))
    last = 0
    for tid, _, _, _ in entries:
        out += _varint(tid - last)
        last = tid
    for _, _, _, rl in entries:
        out += _varint(rl)
    for _, _, ln, _ in entries:
        out += _varint(ln)
    prev_off = prev_len = None
    for _, off, ln, _ in entries:
        if prev_off is not None and off == prev_off + prev_len:
            out += _varint(0)
        else:
            out += _varint(off + 1)
        prev_off, prev_len = off, ln
    return bytes(out)


def deserialize_directory(buf: bytes) -> list:
    n, i = _read_varint(buf, 0)
    tids, rls, lens, offs = [], [], [], []
    last = 0
    for _ in range(n):
        d, i = _read_varint(buf, i)
        last += d
        tids.append(last)
    for _ in range(n):
        v, i = _read_varint(buf, i)
        rls.append(v)
    for _ in range(n):
        v, i = _read_varint(buf, i)
        lens.append(v)
    prev_off = prev_len = None
    for k in range(n):
        v, i = _read_varint(buf, i)
        if v == 0:
            off = prev_off + prev_len
        else:
            off = v - 1
        offs.append(off)
        prev_off, prev_len = off, lens[k]
    return list(zip(tids, offs, lens, rls))


# ---------------------------------------------------------------------------
# header
# ---------------------------------------------------------------------------

_HEADER_FMT = "<7sBQQQQQQQQQQQBBBBBBiiiiBii"


def _pack_header(h: dict) -> bytes:
    b = struct.pack(
        _HEADER_FMT, MAGIC, SPEC_VERSION,
        h["root_offset"], h["root_length"],
        h["meta_offset"], h["meta_length"],
        h["leaf_offset"], h["leaf_length"],
        h["data_offset"], h["data_length"],
        h["n_addressed"], h["n_entries"], h["n_contents"],
        1 if h["clustered"] else 0,
        h["internal_compression"], h["tile_compression"], h["tile_type"],
        h["minzoom"], h["maxzoom"],
        int(h["min_lon"] * 1e7), int(h["min_lat"] * 1e7),
        int(h["max_lon"] * 1e7), int(h["max_lat"] * 1e7),
        h["center_zoom"],
        int(h["center_lon"] * 1e7), int(h["center_lat"] * 1e7))
    assert len(b) == HEADER_SIZE, len(b)
    return b


def read_header(path: str) -> dict:
    with open(path, "rb") as f:
        raw = f.read(HEADER_SIZE)
    v = struct.unpack(_HEADER_FMT, raw)
    assert v[0] == MAGIC and v[1] == SPEC_VERSION
    keys = ["root_offset", "root_length", "meta_offset", "meta_length",
            "leaf_offset", "leaf_length", "data_offset", "data_length",
            "n_addressed", "n_entries", "n_contents"]
    h = dict(zip(keys, v[2:13]))
    h["clustered"] = bool(v[13])
    h["internal_compression"], h["tile_compression"], h["tile_type"] = v[14:17]
    h["minzoom"], h["maxzoom"] = v[17:19]
    h["min_lon"], h["min_lat"], h["max_lon"], h["max_lat"] = \
        [c / 1e7 for c in v[19:23]]
    h["center_zoom"] = v[23]
    h["center_lon"], h["center_lat"] = [c / 1e7 for c in v[24:26]]
    return h


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------

def add_pmt_id(batch: pa.Table) -> pa.Table:
    """map_batches body: attach the spec tile id (sort key)."""
    pid = zxy_to_tileid(batch["zoom"].to_numpy(zero_copy_only=False),
                        batch["x"].to_numpy(zero_copy_only=False),
                        batch["y"].to_numpy(zero_copy_only=False))
    return batch.append_column("pmt_id", pa.array(pid, pa.int64()))


def write_pmtiles(tiles_ds, path: str, metadata: dict | None = None,
                  batch_size: int = 4096) -> int:
    """Tile Dataset/Table (zoom, x, y, tile_gz) → spec PMTiles archive.
    Returns the number of addressed tiles. Content-dedups identical
    blobs (hash of bytes → prior offset; matches the reference's
    tinyCache + RLE intent) and RLEs runs of adjacent identical tiles.
    """
    if isinstance(tiles_ds, pa.Table):
        t = add_pmt_id(tiles_ds).sort_by("pmt_id")
        batches = [t.slice(i, batch_size)
                   for i in range(0, t.num_rows, batch_size)]
    else:
        ds = tiles_ds.map_batches(add_pmt_id, batch_format="pyarrow") \
            .sort("pmt_id")
        batches = ds.iter_batches(batch_size=batch_size,
                                  batch_format="pyarrow")

    spool = path + ".data.tmp"
    entries: list = []          # (tile_id, offset, length, run_length)
    seen: dict = {}             # sha1(blob) -> (offset, length)
    pos = 0
    n_addressed = 0
    n_contents = 0
    clustered = True
    minzoom, maxzoom = 99, 0
    last_blob_hash = None
    with open(spool, "wb") as out:
        for batch in batches:
            pids = batch["pmt_id"].to_numpy(zero_copy_only=False)
            zs = batch["zoom"].to_numpy(zero_copy_only=False)
            gz = batch["tile_gz"].combine_chunks()
            for i in range(batch.num_rows):
                blob = gz[i].as_py()
                h = hashlib.sha1(blob).digest()
                tid = int(pids[i])
                n_addressed += 1
                minzoom = min(minzoom, int(zs[i]))
                maxzoom = max(maxzoom, int(zs[i]))
                # RLE: identical blob on the NEXT tile id extends the run
                if (entries and h == last_blob_hash
                        and tid == entries[-1][0] + entries[-1][3]):
                    e = entries[-1]
                    entries[-1] = (e[0], e[1], e[2], e[3] + 1)
                    continue
                hit = seen.get(h)
                if hit is None:
                    off, ln = pos, len(blob)
                    out.write(blob)
                    pos += ln
                    seen[h] = (off, ln)
                    n_contents += 1
                else:
                    off, ln = hit
                    clustered = False  # backward reference
                entries.append((tid, off, ln, 1))
                last_blob_hash = h
    if minzoom > maxzoom:
        minzoom = maxzoom = 0

    # directories
    root_entries, leaf_blobs = _build_directories(entries)
    root_gz = gzip.compress(serialize_directory(root_entries), 6, mtime=0)
    meta_gz = gzip.compress(
        json.dumps({"name": "tilemaker_ray", **(metadata or {})}).encode(),
        6, mtime=0)
    leaf_section = b"".join(leaf_blobs)

    root_offset = HEADER_SIZE
    meta_offset = root_offset + len(root_gz)
    leaf_offset = meta_offset + len(meta_gz)
    data_offset = leaf_offset + len(leaf_section)
    header = _pack_header({
        "root_offset": root_offset, "root_length": len(root_gz),
        "meta_offset": meta_offset, "meta_length": len(meta_gz),
        "leaf_offset": leaf_offset, "leaf_length": len(leaf_section),
        "data_offset": data_offset, "data_length": pos,
        "n_addressed": n_addressed, "n_entries": len(entries),
        "n_contents": n_contents, "clustered": clustered,
        "internal_compression": COMPRESSION_GZIP,
        "tile_compression": COMPRESSION_GZIP, "tile_type": TILETYPE_MVT,
        "minzoom": minzoom, "maxzoom": maxzoom,
        "min_lon": -180.0, "min_lat": -85.0511,
        "max_lon": 180.0, "max_lat": 85.0511,
        "center_zoom": minzoom, "center_lon": 0.0, "center_lat": 0.0,
    })
    with open(path, "wb") as f:
        f.write(header)
        f.write(root_gz)
        f.write(meta_gz)
        f.write(leaf_section)
        with open(spool, "rb") as src:
            while True:
                chunk = src.read(1 << 22)
                if not chunk:
                    break
                f.write(chunk)
    os.remove(spool)
    return n_addressed


def _build_directories(entries: list):
    """entries → (root_entries, [leaf gz blobs]). Root-only below the
    cutover; otherwise the root holds one pointer entry per leaf
    (run_length=0, offset/length into the leaf section)."""
    if len(entries) <= ROOT_ONLY_MAX:
        return entries, []
    root = []
    leaves = []
    off = 0
    for i in range(0, len(entries), LEAF_SIZE):
        chunk = entries[i:i + LEAF_SIZE]
        blob = gzip.compress(serialize_directory(chunk), 6, mtime=0)
        root.append((chunk[0][0], off, len(blob), 0))
        leaves.append(blob)
        off += len(blob)
    return root, leaves


# ---------------------------------------------------------------------------
# reader (random access; the round-trip check + merge-mode source)
# ---------------------------------------------------------------------------

def _find_entry(entries: list, tid: int):
    lo, hi = 0, len(entries) - 1
    best = None
    while lo <= hi:
        mid = (lo + hi) // 2
        if entries[mid][0] <= tid:
            best = entries[mid]
            lo = mid + 1
        else:
            hi = mid - 1
    return best


def read_pmtiles(path: str, z: int, x: int, y: int) -> bytes | None:
    """Random access one tile's (still-compressed) bytes, or None."""
    if not (0 <= x < (1 << z) and 0 <= y < (1 << z)):
        return None
    tid = int(zxy_to_tileid(z, x, y))
    h = read_header(path)
    with open(path, "rb") as f:
        f.seek(h["root_offset"])
        root = deserialize_directory(
            gzip.decompress(f.read(h["root_length"])))
        e = _find_entry(root, tid)
        if e is None:
            return None
        if e[3] == 0:  # leaf pointer
            f.seek(h["leaf_offset"] + e[1])
            leaf = deserialize_directory(gzip.decompress(f.read(e[2])))
            e = _find_entry(leaf, tid)
            if e is None:
                return None
        etid, off, ln, rl = e
        if rl == 0 or tid >= etid + rl:
            return None
        f.seek(h["data_offset"] + off)
        return f.read(ln)


def read_metadata(path: str) -> dict:
    h = read_header(path)
    with open(path, "rb") as f:
        f.seek(h["meta_offset"])
        return json.loads(gzip.decompress(f.read(h["meta_length"])))


def read_all_tiles(path: str) -> pa.Table:
    """Full scan → (zoom, x, y, tile_id, tile_gz) table (merge-mode
    source, like read_mbtiles)."""
    from ..geo import tilemath as tm
    h = read_header(path)
    with open(path, "rb") as f:
        f.seek(h["root_offset"])
        root = deserialize_directory(
            gzip.decompress(f.read(h["root_length"])))
        entries = []
        if any(e[3] == 0 for e in root):
            for tid0, loff, llen, rl in root:
                f.seek(h["leaf_offset"] + loff)
                entries.extend(deserialize_directory(
                    gzip.decompress(f.read(llen))))
        else:
            entries = root
        zs, xs, ys, blobs = [], [], [], []
        for tid, off, ln, rl in entries:
            f.seek(h["data_offset"] + off)
            blob = f.read(ln)
            for k in range(rl):
                z, x, y = tileid_to_zxy(tid + k)
                zs.append(z)
                xs.append(x)
                ys.append(y)
                blobs.append(blob)
    z = np.asarray(zs, dtype=np.int64)
    x = np.asarray(xs, dtype=np.int64)
    y = np.asarray(ys, dtype=np.int64)
    tid = tm.tile_id(z, x, y) if len(z) else np.empty(0, np.int64)
    return pa.table({"zoom": pa.array(z.astype(np.int32), pa.int32()),
                     "x": pa.array(x.astype(np.int32), pa.int32()),
                     "y": pa.array(y.astype(np.int32), pa.int32()),
                     "tile_id": pa.array(tid, pa.int64()),
                     "tile_gz": pa.array(blobs, pa.binary())})
