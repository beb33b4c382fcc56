"""Literal .osm.pbf binary source — the last reference source format.

The reference ingests OpenStreetMap PBF files directly
(/root/reference/src/pbf_reader.cpp:1-603: blob framing + zlib,
string table, delta-coded DenseNodes / way refs / relation memids,
zigzag sint64, keys_vals 0-termination;
/root/reference/src/pbf_processor.cpp:594-606 parallelizes ingest at
~8k-entity block granularity). SURVEY §1.5 maps the project's S1/S2 to
Parquet, so this module exists for byte-level format parity (VERDICT r3
"What's missing" #3): a from-scratch decoder + encoder for the public
OSM PBF wire format (https://wiki.openstreetmap.org/wiki/PBF_Format,
fileformat.proto / osmformat.proto), no protobuf library required.

Ray-Data shape
--------------
- ``scan_blobs(path)`` is a metadata-only pass: it reads each 4-byte
  length + tiny BlobHeader and SEEKS past the payload, so indexing a
  100 GB planet file touches O(#blocks) bytes, not the data.
- ``read_osm_pbf(path, kind)`` turns that index into
  ``ray.data.from_items(block descriptors).map_batches(decoder)`` —
  one task per blob (the reference's parallel unit), each task reads
  only its own byte range, decodes vectorized (numpy reduceat varint
  kernels — no per-byte Python in the packed hot path) and emits
  Arrow rows. Blocks stream through the object store; nothing
  materializes on the driver.
- Coordinates honor granularity / lat_offset / lon_offset (the
  reference assumes the defaults; we decode the general case) and are
  returned in EXACT integer nanodegree-derived units (``lat_i7`` =
  1e-7 degree) so aggregates are bit-reproducible.

The encoder exists for fixtures and round-trip oracles: deterministic
output (sorted ids, delta+zigzag, one zlib level), DenseNodes always.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# protobuf wire primitives (decode)
# ---------------------------------------------------------------------------

_WT_VARINT = 0
_WT_I64 = 1
_WT_LEN = 2
_WT_I32 = 5


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Single varint (message scaffolding only — packed arrays go
    through the vectorized kernel below)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def iter_fields(buf: bytes, pos: int = 0, end: int | None = None):
    """Yield (field_no, wire_type, value) over one protobuf message.

    LEN fields yield a memoryview of the payload; VARINT fields the
    int; I32/I64 the raw little-endian bytes. Unknown fields are the
    caller's to skip (they are yielded like any other — forward
    compatible, as the reference's default-skip branches are)."""
    if end is None:
        end = len(buf)
    mv = memoryview(buf)
    while pos < end:
        key, pos = _read_varint(buf, pos)
        field_no = key >> 3
        wt = key & 7
        if wt == _WT_VARINT:
            val, pos = _read_varint(buf, pos)
        elif wt == _WT_LEN:
            ln, pos = _read_varint(buf, pos)
            val = mv[pos:pos + ln]
            pos += ln
        elif wt == _WT_I64:
            val = mv[pos:pos + 8]
            pos += 8
        elif wt == _WT_I32:
            val = mv[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field_no, wt, val


def decode_packed_u64(payload) -> np.ndarray:
    """Vectorized packed-varint decode → uint64 array (mod 2^64).

    numpy kernel: per-byte 7-bit groups, varint membership by cumsum
    over terminator flags, per-varint OR-fold via bitwise_or.reduceat
    of (bits << 7*pos_within_varint). Ten-byte varints (negative
    int64 as uint64) fold correctly because uint64 shifts wrap mod
    2^64 exactly like protobuf's truncation."""
    b = np.frombuffer(payload, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    cont = (b & 0x80) != 0
    if cont[-1]:
        raise ValueError("truncated packed varint")
    # index of the varint each byte belongs to: 0-based, increments
    # AFTER each terminator byte
    ends = ~cont
    vid = np.zeros(b.size, dtype=np.int64)
    np.cumsum(ends[:-1], out=vid[1:])
    starts = np.flatnonzero(np.diff(vid, prepend=-1))
    # position of each byte within its varint
    pos_in = np.arange(b.size, dtype=np.int64) - starts[vid]
    if pos_in.max(initial=0) > 9:
        raise ValueError("varint longer than 10 bytes")
    bits = (b & 0x7F).astype(np.uint64) << (pos_in.astype(np.uint64) * np.uint64(7))
    return np.bitwise_or.reduceat(bits, starts)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    """sint64 zigzag: (n >> 1) ^ -(n & 1), exact in int64."""
    u = u.astype(np.uint64, copy=False)
    half = (u >> np.uint64(1)).astype(np.int64)
    sign = -(u & np.uint64(1)).astype(np.int64)
    return half ^ sign


def decode_packed_s64_delta(payload) -> np.ndarray:
    """packed sint64, zigzag + cumulative delta (DenseNodes ids/lats/
    lons, Way refs, Relation memids — pbf_reader.cpp:214-244,426-446)."""
    return np.cumsum(zigzag_decode(decode_packed_u64(payload)))


def _varint_i64(val: int) -> int:
    """Plain (non-zigzag) int64 varint: a negative value arrives as a
    10-byte varint decoding to >= 2^63 — apply the two's-complement
    sign fix (same correction as lat_offset/lon_offset fields 19/20)."""
    return val - (1 << 64) if val >= (1 << 63) else val


# ---------------------------------------------------------------------------
# protobuf wire primitives (encode — fixtures / round-trip oracle)
# ---------------------------------------------------------------------------


def encode_varint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1  # protobuf negative int64 → 10-byte varint
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_packed_u64(vals) -> bytes:
    return b"".join(encode_varint(int(v)) for v in vals)


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    v = np.asarray(v, dtype=np.int64)
    return (v.astype(np.uint64) << np.uint64(1)) ^ (v >> np.int64(63)).astype(np.uint64)


def encode_packed_s64_delta(vals) -> bytes:
    v = np.asarray(vals, dtype=np.int64)
    d = np.diff(v, prepend=np.int64(0))
    return encode_packed_u64(zigzag_encode(d))


def _field(field_no: int, wt: int, payload: bytes) -> bytes:
    head = encode_varint((field_no << 3) | wt)
    if wt == _WT_LEN:
        return head + encode_varint(len(payload)) + payload
    return head + payload


def _field_len(field_no: int, payload: bytes) -> bytes:
    return _field(field_no, _WT_LEN, payload)


def _field_varint(field_no: int, val: int) -> bytes:
    return _field(field_no, _WT_VARINT, encode_varint(val))


# ---------------------------------------------------------------------------
# file framing
# ---------------------------------------------------------------------------


def scan_blobs(path: str) -> list[dict]:
    """Metadata-only block index: [{kind, offset, size}] where offset/
    size frame the Blob message bytes. Reads 4-byte lengths + tiny
    BlobHeaders, seeks past payloads (pbf_reader.cpp:20-63)."""
    blocks = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) == 0:
                break
            if len(head) != 4:
                raise ValueError("truncated blob length")
            (hlen,) = struct.unpack(">I", head)
            hbuf = f.read(hlen)
            if len(hbuf) != hlen:
                raise ValueError("truncated BlobHeader")
            btype = None
            datasize = None
            for fno, wt, val in iter_fields(hbuf):
                if fno == 1 and wt == _WT_LEN:
                    btype = bytes(val).decode()
                elif fno == 3 and wt == _WT_VARINT:
                    datasize = val
                # unknown fields: skip (forward compatible)
            if btype is None or datasize is None:
                raise ValueError("BlobHeader missing type/datasize")
            offset = f.tell()
            blocks.append({"kind": btype, "offset": offset,
                           "size": int(datasize)})
            f.seek(datasize, os.SEEK_CUR)
    return blocks


def read_blob_payload(path: str, offset: int, size: int) -> bytes:
    """Blob message → decompressed block bytes (raw | zlib; other
    codecs rejected like pbf_reader.cpp:90-95)."""
    with open(path, "rb") as f:
        f.seek(offset)
        buf = f.read(size)
    raw = None
    zdata = None
    raw_size = None
    for fno, wt, val in iter_fields(buf):
        if fno == 1 and wt == _WT_LEN:
            raw = bytes(val)
        elif fno == 2 and wt == _WT_VARINT:
            raw_size = val
        elif fno == 3 and wt == _WT_LEN:
            zdata = bytes(val)
        elif fno in (4, 5, 6, 7):
            raise ValueError(f"unsupported Blob compression field {fno}")
    if raw is not None:
        return raw
    if zdata is None:
        raise ValueError("Blob: missing data")
    out = zlib.decompress(zdata)
    if raw_size is not None and len(out) != raw_size:
        raise ValueError("Blob: raw_size mismatch")
    return out


# ---------------------------------------------------------------------------
# block decode
# ---------------------------------------------------------------------------


def decode_header_block(buf: bytes) -> dict:
    """HeaderBlock → {bbox: (minlon,minlat,maxlon,maxlat) in degrees
    or None, required_features, optional_features}."""
    bbox = None
    req: list[str] = []
    opt: list[str] = []
    for fno, wt, val in iter_fields(buf):
        if fno == 1 and wt == _WT_LEN:
            vals = {}
            for bfno, bwt, bval in iter_fields(bytes(val)):
                if bwt == _WT_VARINT:
                    vals[bfno] = int(zigzag_decode(
                        np.array([bval], dtype=np.uint64))[0])
            # left=1 right=2 top=3 bottom=4, nanodegrees
            bbox = (vals.get(1, 0) / 1e9, vals.get(4, 0) / 1e9,
                    vals.get(2, 0) / 1e9, vals.get(3, 0) / 1e9)
        elif fno == 4 and wt == _WT_LEN:
            req.append(bytes(val).decode())
        elif fno == 5 and wt == _WT_LEN:
            opt.append(bytes(val).decode())
    return {"bbox": bbox, "required_features": req,
            "optional_features": opt}


class _BlockCtx:
    __slots__ = ("strings", "granularity", "lat_offset", "lon_offset")

    def __init__(self):
        self.strings: list[str] = []
        self.granularity = 100
        self.lat_offset = 0
        self.lon_offset = 0

    def to_i7(self, raw: np.ndarray, offset: int) -> np.ndarray:
        """raw coord units → 1e-7-degree integers, exact when
        offset+granularity*raw is a multiple of 100 (always true for
        the default granularity the reference assumes)."""
        nano = np.int64(offset) + np.int64(self.granularity) * raw
        return nano // np.int64(100)


def _tags_json(strings: list[str], keys: np.ndarray, vals: np.ndarray) -> str:
    import json
    return json.dumps({strings[k]: strings[v]
                       for k, v in zip(keys.tolist(), vals.tolist())},
                      sort_keys=True, separators=(",", ":"))


def _decode_dense(buf, ctx: _BlockCtx, rows: list):
    ids = lats = lons = None
    kv = np.empty(0, dtype=np.int64)
    for fno, wt, val in iter_fields(bytes(buf)):
        if fno == 1:
            ids = decode_packed_s64_delta(val)
        elif fno == 8:
            lats = decode_packed_s64_delta(val)
        elif fno == 9:
            lons = decode_packed_s64_delta(val)
        elif fno == 10:
            kv = decode_packed_u64(val).astype(np.int64)
        # field 5 (DenseInfo) skipped, like the reference
    if ids is None:
        return
    lat_i7 = ctx.to_i7(lats, ctx.lat_offset)
    lon_i7 = ctx.to_i7(lons, ctx.lon_offset)
    # keys_vals: k,v,k,v,...,0 per node; pad tagless tail
    # (pbf_reader.cpp:252-263)
    bounds = np.flatnonzero(kv == 0)
    starts = np.concatenate(([0], bounds[:-1] + 1)) if bounds.size else \
        np.empty(0, dtype=np.int64)
    n = ids.shape[0]
    for i in range(n):
        if i < bounds.size and bounds[i] > starts[i]:
            seg = kv[starts[i]:bounds[i]]
            tags = _tags_json(ctx.strings, seg[0::2], seg[1::2])
        else:
            tags = "{}"
        rows.append((int(ids[i]), int(lat_i7[i]), int(lon_i7[i]), tags))


def _decode_plain_node(buf, ctx: _BlockCtx, rows: list):
    """Non-dense Node message (the reference REJECTS these,
    pbf_reader.cpp:297-299; we accept them — write-side never emits)."""
    nid = 0
    lat = lon = 0
    keys = vals = np.empty(0, dtype=np.int64)
    for fno, wt, val in iter_fields(bytes(buf)):
        if fno == 1:
            nid = int(zigzag_decode(np.array([val], dtype=np.uint64))[0])
        elif fno == 2:
            keys = decode_packed_u64(val).astype(np.int64)
        elif fno == 3:
            vals = decode_packed_u64(val).astype(np.int64)
        elif fno == 8:
            lat = int(zigzag_decode(np.array([val], dtype=np.uint64))[0])
        elif fno == 9:
            lon = int(zigzag_decode(np.array([val], dtype=np.uint64))[0])
    tags = _tags_json(ctx.strings, keys, vals) if keys.size else "{}"
    rows.append((nid,
                 int(ctx.to_i7(np.array([lat]), ctx.lat_offset)[0]),
                 int(ctx.to_i7(np.array([lon]), ctx.lon_offset)[0]), tags))


def _decode_way(buf, ctx: _BlockCtx, rows: list):
    wid = 0
    keys = vals = np.empty(0, dtype=np.int64)
    refs = np.empty(0, dtype=np.int64)
    lats = lons = None
    for fno, wt, val in iter_fields(bytes(buf)):
        if fno == 1 and wt == _WT_VARINT:
            wid = _varint_i64(val)
        elif fno == 2:
            keys = decode_packed_u64(val).astype(np.int64)
        elif fno == 3:
            vals = decode_packed_u64(val).astype(np.int64)
        elif fno == 8:
            refs = decode_packed_s64_delta(val)
        elif fno == 9:
            lats = decode_packed_s64_delta(val)
        elif fno == 10:
            lons = decode_packed_s64_delta(val)
    tags = _tags_json(ctx.strings, keys, vals) if keys.size else "{}"
    if lats is not None and lons is not None:
        lat_i7 = ctx.to_i7(lats, ctx.lat_offset).tolist()
        lon_i7 = ctx.to_i7(lons, ctx.lon_offset).tolist()
    else:
        lat_i7 = lon_i7 = None
    rows.append((int(wid), refs.tolist(), tags, lat_i7, lon_i7))


_MEMBER_TYPES = ("node", "way", "relation")


def _decode_relation(buf, ctx: _BlockCtx, rows: list):
    rid = 0
    keys = vals = np.empty(0, dtype=np.int64)
    roles = np.empty(0, dtype=np.int64)
    memids = np.empty(0, dtype=np.int64)
    types = np.empty(0, dtype=np.int64)
    for fno, wt, val in iter_fields(bytes(buf)):
        if fno == 1 and wt == _WT_VARINT:
            rid = _varint_i64(val)
        elif fno == 2:
            keys = decode_packed_u64(val).astype(np.int64)
        elif fno == 3:
            vals = decode_packed_u64(val).astype(np.int64)
        elif fno == 8:
            roles = decode_packed_u64(val).astype(np.int64)
        elif fno == 9:
            memids = decode_packed_s64_delta(val)
        elif fno == 10:
            types = decode_packed_u64(val).astype(np.int64)
    tags = _tags_json(ctx.strings, keys, vals) if keys.size else "{}"
    rows.append((int(rid), memids.tolist(),
                 [_MEMBER_TYPES[t] for t in types.tolist()],
                 [ctx.strings[r] for r in roles.tolist()], tags))


def decode_primitive_block(buf: bytes,
                           kinds: tuple = ("nodes", "ways",
                                           "relations")) -> dict[str, pa.Table]:
    """One PrimitiveBlock → {'nodes': Table, 'ways': Table,
    'relations': Table} (empty tables when absent). ``kinds`` prunes
    entity-group parsing: a reader that wants only ways still pays the
    zlib decompress (the format has no group index) but skips the
    node/relation varint work — the analog of the reference's
    type-bounded block scan (pbf_processor.cpp:545-591)."""
    ctx = _BlockCtx()
    groups = []
    for fno, wt, val in iter_fields(buf):
        if fno == 1 and wt == _WT_LEN:  # StringTable
            for sfno, swt, sval in iter_fields(bytes(val)):
                if sfno == 1 and swt == _WT_LEN:
                    ctx.strings.append(bytes(sval).decode("utf-8"))
        elif fno == 2 and wt == _WT_LEN:
            groups.append(bytes(val))
        elif fno == 17 and wt == _WT_VARINT:
            ctx.granularity = val
        elif fno == 19 and wt == _WT_VARINT:
            # int64 plain varint: negative values arrive mod 2^64
            ctx.lat_offset = val - (1 << 64) if val >= (1 << 63) else val
        elif fno == 20 and wt == _WT_VARINT:
            ctx.lon_offset = val - (1 << 64) if val >= (1 << 63) else val
        # 18 date_granularity skipped
    node_rows: list = []
    way_rows: list = []
    rel_rows: list = []
    want_n = "nodes" in kinds
    want_w = "ways" in kinds
    want_r = "relations" in kinds
    for g in groups:
        for fno, wt, val in iter_fields(g):
            if fno == 1 and wt == _WT_LEN and want_n:
                _decode_plain_node(val, ctx, node_rows)
            elif fno == 2 and wt == _WT_LEN and want_n:
                _decode_dense(val, ctx, node_rows)
            elif fno == 3 and wt == _WT_LEN and want_w:
                _decode_way(val, ctx, way_rows)
            elif fno == 4 and wt == _WT_LEN and want_r:
                _decode_relation(val, ctx, rel_rows)
            # 5 changesets skipped
    nodes = pa.table({
        "node_id": pa.array([r[0] for r in node_rows], pa.int64()),
        "lat_i7": pa.array([r[1] for r in node_rows], pa.int64()),
        "lon_i7": pa.array([r[2] for r in node_rows], pa.int64()),
        "tags": pa.array([r[3] for r in node_rows], pa.string()),
    })
    ways = pa.table({
        "way_id": pa.array([r[0] for r in way_rows], pa.int64()),
        "refs": pa.array([r[1] for r in way_rows],
                         pa.list_(pa.int64())),
        "tags": pa.array([r[2] for r in way_rows], pa.string()),
        "lats_i7": pa.array([r[3] for r in way_rows],
                            pa.list_(pa.int64())),
        "lons_i7": pa.array([r[4] for r in way_rows],
                            pa.list_(pa.int64())),
    })
    relations = pa.table({
        "relation_id": pa.array([r[0] for r in rel_rows], pa.int64()),
        "member_ids": pa.array([r[1] for r in rel_rows],
                               pa.list_(pa.int64())),
        "member_types": pa.array([r[2] for r in rel_rows],
                                 pa.list_(pa.string())),
        "member_roles": pa.array([r[3] for r in rel_rows],
                                 pa.list_(pa.string())),
        "tags": pa.array([r[4] for r in rel_rows], pa.string()),
    })
    return {"nodes": nodes, "ways": ways, "relations": relations}


# ---------------------------------------------------------------------------
# Ray Data source
# ---------------------------------------------------------------------------

_EMPTY = decode_primitive_block(b"")


def read_header(path: str) -> dict:
    for blk in scan_blobs(path):
        if blk["kind"] == "OSMHeader":
            return decode_header_block(
                read_blob_payload(path, blk["offset"], blk["size"]))
    raise ValueError("no OSMHeader blob")


_KIND_RANK = {"nodes": 0, "ways": 1, "relations": 2}


def probe_block_kinds(path: str, blk: dict) -> set[str]:
    """Entity kinds present in one OSMData blob, WITHOUT decoding
    entities: decompress, then walk only the field tags of each
    PrimitiveGroup (values skipped)."""
    buf = read_blob_payload(path, blk["offset"], blk["size"])
    kinds: set[str] = set()
    for fno, wt, val in iter_fields(buf):
        if fno == 2 and wt == _WT_LEN:
            for gfno, gwt, _ in iter_fields(bytes(val)):
                if gfno in (1, 2):
                    kinds.add("nodes")
                elif gfno == 3:
                    kinds.add("ways")
                elif gfno == 4:
                    kinds.add("relations")
    return kinds


def _sorted_kind_range(path: str, blocks: list[dict],
                       kind: str) -> list[dict]:
    """For Sort.Type_then_ID inputs, binary-search the contiguous
    block range holding ``kind`` — O(log n) blob probes instead of
    decoding every blob (the reference's type-bounded scan,
    pbf_processor.cpp:545-591). A mixed boundary blob (e.g. the last
    nodes block also holding the first ways) is included in BOTH
    adjacent ranges, exactly as the reference's hasNodes/hasWays
    bounds overlap at waysStart/relationsStart — the range for
    ``kind`` starts at the first block whose MAX kind reaches it and
    ends at the first block whose MIN kind is past it.
    decode_primitive_block prunes by kind, so overlap is harmless.
    Blobs with no entities rank as their successor's kind would
    (probe walks forward past them)."""
    want = _KIND_RANK[kind]
    probe_cache: dict[int, tuple[int, int]] = {}

    def ranks_at(i: int) -> tuple[int, int]:
        # (min_rank, max_rank) of the first non-empty blob at or
        # after i; both sequences are monotone under Type_then_ID
        got = probe_cache.get(i)
        if got is not None:
            return got
        for j in range(i, len(blocks)):
            ks = probe_block_kinds(path, blocks[j])
            if ks:
                rr = [_KIND_RANK[k] for k in ks]
                probe_cache[i] = (min(rr), max(rr))
                return probe_cache[i]
        probe_cache[i] = (3, 3)
        return probe_cache[i]

    def bisect(target: int, use_max: bool) -> int:
        # first index whose (max if use_max else min) rank >= target
        lo, hi = 0, len(blocks)
        while lo < hi:
            mid = (lo + hi) // 2
            r = ranks_at(mid)[1 if use_max else 0]
            if r >= target:
                hi = mid
            else:
                lo = mid + 1
        return lo

    return blocks[bisect(want, True):bisect(want + 1, False)]


def read_osm_pbf(path: str, kind: str = "nodes"):
    """Distributed read: one decode task per OSMData blob; each task
    reads only its byte range. kind ∈ nodes|ways|relations. When the
    header declares Sort.Type_then_ID the blob list is pre-narrowed to
    the kind's contiguous range by O(log n) driver probes."""
    import ray.data as rd
    if kind not in ("nodes", "ways", "relations"):
        raise ValueError(f"bad kind {kind!r}")
    all_blobs = scan_blobs(path)
    blocks = [b for b in all_blobs if b["kind"] == "OSMData"]
    header = next((b for b in all_blobs if b["kind"] == "OSMHeader"),
                  None)
    if blocks and header is not None:
        h = decode_header_block(
            read_blob_payload(path, header["offset"], header["size"]))
        if "Sort.Type_then_ID" in h["optional_features"]:
            blocks = _sorted_kind_range(path, blocks, kind)
    if not blocks:
        return rd.from_arrow(_EMPTY[kind])
    items = [{"path": path, "offset": b["offset"], "size": b["size"]}
             for b in blocks]

    def decode(batch: pa.Table) -> pa.Table:
        parts = []
        for i in range(batch.num_rows):
            payload = read_blob_payload(
                batch["path"][i].as_py(), batch["offset"][i].as_py(),
                batch["size"][i].as_py())
            parts.append(decode_primitive_block(payload, (kind,))[kind])
        return pa.concat_tables(parts) if parts else _EMPTY[kind]

    return (rd.from_items(items, override_num_blocks=len(items))
            .map_batches(decode, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# encoder (fixtures / round-trip oracle)
# ---------------------------------------------------------------------------


class _StringTable:
    """Index 0 is reserved-empty (DenseNodes keys_vals uses 0 as the
    per-node terminator, so real strings start at 1)."""

    def __init__(self):
        self._idx: dict[str, int] = {}
        self.strings: list[str] = [""]

    def add(self, s: str) -> int:
        i = self._idx.get(s)
        if i is None:
            i = len(self.strings)
            self.strings.append(s)
            self._idx[s] = i
        return i

    def encode(self) -> bytes:
        return b"".join(_field_len(1, s.encode("utf-8"))
                        for s in self.strings)


def _encode_blob(block_bytes: bytes, compress: bool) -> bytes:
    if compress:
        blob = (_field_varint(2, len(block_bytes)) +
                _field_len(3, zlib.compress(block_bytes, 6)))
    else:
        blob = _field_len(1, block_bytes)
    return blob


def _frame(kind: str, blob: bytes) -> bytes:
    header = (_field_len(1, kind.encode()) +
              _field_varint(3, len(blob)))
    return struct.pack(">I", len(header)) + header + blob


def _encode_primitive_block(group: bytes, st: _StringTable,
                            granularity: int = 100,
                            lat_offset: int = 0,
                            lon_offset: int = 0) -> bytes:
    out = _field_len(1, st.encode()) + _field_len(2, group)
    if granularity != 100:
        out += _field_varint(17, granularity)
    if lat_offset:
        out += _field_varint(19, lat_offset)
    if lon_offset:
        out += _field_varint(20, lon_offset)
    return out


def _coords_to_raw(lat_i7, granularity: int, offset: int) -> np.ndarray:
    nano = np.asarray(lat_i7, dtype=np.int64) * np.int64(100)
    raw, rem = np.divmod(nano - np.int64(offset), np.int64(granularity))
    if rem.any():
        raise ValueError("coords not representable at this granularity")
    return raw


def write_osm_pbf(path: str, nodes: pa.Table | None = None,
                  ways: pa.Table | None = None,
                  relations: pa.Table | None = None,
                  block_entities: int = 8000, compress: bool = True,
                  granularity: int = 100, lat_offset: int = 0,
                  lon_offset: int = 0,
                  bbox_i9: tuple | None = None) -> int:
    """Deterministic writer: header blob + DenseNodes / Way / Relation
    blocks of ``block_entities`` each (the reference's preferred ~8k
    block granularity, pbf_processor.cpp:594-606). Input schemas match
    the decoder's outputs (tags as sorted-key JSON strings). Returns
    the number of OSMData blocks written."""
    import json
    chunks = [b""]  # header placeholder
    n_blocks = 0

    def emit(group: bytes, st: _StringTable):
        nonlocal n_blocks
        block = _encode_primitive_block(group, st, granularity,
                                        lat_offset, lon_offset)
        chunks.append(_frame("OSMData", _encode_blob(block, compress)))
        n_blocks += 1

    if nodes is not None and nodes.num_rows:
        ids = nodes["node_id"].to_numpy()
        lat_raw = _coords_to_raw(nodes["lat_i7"].to_numpy(),
                                 granularity, lat_offset)
        lon_raw = _coords_to_raw(nodes["lon_i7"].to_numpy(),
                                 granularity, lon_offset)
        tags = nodes["tags"].to_pylist()
        for s in range(0, len(ids), block_entities):
            e = min(s + block_entities, len(ids))
            st = _StringTable()
            kv: list[int] = []
            for t in tags[s:e]:
                for k, v in json.loads(t).items():
                    kv.append(st.add(k))
                    kv.append(st.add(v))
                kv.append(0)
            dense = (_field_len(1, encode_packed_s64_delta(ids[s:e])) +
                     _field_len(8, encode_packed_s64_delta(lat_raw[s:e])) +
                     _field_len(9, encode_packed_s64_delta(lon_raw[s:e])) +
                     _field_len(10, encode_packed_u64(kv)))
            emit(_field_len(2, dense), st)

    if ways is not None and ways.num_rows:
        wids = ways["way_id"].to_numpy()
        refs = ways["refs"].to_pylist()
        tags = ways["tags"].to_pylist()
        has_loc = ("lats_i7" in ways.column_names and
                   ways["lats_i7"].null_count < ways.num_rows)
        lats = ways["lats_i7"].to_pylist() if has_loc else None
        lons = ways["lons_i7"].to_pylist() if has_loc else None
        for s in range(0, len(wids), block_entities):
            e = min(s + block_entities, len(wids))
            st = _StringTable()
            group = bytearray()
            for i in range(s, e):
                msg = _field_varint(1, int(wids[i]))
                t = json.loads(tags[i])
                if t:
                    msg += _field_len(2, encode_packed_u64(
                        [st.add(k) for k in t]))
                    msg += _field_len(3, encode_packed_u64(
                        [st.add(v) for v in t.values()]))
                msg += _field_len(8, encode_packed_s64_delta(refs[i]))
                if lats is not None and lats[i] is not None:
                    msg += _field_len(9, encode_packed_s64_delta(
                        _coords_to_raw(lats[i], granularity, lat_offset)))
                    msg += _field_len(10, encode_packed_s64_delta(
                        _coords_to_raw(lons[i], granularity, lon_offset)))
                group += _field_len(3, msg)
            emit(bytes(group), st)

    if relations is not None and relations.num_rows:
        rids = relations["relation_id"].to_numpy()
        mids = relations["member_ids"].to_pylist()
        mtypes = relations["member_types"].to_pylist()
        mroles = relations["member_roles"].to_pylist()
        tags = relations["tags"].to_pylist()
        for s in range(0, len(rids), block_entities):
            e = min(s + block_entities, len(rids))
            st = _StringTable()
            group = bytearray()
            for i in range(s, e):
                msg = _field_varint(1, int(rids[i]))
                t = json.loads(tags[i])
                if t:
                    msg += _field_len(2, encode_packed_u64(
                        [st.add(k) for k in t]))
                    msg += _field_len(3, encode_packed_u64(
                        [st.add(v) for v in t.values()]))
                msg += _field_len(8, encode_packed_u64(
                    [st.add(r) for r in mroles[i]]))
                msg += _field_len(9, encode_packed_s64_delta(mids[i]))
                msg += _field_len(10, encode_packed_u64(
                    [_MEMBER_TYPES.index(ty) for ty in mtypes[i]]))
                group += _field_len(4, msg)
            emit(bytes(group), st)

    header = (_field_len(4, b"OsmSchema-V0.6") +
              _field_len(4, b"DenseNodes"))

    def _ids_sorted(t, col):
        if t is None or t.num_rows < 2:
            return True
        v = t[col].to_numpy()
        return bool(np.all(v[1:] >= v[:-1]))

    # blocks are emitted nodes→ways→relations; declare the sortedness
    # feature (enables the reader's O(log n) type-range bisection)
    # only when the per-type id order actually holds
    if (_ids_sorted(nodes, "node_id") and _ids_sorted(ways, "way_id")
            and _ids_sorted(relations, "relation_id")):
        header += _field_len(5, b"Sort.Type_then_ID")
    if bbox_i9 is not None:
        left, bottom, right, top = bbox_i9
        bb = b"".join(_field(f, _WT_VARINT,
                             encode_varint(int(zigzag_encode(
                                 np.array([v], dtype=np.int64))[0])))
                      for f, v in ((1, left), (2, right),
                                   (3, top), (4, bottom)))
        header = _field_len(1, bb) + header
    chunks[0] = _frame("OSMHeader", _encode_blob(header, compress))

    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        for c in chunks:
            f.write(c)
    os.replace(tmp, path)
    return n_blocks
