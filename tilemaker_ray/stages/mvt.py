"""Mapbox Vector Tile (MVT 2.1) encoder — hand-rolled protobuf.

Implements the public vector-tile spec
(github.com/mapbox/vector-tile-spec, the same wire format the
reference emits through vendored vtzero,
/root/reference/src/tile_worker.cpp:98-301): varint wire encoding,
zigzag deltas, MoveTo/LineTo/ClosePath command integers, per-layer
key/value dictionaries. No protobuf library needed — per-tile feature
counts are small, so a tight Python byte-builder is adequate; all
coordinate quantization/delta math is numpy.

Spec constants: Tile.layers = field 3; Layer{version=15, name=1,
features=2, keys=3, values=4, extent=5}; Feature{id=1, tags=2,
type=3, geometry=4}; Value{string=1, float=2, double=3, int=4,
uint=5, sint=6, bool=7}.
"""

from __future__ import annotations

import numpy as np

CMD_MOVETO, CMD_LINETO, CMD_CLOSEPATH = 1, 2, 7
GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 1, 2, 3


def _varint(v: int) -> bytes:
    out = bytearray()
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _packed_u32(field: int, values) -> bytes:
    if isinstance(values, np.ndarray):
        body = varints_array(values)
    else:
        body = b"".join(_varint(int(v)) for v in values)
    return _len_delim(field, body)


def varints_array(vals: np.ndarray) -> bytes:
    """Vectorized varint encoding of a uint array (values < 2^42) —
    the hot path for packed geometry commands."""
    v = np.asarray(vals, dtype=np.uint64)
    nb = (np.uint64(1) + (v >= 1 << 7) + (v >= 1 << 14) + (v >= 1 << 21)
          + (v >= 1 << 28) + (v >= 1 << 35)).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(nb)])
    out = np.zeros(offs[-1], dtype=np.uint8)
    for j in range(6):
        need = nb > j
        if not need.any():
            break
        byte = ((v[need] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        more = (nb[need] > j + 1)
        byte = byte | (more.astype(np.uint8) << 7)
        out[offs[:-1][need] + j] = byte
    return out.tobytes()


def multipoint_commands(pts: np.ndarray) -> np.ndarray:
    """Command-integer array for an N-point MoveTo (zigzag deltas),
    fully vectorized."""
    p = np.asarray(pts, dtype=np.int64).reshape(-1, 2)
    d = np.empty_like(p)
    d[0] = p[0]
    d[1:] = np.diff(p, axis=0)
    zz = (d << 1) ^ (d >> 63)
    cmds = np.empty(1 + 2 * len(p), dtype=np.uint64)
    cmds[0] = (len(p) << 3) | CMD_MOVETO
    cmds[1::2] = zz[:, 0]
    cmds[2::2] = zz[:, 1]
    return cmds


def geometry_commands(parts: list, geom_type: int) -> list:
    """Encode geometry parts (each an (N,2) int array of tile-grid
    coords) into MVT command integers with zigzag deltas.

    - POINT: one MoveTo with all points
    - LINESTRING: per part MoveTo(1) + LineTo(N-1)
    - POLYGON: per ring MoveTo(1) + LineTo(N-2) + ClosePath (input
      rings are closed; the closing vertex is dropped per spec)
    """
    cmds: list[int] = []
    cx = cy = 0
    if geom_type == GEOM_POINT:
        pts = np.vstack(parts)
        cmds.append((len(pts) << 3) | CMD_MOVETO)
        for x, y in pts:
            cmds.append(_zigzag(int(x) - cx))
            cmds.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        return cmds
    for part in parts:
        p = np.asarray(part, dtype=np.int64)
        if geom_type == GEOM_POLYGON and len(p) >= 2 and (p[0] == p[-1]).all():
            p = p[:-1]
        if len(p) < (2 if geom_type == GEOM_LINESTRING else 3):
            continue
        cmds.append((1 << 3) | CMD_MOVETO)
        cmds.append(_zigzag(int(p[0, 0]) - cx))
        cmds.append(_zigzag(int(p[0, 1]) - cy))
        cx, cy = int(p[0, 0]), int(p[0, 1])
        cmds.append(((len(p) - 1) << 3) | CMD_LINETO)
        for x, y in p[1:]:
            cmds.append(_zigzag(int(x) - cx))
            cmds.append(_zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
        if geom_type == GEOM_POLYGON:
            # MVT 2.1: ClosePath carries command count 1, so the wire
            # integer is (1<<3)|7 = 15 (vtzero emits exactly this,
            # include/vtzero/geometry.hpp:103-105 in the reference tree).
            cmds.append((1 << 3) | CMD_CLOSEPATH)
    return cmds


def _encode_value(v) -> bytes:
    if isinstance(v, bool):
        return _tag(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _tag(6, 0) + _varint(_zigzag(v))
    if isinstance(v, float):
        import struct
        return _tag(3, 1) + struct.pack("<d", v)
    s = str(v).encode("utf-8")
    return _len_delim(1, s)


class LayerBuilder:
    """One MVT layer: features + deduplicated key/value dictionaries
    (the in-tile analog of the reference's AttributeStore dedup,
    include/attribute_store.h — global dedup is unnecessary in a
    share-nothing engine, per-tile dedup is what the format needs)."""

    def __init__(self, name: str, extent: int = 4096):
        self.name = name
        self.extent = extent
        self.keys: list[str] = []
        self.values: list[bytes] = []
        self._kidx: dict[str, int] = {}
        self._vidx: dict[bytes, int] = {}
        self.features: list[bytes] = []

    def add_feature(self, geom_type: int, parts: list, attrs: dict,
                    feature_id: int | None = None):
        if geom_type == GEOM_POINT:
            pts = parts[0] if len(parts) == 1 else np.vstack(parts)
            if len(pts) == 0:
                return False
            cmds = multipoint_commands(pts)  # vectorized fast path
        else:
            cmds = geometry_commands(parts, geom_type)
        if len(cmds) == 0:
            return False
        tags = []
        for k, v in attrs.items():
            if k not in self._kidx:
                self._kidx[k] = len(self.keys)
                self.keys.append(k)
            vb = _encode_value(v)
            if vb not in self._vidx:
                self._vidx[vb] = len(self.values)
                self.values.append(vb)
            tags.append(self._kidx[k])
            tags.append(self._vidx[vb])
        body = b""
        if feature_id is not None:
            body += _tag(1, 0) + _varint(int(feature_id))
        if tags:
            body += _packed_u32(2, tags)
        body += _tag(3, 0) + _varint(geom_type)
        body += _packed_u32(4, cmds)
        self.features.append(body)
        return True

    def build(self) -> bytes:
        body = _tag(15, 0) + _varint(2)          # version
        body += _len_delim(1, self.name.encode("utf-8"))
        for f in self.features:
            body += _len_delim(2, f)
        for k in self.keys:
            body += _len_delim(3, k.encode("utf-8"))
        for v in self.values:
            body += _len_delim(4, v)
        body += _tag(5, 0) + _varint(self.extent)
        return body


def build_tile(layers: list) -> bytes:
    """layers: list of LayerBuilder → full MVT tile bytes."""
    return b"".join(_len_delim(3, l.build()) for l in layers if l.features)


# -- minimal decoder (for tests / the merge reader, the analog of
#    readTileAndUncompress + vtzero iteration, src/mbtiles.cpp:103-140) --

def decode_tile(buf: bytes) -> dict:
    """MVT bytes → {layer_name: {"features": [(type, tags, cmds)],
    "keys": [...], "values": [...], "extent": int}}."""
    out = {}
    for fnum, val in _iter_fields(buf):
        if fnum != 3:
            continue
        layer = {"features": [], "keys": [], "values": [], "extent": 4096,
                 "name": ""}
        for lf, lv in _iter_fields(val):
            if lf == 1:
                layer["name"] = lv.decode()
            elif lf == 2:
                feat = {"type": 0, "tags": [], "geometry": [], "id": None}
                for ff, fv in _iter_fields(lv):
                    if ff == 1:
                        feat["id"] = fv
                    elif ff == 2:
                        feat["tags"] = _unpack_varints(fv)
                    elif ff == 3:
                        feat["type"] = fv
                    elif ff == 4:
                        feat["geometry"] = _unpack_varints(fv)
                layer["features"].append(feat)
            elif lf == 3:
                layer["keys"].append(lv.decode())
            elif lf == 4:
                layer["values"].append(_decode_value(lv))
            elif lf == 5:
                layer["extent"] = lv
        out[layer["name"]] = layer
    return out


def _iter_fields(buf: bytes):
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        fnum, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
            yield fnum, v
        elif wire == 1:
            yield fnum, buf[i:i + 8]
            i += 8
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            yield fnum, buf[i:i + ln]
            i += ln
        elif wire == 5:
            yield fnum, buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"bad wire type {wire}")


def _read_varint(buf: bytes, i: int):
    v = shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def _unpack_varints(buf: bytes) -> list:
    out = []
    i = 0
    while i < len(buf):
        v, i = _read_varint(buf, i)
        out.append(v)
    return out


def _decode_value(buf: bytes):
    for f, v in _iter_fields(buf):
        if f == 1:
            return v.decode()
        if f == 3:
            import struct
            return struct.unpack("<d", v)[0]
        if f == 6:
            return (v >> 1) ^ -(v & 1)
        if f == 7:
            return bool(v)
        return v
    return None


def decode_geometry(cmds: list):
    """Command integers → list of (N,2) int arrays (parts/rings)."""
    parts = []
    cur = []
    x = y = 0
    i = 0
    while i < len(cmds):
        cmd = cmds[i]
        op, count = cmd & 7, cmd >> 3
        i += 1
        if op == CMD_MOVETO:
            for _ in range(count):
                if cur:
                    parts.append(np.asarray(cur))
                    cur = []
                dx, dy = cmds[i], cmds[i + 1]
                i += 2
                x += (dx >> 1) ^ -(dx & 1)
                y += (dy >> 1) ^ -(dy & 1)
                cur.append((x, y))
        elif op == CMD_LINETO:
            for _ in range(count):
                dx, dy = cmds[i], cmds[i + 1]
                i += 2
                x += (dx >> 1) ^ -(dx & 1)
                y += (dy >> 1) ^ -(dy & 1)
                cur.append((x, y))
        elif op == CMD_CLOSEPATH:
            if cur:
                cur.append(cur[0])
                parts.append(np.asarray(cur))
                cur = []
    if cur:
        parts.append(np.asarray(cur))
    return parts
