"""EXIF / TIFF-IFD metadata extraction from JPEG APP1 segments
(EXIF 2.3 / TIFF 6.0 wire format, public specs) — the camera-metadata
harvest step of an image-crawl pipeline (orientation for correct
decode, Make/Model/DateTime for provenance dedup and PII review).

Pure-stdlib segment walk: SOI → APPn/COM chain up to SOS; the first
APP1 whose payload starts with ``Exif\\0\\0`` carries a TIFF file:
2-byte byte-order mark (II little / MM big), magic 42, IFD0 offset,
then count × 12-byte entries (tag, type, count, value-or-offset;
values wider than 4 bytes live at an offset in the data area, narrow
values sit left-justified in the field). Only IFD0 tags needed by a
curation run are decoded; everything else is skipped without error —
crawled EXIF is routinely truncated or vendor-mangled, so every parse
error degrades to "no metadata", never an exception.

Scale shape: per-row metadata parse inside ``map_batches`` (payloads
are already in the batch; the walk touches only headers, not entropy-
coded data), no shuffle — the downstream rollup is a tiny groupby.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132

# TIFF type -> byte width (only the ones we read/write)
_TYPE_W = {1: 1, 2: 1, 3: 2, 4: 4}


def build_exif_app1(make: str, model: str, orientation: int,
                    datetime: str, big_endian: bool = False) -> bytes:
    """Construct an APP1 EXIF segment (marker + length included) with
    an IFD0 carrying Make/Model/Orientation/DateTime. ASCII values
    longer than 4 bytes (incl. NUL) are placed in the data area."""
    bo = ">" if big_endian else "<"
    entries = []          # (tag, type, count, inline4 | (None, data))
    data_area = b""
    base = 8 + 2 + 4 * 12 + 4      # header + count + entries + nextIFD

    def ascii_val(s):
        nonlocal data_area
        raw = s.encode("ascii") + b"\x00"
        if len(raw) <= 4:
            return len(raw), raw.ljust(4, b"\x00"), None
        off = base + len(data_area)
        data_area += raw
        return len(raw), struct.pack(bo + "I", off), None

    n, v, _ = ascii_val(make)
    entries.append((_TAG_MAKE, 2, n, v))
    n, v, _ = ascii_val(model)
    entries.append((_TAG_MODEL, 2, n, v))
    entries.append((_TAG_ORIENTATION, 3, 1,
                    struct.pack(bo + "H", orientation).ljust(4, b"\x00")))
    n, v, _ = ascii_val(datetime)
    entries.append((_TAG_DATETIME, 2, n, v))

    tiff = (b"MM" if big_endian else b"II") \
        + struct.pack(bo + "H", 42) + struct.pack(bo + "I", 8)
    ifd = struct.pack(bo + "H", len(entries))
    for tag, typ, cnt, val in sorted(entries):
        ifd += struct.pack(bo + "HHI", tag, typ, cnt) + val
    ifd += struct.pack(bo + "I", 0)          # no next IFD
    payload = b"Exif\x00\x00" + tiff + ifd + data_area
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment immediately after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    return jpeg[:2] + app1 + jpeg[2:]


def parse_exif(jpeg: bytes):
    """Return {'make','model','orientation','datetime'} (missing tags
    -> None) or None if the payload is not a JPEG / carries no EXIF.
    Never raises on malformed metadata — returns what it got."""
    if len(jpeg) < 4 or jpeg[:2] != b"\xff\xd8":
        return None
    i = 2
    tiff = None
    while i + 4 <= len(jpeg):
        if jpeg[i] != 0xFF:
            return None
        marker = jpeg[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA or marker == 0xD9:   # SOS/EOI: no EXIF seen
            return None
        seg_len = struct.unpack(">H", jpeg[i + 2:i + 4])[0]
        body = jpeg[i + 4:i + 2 + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        i += 2 + seg_len
    if tiff is None or len(tiff) < 8:
        return None
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        return None
    try:
        if struct.unpack(bo + "H", tiff[2:4])[0] != 42:
            return None
        ifd_off = struct.unpack(bo + "I", tiff[4:8])[0]
        n = struct.unpack(bo + "H", tiff[ifd_off:ifd_off + 2])[0]
        out = {"make": None, "model": None, "orientation": None,
               "datetime": None}
        for k in range(n):
            e = tiff[ifd_off + 2 + 12 * k:ifd_off + 2 + 12 * (k + 1)]
            if len(e) < 12:
                break
            tag, typ, cnt = struct.unpack(bo + "HHI", e[:8])
            width = _TYPE_W.get(typ)
            if width is None:
                continue
            nbytes = width * cnt
            if nbytes <= 4:
                raw = e[8:8 + nbytes]
            else:
                off = struct.unpack(bo + "I", e[8:12])[0]
                raw = tiff[off:off + nbytes]
                if len(raw) < nbytes:
                    continue
            if tag in (_TAG_MAKE, _TAG_MODEL, _TAG_DATETIME) \
                    and typ == 2:
                val = raw.split(b"\x00", 1)[0].decode(
                    "ascii", errors="replace")
                key = {_TAG_MAKE: "make", _TAG_MODEL: "model",
                       _TAG_DATETIME: "datetime"}[tag]
                out[key] = val
            elif tag == _TAG_ORIENTATION and typ == 3 and cnt >= 1:
                out["orientation"] = struct.unpack(bo + "H",
                                                   raw[:2])[0]
        return out
    except (struct.error, IndexError):
        return None


def exif_extract_fn(batch: pa.Table) -> pa.Table:
    """map_batches body: media rows → (media_id, make, model,
    orientation, datetime) for rows carrying EXIF; others dropped."""
    ids, mk, md, orc, dt = [], [], [], [], []
    for mid, payload in zip(batch["media_id"].to_pylist(),
                            batch["payload"].to_pylist()):
        meta = parse_exif(payload)
        if meta is None:
            continue
        ids.append(mid)
        mk.append(meta["make"])
        md.append(meta["model"])
        orc.append(meta["orientation"])
        dt.append(meta["datetime"])
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "make": pa.array(mk, pa.string()),
        "model": pa.array(md, pa.string()),
        "orientation": pa.array(
            np.asarray(orc, dtype=np.int64) if orc else [],
            pa.int64()),
        "datetime": pa.array(dt, pa.string())})
