"""Pure-Python ESRI shapefile (.shp/.dbf) source.

The reference's primary external-layer path
(/root/reference/src/shp_processor.cpp:109-278): read .shp geometry +
.dbf attributes, assemble polygon rings (first part is an exterior
ring; a later clockwise part starts a new polygon, counter-clockwise
parts are holes of the current one — shp_processor.cpp:225-250), remap
the configured attribute columns, and emit rows in the same polygon
table schema the PIP join broadcasts.

Formats are the public ESRI specs:
- .shp: 100-byte header (big-endian file code 9994 / length, little-
  endian version 1000 / shape type / bbox), then records of
  (BE record number, BE content length) + LE shape payload.
- .dbf: dBase III — version byte, LE record count, header/record sizes,
  32-byte field descriptors (11-byte name, type char, length), records
  as fixed-width ASCII with a deletion-flag byte.

External layers are small sides (admin/ocean/landuse); like the other
polygon sources they parse on the driver and broadcast via ``ray.put``
— never shuffled (SURVEY.md §2.4 T4).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..geo import wkb as _wkb

SHP_NULL = 0
SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5
SHP_MULTIPOINT = 8


# ---------------------------------------------------------------------------
# .shp geometry
# ---------------------------------------------------------------------------

def read_shp(path: str) -> list:
    """→ list of (shape_type, parts) where parts is a list of (N,2)
    float64 arrays ((lon, lat) vertex runs; for polygons: rings in file
    order). Null shapes yield (0, [])."""
    with open(path, "rb") as f:
        buf = f.read()
    code, = struct.unpack(">i", buf[0:4])
    if code != 9994:
        raise ValueError(f"{path}: not a shapefile (code {code})")
    file_len = struct.unpack(">i", buf[24:28])[0] * 2  # 16-bit words
    out = []
    pos = 100
    while pos + 8 <= file_len:
        _recno, content_len = struct.unpack(">ii", buf[pos:pos + 8])
        pos += 8
        rec = buf[pos:pos + content_len * 2]
        pos += content_len * 2
        stype, = struct.unpack("<i", rec[0:4])
        base = stype % 10  # fold Z (11+) / M (21+) variants onto 2D
        if stype == SHP_NULL:
            out.append((0, []))
        elif base == SHP_POINT:
            x, y = struct.unpack("<dd", rec[4:20])
            out.append((SHP_POINT, [np.array([[x, y]])]))
        elif base == SHP_MULTIPOINT:
            n, = struct.unpack("<i", rec[36:40])
            pts = np.frombuffer(rec, dtype="<f8", count=2 * n,
                                offset=40).reshape(n, 2)
            out.append((SHP_MULTIPOINT, [pts.copy()]))
        elif base in (SHP_POLYLINE, SHP_POLYGON):
            n_parts, n_points = struct.unpack("<ii", rec[36:44])
            parts_off = np.frombuffer(rec, dtype="<i4", count=n_parts,
                                      offset=44)
            pts = np.frombuffer(rec, dtype="<f8", count=2 * n_points,
                                offset=44 + 4 * n_parts).reshape(n_points, 2)
            bounds = np.concatenate([parts_off, [n_points]])
            parts = [pts[bounds[j]:bounds[j + 1]].copy()
                     for j in range(n_parts)]
            out.append((SHP_POLYLINE if base == SHP_POLYLINE
                        else SHP_POLYGON, parts))
        else:
            raise ValueError(f"unsupported shape type {stype}")
    return out


def _ring_signed_area(ring: np.ndarray) -> float:
    from ..geo.clip import ring_area
    return ring_area(np.asarray(ring, dtype=np.float64))


def assemble_polygons(parts: list) -> list:
    """Shapefile polygon parts → list of (exterior, [holes]) following
    the reference's sequential rule (shp_processor.cpp:225-250): part 0
    is an exterior; a subsequent CLOCKWISE part (ESRI outer convention,
    negative shoelace area) starts a new polygon; counter-clockwise
    parts are holes of the current polygon."""
    if not parts:
        return []
    polys = []
    cur_ext, cur_holes = parts[0], []
    for ring in parts[1:]:
        if _ring_signed_area(ring) < 0.0:  # CW → new exterior
            polys.append((cur_ext, cur_holes))
            cur_ext, cur_holes = ring, []
        else:
            cur_holes.append(ring)
    polys.append((cur_ext, cur_holes))
    return polys


# ---------------------------------------------------------------------------
# .dbf attributes
# ---------------------------------------------------------------------------

def read_dbf(path: str, columns: list | None = None) -> pa.Table:
    """→ attribute table; C fields as string, N/F as float64 (int64 when
    no decimals), L as bool. ``columns`` selects/orders fields (missing
    names are ignored, like DBFGetFieldIndex returning -1)."""
    with open(path, "rb") as f:
        buf = f.read()
    n_rec, = struct.unpack("<i", buf[4:8])
    hdr_size, rec_size = struct.unpack("<hh", buf[8:12])
    fields = []  # (name, type, length, decimals)
    pos = 32
    while pos < hdr_size - 1 and buf[pos] != 0x0D:
        fd = buf[pos:pos + 32]
        name = fd[0:11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(fd[11])
        flen = fd[16]
        fdec = fd[17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    want = None if columns is None else set(columns)
    raw: dict = {name: [] for name, *_ in fields
                 if want is None or name in want}
    for r in range(n_rec):
        rec = buf[hdr_size + r * rec_size: hdr_size + (r + 1) * rec_size]
        if rec[:1] == b"*":
            # deleted record: emit nulls to keep the dbf row index
            # 1:1 with .shp record numbers (read_shapefile indexes by
            # shp record)
            for name in raw:
                raw[name].append(None)
            continue
        off = 1
        for name, ftype, flen, fdec in fields:
            cell = rec[off:off + flen]
            off += flen
            if name not in raw:
                continue
            s = cell.decode("ascii", "replace").strip()
            if ftype in ("N", "F"):
                if not s:
                    raw[name].append(None)
                elif fdec == 0 and "." not in s:
                    raw[name].append(int(s))
                else:
                    raw[name].append(float(s))
            elif ftype == "L":
                raw[name].append(s in ("Y", "y", "T", "t"))
            else:
                raw[name].append(s)
    cols = {}
    order = columns if columns is not None else [f[0] for f in fields]
    for name in order:
        if name in raw:
            cols[name] = pa.array(raw[name])
    return pa.table(cols) if cols else pa.table({})


# ---------------------------------------------------------------------------
# combined source → polygon-layer table
# ---------------------------------------------------------------------------

def read_shapefile(base: str, layer: str, columns: list | None = None,
                   index_name: str | None = None, minzoom: int = 0,
                   attr_remap: dict | None = None,
                   attribute_function=None) -> pa.Table:
    """``base`` without extension (or the .shp path). → the standard
    polygon-layer table (layer, name, class, minzoom, geom_wkb) plus one
    column per requested dbf attribute. ``index_name`` names the dbf
    field used as the feature name (the layer's indexName);
    ``attr_remap`` renames dbf fields on output (M8 attribute remap,
    same as sourceColumns mapping in the reference's layer config).
    Polygon records may expand to several rows (one per assembled
    polygon, sharing attributes); lines emit one row per part."""
    if base.endswith(".shp"):
        base = base[:-4]
    shapes = read_shp(base + ".shp")
    dbf_cols = set(columns or [])
    if index_name:
        dbf_cols.add(index_name)
    attrs = read_dbf(base + ".dbf", sorted(dbf_cols)) if dbf_cols \
        else pa.table({})

    out = {"layer": [], "name": [], "class": [], "minzoom": [],
           "geom_wkb": []}
    extra: dict = {c: [] for c in (columns or []) if c != index_name}
    rec_idx = []
    for i, (stype, parts) in enumerate(shapes):
        name = ""
        if index_name and index_name in (attrs.column_names or []):
            v = attrs[index_name][i].as_py()
            name = "" if v is None else str(v)

        def emit(geom):
            out["layer"].append(layer)
            out["name"].append(name)
            out["class"].append("")
            out["minzoom"].append(minzoom)
            out["geom_wkb"].append(geom)
            rec_idx.append(i)

        if stype == SHP_POINT:
            emit(_wkb.point_wkb(parts[0][0, 0], parts[0][0, 1]))
        elif stype == SHP_MULTIPOINT:
            for p in parts[0]:
                emit(_wkb.point_wkb(p[0], p[1]))
        elif stype == SHP_POLYLINE:
            for part in parts:
                if len(part) >= 2:
                    emit(_wkb.linestring_wkb(part))
        elif stype == SHP_POLYGON:
            for ext, holes in assemble_polygons(parts):
                if len(ext) >= 4:
                    emit(_wkb.polygon_wkb(ext, holes or None))
    t = pa.table({
        "layer": pa.array(out["layer"], pa.string()),
        "name": pa.array(out["name"], pa.string()),
        "class": pa.array(out["class"], pa.string()),
        "minzoom": pa.array(out["minzoom"], pa.int8()),
        "geom_wkb": pa.array(out["geom_wkb"], pa.binary()),
    })
    for c in (columns or []):
        if c == index_name or c not in attrs.column_names:
            continue
        vals = attrs[c].take(pa.array(rec_idx))
        t = t.append_column((attr_remap or {}).get(c, c), vals)
    if attribute_function is not None:
        # the reference's Lua attribute_function hook
        # (src/osm_lua_processing.cpp:355-370 via shp_processor): user
        # callable (attrs: dict, layer: str) -> dict rewrites each
        # feature's attribute row; returned keys become/replace columns
        # (the 'class'/'minzoom' specials keep their typed columns).
        # A callable that mutates in place and returns None keeps its
        # (mutated) input row — the usual Python-hook idiom.
        rows = t.to_pylist()
        rewritten = []
        for r in rows:
            rr = dict(r)
            out_r = attribute_function(rr, layer)
            rewritten.append(rr if out_r is None else out_r)
        # with no rows, keep the standard schema (downstream index
        # builds select geom_wkb/layer); with rows, the rewritten keys
        # define the columns (a popped key genuinely disappears)
        keys: list = [] if rewritten else list(t.column_names)
        for r in rewritten:
            for k in r:
                if k not in keys:
                    keys.append(k)
        cols = {}
        for k in keys:
            vals = [r.get(k) for r in rewritten]
            if k == "minzoom":
                cols[k] = pa.array([int(v or 0) for v in vals], pa.int8())
            elif k == "geom_wkb":
                cols[k] = pa.array(vals, pa.binary())
            else:
                typ = t.schema.field(k).type if k in t.column_names \
                    else None
                cols[k] = pa.array(vals, typ) if typ is not None \
                    else pa.array(vals)
        t = pa.table(cols)
    return t


# ---------------------------------------------------------------------------
# writer (fixtures / debug sink)
# ---------------------------------------------------------------------------

def write_shapefile(base: str, geoms: list, fields: dict | None = None):
    """Minimal .shp/.dbf writer for test fixtures: ``geoms`` is a list
    of (shape_type, parts); ``fields`` maps column name → list of
    values (str or int). Writes ESRI-conformant files (BE headers,
    ring order preserved as given)."""
    if base.endswith(".shp"):
        base = base[:-4]
    records = []
    allx, ally = [], []
    for stype, parts in geoms:
        if stype == SHP_POINT:
            p = parts[0][0]
            rec = struct.pack("<i", SHP_POINT) + struct.pack("<dd", *p)
            allx.append(p[0]); ally.append(p[1])
        elif stype in (SHP_POLYLINE, SHP_POLYGON):
            pts = np.vstack(parts)
            offs = np.cumsum([0] + [len(p) for p in parts[:-1]])
            bbox = (pts[:, 0].min(), pts[:, 1].min(),
                    pts[:, 0].max(), pts[:, 1].max())
            rec = (struct.pack("<i", stype)
                   + struct.pack("<4d", *bbox)
                   + struct.pack("<ii", len(parts), len(pts))
                   + np.asarray(offs, "<i4").tobytes()
                   + np.asarray(pts, "<f8").tobytes())
            allx.extend([bbox[0], bbox[2]]); ally.extend([bbox[1], bbox[3]])
        else:
            raise ValueError(f"writer: unsupported type {stype}")
        records.append(rec)
    body = b""
    for i, rec in enumerate(records):
        body += struct.pack(">ii", i + 1, len(rec) // 2) + rec
    bbox = (min(allx), min(ally), max(allx), max(ally)) if allx \
        else (0, 0, 0, 0)
    shp_type = geoms[0][0] if geoms else SHP_NULL
    hdr = (struct.pack(">i", 9994) + b"\x00" * 20
           + struct.pack(">i", (100 + len(body)) // 2)
           + struct.pack("<ii", 1000, shp_type)
           + struct.pack("<4d", *bbox) + struct.pack("<4d", 0, 0, 0, 0))
    with open(base + ".shp", "wb") as f:
        f.write(hdr + body)

    fields = fields or {}
    names = list(fields)
    n = len(records)
    flens = {}
    for c in names:
        flens[c] = max([len(str(v)) for v in fields[c]] + [1])
    rec_size = 1 + sum(flens.values())
    hdr_size = 32 + 32 * len(names) + 1
    out = bytearray()
    out += struct.pack("<B3Bi hh", 0x03, 26, 8, 17, n, hdr_size, rec_size)
    out += b"\x00" * 20
    for c in names:
        fd = bytearray(32)
        fd[0:11] = c.encode("ascii")[:11].ljust(11, b"\x00")
        fd[11] = ord("C")
        fd[16] = flens[c]
        out += fd
    out += b"\x0D"
    for r in range(n):
        out += b" "
        for c in names:
            out += str(fields[c][r]).encode("ascii").ljust(flens[c])[:flens[c]]
    with open(base + ".dbf", "wb") as f:
        f.write(bytes(out))
