"""Page → feature extraction (the per-record UDF host).

The analog of tilemaker's per-entity Lua UDF stage
(/root/reference/src/osm_lua_processing.cpp:1110-1239 — node_function /
way_function / relation_function): each input record yields 0..N
feature emissions ``(layer, geometry, attributes, minzoom, z_order)``.
Here the "entities" are web pages and the "tags" are machine-readable
geo signals in the HTML head:

- ``<meta name="geo.position" content="lat;lon">``   → point  (layer place)
- ``<meta name="geo.track"    content="lat,lon ...">`` → line  (layer track)
- ``<meta name="geo.footprint" content="lat,lon ...">`` → polygon (layer footprint)

:class:`ExtractFeatures` is an actor-pool callable: regexes are
compiled once per actor in ``__init__`` (the reference builds one Lua
VM per thread the same way, src/tilemaker.cpp:316-321) and each
``__call__`` flat-maps one Arrow batch of pages into a feature batch.

``extract_text`` is the reference text extractor whose output must be
byte-identical to the ``text`` column per url (BASELINE.json
input_hint; enforced by tests/test_pages.py).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..geo import wkb as _wkb

_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)
_BODY_RE = re.compile(rb"<body>(.*?)</body>", re.S)


def extract_text(html: bytes) -> str:
    """The reference extractor: visible text = the page's <p> paragraphs
    joined by newlines. Byte-identical to the generator's ``text``."""
    body = _BODY_RE.search(html)
    if body is None:
        return ""
    paras = _P_RE.findall(body.group(1))
    return b"\n".join(paras).decode("utf-8")


FEATURE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("fuid", pa.int64()),         # compact feature uid: fnv1a64(url) ⊕ seq —
                                  # the shuffle-side identity (url itself never
                                  # enters the tile shuffle; SURVEY §7.5 wide-
                                  # records rule). 64-bit collision odds are
                                  # negligible below ~10^9 features per shard;
                                  # widen to two int64s beyond that.
    ("feature_seq", pa.int32()),
    ("kind", pa.int8()),          # 1 point, 2 line, 3 polygon (WKB type ids)
    ("layer", pa.string()),
    ("name", pa.string()),        # city slug from the url path
    ("lang", pa.string()),
    ("lon", pa.float64()),        # representative point (point itself /
    ("lat", pa.float64()),        #   first vertex) — drives cell encode
    ("geom_wkb", pa.binary()),
    ("minzoom", pa.int8()),
    ("z_order", pa.int16()),
    ("attrs_json", pa.string()),  # extra MVT attributes from the UDF path
])

_LAYER_BY_KIND = {1: "place", 2: "track", 3: "footprint"}
_MINZOOM_BY_KIND = {1: 6, 2: 9, 3: 11}


class ExtractFeatures:
    """Actor-pool flat-map: pages batch → features batch.

    Use with ``ds.map_batches(ExtractFeatures, batch_format="pyarrow",
    concurrency=N)``. Drops the wide ``html`` column on output (project
    early — SURVEY.md §7.5)."""

    def __init__(self):
        self.pos_re = re.compile(
            rb'<meta name="geo\.position" content="(-?[\d.]+);(-?[\d.]+)">')
        self.track_re = re.compile(rb'<meta name="geo\.track" content="([^"]+)">')
        self.foot_re = re.compile(rb'<meta name="geo\.footprint" content="([^"]+)">')
        self.slug_re = re.compile(r"https?://[^/]+/([^/]+)/")

    # RE2 variants of the compiled patterns for the Arrow kernels
    _POS_PAT = r'<meta name="geo\.position" content="(?P<lat>-?[\d.]+);(?P<lon>-?[\d.]+)">'
    _POS_COUNT = r'<meta name="geo\.position" content="-?[\d.]+;-?[\d.]+">'
    _TRK_COUNT = r'<meta name="geo\.track" content="[^"]+">'
    _FPT_COUNT = r'<meta name="geo\.footprint" content="[^"]+">'
    _SLUG_PAT = r'^https?://[^/]+/(?P<slug>[^/]+)/'

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized fast path for the dominant page shape (exactly one
        geo.position, no track/footprint): Arrow ``extract_regex`` +
        numpy WKB construction, no per-page Python. Pages with multiple
        or non-point emissions fall back to the per-page loop; output
        row order is restored to the original (page, seq) order so the
        result is byte-identical to the all-Python path."""
        import pyarrow.compute as pc
        n = batch.num_rows
        html = batch["html"]
        n_pos = pc.count_substring_regex(html, self._POS_COUNT).to_numpy()
        n_trk = pc.count_substring_regex(html, self._TRK_COUNT).to_numpy()
        n_fpt = pc.count_substring_regex(html, self._FPT_COUNT).to_numpy()
        fast = (n_pos == 1) & (n_trk == 0) & (n_fpt == 0)
        silent = (n_pos == 0) & (n_trk == 0) & (n_fpt == 0)
        slow_idx = np.flatnonzero(~fast & ~silent)
        fast_idx = np.flatnonzero(fast)

        tables = []
        if len(fast_idx):
            sub = batch.take(pa.array(fast_idx))
            ex = pc.extract_regex(sub["html"], self._POS_PAT)
            lat = pc.cast(pc.cast(pc.struct_field(ex, "lat"), pa.string()),
                          pa.float64()).to_numpy()
            lon = pc.cast(pc.cast(pc.struct_field(ex, "lon"), pa.string()),
                          pa.float64()).to_numpy()
            slug = pc.struct_field(
                pc.extract_regex(sub["url"], self._SLUG_PAT), "slug")
            name = pc.fill_null(slug, "")
            urls_f = sub["url"].to_pylist()
            fuid = np.fromiter((feature_uid(u, 0) for u in urls_f),
                               dtype=np.int64, count=len(urls_f))
            m = len(fast_idx)
            geom = _points_binary_array(lon, lat)
            tables.append(pa.table({
                "url": sub["url"],
                "fuid": pa.array(fuid, pa.int64()),
                "feature_seq": pa.array(np.zeros(m, np.int32), pa.int32()),
                "kind": pa.array(np.ones(m, np.int8), pa.int8()),
                "layer": pa.array(["place"] * m, pa.string()),
                "name": pc.cast(name, pa.string()),
                "lang": sub["lang"],
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
                "geom_wkb": geom,
                "minzoom": pa.array(
                    np.full(m, _MINZOOM_BY_KIND[1], np.int8), pa.int8()),
                "z_order": pa.array(np.zeros(m, np.int16), pa.int16()),
                "attrs_json": pa.array([""] * m, pa.string()),
                "_pageidx": pa.array(fast_idx, pa.int64()),
            }, schema=_SCHEMA_WITH_IDX))
        if len(slow_idx):
            sub = batch.take(pa.array(slow_idx))
            tables.append(self._slow_path(sub, slow_idx))
        if not tables:
            return pa.table(
                {f.name: pa.array([], f.type) for f in FEATURE_SCHEMA},
                schema=FEATURE_SCHEMA)
        t = pa.concat_tables(tables)
        order = np.lexsort((t["feature_seq"].to_numpy(zero_copy_only=False),
                            t["_pageidx"].to_numpy(zero_copy_only=False)))
        return t.take(pa.array(order)).drop_columns(["_pageidx"]) \
            .cast(FEATURE_SCHEMA)

    def _slow_path(self, batch: pa.Table, page_idx: np.ndarray) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        langs = batch["lang"].to_pylist()

        out = {k: [] for k in ("url", "fuid", "feature_seq", "kind", "layer",
                               "name", "lang", "lon", "lat", "geom_wkb",
                               "minzoom", "z_order", "attrs_json")}
        out["_pageidx"] = []

        cur_idx = [0]

        def emit(url, seq, kind, name, lang, lon, lat, geom):
            out["_pageidx"].append(cur_idx[0])
            out["url"].append(url)
            out["fuid"].append(feature_uid(url, seq))
            out["feature_seq"].append(seq)
            out["kind"].append(kind)
            out["layer"].append(_LAYER_BY_KIND[kind])
            out["name"].append(name)
            out["lang"].append(lang)
            out["lon"].append(lon)
            out["lat"].append(lat)
            out["geom_wkb"].append(geom)
            out["minzoom"].append(_MINZOOM_BY_KIND[kind])
            # points: z_order 0 (no salience ordering) so combine_points
            # can merge whole same-name runs into one multipoint — the
            # reference merges adjacent features with identical
            # (geomType, z_order, attributes) (tile_worker.cpp:323-370);
            # lines/polygons: deterministic url-hash z_order, int16
            # compressed like include/output_object.h:54-62
            out["z_order"].append(0 if kind == 1 else hash_z_order(url))
            out["attrs_json"].append("")

        for pidx, url, html, lang in zip(page_idx, urls, htmls, langs):
            cur_idx[0] = int(pidx)
            name_m = self.slug_re.match(url)
            name = name_m.group(1) if name_m else ""
            seq = 0
            for m in self.pos_re.finditer(html):
                lat, lon = float(m.group(1)), float(m.group(2))
                emit(url, seq, 1, name, lang, lon, lat, _wkb.point_wkb(lon, lat))
                seq += 1
            for m in self.track_re.finditer(html):
                coords = _parse_latlon_list(m.group(1))
                if len(coords) >= 2:
                    emit(url, seq, 2, name, lang, coords[0, 0], coords[0, 1],
                         _wkb.linestring_wkb(coords))
                    seq += 1
            for m in self.foot_re.finditer(html):
                coords = _parse_latlon_list(m.group(1))
                if len(coords) >= 3:
                    emit(url, seq, 3, name, lang, coords[0, 0], coords[0, 1],
                         _wkb.polygon_wkb(coords))
                    seq += 1
        return pa.table(
            {k: pa.array(v, _SCHEMA_WITH_IDX.field(k).type)
             for k, v in out.items()},
            schema=_SCHEMA_WITH_IDX)


_SCHEMA_WITH_IDX = FEATURE_SCHEMA.append(pa.field("_pageidx", pa.int64()))


def _points_binary_array(lon: np.ndarray, lat: np.ndarray) -> pa.Array:
    """N (lon, lat) pairs → Arrow binary array of 21-byte point WKBs,
    built from one flat buffer (no per-row bytes objects)."""
    n = len(lon)
    buf = np.empty((n, 21), dtype=np.uint8)
    buf[:, 0] = 1                       # little-endian flag
    buf[:, 1:5] = np.frombuffer(np.uint32(1).tobytes(), dtype=np.uint8)
    buf[:, 5:13] = np.asarray(lon, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.asarray(lat, dtype="<f8").view(np.uint8).reshape(n, 8)
    offsets = np.arange(0, (n + 1) * 21, 21, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())])


def _parse_latlon_list(content: bytes) -> np.ndarray:
    """'lat,lon lat,lon ...' → (N,2) array of (lon, lat)."""
    vals = np.array(
        [float(v) for pair in content.split(b" ") for v in pair.split(b",")])
    if len(vals) < 2:
        return np.empty((0, 2))
    ll = vals.reshape(-1, 2)
    return np.stack([ll[:, 1], ll[:, 0]], axis=1)  # → (lon, lat)


def feature_uid(url: str, seq: int) -> int:
    """64 bits of md5(url) mixed with the emission seq — stable across
    processes (python hash() is salted) and C-speed (a pure-python
    fnv1a loop was the hottest line of the extract stage)."""
    import hashlib
    h = int.from_bytes(hashlib.md5(url.encode()).digest()[:8], "little")
    h ^= (seq * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 63)  # signed int64 range for Arrow


def hash_z_order(url: str) -> int:
    """Deterministic int16 z-order from a stable url hash (python hash()
    is salted per process — use fnv1a instead)."""
    h = 2166136261
    for b in url.encode():
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return (h % 2001) - 1000


def compress_z_order(z: float) -> int:
    """Fold an unbounded z-order into int16 exactly as the reference
    (/root/reference/include/output_object.h:47-61): ``floor(z*10)``
    within ±1000, ``±(sqrt((|z|-1000)*10)+10000)`` beyond, and 0 for
    any non-finite input (``finite_cast``). Floor semantics (toward
    -inf, not toward zero) match ``std::floor`` + ``static_cast``."""
    import math
    if not math.isfinite(z):
        return 0
    if z > 1000:
        v = math.floor(math.sqrt((z - 1000) * 10) + 10000)
    elif z < -1000:
        v = math.floor(-10000 - math.sqrt((abs(z) - 1000) * 10))
    else:
        v = math.floor(z * 10)
    # C short cast wraps; clamp instead (inputs past ±~5.3e8 only)
    return max(-32768, min(32767, int(v)))


_EXTRACTOR: "ExtractFeatures | None" = None


def extract_features_batch(batch: pa.Table) -> pa.Table:
    """Stateless map_batches body with worker-process-global extractor
    state (regexes compiled once per worker, like an actor's __init__ —
    but fusable with neighboring stages and free of actor-pool
    startup latency)."""
    global _EXTRACTOR
    if _EXTRACTOR is None:
        _EXTRACTOR = ExtractFeatures()
    return _EXTRACTOR(batch)


class ExtractText:
    """Text-extraction stage (batch → batch + extracted_text column):
    used by the byte-identity check and by the text-analysis operators
    so they can run on raw pages."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [extract_text(h) for h in batch["html"].to_pylist()]
        return batch.append_column("extracted_text", pa.array(texts, pa.string()))
