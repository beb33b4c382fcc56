"""Tile preview server: serve z/x/y vector tiles from an .mbtiles or
.pmtiles archive over HTTP (stdlib only).

Reference parity: /root/reference/server/server.cpp (~GET
/{z}/{x}/{y}.pbf with Content-Encoding: gzip + CORS, GET /metadata
from the metadata table, static index fallback). This engine is a
batch pipeline, so the server is a demo/debug surface, not a product
path — one thread-per-request stdlib ThreadingHTTPServer, per-thread
sqlite connections, tiles stay gzip-compressed end to end (the
archive stores gzip MVT; the browser inflates).

Run: ``python -m tilemaker_ray.server --input out.mbtiles [--port 8080]``
"""

from __future__ import annotations

import json
import os
import re
import sqlite3
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

_TILE_RE = re.compile(r"^/(\d+)/(\d+)/(\d+)\.(?:pbf|mvt)$")

_INDEX_HTML = """<!doctype html>
<html><head><title>tilemaker_ray preview</title></head><body>
<h1>tilemaker_ray tile server</h1>
<p>Endpoints: <code>/{z}/{x}/{y}.pbf</code> (gzip MVT),
<code>/metadata</code> (tileset JSON).</p>
<p>Point any MVT viewer (maplibre/mapbox-gl) at this origin.</p>
</body></html>"""


class _TileSource:
    """Uniform z/x/y → gzip-MVT-bytes lookup over either archive
    format. MBTiles: per-thread sqlite connections (sqlite3 objects
    are not thread-safe across threads). PMTiles: header + root
    directory parsed ONCE at construction, leaf directories cached on
    first touch — per request only a byte-range read remains (the
    naive path re-gunzipped the root on every tile)."""

    def __init__(self, path: str):
        self.path = path
        self.kind = "pmtiles" if path.endswith(".pmtiles") else "mbtiles"
        self._local = threading.local()
        if self.kind == "pmtiles":
            import gzip

            from .stages import pmtiles as _pmt
            self._pmt = _pmt
            self._hdr = _pmt.read_header(path)
            with open(path, "rb") as f:
                f.seek(self._hdr["root_offset"])
                self._root = _pmt.deserialize_directory(
                    gzip.decompress(f.read(self._hdr["root_length"])))
            self._leaves: dict = {}
            self._leaf_lock = threading.Lock()

    def _pmtiles_tile(self, z: int, x: int, y: int) -> bytes | None:
        import gzip
        if not (0 <= x < (1 << z) and 0 <= y < (1 << z)):
            return None
        tid = int(self._pmt.zxy_to_tileid(z, x, y))
        e = self._pmt._find_entry(self._root, tid)
        if e is None:
            return None
        if e[3] == 0:                     # leaf pointer
            key = (e[1], e[2])
            leaf = self._leaves.get(key)
            if leaf is None:
                with open(self.path, "rb") as f:
                    f.seek(self._hdr["leaf_offset"] + e[1])
                    leaf = self._pmt.deserialize_directory(
                        gzip.decompress(f.read(e[2])))
                with self._leaf_lock:
                    self._leaves[key] = leaf
            e = self._pmt._find_entry(leaf, tid)
            if e is None:
                return None
        etid, off, ln, rl = e
        if rl == 0 or tid >= etid + rl:
            return None
        with open(self.path, "rb") as f:
            f.seek(self._hdr["data_offset"] + off)
            return f.read(ln)

    def _con(self) -> sqlite3.Connection:
        con = getattr(self._local, "con", None)
        if con is None:
            con = self._local.con = sqlite3.connect(self.path)
        return con

    def tile(self, z: int, x: int, y: int) -> bytes | None:
        if self.kind == "pmtiles":
            return self._pmtiles_tile(z, x, y)
        tms_y = (1 << z) - 1 - y          # same flip as the reference
        row = self._con().execute(
            "SELECT tile_data FROM tiles WHERE zoom_level=? AND "
            "tile_column=? AND tile_row=?", (z, x, tms_y)).fetchone()
        return None if row is None else row[0]

    def metadata(self) -> dict:
        if self.kind == "pmtiles":
            return self._pmt.read_metadata(self.path)
        out = {}
        for name, value in self._con().execute(
                "SELECT name, value FROM metadata"):
            if name == "json":
                # reference: the json row is inlined as an object
                out["json"] = json.loads(value)
            else:
                out[name] = value
        return out


class TileHandler(BaseHTTPRequestHandler):
    source: _TileSource = None          # set by make_server

    def log_message(self, fmt, *args):   # quiet by default
        if os.environ.get("TILE_SERVER_VERBOSE"):
            super().log_message(fmt, *args)

    def _send(self, code: int, body: bytes, ctype: str,
              gzip_encoded: bool = False):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Access-Control-Allow-Origin", "*")
        if gzip_encoded:
            self.send_header("Content-Encoding", "gzip")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        m = _TILE_RE.match(self.path)
        if m:
            z, x, y = (int(g) for g in m.groups())
            blob = self.source.tile(z, x, y)
            if blob is None:
                self._send(404, b"tile not found", "text/plain")
            else:
                self._send(200, blob,
                           "application/vnd.mapbox-vector-tile",
                           gzip_encoded=True)
            return
        if self.path in ("/metadata", "/metadata.json"):
            self._send(200,
                       json.dumps(self.source.metadata()).encode(),
                       "application/json")
            return
        if self.path in ("/", "/index.html"):
            self._send(200, _INDEX_HTML.encode(), "text/html")
            return
        self._send(404, b"not found", "text/plain")


def make_server(input_path: str, port: int = 0) -> ThreadingHTTPServer:
    """Build (but don't run) the server; port 0 picks a free port
    (``srv.server_address[1]``). Caller runs ``serve_forever()``."""
    handler = type("BoundTileHandler", (TileHandler,),
                   {"source": _TileSource(input_path)})
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="Serve tiles from an .mbtiles/.pmtiles archive")
    ap.add_argument("--input", required=True)
    ap.add_argument("--port", type=int, default=8080)
    args = ap.parse_args(argv)
    srv = make_server(args.input, args.port)
    print(f"serving {args.input} on http://127.0.0.1:"
          f"{srv.server_address[1]}")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
