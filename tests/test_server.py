"""Tile preview server: MBTiles + PMTiles lookups over real HTTP."""

import gzip
import json
import threading
import urllib.request

import pyarrow as pa


def _tiny_tiles_ds():
    import ray.data as rd
    rows = []
    for z, x, y in [(2, 1, 1), (2, 3, 0), (3, 5, 2)]:
        rows.append((z, x, y, gzip.compress(
            f"tile-{z}-{x}-{y}".encode(), mtime=0)))
    return rd.from_arrow(pa.table({
        "zoom": pa.array([r[0] for r in rows], pa.int32()),
        "x": pa.array([r[1] for r in rows], pa.int32()),
        "y": pa.array([r[2] for r in rows], pa.int32()),
        "tile_gz": pa.array([r[3] for r in rows], pa.binary())}))


def _get(url):
    req = urllib.request.Request(url)
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, dict(r.headers), r.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def _serve(path):
    from tilemaker_ray.server import make_server
    srv = make_server(path, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def test_server_mbtiles_roundtrip(ray_session, tmp_path):
    from tilemaker_ray.stages.sinks import write_mbtiles
    path = str(tmp_path / "t.mbtiles")
    write_mbtiles(_tiny_tiles_ds(), path)
    srv, port = _serve(path)
    try:
        st, hdr, body = _get(f"http://127.0.0.1:{port}/2/1/1.pbf")
        assert st == 200
        assert hdr.get("Content-Encoding") == "gzip"
        assert hdr.get("Access-Control-Allow-Origin") == "*"
        assert gzip.decompress(body) == b"tile-2-1-1"
        st, _, _ = _get(f"http://127.0.0.1:{port}/2/0/0.pbf")
        assert st == 404
        st, _, body = _get(f"http://127.0.0.1:{port}/metadata")
        assert st == 200
        meta = json.loads(body)
        assert meta.get("format") == "pbf"
        st, _, body = _get(f"http://127.0.0.1:{port}/")
        assert st == 200 and b"tilemaker_ray" in body
    finally:
        srv.shutdown()


def test_server_pmtiles_roundtrip(ray_session, tmp_path):
    from tilemaker_ray.stages.pmtiles import write_pmtiles
    path = str(tmp_path / "t.pmtiles")
    write_pmtiles(_tiny_tiles_ds(), path)
    srv, port = _serve(path)
    try:
        st, hdr, body = _get(f"http://127.0.0.1:{port}/3/5/2.mvt")
        assert st == 200
        assert gzip.decompress(body) == b"tile-3-5-2"
        st, _, _ = _get(f"http://127.0.0.1:{port}/9/9/9.pbf")
        assert st == 404
    finally:
        srv.shutdown()
