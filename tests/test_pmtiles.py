"""PMTiles v3 spec conformance: tile ids (Hilbert), directory codec,
header layout, RLE, root/leaf split, streaming round-trip."""

import gzip

import numpy as np
import pyarrow as pa
import pytest

from tilemaker_ray.stages import pmtiles as P


def test_zxy_to_tileid_known_values():
    # values from the public pmtiles reference implementations
    assert int(P.zxy_to_tileid(0, 0, 0)) == 0
    assert int(P.zxy_to_tileid(1, 0, 0)) == 1
    assert int(P.zxy_to_tileid(1, 0, 1)) == 2
    assert int(P.zxy_to_tileid(1, 1, 1)) == 3
    assert int(P.zxy_to_tileid(1, 1, 0)) == 4
    assert int(P.zxy_to_tileid(2, 0, 0)) == 5


def test_tileid_roundtrip_exhaustive_low_zooms():
    for z in range(0, 5):
        n = 1 << z
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        tids = P.zxy_to_tileid(np.full(n * n, z), xs.ravel(), ys.ravel())
        # bijective within the zoom's id range
        lo = (4 ** z - 1) // 3
        assert sorted(tids.tolist()) == list(range(lo, lo + n * n))
        for t, x, y in zip(tids.ravel(), xs.ravel(), ys.ravel()):
            assert P.tileid_to_zxy(int(t)) == (z, int(x), int(y))


def test_directory_codec_roundtrip():
    entries = [(0, 0, 100, 1), (1, 100, 50, 3), (4, 100, 50, 1),
               (10, 150, 7, 1), (500, 157, 10000, 2)]
    buf = P.serialize_directory(entries)
    assert P.deserialize_directory(buf) == entries
    assert P.deserialize_directory(P.serialize_directory([])) == []


def test_write_read_small_archive(tmp_path):
    rng = np.random.RandomState(0)
    rows = []
    for z in (0, 1, 2, 3):
        for x in range(1 << z):
            for y in range(1 << z):
                rows.append((z, x, y, bytes(rng.bytes(20))))
    t = pa.table({"zoom": pa.array([r[0] for r in rows], pa.int32()),
                  "x": pa.array([r[1] for r in rows], pa.int32()),
                  "y": pa.array([r[2] for r in rows], pa.int32()),
                  "tile_gz": pa.array([r[3] for r in rows], pa.binary())})
    path = str(tmp_path / "t.pmtiles")
    n = P.write_pmtiles(t, path, metadata={"k": "v"})
    assert n == len(rows)
    h = P.read_header(path)
    assert h["minzoom"] == 0 and h["maxzoom"] == 3
    assert h["n_addressed"] == len(rows)
    assert P.read_metadata(path)["k"] == "v"
    for z, x, y, blob in rows:
        assert P.read_pmtiles(path, z, x, y) == blob
    assert P.read_pmtiles(path, 4, 0, 0) is None
    # full scan matches input
    back = P.read_all_tiles(t and path)
    assert back.num_rows == len(rows)


def test_rle_of_identical_adjacent_tiles(tmp_path):
    """A solid area of identical tiles collapses to one entry with
    run_length > 1 (the spec's RLE; reference appendWithRLE,
    src/pmtiles.cpp:25-47)."""
    blob = b"SAME" * 10
    z = 3
    rows = [(z, x, y, blob) for x in range(8) for y in range(8)]
    t = pa.table({"zoom": pa.array([r[0] for r in rows], pa.int32()),
                  "x": pa.array([r[1] for r in rows], pa.int32()),
                  "y": pa.array([r[2] for r in rows], pa.int32()),
                  "tile_gz": pa.array([r[3] for r in rows], pa.binary())})
    path = str(tmp_path / "rle.pmtiles")
    P.write_pmtiles(t, path)
    h = P.read_header(path)
    assert h["n_addressed"] == 64
    assert h["n_entries"] == 1      # one RLE run covers the whole zoom
    assert h["n_contents"] == 1     # one stored blob
    assert h["clustered"] is True
    for x in range(8):
        for y in range(8):
            assert P.read_pmtiles(path, z, x, y) == blob


def test_leaf_directories(tmp_path):
    """More entries than the root cutover → root holds leaf pointers
    (run_length 0) and lookups descend."""
    z = 7  # 16384 tiles > ROOT_ONLY_MAX
    n = 1 << z
    rng = np.random.RandomState(1)
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    keep = rng.rand(len(xs)) < 0.25   # ~4096 sparse tiles, distinct blobs
    xs, ys = xs[keep], ys[keep]
    blobs = [b"%08d" % i for i in range(len(xs))]
    t = pa.table({"zoom": pa.array(np.full(len(xs), z, np.int32), pa.int32()),
                  "x": pa.array(xs.astype(np.int32), pa.int32()),
                  "y": pa.array(ys.astype(np.int32), pa.int32()),
                  "tile_gz": pa.array(blobs, pa.binary())})
    path = str(tmp_path / "leaf.pmtiles")
    P.write_pmtiles(t, path)
    h = P.read_header(path)
    assert h["leaf_length"] > 0
    # sample lookups across the id space
    idx = rng.choice(len(xs), 50, replace=False)
    for i in idx:
        assert P.read_pmtiles(path, z, int(xs[i]), int(ys[i])) == blobs[i]
    # absent tile inside the zoom range
    present = set(zip(xs.tolist(), ys.tolist()))
    for x in range(n):
        if (x, 0) not in present:
            assert P.read_pmtiles(path, z, x, 0) is None
            break


def test_streaming_from_dataset(ray_session, tmp_path):
    import ray.data as rd
    t = pa.table({"zoom": pa.array([2] * 16, pa.int32()),
                  "x": pa.array([i % 4 for i in range(16)], pa.int32()),
                  "y": pa.array([i // 4 for i in range(16)], pa.int32()),
                  "tile_gz": pa.array([b"%d" % i for i in range(16)],
                                      pa.binary())})
    path = str(tmp_path / "ds.pmtiles")
    n = P.write_pmtiles(rd.from_arrow(t).repartition(4), path)
    assert n == 16
    for i in range(16):
        assert P.read_pmtiles(path, 2, i % 4, i // 4) == b"%d" % i
