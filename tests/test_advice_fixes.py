"""Regression tests for the round-1 ADVICE findings.

1. MVT ClosePath must be the command integer (1<<3)|7 = 15, not bare 7
   (vtzero include/vtzero/geometry.hpp:103-105).
2. compress_z_order must mirror the reference formula
   (/root/reference/include/output_object.h:47-61) incl. finite_cast.
3. Polygon rings must honor simplify_algorithm="visvalingam".
"""

import numpy as np

from tilemaker_ray.stages import mvt
from tilemaker_ray.stages.extract import compress_z_order
from tilemaker_ray.geo import simplify as _simplify


def test_closepath_command_integer_is_15():
    ring = np.array([[0, 0], [100, 0], [100, 100], [0, 100], [0, 0]])
    cmds = mvt.geometry_commands([ring], mvt.GEOM_POLYGON)
    assert cmds[-1] == 15, (
        "ClosePath must carry count=1: (1<<3)|7 == 15, got %r" % cmds[-1])
    # and never the bare opcode
    assert 7 not in cmds or cmds.index(7) != len(cmds) - 1


def test_closepath_roundtrips_through_decoder():
    lb = mvt.LayerBuilder("poly")
    ring = np.array([[0, 0], [256, 0], [256, 256], [0, 0]])
    assert lb.add_feature(mvt.GEOM_POLYGON, [ring], {"name": "t"})
    feat = mvt.decode_tile(mvt.build_tile([lb]))["poly"]["features"][0]
    close = feat["geometry"][-1]
    assert close & 7 == mvt.CMD_CLOSEPATH and close >> 3 == 1
    parts = mvt.decode_geometry(feat["geometry"])
    assert len(parts) == 1 and (parts[0][0] == parts[0][-1]).all()


def test_compress_z_order_matches_reference_formula():
    # linear range: floor(z*10)
    assert compress_z_order(2.34) == 23
    assert compress_z_order(-1.5) == -15       # floor, not trunc-toward-zero
    assert compress_z_order(1000.0) == 10000
    assert compress_z_order(-1000.0) == -10000
    # beyond ±1000: sqrt((|z|-1000)*10) ± 10000
    assert compress_z_order(1500.0) == int(np.floor(np.sqrt(5000) + 10000))
    assert compress_z_order(1500.0) == 10070
    assert compress_z_order(-1500.0) == int(np.floor(-10000 - np.sqrt(5000)))
    # finite_cast: non-finite → 0, no exception
    assert compress_z_order(float("nan")) == 0
    assert compress_z_order(float("inf")) == 0
    assert compress_z_order(float("-inf")) == 0


def test_simplify_ring_honors_visvalingam():
    # a ring with one tiny-area midpoint that visvalingam removes but a
    # tiny DP tolerance would keep differently: compare against direct calls
    ring = np.array([[0.0, 0.0], [50.0, 1.0], [100.0, 0.0], [100.0, 100.0],
                     [0.0, 100.0], [0.0, 0.0]])
    tol = 3.0
    vis = _simplify.simplify_ring(ring, tol, algorithm="visvalingam")
    dp = _simplify.simplify_ring(ring, tol, algorithm="douglas-peucker")
    expect_vis = _simplify.visvalingam(ring, tol ** 2)
    assert np.array_equal(vis, expect_vis)
    assert np.array_equal(dp, _simplify.douglas_peucker(ring, tol))
    # the mid point (50,1) has triangle area 50 > 9 → vis keeps it; DP
    # tolerance 3 removes it (offset 1 < 3). They must genuinely differ
    # so the dispatch is observable.
    assert len(vis) != len(dp)


def test_extract_fast_path_byte_identical():
    """The vectorized single-position fast path must produce exactly the
    same rows (values AND order) as the per-page Python loop."""
    import pyarrow as pa
    from tilemaker_ray.stages.extract import ExtractFeatures, FEATURE_SCHEMA

    pages = [
        ("https://ex.com/berlin/a", b'<head><meta name="geo.position" content="52.5;13.4"></head><body><p>x</p></body>'),
        ("https://ex.com/none/b", b"<body><p>no geo</p></body>"),
        ("https://ex.com/two/c", b'<meta name="geo.position" content="1.5;2.5"><meta name="geo.position" content="-3.25;4">'),
        ("https://ex.com/trk/d", b'<meta name="geo.track" content="1,2 3,4 5,6">'),
        ("https://ex.com/mix/e", b'<meta name="geo.position" content="9;8"><meta name="geo.footprint" content="0,0 0,1 1,1 1,0">'),
        ("https://ex.com/pt/f", b'<meta name="geo.position" content="-45.125;170.0">'),
        ("badurl", b'<meta name="geo.position" content="7;7">'),
    ]
    batch = pa.table({
        "url": pa.array([u for u, _ in pages], pa.string()),
        "html": pa.array([h for _, h in pages], pa.binary()),
        "lang": pa.array(["en"] * len(pages), pa.string()),
    })
    ex = ExtractFeatures()
    fast = ex(batch)
    slow = ex._slow_path(batch, np.arange(len(pages))) \
        .drop_columns(["_pageidx"]).cast(FEATURE_SCHEMA)
    assert fast.schema.equals(slow.schema)
    assert fast.equals(slow), (
        f"fast path diverged:\n{fast.to_pydict()}\nvs\n{slow.to_pydict()}")


# --------------------------- round 3 advice fixes ---------------------------

def test_read_warc_names_stray_gz_file(ray_session, tmp_path):
    import gzip
    import pytest
    from tilemaker_ray.sources.warc import read_warc
    bad = tmp_path / "notwarc.gz"
    bad.write_bytes(gzip.compress(b"just some text, not a WARC"))
    with pytest.raises(Exception) as ei:
        read_warc(str(tmp_path)).to_pandas()
    assert "notwarc.gz" in str(ei.value)


def test_grouped_moments_rejects_nan(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from tilemaker_ray.stages.moments import grouped_moments
    t = pa.table({"g": pa.array(["a", "a", "b"]),
                  "x": pa.array([1.0, float("nan"), 2.0]),
                  "y": pa.array([1.0, 2.0, 3.0])})
    with pytest.raises(Exception) as ei:
        grouped_moments(rd.from_arrow(t), "g", "x", "y").to_pandas()
    assert "null/NaN" in str(ei.value)


def test_warc_ts_roundtrip_is_microsecond_exact(ray_session):
    from tilemaker_ray.sources.warc import parse_warc, warc_record
    ts = 1_700_000_000_123_457          # sub-second precision
    rec = warc_record("u://a/1", ts, b"<p>x</p>")
    assert parse_warc(rec) == [("u://a/1", ts, b"<p>x</p>")]
