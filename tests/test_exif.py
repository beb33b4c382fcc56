"""EXIF parse: independent struct-built fixtures (both byte orders,
inline + offset values, foreign tags, truncation, non-EXIF APP1),
and the planted-roundtrip over the real JPEG encoder."""

import struct

import numpy as np

from tilemaker_ray.stages.exif import (build_exif_app1, insert_app1,
                                       parse_exif)


def _hand_built_jpeg_mm():
    """Big-endian TIFF written BY HAND (not via build_exif_app1):
    entry order scrambled, an unknown tag (0x8769 LONG) and an
    unsupported type (5 RATIONAL) interleaved, data area before use."""
    bo = ">"
    make = b"HandCam\x00"                 # 8 bytes -> offset value
    # layout: header(8) count(2) 4*12 entries next(4) data
    base = 8 + 2 + 4 * 12 + 4
    entries = b""
    entries += struct.pack(bo + "HHI", 0x0112, 3, 1) \
        + struct.pack(bo + "H", 6) + b"\x00\x00"
    entries += struct.pack(bo + "HHI", 0x8769, 4, 1) \
        + struct.pack(bo + "I", 0)         # unknown tag, skipped
    entries += struct.pack(bo + "HHI", 0x010F, 2, len(make)) \
        + struct.pack(bo + "I", base)
    entries += struct.pack(bo + "HHI", 0x011A, 5, 1) \
        + struct.pack(bo + "I", 0)         # RATIONAL, skipped
    tiff = b"MM" + struct.pack(bo + "H", 42) \
        + struct.pack(bo + "I", 8) \
        + struct.pack(bo + "H", 4) + entries \
        + struct.pack(bo + "I", 0) + make
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return b"\xff\xd8" + app1 + b"\xff\xd9"


def test_hand_built_big_endian():
    meta = parse_exif(_hand_built_jpeg_mm())
    assert meta == {"make": "HandCam", "model": None,
                    "orientation": 6, "datetime": None}


def test_roundtrip_both_endiannesses_over_real_jpeg():
    from tilemaker_ray.stages.media_codecs import encode_jpeg_gray

    rng = np.random.RandomState(7)
    jpeg = encode_jpeg_gray(rng.randint(0, 256, (10, 12),
                                        dtype=np.uint8))
    for be in (False, True):
        app1 = build_exif_app1("cam1", "m2", 5,
                               "2026:01:02 03:04:05", big_endian=be)
        meta = parse_exif(insert_app1(jpeg, app1))
        assert meta == {"make": "cam1", "model": "m2",
                        "orientation": 5,
                        "datetime": "2026:01:02 03:04:05"}, be


def test_no_exif_and_garbage():
    from tilemaker_ray.stages.media_codecs import (encode_jpeg_gray,
                                                   encode_png_gray)
    img = np.zeros((8, 8), dtype=np.uint8)
    assert parse_exif(encode_jpeg_gray(img)) is None     # no APP1
    assert parse_exif(encode_png_gray(img)) is None      # not JPEG
    assert parse_exif(b"") is None
    assert parse_exif(b"\xff\xd8\xff") is None
    # APP1 that is XMP, not EXIF -> skipped; SOS reached -> None
    xmp = b"\xff\xe1" + struct.pack(">H", 12) + b"http://ns.a"
    assert parse_exif(b"\xff\xd8" + xmp + b"\xff\xd9") is None
    # truncated TIFF inside a well-formed APP1 degrades to None
    bad = b"Exif\x00\x00II*\x00"
    app1 = b"\xff\xe1" + struct.pack(">H", len(bad) + 2) + bad
    assert parse_exif(b"\xff\xd8" + app1 + b"\xff\xd9") is None


def test_inline_short_ascii():
    """ASCII values of <= 4 bytes (incl. NUL) stay inline."""
    from tilemaker_ray.stages.media_codecs import encode_jpeg_gray
    jpeg = encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8))
    app1 = build_exif_app1("abc", "x", 1, "d", big_endian=False)
    meta = parse_exif(insert_app1(jpeg, app1))
    assert meta["make"] == "abc" and meta["model"] == "x" \
        and meta["datetime"] == "d"


def test_query_planted_parity():
    """q_exif_media's rollup equals a brute single-process rollup of
    the same planting rule at sf0.001."""
    import pyarrow.parquet as pq

    from tilemaker_ray.pipelines.queries import q_exif_media

    n = pq.read_metadata(
        "/root/testdata/sf0.001/documents.parquet").num_rows
    exp = {}
    for mid in range(n):
        if mid % 2 == 0 and mid % 4 == 2:
            key = (f"cam{mid % 5}", 1 + mid % 8)
            dt = f"2026:01:{1 + mid % 28:02d} 00:00:00"
            c, lo, hi = exp.get(key, (0, "9", ""))
            exp[key] = (c + 1, min(lo, dt), max(hi, dt))
    got = q_exif_media("/root/testdata/sf0.001").to_pandas()
    assert len(got) == len(exp)
    for r in got.itertuples():
        c, lo, hi = exp[(r.make, r.orientation)]
        assert (r.n, r.first_dt, r.last_dt) == (c, lo, hi)
