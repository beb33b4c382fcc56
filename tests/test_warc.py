"""WARC sink/source: spec-shape checks and distributed roundtrip."""

import glob
import os

import numpy as np
import pyarrow as pa

from tilemaker_ray.sources.warc import (parse_warc, read_warc,
                                        warc_record, write_warc_shards)


def test_record_shape_and_parse():
    rec = warc_record("https://example.com/x/1",
                      1_700_000_000_000_000, b"<html>hi</html>")
    assert rec.startswith(b"WARC/1.1\r\n")
    assert b"WARC-Type: response\r\n" in rec
    assert rec.endswith(b"\r\n\r\n")
    # Content-Length covers the full HTTP message
    out = parse_warc(rec)
    assert out == [("https://example.com/x/1",
                    1_700_000_000_000_000, b"<html>hi</html>")]


def test_parse_skips_non_response_records():
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 4\r\n\r\nabcd\r\n\r\n")
    rec = warc_record("u://a", 0, b"<p>x</p>")
    assert parse_warc(info + rec) == [("u://a", 0, b"<p>x</p>")]


def test_html_with_crlf_sequences_survives():
    # payload containing CRLFCRLF must not break record framing
    html = b"a\r\n\r\nb\r\n\r\nc"
    rec = warc_record("u://b", 5_000_000, html) \
        + warc_record("u://c", 6_000_000, b"tail")
    got = parse_warc(rec)
    assert got[0][2] == html and got[1][0] == "u://c"


def test_distributed_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    from tilemaker_ray.sources import pages as _pages
    src = _pages.pages_dataset(300).materialize()
    out_dir = str(tmp_path / "warc")
    n = write_warc_shards(src, out_dir)
    assert n == 300
    assert len(glob.glob(os.path.join(out_dir, "part-*.warc"))) >= 1

    back = read_warc(out_dir).to_pandas()
    orig = src.to_pandas()
    assert len(back) == 300
    b = back.sort_values("url").reset_index(drop=True)
    o = orig[["url", "warc_ts", "html"]].sort_values("url") \
        .reset_index(drop=True)
    assert list(b["url"]) == list(o["url"])
    assert list(b["html"]) == list(o["html"])
    # WARC 1.1 fractional-second dates: timestamps round-trip EXACTLY
    bt = b["warc_ts"].astype("int64").to_numpy()
    ot = o["warc_ts"].astype("int64").to_numpy()
    assert np.array_equal(bt, ot)


def test_rewrite_is_idempotent(ray_session, tmp_path):
    from tilemaker_ray.sources import pages as _pages
    src = _pages.pages_dataset(120).materialize()
    out_dir = str(tmp_path / "warc2")
    write_warc_shards(src, out_dir)
    first = sorted(glob.glob(os.path.join(out_dir, "part-*.warc")))
    write_warc_shards(src, out_dir)
    second = sorted(glob.glob(os.path.join(out_dir, "part-*.warc")))
    assert first == second        # content-hash parts, no duplicates


def test_warc_host_stats_equals_parquet_path(ray_session):
    from tilemaker_ray.pipelines.queries import (q_host_stats_pages,
                                                 q_warc_host_stats)
    sf = "/root/testdata/sf0.001"
    a = q_warc_host_stats(sf).to_pandas().reset_index(drop=True)
    b = q_host_stats_pages(sf).to_pandas().reset_index(drop=True)
    assert a.equals(b)


def test_gz_roundtrip_per_record_members(ray_session, tmp_path):
    import gzip
    from tilemaker_ray.sources import pages as _pages
    src = _pages.pages_dataset(150).materialize()
    out_dir = str(tmp_path / "warcgz")
    n = write_warc_shards(src, out_dir, compress=True)
    assert n == 150
    parts = glob.glob(os.path.join(out_dir, "part-*.warc.gz"))
    assert parts
    # each part is a CONCATENATION of gzip members (one per record):
    # member count == record count, and a plain gzip read sees all
    raw = open(parts[0], "rb").read()
    # magic-byte scan can over-count (the pattern may occur inside
    # compressed payloads) but never under-counts the members
    n_members = raw.count(b"\x1f\x8b\x08")
    with gzip.open(parts[0], "rb") as f:
        records = parse_warc(f.read())
    assert n_members >= len(records) >= 1

    back = read_warc(out_dir).to_pandas()
    orig = src.to_pandas()
    b = back.sort_values("url").reset_index(drop=True)
    o = orig.sort_values("url").reset_index(drop=True)
    assert list(b["url"]) == list(o["url"])
    assert list(b["html"]) == list(o["html"])


# ---------------------------------- WET ----------------------------------

def test_wet_record_roundtrip():
    from tilemaker_ray.sources.warc import parse_wet, wet_record
    ts = 1_700_000_000_123_457
    rec = wet_record("https://a/1", ts, "extracted text ünïcode")
    assert b"WARC-Type: conversion" in rec
    assert parse_wet(rec) == [("https://a/1", ts,
                               "extracted text ünïcode")]
    # warcinfo-style leading record is skipped
    info = (b"WARC/1.1\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 4\r\n\r\nabcd\r\n\r\n")
    assert parse_wet(info + rec) == [("https://a/1", ts,
                                      "extracted text ünïcode")]


def test_wet_shards_roundtrip(ray_session, tmp_path):
    from tilemaker_ray.sources import pages as _pages
    from tilemaker_ray.sources.warc import read_wet, write_wet_shards
    src = _pages.pages_dataset(150).materialize()
    out = str(tmp_path / "wet")
    write_wet_shards(src.select_columns(["url", "warc_ts", "text"]),
                     out)
    back = read_wet(out).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    orig = src.to_pandas()[["url", "warc_ts", "text"]] \
        .sort_values("url").reset_index(drop=True)
    assert list(back["url"]) == list(orig["url"])
    assert list(back["text"]) == list(orig["text"])
    assert np.array_equal(back["warc_ts"].astype("int64").to_numpy(),
                          orig["warc_ts"].astype("int64").to_numpy())


def test_wet_shards_gz_roundtrip(ray_session, tmp_path):
    from tilemaker_ray.sources import pages as _pages
    from tilemaker_ray.sources.warc import read_wet, write_wet_shards
    src = _pages.pages_dataset(60).materialize()
    out = str(tmp_path / "wetgz")
    write_wet_shards(src.select_columns(["url", "warc_ts", "text"]),
                     out, compress=True)
    back = read_wet(out).to_pandas()
    assert len(back) == 60


def test_cross_format_reads_refuse_loudly(ray_session, tmp_path):
    import pytest
    from tilemaker_ray.sources import pages as _pages
    from tilemaker_ray.sources.warc import (read_warc, read_wet,
                                            write_warc_shards,
                                            write_wet_shards)
    src = _pages.pages_dataset(40).materialize()
    # compressed shards: both formats end in .gz, so only the
    # basename check distinguishes them (the uncompressed case is
    # already excluded by the extension filters)
    wdir = str(tmp_path / "w")
    write_warc_shards(src, wdir, compress=True)
    tdir = str(tmp_path / "t")
    write_wet_shards(src.select_columns(["url", "warc_ts", "text"]),
                     tdir, compress=True)
    with pytest.raises(Exception) as ei:
        read_wet(wdir).to_pandas()       # WARC shards into read_wet
    assert "use read_warc" in str(ei.value) or ".wet" in str(ei.value)
    with pytest.raises(Exception) as ei:
        read_warc(tdir).to_pandas()      # WET shards into read_warc
    assert "use read_wet" in str(ei.value)
