"""WARC/WET source and sink — the container formats the actual Common
Crawl corpus ships in (ISO 28500, public spec). The reference engine's
analog is its binary OSM PBF reader (block scan + entity decode,
/root/reference/src/pbf_processor.cpp); for a webtext corpus the
equivalent "native archive" is WARC response records wrapping HTTP
payloads.

Layout notes (per the public spec):
 * a record = header block (``WARC/1.1`` + named fields, CRLF lines,
   blank-line terminator), then exactly ``Content-Length`` payload
   bytes, then CRLF CRLF;
 * ``response`` records carry an HTTP message as payload — status
   line + headers + body; the page html is the HTTP body.

Distributed shape:
 * WRITER: one .warc file per map_batches task, content-hash-named
   atomic parts (same idempotent-retry scheme as the GeoJSONL sink);
 * READER: file-per-task parallelism via read_binary_files — WARC has
   no record index, so the split unit is the FILE (shards are written
   small for that reason; exactly how Common Crawl distributes ~1 GB
   segment files). Parsing is sequential within a file by necessity
   (length-prefixed records), vectorization happens downstream.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"


def _iso(ts_us: int) -> str:
    """WARC 1.1-style UTC timestamp WITH fractional seconds, so a
    write→read roundtrip preserves the corpus' microsecond warc_ts
    exactly (WARC 1.0 only allows whole seconds — the round-2 advice
    flagged the silent truncation). Whole-second instants still emit
    the fraction; the parser accepts both forms."""
    import datetime as dt
    t = dt.datetime.fromtimestamp(ts_us / 1e6, tz=dt.timezone.utc)
    return t.strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def warc_record(url: str, ts_us: int, html: bytes) -> bytes:
    """One WARC response record wrapping an HTTP/1.1 200 message.
    WARC-Record-ID (mandatory per the spec) is a deterministic
    urn:uuid derived from (url, ts) so re-exports are byte-stable."""
    import hashlib
    import uuid
    rid = uuid.UUID(bytes=hashlib.md5(
        f"{url}|{ts_us}".encode()).digest())
    http = (b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: text/html; charset=utf-8" + _CRLF
            + b"Content-Length: " + str(len(html)).encode() + _CRLF
            + _CRLF + html)
    hdr = (b"WARC/1.1" + _CRLF
           + b"WARC-Type: response" + _CRLF
           + b"WARC-Record-ID: <urn:uuid:" + str(rid).encode() + b">"
           + _CRLF
           + b"WARC-Target-URI: " + url.encode() + _CRLF
           + b"WARC-Date: " + _iso(ts_us).encode() + _CRLF
           + b"Content-Type: application/http; msgtype=response" + _CRLF
           + b"Content-Length: " + str(len(http)).encode() + _CRLF
           + _CRLF)
    return hdr + http + _CRLF + _CRLF


def parse_warc(data: bytes):
    """WARC bytes → list of (url, ts_us, html bytes) from response
    records (other record types skipped). Sequential by necessity —
    records are length-prefixed."""
    import datetime as dt
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        end_hdr = data.find(_CRLF + _CRLF, pos)
        if end_hdr < 0:
            break
        head = data[pos:end_hdr].decode("utf-8", "replace")
        fields = {}
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC header at byte {pos}")
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        if "content-length" not in fields:
            raise ValueError(f"record at byte {pos} missing "
                             "Content-Length")
        clen = int(fields["content-length"])
        if end_hdr + 4 + clen > n:
            raise ValueError(f"record at byte {pos}: Content-Length "
                             f"{clen} overruns the buffer (truncated "
                             "shard)")
        body = data[end_hdr + 4:end_hdr + 4 + clen]
        pos = end_hdr + 4 + clen + 4          # payload + CRLF CRLF
        if fields.get("warc-type") != "response":
            continue
        url = fields["warc-target-uri"]
        wd = fields["warc-date"]
        fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in wd \
            else "%Y-%m-%dT%H:%M:%SZ"
        t = dt.datetime.strptime(wd, fmt) \
            .replace(tzinfo=dt.timezone.utc)
        ts_us = int(round(t.timestamp() * 1_000_000))
        # split the HTTP message: body begins after its blank line
        hb = body.find(_CRLF + _CRLF)
        html = body[hb + 4:] if hb >= 0 else b""
        out.append((url, ts_us, html))
    return out


def _gzip_member(data: bytes) -> bytes:
    import gzip
    import io
    buf = io.BytesIO()
    # mtime pinned for byte-stable re-exports
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(data)
    return buf.getvalue()


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the actual Common
    Crawl layout: one member PER RECORD, so readers can seek to a
    record offset without decompressing the prefix)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib_decompressobj()
        out.extend(d.decompress(data[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("corrupt gzip member")
        pos += consumed
    return bytes(out)


def zlib_decompressobj():
    import zlib
    return zlib.decompressobj(16 + zlib.MAX_WBITS)   # gzip wrapper


def write_warc_shards(pages_ds, out_dir: str,
                      compress: bool = False) -> int:
    """Distributed WARC export via the shared content-hash part sink
    (stages/sinks.py::write_hash_parts): retries overwrite
    idempotently; the per-page urls salt the hash, so distinct
    batches can never collapse (urls are unique per the corpus
    contract). ``compress=True`` writes .warc.gz with one gzip member
    per record — the actual Common Crawl on-disk layout. Returns
    record count."""
    from ..stages.sinks import write_hash_parts

    def serialize(batch: pa.Table):
        urls = batch["url"].to_pylist()
        ts = batch["warc_ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        htmls = batch["html"].to_pylist()
        recs = (warc_record(u, int(t), h)
                for u, t, h in zip(urls, ts, htmls))
        if compress:
            body = b"".join(_gzip_member(r) for r in recs)
        else:
            body = b"".join(recs)
        return body, "|".join(urls).encode()

    ext = "warc.gz" if compress else "warc"
    return write_hash_parts(pages_ds, out_dir, ext, serialize)


def read_warc(path_or_dir: str):
    """→ Dataset (url, warc_ts, html) from .warc shards; one task per
    file (the WARC split unit)."""
    import ray.data as rd

    ds = rd.read_binary_files(path_or_dir,
                              file_extensions=["warc", "gz"],
                              include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, htmls = [], [], []
        paths = batch["path"].to_pylist()
        for fp, blob in zip(paths, batch["bytes"].to_pylist()):
            if ".wet" in os.path.basename(fp):
                # a WET shard passes the WARC/ magic check but holds
                # only 'conversion' records — it would contribute
                # ZERO rows silently; refuse loudly instead
                raise ValueError(
                    f"{fp}: WET shard in a WARC read — use read_wet")
            if blob[:2] == b"\x1f\x8b":          # gzip magic
                blob = _gunzip_members(blob)
            if not blob.startswith(b"WARC/"):
                # a stray non-WARC .gz in the directory: name it
                # instead of failing deep inside parse_warc
                raise ValueError(
                    f"{fp}: not a WARC file (no WARC/ magic)")
            for u, t, h in parse_warc(blob):
                urls.append(u)
                tss.append(t)
                htmls.append(h)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.asarray(tss, dtype=np.int64), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary())})

    return ds.map_batches(parse, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# WET (WARC text conversion) — the text-only sibling of WARC that
# Common Crawl publishes for LLM-corpus consumers: "conversion"
# records carrying extracted plain text instead of HTTP messages.
# Same container framing, so the reader shares parse machinery.
# ---------------------------------------------------------------------------

def wet_record(url: str, ts_us: int, text: str) -> bytes:
    """One WARC conversion record carrying extracted plain text."""
    import hashlib
    import uuid
    rid = uuid.UUID(bytes=hashlib.md5(
        f"wet|{url}|{ts_us}".encode()).digest())
    body = text.encode("utf-8")
    hdr = (b"WARC/1.1" + _CRLF
           + b"WARC-Type: conversion" + _CRLF
           + b"WARC-Record-ID: <urn:uuid:" + str(rid).encode() + b">"
           + _CRLF
           + b"WARC-Target-URI: " + url.encode() + _CRLF
           + b"WARC-Date: " + _iso(ts_us).encode() + _CRLF
           + b"Content-Type: text/plain" + _CRLF
           + b"Content-Length: " + str(len(body)).encode() + _CRLF
           + _CRLF)
    return hdr + body + _CRLF + _CRLF


def parse_wet(data: bytes):
    """WET bytes → list of (url, ts_us, text) from conversion
    records (other record types skipped — real WET files lead with a
    warcinfo record)."""
    import datetime as dt
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        end_hdr = data.find(_CRLF + _CRLF, pos)
        if end_hdr < 0:
            break
        head = data[pos:end_hdr].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC header at byte {pos}")
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields["content-length"])
        if end_hdr + 4 + clen > n:
            raise ValueError(f"record at byte {pos}: Content-Length "
                             f"{clen} overruns the buffer")
        body = data[end_hdr + 4:end_hdr + 4 + clen]
        pos = end_hdr + 4 + clen + 4
        if fields.get("warc-type") != "conversion":
            continue
        wd = fields["warc-date"]
        fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in wd \
            else "%Y-%m-%dT%H:%M:%SZ"
        t = dt.datetime.strptime(wd, fmt) \
            .replace(tzinfo=dt.timezone.utc)
        out.append((fields["warc-target-uri"],
                    int(round(t.timestamp() * 1_000_000)),
                    body.decode("utf-8", "replace")))
    return out


def write_wet_shards(pages_ds, out_dir: str,
                     compress: bool = False) -> int:
    """(url, warc_ts, text) Dataset → content-hash-named .warc.wet
    shards (idempotent, same sink contract as write_warc_shards)."""
    from ..stages.sinks import write_hash_parts

    def serialize(batch: pa.Table):
        urls = batch["url"].to_pylist()
        tss = batch["warc_ts"].cast(pa.int64()).to_pylist()
        texts = batch["text"].to_pylist()
        recs = [wet_record(u, t, x)
                for u, t, x in zip(urls, tss, texts)]
        if compress:
            body = b"".join(_gzip_member(r) for r in recs)
        else:
            body = b"".join(recs)
        return body, "|".join(urls).encode()

    ext = "warc.wet.gz" if compress else "warc.wet"
    return write_hash_parts(pages_ds, out_dir, ext, serialize)


def read_wet(path_or_dir: str):
    """→ Dataset (url, warc_ts, text) from .warc.wet shards; one task
    per file."""
    import ray.data as rd

    ds = rd.read_binary_files(path_or_dir,
                              file_extensions=["wet", "gz"],
                              include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, texts = [], [], []
        for fp, blob in zip(batch["path"].to_pylist(),
                            batch["bytes"].to_pylist()):
            if ".wet" not in os.path.basename(fp):
                # a response-record WARC shard would contribute ZERO
                # conversion records silently; refuse loudly
                raise ValueError(
                    f"{fp}: not a .wet shard — use read_warc for "
                    "response-record WARCs")
            if blob[:2] == b"\x1f\x8b":
                blob = _gunzip_members(blob)
            if not blob.startswith(b"WARC/"):
                raise ValueError(f"{fp}: not a WET file (no WARC/ "
                                 "magic)")
            for u, t, x in parse_wet(blob):
                urls.append(u)
                tss.append(t)
                texts.append(x)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.asarray(tss, dtype=np.int64), pa.timestamp("us")),
            "text": pa.array(texts, pa.string())})

    return ds.map_batches(parse, batch_format="pyarrow")
