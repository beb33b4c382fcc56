"""Real (pure-stdlib) media codecs: 8-bit grayscale PNG and PCM WAV.

The container ships no PIL/libav, but PNG is zlib + CRC32 (both in the
Python stdlib) and WAV is plain RIFF structs — so the engine's
image/audio decode path can be REAL for these formats instead of the
clearly-marked stub it used in round 1 (stages/multimodal.py's FAK*
fake format remains for the wide-record plumbing tests). Spec
references: PNG (RFC 2083, public) — signature, IHDR/IDAT/IEND
chunks, per-scanline filter types 0–4 (None/Sub/Up/Average/Paeth);
WAV — RIFF/WAVE with fmt(PCM)+data chunks.

The DECODER implements all five PNG filters (a real-world PNG may use
any per scanline); the encoder emits filter 0 rows plus, on request,
filter-diverse rows so tests exercise every decode branch.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png_gray(img: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit grayscale ndarray (h, w) → PNG bytes. ``filter_type``
    selects the per-scanline filter (0–4) so tests can cover every
    decoder branch; real encoders pick per-row, decoders must accept
    any."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    raw = bytearray()
    prev = np.zeros(w, dtype=np.uint8)
    for r in range(h):
        row = img[r]
        f = filter_type
        if f == 0:
            enc = row
        elif f == 1:      # Sub
            enc = (row.astype(np.int16)
                   - np.concatenate([[0], row[:-1]]).astype(np.int16)) \
                % 256
        elif f == 2:      # Up
            enc = (row.astype(np.int16) - prev.astype(np.int16)) % 256
        elif f == 3:      # Average
            left = np.concatenate([[0], row[:-1]]).astype(np.int32)
            enc = (row.astype(np.int32)
                   - (left + prev.astype(np.int32)) // 2) % 256
        else:             # Paeth
            left = np.concatenate([[0], row[:-1]]).astype(np.int32)
            up = prev.astype(np.int32)
            ul = np.concatenate([[0], prev[:-1]]).astype(np.int32)
            p = left + up - ul
            pa_, pb, pc_ = (np.abs(p - left), np.abs(p - up),
                            np.abs(p - ul))
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, up, ul))
            enc = (row.astype(np.int32) - pred) % 256
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + _chunk(b"IEND", b""))


def decode_png_gray(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w) uint8 ndarray. Supports 8-bit grayscale,
    no interlace; implements ALL five scanline filters."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype != 0 or inter != 0:
                raise ValueError(
                    "only 8-bit grayscale non-interlaced supported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w + 1):
        raise ValueError("bad IDAT length")
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int32)
    for r in range(h):
        f = raw[r * (w + 1)]
        line = np.frombuffer(raw, dtype=np.uint8,
                             offset=r * (w + 1) + 1, count=w) \
            .astype(np.int32)
        if f == 0:
            row = line
        elif f == 1:      # Sub — recon[i] = line[i] + recon[i-1]
            row = _defilter_sub(line)
        elif f == 2:      # Up
            row = (line + prev) % 256
        elif f == 3:      # Average
            row = np.empty(w, dtype=np.int32)
            left = 0
            for i in range(w):
                row[i] = (line[i] + (left + prev[i]) // 2) % 256
                left = row[i]
        elif f == 4:      # Paeth
            row = np.empty(w, dtype=np.int32)
            left = 0
            for i in range(w):
                ul = prev[i - 1] if i else 0
                p = left + prev[i] - ul
                pa_, pb, pc_ = abs(p - left), abs(p - prev[i]), \
                    abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc_) else \
                    (prev[i] if pb <= pc_ else ul)
                row[i] = (line[i] + pred) % 256
                left = row[i]
        else:
            raise ValueError(f"bad filter {f}")
        out[r] = row.astype(np.uint8)
        prev = row
    return out


def _defilter_sub(line: np.ndarray) -> np.ndarray:
    # recon[i] = (line[i] + recon[i-1]) % 256 == cumsum mod 256
    return np.cumsum(line.astype(np.int64)) % 256


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → WAV bytes (RIFF/WAVE, PCM)."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(data: bytes):
    """WAV bytes → (samples int16 ndarray, rate). Mono 16-bit PCM."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, rate, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"fmt ":
            afmt, ch, rate, _br, _ba, bits = \
                struct.unpack_from("<HHIIHH", body)
            if afmt != 1 or ch != 1 or bits != 16:
                raise ValueError("only mono 16-bit PCM supported")
        elif tag == b"data":
            pcm = body
        pos += 8 + ln + (ln & 1)          # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return np.frombuffer(pcm, dtype="<i2"), rate
