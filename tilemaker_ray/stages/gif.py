"""From-scratch GIF87a/89a codec (LZW) — grayscale palette images,
animated multi-frame streams, and the 4-pass interlace layout.

No reference analog (tilemaker consumes vector geometry); this extends
the engine's real-format media surface (stages/media_codecs.py: PNG /
JPEG / WAV) with the third major crawl image format so the pHash /
feature-extraction family sees GIFs natively instead of typed-skipping
them. Pure stdlib + numpy: the LZW entropy layer is implemented from
the GIF89a specification (variable 3..12-bit codes, clear / EOI codes,
the KwKwK "code == next" case), the container from the block grammar
(logical screen descriptor, graphic-control / application extensions,
image descriptors, sub-block framing).

Scale shape: codecs are per-payload kernels invoked from actor-pool
map_batches stages (stages/multimodal.py) — parallelism is across
rows, which is the only axis that matters at 100 TB; a single GIF is
bounded by the 12-bit LZW table so per-payload cost is linear.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4096        # 12-bit ceiling fixed by the spec


# ---------------------------------------------------------------------------
# LZW entropy layer
# ---------------------------------------------------------------------------

def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emits CLEAR, dictionary-compressed codes with
    variable width, resets the table at 4096, terminates with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    seq = b""
    for v in indices.astype(np.uint8).tobytes():
        cand = seq + bytes([v])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code < _MAX_CODE:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes([v])
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int
                ) -> np.ndarray:
    """Decode a GIF LZW stream to ``n_expected`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    buf = np.frombuffer(data, dtype=np.uint8)
    bitbuf = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(buf):
                raise ValueError("GIF: truncated LZW stream")
            bitbuf |= int(buf[pos]) << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]          # the KwKwK case
        else:
            raise ValueError("GIF: LZW code out of range")
        out.extend(entry)
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_expected:
        raise ValueError("GIF: LZW stream ended before image filled")
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


# ---------------------------------------------------------------------------
# Sub-block framing
# ---------------------------------------------------------------------------

def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF: truncated sub-block stream")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out.extend(data[pos:pos + n])
        if pos + n > len(data):
            raise ValueError("GIF: truncated sub-block")
        pos += n


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_rows(h: int) -> np.ndarray:
    """Row output order of the GIF 4-pass interlace."""
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return np.asarray(rows, dtype=np.int64)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

def encode_gif_gray(frames: np.ndarray, interlace: bool = False,
                    delay_cs: int = 4) -> bytes:
    """Encode (h, w) or (n, h, w) uint8 gray frames as GIF89a with a
    256-entry grayscale global palette. Multi-frame inputs get a
    NETSCAPE loop block + per-frame graphic-control extensions."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 2:
        frames = frames[None]
    n, h, w = frames.shape
    out = bytearray()
    out.extend(b"GIF89a")
    # logical screen descriptor: global table, 8 bits/entry, 256 colors
    out.extend(struct.pack("<HHBBB", w, h, 0xF7, 0, 0))
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    out.extend(pal.tobytes())
    if n > 1:
        out.extend(b"\x21\xff\x0bNETSCAPE2.0")
        out.extend(_subblocks(b"\x01\x00\x00"))   # loop forever
    for f in range(n):
        if n > 1:
            out.extend(b"\x21\xf9\x04")
            out.extend(struct.pack("<BHB", 0x04, delay_cs, 0))
            out.append(0)
        flags = 0x40 if interlace else 0x00
        out.extend(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, flags))
        img = frames[f]
        if interlace:
            img = img[_interlace_rows(h)]
        out.append(8)  # LZW minimum code size
        out.extend(_subblocks(_lzw_encode(img.reshape(-1), 8)))
    out.append(0x3B)
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """Decode any grayscale-palette GIF87a/89a produced by this module
    (and standard single/multi-frame full-size-frame GIFs) to an
    (n, h, w) uint8 array of gray values (palette red channel)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gpal = None
    if flags & 0x80:
        gsize = 2 << (flags & 0x07)
        gpal = np.frombuffer(data, np.uint8, gsize * 3, pos
                             ).reshape(gsize, 3)
        pos += gsize * 3
    frames = []
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:          # trailer
            break
        if block == 0x21:          # extension: label + sub-blocks
            pos += 1
            _body, pos = _read_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        x0, y0, w, h, iflags = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        pal = gpal
        if iflags & 0x80:
            lsize = 2 << (iflags & 0x07)
            pal = np.frombuffer(data, np.uint8, lsize * 3, pos
                                ).reshape(lsize, 3)
            pos += lsize * 3
        if pal is None:
            raise ValueError("GIF: frame without a color table")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(lzw, mcs, w * h).reshape(h, w)
        if iflags & 0x40:
            rows = _interlace_rows(h)
            img = np.empty_like(idx)
            img[rows] = idx
        else:
            img = idx
        gray = pal[img, 0]          # grayscale palette: r == g == b
        if (x0, y0, w, h) != (0, 0, sw, sh):
            # sub-rectangle frame: composite onto the previous frame
            # (disposal "do not dispose" semantics)
            base = (frames[-1].copy() if frames
                    else np.zeros((sh, sw), dtype=np.uint8))
            base[y0:y0 + h, x0:x0 + w] = gray
            gray = base
        frames.append(gray)
    if not frames:
        raise ValueError("GIF: no image data")
    return np.stack(frames)
