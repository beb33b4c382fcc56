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


# ---------------------------------------------------------------------------
# JPEG: pure-stdlib encoder + decoder.
#
# Scope (round 5): 8-bit DCT — baseline sequential (single-component
# grayscale, interleaved multi-component color with any baseline
# sampling incl. 4:2:0, AND non-interleaved multi-scan) plus
# PROGRESSIVE (SOF2: spectral selection + successive approximation
# per ITU-T T.81 Annex G — the majority format in a real Common-Crawl
# image mix). Color decodes to its luma plane, the pipeline's
# grayscale image representation. Honest NotImplementedError only for
# arithmetic-coded / lossless / hierarchical frames and 16-bit quant
# tables.
# The bitstream is SELF-DESCRIBING: the decoder reads DQT/DHT from
# the stream (as the spec requires), so roundtrip correctness never
# depends on baked-in table constants. Entropy coding is bit-level
# Python — fine for the actor-pool decode stage this feeds
# (per-image cost, small images; the vectorized work is the DCT).
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# default luminance quant table (spec Annex K layout not required —
# it is WRITTEN into DQT and read back; values chosen mild so tests
# see near-lossless smooth-image roundtrips)
_QTBL_DEFAULT = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    D = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    D[0] /= np.sqrt(2.0)
    return D


_DCT = _dct_matrix()


def _huff_canonical(freq: dict) -> tuple:
    """(bits[1..16], values) — canonical JPEG Huffman table from
    symbol frequencies via the spec's length-limited procedure
    (package-merge is overkill at 256 symbols: build by sorted
    frequency with the classic JPEG reserve-one-code rule)."""
    # simple guaranteed-valid construction: assign code lengths by
    # frequency order, capped at 16, using the Kraft budget greedily
    syms = sorted(freq, key=lambda s: (-freq[s], s))
    n = len(syms)
    # start everyone at ceil(log2(n+1)) bits, then shorten the most
    # frequent while the Kraft sum allows
    lengths = {s: min(16, max(2, (n).bit_length())) for s in syms}
    # tighten: repeatedly try to shorten the most frequent symbol
    def kraft(ls):
        return sum(2.0 ** -l for l in ls.values())
    improved = True
    while improved:
        improved = False
        for s in syms:
            if lengths[s] > 1:
                lengths[s] -= 1
                if kraft(lengths) <= 1.0 - 2.0 ** -16:
                    improved = True   # keep one code reserved
                else:
                    lengths[s] += 1
    bits = [0] * 17
    for s in syms:
        bits[lengths[s]] += 1
    values = sorted(syms, key=lambda s: (lengths[s], syms.index(s)))
    return bits[1:], values


def _assign_codes(bits: list, values: list) -> dict:
    """canonical (bits, values) → {symbol: (code, length)}."""
    codes = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[vi]] = (code, ln)
            code += 1
            vi += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)     # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("JPEG scan truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) \
                    else 0xD9
                if nxt == 0x00:
                    self.pos += 1         # stuffed byte
                elif 0xD0 <= nxt <= 0xD7:
                    self.pos += 1         # consume the marker byte
                    raise _RestartMarker(nxt)
                else:
                    # a real marker (EOI/next segment): end of scan —
                    # park past the data and feed zero padding so the
                    # marker byte is never decoded as entropy data
                    self.pos = len(self.data)
                    b = 0
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align(self):
        self.nbits = 0
        self.acc = 0


class _RestartMarker(Exception):
    def __init__(self, m):
        self.marker = m


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _mag_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def encode_jpeg_gray(img: np.ndarray, qtbl: np.ndarray | None = None) -> bytes:
    """8-bit grayscale (h, w) → baseline JPEG bytes. Two-pass: first
    collect DC/AC symbol statistics, then emit with canonical Huffman
    tables written into DHT (self-describing stream)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    q = _QTBL_DEFAULT if qtbl is None else np.asarray(qtbl, np.int64)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(img, ((0, bh * 8 - h), (0, bw * 8 - w)),
                    mode="edge").astype(np.float64) - 128.0
    # vectorized 2D DCT over all blocks
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    F = np.einsum("ij,bcjk,lk->bcil", _DCT, blocks, _DCT)
    Q = np.round(F / q).astype(np.int64)
    zz = Q.reshape(bh * bw, 64).take(_ZIGZAG, axis=1)
    # DC differences
    dc = zz[:, 0]
    dcdiff = np.diff(np.concatenate([[0], dc]))

    def block_symbols(i):
        """yield (kind, symbol, extra_bits_value, extra_len)."""
        out = []
        d = int(dcdiff[i])
        cat = _category(d)
        out.append(("dc", cat, _mag_bits(d, cat), cat))
        row = zz[i]
        nz = np.flatnonzero(row[1:]) + 1
        prev = 0
        for j in nz:
            run = int(j) - prev - 1
            while run >= 16:
                out.append(("ac", 0xF0, 0, 0))
                run -= 16
            v = int(row[j])
            cat = _category(v)
            out.append(("ac", (run << 4) | cat, _mag_bits(v, cat), cat))
            prev = int(j)
        if prev != 63:
            out.append(("ac", 0x00, 0, 0))    # EOB
        return out

    all_syms = [block_symbols(i) for i in range(bh * bw)]
    dcfreq: dict = {}
    acfreq: dict = {}
    for bl in all_syms:
        for kind, sym, _, _ in bl:
            (dcfreq if kind == "dc" else acfreq)[sym] = \
                (dcfreq if kind == "dc" else acfreq).get(sym, 0) + 1
    dcbits, dcvals = _huff_canonical(dcfreq)
    acbits, acvals = _huff_canonical(acfreq)
    dccodes = _assign_codes(dcbits, dcvals)
    accodes = _assign_codes(acbits, acvals)

    bwr = _BitWriter()
    for bl in all_syms:
        for kind, sym, extra, elen in bl:
            c, ln = (dccodes if kind == "dc" else accodes)[sym]
            bwr.write(c, ln)
            if elen:
                bwr.write(extra, elen)
    bwr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    qzz = q.reshape(64).take(_ZIGZAG).astype(np.uint8).tobytes()
    out = bytearray(b"\xff\xd8")                      # SOI
    out += seg(0xDB, b"\x00" + qzz)                   # DQT id 0
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 1)
               + bytes([1, 0x11, 0]))                 # SOF0 1 comp
    out += seg(0xC4, b"\x00" + bytes(dcbits)
               + bytes(dcvals))                       # DHT DC 0
    out += seg(0xC4, b"\x10" + bytes(acbits)
               + bytes(acvals))                       # DHT AC 0
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))   # SOS
    out += bwr.out
    out += b"\xff\xd9"                                # EOI
    return bytes(out)


_SOF_UNSUPPORTED = frozenset(
    # lossless / arithmetic / differential-hierarchical frames — no Ray
    # analog without native libs; typed-skip at the pipeline layer
    [0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF])


def _entropy_end(data: bytes, pos: int) -> int:
    """Index of the first real marker after an entropy-coded segment
    (skips FF00 stuffing, RSTn, and FF fill bytes)."""
    while True:
        f = data.find(b"\xff", pos)
        if f < 0 or f + 1 >= len(data):
            return len(data)
        m = data[f + 1]
        if m == 0x00 or 0xD0 <= m <= 0xD7:
            pos = f + 2
        elif m == 0xFF:
            pos = f + 1                    # fill byte
        else:
            return f


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """JPEG bytes → 8-bit grayscale ndarray (h, w). Unified multi-scan
    decoder: baseline sequential (single-component, interleaved
    multi-component, AND non-interleaved multi-scan) and progressive
    SOF2 (spectral selection + successive approximation per ITU-T T.81
    Annex G — DC first/refine, AC first with EOB runs and ZRL, AC
    refinement with correction bits, interleaved DC scans, restart
    intervals). Reads DQT/DHT from the stream, handles byte stuffing,
    DRI/RSTn, APPn/COM skip. Color images decode to their LUMA plane
    (the pipeline's image representation is grayscale).
    NotImplementedError only for arithmetic-coded / lossless /
    hierarchical frames, non-8-bit precision, and 16-bit quant
    tables."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtables: dict = {}
    huff: dict = {}
    h = w = None
    comps: list = []               # per-comp state dicts, SOF order
    progressive = False
    dri = 0
    hmax = vmax = mcux = mcuy = 1
    saw_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker at {pos}")
        m = data[pos + 1]
        if m == 0xD9:
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:     # TEM / stray RSTn
            pos += 2
            continue
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4:pos + 2 + ln]
        if m == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(body[i + 1:i + 65], np.uint8) \
                    .astype(np.int64)
                out64 = np.zeros(64, dtype=np.int64)
                out64[_ZIGZAG] = tbl
                qtables[tq] = out64.reshape(8, 8)
                i += 65
        elif m in (0xC0, 0xC1, 0xC2):
            progressive = m == 0xC2
            prec, hh, ww, ncomp = struct.unpack_from(">BHHB", body)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision")
            h, w = hh, ww
            raw = [(body[6 + 3 * ci], body[7 + 3 * ci] >> 4,
                    body[7 + 3 * ci] & 0xF, body[8 + 3 * ci])
                   for ci in range(ncomp)]
            hmax = max(r[1] for r in raw)
            vmax = max(r[2] for r in raw)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            comps = []
            for cid, ch_, cv, tq in raw:
                cw = -(-(w * ch_) // hmax)      # comp dims (A.1.1)
                chh = -(-(h * cv) // vmax)
                comps.append({
                    "cid": cid, "H": ch_, "V": cv, "tq": tq,
                    "nbw": mcux * ch_,          # MCU-padded block grid
                    "nbw_s": -(-cw // 8),       # non-interleaved grid
                    "nbh_s": -(-chh // 8),
                    "coef": np.zeros((mcuy * cv * mcux * ch_, 64),
                                     dtype=np.int64)})
        elif m in _SOF_UNSUPPORTED or m == 0xC8:
            raise NotImplementedError(
                f"JPEG frame type 0x{m:02X} "
                "(arithmetic/lossless/hierarchical)")
        elif m == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                huff[(tc, th)] = _decode_table(bits, vals)
                i += 17 + nv
        elif m == 0xDD:
            (dri,) = struct.unpack_from(">H", body)
        elif m == 0xDA:
            if not comps:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            sel = [(body[1 + 2 * si], body[2 + 2 * si] >> 4,
                    body[2 + 2 * si] & 0xF) for si in range(ns)]
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            scan_start = pos + 2 + ln
            end = _entropy_end(data, scan_start)
            _decode_scan(data[scan_start:end], comps, sel, ss, se, ah,
                         al, progressive, huff, dri, mcux, mcuy)
            saw_scan = True
            pos = end
            continue
        pos += 2 + ln
    if h is None or not saw_scan:
        raise ValueError("JPEG missing SOF/SOS")
    # luma = SOF component 0 by convention (YCbCr / YCCK put Y first):
    # dezigzag + dequantize + IDCT (vectorized over all blocks)
    p = comps[0]
    q = qtables[p["tq"]]
    nbw = p["nbw"]
    nbh = p["coef"].shape[0] // nbw
    dezz = np.zeros_like(p["coef"])
    dezz[:, _ZIGZAG] = p["coef"]
    F = dezz.reshape(nbh * nbw, 8, 8).astype(np.float64) * q
    blocks = np.einsum("ji,bjk,kl->bil", _DCT, F, _DCT)
    img = blocks.reshape(nbh, nbw, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(nbh * 8, nbw * 8) + 128.0
    img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    # a non-max-sampled luma (unusual) upsamples to the image grid
    sy, sx = vmax // p["V"], hmax // p["H"]
    if sy > 1 or sx > 1:
        img = np.repeat(np.repeat(img, sy, axis=0), sx, axis=1)
    return img[:h, :w]


def _decode_scan(ent: bytes, comps: list, sel: list, ss: int, se: int,
                 ah: int, al: int, progressive: bool, huff: dict,
                 dri: int, mcux: int, mcuy: int):
    """Decode one entropy-coded scan into the components' coefficient
    stores (zigzag order, point-transform applied per Annex G)."""
    rdr = _BitReader(ent)
    eobrun = 0
    if len(sel) > 1:
        # interleaved MCU scan: sequential full blocks, or progressive
        # DC (AC scans are single-component by spec, B.2.3)
        if progressive and ss != 0:
            raise ValueError("interleaved progressive AC scan")
        plan = []
        for cs, td, ta in sel:
            c = next(cc for cc in comps if cc["cid"] == cs)
            plan.append((c, huff.get((0, td)), huff.get((1, ta))))
        preds = [0] * len(plan)
        nmcu = mcux * mcuy
        mi = 0
        while mi < nmcu:
            my, mx = divmod(mi, mcux)
            try:
                for ci, (c, dctab, actab) in enumerate(plan):
                    for v in range(c["V"]):
                        for u in range(c["H"]):
                            bi = (my * c["V"] + v) * c["nbw"] \
                                + mx * c["H"] + u
                            row = c["coef"][bi]
                            if not progressive:
                                preds[ci] = _huff_block(
                                    rdr, dctab, actab, preds[ci], row)
                            elif ah == 0:
                                cat = _read_symbol(rdr, dctab)
                                diff = _extend(rdr.read(cat), cat) \
                                    if cat else 0
                                preds[ci] += diff
                                row[0] = preds[ci] << al
                            else:
                                if rdr.read(1):
                                    row[0] |= 1 << al
                mi += 1
                if dri and mi % dri == 0 and mi < nmcu:
                    _skip_restart(rdr)
                    preds = [0] * len(plan)
            except _RestartMarker:
                rdr.align()
                preds = [0] * len(plan)
        return
    # non-interleaved scan over the component's OWN block grid (its
    # dims derive from the component's sampling, not the MCU padding)
    cs, td, ta = sel[0]
    c = next(cc for cc in comps if cc["cid"] == cs)
    dctab = huff.get((0, td))
    actab = huff.get((1, ta))
    nb = c["nbh_s"] * c["nbw_s"]
    pred = 0
    bi = 0
    while bi < nb:
        by, bx = divmod(bi, c["nbw_s"])
        row = c["coef"][by * c["nbw"] + bx]
        try:
            if not progressive:
                pred = _huff_block(rdr, dctab, actab, pred, row)
            elif ss == 0:
                if ah == 0:
                    cat = _read_symbol(rdr, dctab)
                    diff = _extend(rdr.read(cat), cat) if cat else 0
                    pred += diff
                    row[0] = pred << al
                else:
                    if rdr.read(1):
                        row[0] |= 1 << al
            elif ah == 0:
                eobrun = _ac_first(rdr, actab, row, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(rdr, actab, row, ss, se, al, eobrun)
            bi += 1
            if dri and bi % dri == 0 and bi < nb:
                _skip_restart(rdr)
                pred = 0
                eobrun = 0
        except _RestartMarker:
            rdr.align()
            pred = 0
            eobrun = 0


def _ac_first(rdr: "_BitReader", actab: dict, row: np.ndarray, ss: int,
              se: int, al: int, eobrun: int) -> int:
    """First AC scan of a band (T.81 G.1.2.2, fig. G.3/G.5): run-length
    coefficients scaled by 2^Al, EOBn codes start a run of all-zero
    bands. Returns the remaining EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_symbol(rdr, actab)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1          # this band is run member
                if r:
                    eobrun += rdr.read(r)
                return eobrun
            k += 16                            # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC run overflow in progressive scan")
            row[k] = _extend(rdr.read(s), s) << al
            k += 1
    return 0


def _ac_refine(rdr: "_BitReader", actab: dict, row: np.ndarray, ss: int,
               se: int, al: int, eobrun: int) -> int:
    """AC successive-approximation refinement (T.81 G.1.2.3, fig. G.7):
    newly-nonzero coefficients arrive as ±2^Al; every already-nonzero
    coefficient in the band consumes a correction bit (1 = grow its
    magnitude by 2^Al) — including inside EOB runs."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(rdr, actab)
            r, s = rs >> 4, rs & 0xF
            if s:
                s = p1 if rdr.read(1) else m1  # sign of new coefficient
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.read(r)
                    break                      # EOB logic handles rest
                # r == 15: ZRL — skip 16 zero-history coefficients
            # advance over nonzero coefficients (correction bits) and r
            # zero-history ones to the insertion point
            while k <= se:
                cur = int(row[k])
                if cur != 0:
                    if rdr.read(1) and (cur & p1) == 0:
                        row[k] = cur + (p1 if cur >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s and k <= se:
                row[k] = s
            k += 1
    if eobrun > 0:
        while k <= se:
            cur = int(row[k])
            if cur != 0:
                if rdr.read(1) and (cur & p1) == 0:
                    row[k] = cur + (p1 if cur >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _huff_block(rdr: "_BitReader", dctab: dict, actab: dict,
                pred: int, out_row: np.ndarray) -> int:
    """Decode one 8×8 block's coefficients into ``out_row`` (zigzag
    order); returns the updated DC predictor."""
    cat = _read_symbol(rdr, dctab)
    diff = _extend(rdr.read(cat), cat) if cat else 0
    pred += diff
    out_row[0] = pred
    k = 1
    while k < 64:
        rs = _read_symbol(rdr, actab)
        r, s = rs >> 4, rs & 0xF
        if rs == 0x00:
            break                          # EOB
        if rs == 0xF0:
            k += 16
            continue
        k += r
        if k > 63:
            raise ValueError("AC run overflow")
        out_row[k] = _extend(rdr.read(s), s)
        k += 1
    return pred


def encode_jpeg_color(rgb: np.ndarray, qtbl: np.ndarray | None = None,
                      qtbl_c: np.ndarray | None = None) -> bytes:
    """8-bit RGB (h, w, 3) → baseline YCbCr 4:2:0 JPEG bytes (JFIF
    color matrix, 2×2-mean chroma subsampling, interleaved MCUs, two
    quant tables, separate luma/chroma Huffman pairs built canonically
    from the stream's own statistics — self-describing, like the
    grayscale encoder)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8).astype(np.float64)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_jpeg_color expects (h, w, 3) RGB")
    h, w = rgb.shape[:2]
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    mh, mw = (h + 15) // 16, (w + 15) // 16
    qy = _QTBL_DEFAULT if qtbl is None else np.asarray(qtbl, np.int64)
    qc = qy if qtbl_c is None else np.asarray(qtbl_c, np.int64)

    def pad_to(plane, ph, pw):
        return np.pad(plane, ((0, ph - plane.shape[0]),
                              (0, pw - plane.shape[1])), mode="edge")

    yp = pad_to(y, mh * 16, mw * 16)
    cbp = pad_to(cb, mh * 16, mw * 16)
    crp = pad_to(cr, mh * 16, mw * 16)
    # 4:2:0 chroma: 2×2 mean
    cbs = cbp.reshape(mh * 8, 2, mw * 8, 2).mean(axis=(1, 3))
    crs = crp.reshape(mh * 8, 2, mw * 8, 2).mean(axis=(1, 3))

    def comp_zz(plane, q):
        bh, bw2 = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (plane - 128.0).reshape(bh, 8, bw2, 8) \
            .transpose(0, 2, 1, 3)
        F = np.einsum("ij,bcjk,lk->bcil", _DCT, blocks, _DCT)
        Q = np.round(F / q).astype(np.int64)
        return Q.reshape(bh * bw2, 64).take(_ZIGZAG, axis=1), bw2

    yzz, ynbw = comp_zz(yp, qy)
    cbzz, cnbw = comp_zz(cbs, qc)
    crzz, _ = comp_zz(crs, qc)

    def block_syms(row, dcdiff):
        out = []
        cat = _category(dcdiff)
        out.append(("dc", cat, _mag_bits(dcdiff, cat), cat))
        nz = np.flatnonzero(row[1:]) + 1
        prev = 0
        for j in nz:
            run = int(j) - prev - 1
            while run >= 16:
                out.append(("ac", 0xF0, 0, 0))
                run -= 16
            v = int(row[j])
            cat = _category(v)
            out.append(("ac", (run << 4) | cat, _mag_bits(v, cat), cat))
            prev = int(j)
        if prev != 63:
            out.append(("ac", 0x00, 0, 0))
        return out

    # MCU-ordered symbol stream, per table class (0 = luma, 1 = chroma)
    preds = [0, 0, 0]
    mcu_syms: list = []
    for my in range(mh):
        for mx in range(mw):
            for v in range(2):
                for u in range(2):
                    bi = (my * 2 + v) * ynbw + mx * 2 + u
                    d = int(yzz[bi, 0]) - preds[0]
                    preds[0] = int(yzz[bi, 0])
                    mcu_syms.append((0, block_syms(yzz[bi], d)))
            for ci, czz in ((1, cbzz), (2, crzz)):
                bi = my * cnbw + mx
                d = int(czz[bi, 0]) - preds[ci]
                preds[ci] = int(czz[bi, 0])
                mcu_syms.append((1, block_syms(czz[bi], d)))
    freqs = {(0, "dc"): {}, (0, "ac"): {}, (1, "dc"): {}, (1, "ac"): {}}
    for cls, syms in mcu_syms:
        for kind, sym, _, _ in syms:
            f = freqs[(cls, kind)]
            f[sym] = f.get(sym, 0) + 1
    tables = {}
    for key, f in freqs.items():
        bits, vals = _huff_canonical(f if f else {0: 1})
        tables[key] = (bits, vals, _assign_codes(bits, vals))
    bwr = _BitWriter()
    for cls, syms in mcu_syms:
        for kind, sym, extra, elen in syms:
            c, ln = tables[(cls, kind)][2][sym]
            bwr.write(c, ln)
            if elen:
                bwr.write(extra, elen)
    bwr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) \
            + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + qy.reshape(64).take(_ZIGZAG)
               .astype(np.uint8).tobytes())
    out += seg(0xDB, b"\x01" + qc.reshape(64).take(_ZIGZAG)
               .astype(np.uint8).tobytes())
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, 3)
               + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for (cls, kind), (bits, vals, _) in sorted(tables.items()):
        tc = 0 if kind == "dc" else 1
        out += seg(0xC4, bytes([(tc << 4) | cls]) + bytes(bits)
                   + bytes(vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += bwr.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) + non-interleaved multi-scan baseline ENCODERS.
#
# Fixture generators for the unified decoder above (no PIL in the
# container, so the test corpus must be self-made): the progressive
# encoder follows the IJG default scan script shape — interleaved DC
# first at Al=1, luma AC split 1-5/6-63 at Al=2, chroma AC at Al=1,
# then successive-approximation refinements down to Al=0 (jcphuff-style
# correction-bit buffering, T.81 G.1.2.3). Because every scan refines
# to Al=0, the final coefficients equal the baseline quantization —
# decoding a progressive stream must be pixel-identical to decoding
# the baseline stream of the same image/qtable, which is exactly what
# the tests assert.
# ---------------------------------------------------------------------------


def _plane_zz(plane: np.ndarray, q: np.ndarray, pad_h: int,
              pad_w: int) -> tuple:
    """float plane → (zigzag coeff rows, blocks-per-row) on a grid
    padded to (pad_h, pad_w) pixels (edge padding, like the baseline
    encoders)."""
    plane = np.pad(plane, ((0, pad_h - plane.shape[0]),
                           (0, pad_w - plane.shape[1])), mode="edge")
    bh, bw = pad_h // 8, pad_w // 8
    blocks = (plane - 128.0).reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    F = np.einsum("ij,bcjk,lk->bcil", _DCT, blocks, _DCT)
    Q = np.round(F / q).astype(np.int64)
    return Q.reshape(bh * bw, 64).take(_ZIGZAG, axis=1), bw


def _jpeg_comps(img: np.ndarray, qtbl, qtbl_c) -> tuple:
    """Grayscale (h,w) or RGB (h,w,3) → (h, w, [component dicts],
    [(tq, qtable)]) shared by the progressive and multi-scan
    encoders. Color uses YCbCr 4:2:0 like encode_jpeg_color."""
    img = np.asarray(img)
    qy = _QTBL_DEFAULT if qtbl is None else np.asarray(qtbl, np.int64)
    if img.ndim == 2:
        h, w = img.shape
        zz, nbw = _plane_zz(img.astype(np.float64),
                            qy, ((h + 7) // 8) * 8, ((w + 7) // 8) * 8)
        comp = {"id": 1, "H": 1, "V": 1, "tq": 0, "zz": zz, "nbw": nbw,
                "nbw_s": (w + 7) // 8, "nbh_s": (h + 7) // 8}
        return h, w, [comp], [(0, qy)]
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (h, w) grayscale or (h, w, 3) RGB")
    qc = qy if qtbl_c is None else np.asarray(qtbl_c, np.int64)
    rgb = img.astype(np.float64)
    h, w = rgb.shape[:2]
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    mh, mw = (h + 15) // 16, (w + 15) // 16
    yzz, ynbw = _plane_zz(y, qy, mh * 16, mw * 16)

    def sub(p):
        p = np.pad(p, ((0, mh * 16 - p.shape[0]),
                       (0, mw * 16 - p.shape[1])), mode="edge")
        return p.reshape(mh * 8, 2, mw * 8, 2).mean(axis=(1, 3))

    cbzz, cnbw = _plane_zz(sub(cb), qc, mh * 8, mw * 8)
    crzz, _ = _plane_zz(sub(cr), qc, mh * 8, mw * 8)
    comps = [
        {"id": 1, "H": 2, "V": 2, "tq": 0, "zz": yzz, "nbw": ynbw,
         "nbw_s": (w + 7) // 8, "nbh_s": (h + 7) // 8},
        {"id": 2, "H": 1, "V": 1, "tq": 1, "zz": cbzz, "nbw": cnbw,
         "nbw_s": -(-(-(-w // 2)) // 8), "nbh_s": -(-(-(-h // 2)) // 8)},
        {"id": 3, "H": 1, "V": 1, "tq": 1, "zz": crzz, "nbw": cnbw,
         "nbw_s": -(-(-(-w // 2)) // 8), "nbh_s": -(-(-(-h // 2)) // 8)},
    ]
    return h, w, comps, [(0, qy), (1, qc)]


def _dc_scan_events(scan_comps: list, mcux: int, mcuy: int, ah: int,
                    al: int) -> list:
    """DC scan (interleaved MCU order when >1 component). First pass
    (ah=0): category + diff bits of the point-transformed DC;
    refinement: one raw bit per block."""
    ev = []
    preds = [0] * len(scan_comps)
    for mi in range(mcux * mcuy):
        my, mx = divmod(mi, mcux)
        for ci, c in enumerate(scan_comps):
            for v in range(c["V"]):
                for u in range(c["H"]):
                    bi = (my * c["V"] + v) * c["nbw"] + mx * c["H"] + u
                    t = int(c["zz"][bi, 0]) >> al
                    if ah == 0:
                        d = t - preds[ci]
                        preds[ci] = t
                        cat = _category(d)
                        ev.append(("s", 0, cat))
                        if cat:
                            ev.append(("b", _mag_bits(d, cat), cat))
                    else:
                        ev.append(("b", t & 1, 1))
    return ev


class _EobState:
    __slots__ = ("eobrun", "pending")

    def __init__(self):
        self.eobrun = 0
        self.pending = []      # correction bits buffered across blocks


def _flush_eob(st: _EobState, ev: list):
    if st.eobrun > 0:
        nb = st.eobrun.bit_length() - 1
        ev.append(("s", 1, nb << 4))
        if nb:
            ev.append(("b", st.eobrun & ((1 << nb) - 1), nb))
        st.eobrun = 0
    for b in st.pending:
        ev.append(("b", b, 1))
    st.pending = []


def _ac_first_block_events(zz_row, ss, se, al, st: _EobState, ev: list):
    """First AC scan of one block (jcphuff encode_mcu_AC_first)."""
    r = 0
    for k in range(ss, se + 1):
        t = int(zz_row[k])
        if t == 0:
            r += 1
            continue
        if t < 0:
            ta = (-t) >> al
            if ta == 0:
                r += 1
                continue
            nb = ta.bit_length()
            bits = (~ta) & ((1 << nb) - 1)
        else:
            ta = t >> al
            if ta == 0:
                r += 1
                continue
            nb = ta.bit_length()
            bits = ta
        _flush_eob(st, ev)
        while r > 15:
            ev.append(("s", 1, 0xF0))
            r -= 16
        ev.append(("s", 1, (r << 4) | nb))
        ev.append(("b", bits, nb))
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            _flush_eob(st, ev)


def _ac_refine_block_events(zz_row, ss, se, al, st: _EobState, ev: list):
    """AC refinement of one block (jcphuff encode_mcu_AC_refine):
    newly-nonzero coefficients emit (run, 1)+sign; already-nonzero ones
    buffer a correction bit attached to the next emitted symbol."""
    absv = [abs(int(zz_row[k])) >> al for k in range(ss, se + 1)]
    eob = 0
    for k in range(ss, se + 1):
        if absv[k - ss] == 1:
            eob = k                 # last NEWLY-nonzero position
    r = 0
    br: list = []
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            _flush_eob(st, ev)
            ev.append(("s", 1, 0xF0))
            for b in br:
                ev.append(("b", b, 1))
            br = []
            r -= 16
        if t > 1:
            br.append(t & 1)        # correction bit
            continue
        _flush_eob(st, ev)
        ev.append(("s", 1, (r << 4) | 1))
        ev.append(("b", 1 if int(zz_row[k]) >= 0 else 0, 1))
        for b in br:
            ev.append(("b", b, 1))
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF or len(st.pending) > 937:
            _flush_eob(st, ev)


def _seq_block_events(zz_row, dcdiff) -> list:
    """One full sequential block (DC category+bits, AC run-lengths) as
    events — the non-interleaved baseline scan body."""
    ev = []
    cat = _category(dcdiff)
    ev.append(("s", 0, cat))
    if cat:
        ev.append(("b", _mag_bits(dcdiff, cat), cat))
    nz = np.flatnonzero(zz_row[1:]) + 1
    prev = 0
    for j in nz:
        run = int(j) - prev - 1
        while run >= 16:
            ev.append(("s", 1, 0xF0))
            run -= 16
        v = int(zz_row[j])
        cat = _category(v)
        ev.append(("s", 1, (run << 4) | cat))
        if cat:
            ev.append(("b", _mag_bits(v, cat), cat))
        prev = int(j)
    if prev != 63:
        ev.append(("s", 1, 0x00))
    return ev


def _emit_scan(out: bytearray, ev: list, scan_comps: list, ss: int,
               se: int, ah: int, al: int):
    """Count the scan's symbols, build per-class canonical Huffman
    tables (ids 0/0, re-emitted as DHT before the SOS — later tables
    overwrite earlier ones by id, as the spec allows), then write
    DHT + SOS + entropy bytes."""
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    freqs: dict = {0: {}, 1: {}}
    for e in ev:
        if e[0] == "s":
            freqs[e[1]][e[2]] = freqs[e[1]].get(e[2], 0) + 1
    codes: dict = {}
    for cls in (0, 1):
        if freqs[cls]:
            bits, vals = _huff_canonical(freqs[cls])
            codes[cls] = _assign_codes(bits, vals)
            out += seg(0xC4, bytes([(cls << 4)]) + bytes(bits)
                       + bytes(vals))
    bwr = _BitWriter()
    for e in ev:
        if e[0] == "s":
            c, ln = codes[e[1]][e[2]]
            bwr.write(c, ln)
        else:
            bwr.write(e[1], e[2])
    bwr.flush()
    body = bytes([len(scan_comps)])
    for c in scan_comps:
        body += bytes([c["id"], 0x00])
    body += bytes([ss, se, (ah << 4) | al])
    out += seg(0xDA, body)
    out += bwr.out


def _jpeg_headers(h: int, w: int, comps: list, qts: list,
                  sof: int) -> bytearray:
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    out = bytearray(b"\xff\xd8")
    for tq, q in qts:
        out += seg(0xDB, bytes([tq]) + q.reshape(64).take(_ZIGZAG)
                   .astype(np.uint8).tobytes())
    sofc = b"".join(bytes([c["id"], (c["H"] << 4) | c["V"], c["tq"]])
                    for c in comps)
    out += seg(sof, struct.pack(">BHHB", 8, h, w, len(comps)) + sofc)
    return out


def encode_jpeg_progressive(img: np.ndarray,
                            qtbl: np.ndarray | None = None,
                            qtbl_c: np.ndarray | None = None) -> bytes:
    """Grayscale (h,w) or RGB (h,w,3) → progressive (SOF2) JPEG with
    the IJG-shaped scan script (spectral selection + successive
    approximation, refined fully to Al=0 so the stream is
    coefficient-equivalent to the baseline encoding)."""
    h, w, comps, qts = _jpeg_comps(img, qtbl, qtbl_c)
    hmax = max(c["H"] for c in comps)
    vmax = max(c["V"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    out = _jpeg_headers(h, w, comps, qts, 0xC2)

    def ac_scan(c, ss, se, ah, al):
        ev: list = []
        st = _EobState()
        for by in range(c["nbh_s"]):
            for bx in range(c["nbw_s"]):
                row = c["zz"][by * c["nbw"] + bx]
                if ah == 0:
                    _ac_first_block_events(row, ss, se, al, st, ev)
                else:
                    _ac_refine_block_events(row, ss, se, al, st, ev)
        _flush_eob(st, ev)
        _emit_scan(out, ev, [c], ss, se, ah, al)

    # scan script (jcparam.c fill_scans shape)
    _emit_scan(out, _dc_scan_events(comps, mcux, mcuy, 0, 1),
               comps, 0, 0, 0, 1)
    y = comps[0]
    ac_scan(y, 1, 5, 0, 2)
    for c in comps[1:]:
        ac_scan(c, 1, 63, 0, 1)
    ac_scan(y, 6, 63, 0, 2)
    ac_scan(y, 1, 63, 2, 1)
    _emit_scan(out, _dc_scan_events(comps, mcux, mcuy, 1, 0),
               comps, 0, 0, 1, 0)
    ac_scan(y, 1, 63, 1, 0)
    for c in comps[1:]:
        ac_scan(c, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_multiscan(img: np.ndarray,
                          qtbl: np.ndarray | None = None,
                          qtbl_c: np.ndarray | None = None) -> bytes:
    """Grayscale or RGB → BASELINE (SOF0) JPEG with each component in
    its own non-interleaved scan — the legal baseline layout the
    round-4 decoder typed-skipped."""
    h, w, comps, qts = _jpeg_comps(img, qtbl, qtbl_c)
    out = _jpeg_headers(h, w, comps, qts, 0xC0)
    for c in comps:
        ev: list = []
        pred = 0
        for by in range(c["nbh_s"]):
            for bx in range(c["nbw_s"]):
                row = c["zz"][by * c["nbw"] + bx]
                dc = int(row[0])
                ev.extend(_seq_block_events(row, dc - pred))
                pred = dc
        _emit_scan(out, ev, [c], 0, 63, 0, 0)
    out += b"\xff\xd9"
    return bytes(out)


def _decode_table(bits: list, vals: list) -> dict:
    """DHT (bits, values) → {(code, length): symbol} lookup."""
    lut = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lut[(code, ln)] = vals[vi]
            code += 1
            vi += 1
        code <<= 1
    return lut


def _read_symbol(rdr: _BitReader, tab: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | rdr.read(1)
        sym = tab.get((code, ln))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def _skip_restart(rdr: _BitReader):
    """Consume an expected RSTn marker at a restart interval."""
    rdr.align()
    d = rdr.data
    p = rdr.pos
    while p + 1 < len(d) and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
        p += 1
    rdr.pos = min(p + 2, len(d))


# ---------------------------------------------------------------------------
# Perceptual image hash (pHash): 32×32 area-mean resize → 2D DCT →
# top-left 8×8 low-frequency block (DC dropped) → median threshold →
# 64-bit signature. Classic pHash construction (public); invariant to
# uniform brightness shifts (constant offsets live entirely in DC) and
# stable under JPEG requantization (which preserves low frequencies).
# ---------------------------------------------------------------------------

def _dct_matrix_n(n: int) -> np.ndarray:
    k = np.arange(n)
    D = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n)) \
        * np.sqrt(2.0 / n)
    D[0] /= np.sqrt(2.0)
    return D


_DCT32 = _dct_matrix_n(32)


def _resize_area(img: np.ndarray, out: int = 32) -> np.ndarray:
    """Deterministic area-mean resize to (out, out): each output cell
    averages its (possibly ragged) source block — no interpolation
    library, exact for any input size."""
    h, w = img.shape
    ys = (np.arange(out + 1) * h) // out
    xs = (np.arange(out + 1) * w) // out
    ys = np.maximum(ys, np.arange(out + 1))  # guarantee non-empty
    xs = np.maximum(xs, np.arange(out + 1))
    ys = np.minimum(ys, h)
    xs = np.minimum(xs, w)
    # integral image makes each block mean O(1)
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(img.astype(np.float64), 0), 1)
    blk = (ii[ys[1:], :][:, xs[1:]] - ii[ys[:-1], :][:, xs[1:]]
           - ii[ys[1:], :][:, xs[:-1]] + ii[ys[:-1], :][:, xs[:-1]])
    area = ((ys[1:] - ys[:-1])[:, None]
            * (xs[1:] - xs[:-1])[None, :]).astype(np.float64)
    return blk / area


def phash64(img: np.ndarray) -> int:
    """8-bit grayscale ndarray → 64-bit perceptual hash."""
    if img.shape[0] < 32 or img.shape[1] < 32:
        # upscale tiny images by repetition so the DCT grid is full
        ry = -(-32 // img.shape[0])
        rx = -(-32 // img.shape[1])
        img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)
    small = _resize_area(img, 32)
    F = _DCT32 @ small @ _DCT32.T
    low = F[:8, :8].flatten()[1:]         # drop DC
    med = np.median(low)
    bits = low > med
    out = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


# ---------------------------------------------------------------------------
# Audio fingerprint: 8 time slices × 8 log-spaced spectral bands of
# log energy, median-thresholded → 64-bit signature (the classic
# spectral-band fingerprint shape, e.g. Haitsma & Kalker 2002,
# public). Invariant to uniform volume scaling (log energies shift by
# a constant, and so does their median) and to lossless re-encodes.
# ---------------------------------------------------------------------------

def audio_fingerprint64(samples: np.ndarray) -> int:
    """mono int16/float samples → 64-bit spectral fingerprint."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < 64:
        x = np.pad(x, (0, 64 - len(x)))
    n_slices = 8
    cut = len(x) // n_slices * n_slices
    frames = x[:cut].reshape(n_slices, -1)
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    nb = spec.shape[1]
    # 8 log-spaced band edges over the positive spectrum (skip DC)
    edges = np.unique(np.round(
        np.logspace(0, np.log10(nb - 1), 9)).astype(np.int64))
    while len(edges) < 9:                 # tiny spectra: pad edges
        edges = np.append(edges, edges[-1] + 1)
    # clamp padded edges into the spectrum so every band spans ≥1 bin
    # (an empty spec[:, lo:hi] slice would mean-NaN the feature and
    # silently zero bits for very short clips)
    edges = np.minimum(edges, nb - 1)
    feats = np.empty((n_slices, 8), dtype=np.float64)
    for b in range(8):
        lo, hi = int(edges[b]), max(int(edges[b + 1]), int(edges[b]) + 1)
        # MEAN per bin, not sum: log-spaced bands widen geometrically,
        # and a width-weighted sum would give every flat-spectrum
        # signal the same bit pattern (no discrimination)
        feats[:, b] = spec[:, lo:hi].mean(axis=1)
    feats = np.log(feats.flatten() + 1e-12)
    med = np.median(feats)
    bits = feats > med
    out = np.uint64(0)
    for i, v in enumerate(bits):
        if v:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)
