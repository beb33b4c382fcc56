"""GIF codec oracles: LZW roundtrip (incl. table reset + KwKwK),
interlace layout, animation framing, sub-rectangle compositing."""

import numpy as np
import pytest

from tilemaker_ray.stages.gif import (_interlace_rows, _lzw_decode,
                                      _lzw_encode, _read_subblocks,
                                      _subblocks, decode_gif,
                                      encode_gif_gray)


def test_lzw_roundtrip_random():
    rng = np.random.RandomState(7)
    for n in (1, 2, 17, 255, 256, 4096, 20000):
        data = rng.randint(0, 256, n).astype(np.uint8)
        enc = _lzw_encode(data, 8)
        dec = _lzw_decode(enc, 8, n)
        assert np.array_equal(dec, data)


def test_lzw_kwkwk_case():
    # 'aaaa...' forces code == next_code immediately (KwKwK)
    data = np.zeros(1000, dtype=np.uint8)
    assert np.array_equal(_lzw_decode(_lzw_encode(data, 8), 8, 1000), data)


def test_lzw_table_reset():
    # long low-entropy stream with many distinct pairs grows the table
    # past 4096 and forces a mid-stream CLEAR
    rng = np.random.RandomState(3)
    data = rng.randint(0, 4, 200_000).astype(np.uint8)
    enc = _lzw_encode(data, 8)
    assert np.array_equal(_lzw_decode(enc, 8, len(data)), data)


def test_lzw_small_code_size():
    rng = np.random.RandomState(11)
    data = rng.randint(0, 4, 500).astype(np.uint8)
    enc = _lzw_encode(data, 2)
    assert np.array_equal(_lzw_decode(enc, 2, 500), data)


def test_subblock_roundtrip():
    for n in (0, 1, 254, 255, 256, 1000):
        raw = bytes(range(256)) * (n // 256 + 1)
        raw = raw[:n]
        framed = _subblocks(raw)
        out, pos = _read_subblocks(framed, 0)
        assert out == raw and pos == len(framed)


def test_interlace_rows_is_permutation():
    for h in (1, 2, 7, 8, 9, 64, 101):
        rows = _interlace_rows(h)
        assert sorted(rows.tolist()) == list(range(h))


def test_gif_roundtrip_single_frame():
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (24, 31)).astype(np.uint8)
    out = decode_gif(encode_gif_gray(img))
    assert out.shape == (1, 24, 31)
    assert np.array_equal(out[0], img)


def test_gif_roundtrip_interlaced():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (37, 16)).astype(np.uint8)
    plain = decode_gif(encode_gif_gray(img, interlace=False))
    inter = decode_gif(encode_gif_gray(img, interlace=True))
    assert np.array_equal(plain, inter)
    assert np.array_equal(inter[0], img)


def test_gif_roundtrip_animated():
    rng = np.random.RandomState(9)
    frames = rng.randint(0, 256, (5, 12, 18)).astype(np.uint8)
    out = decode_gif(encode_gif_gray(frames))
    assert out.shape == (5, 12, 18)
    assert np.array_equal(out, frames)


def test_gif_subrect_composites_on_previous():
    """A hand-built second frame covering a sub-rectangle must land on
    top of frame 1 (disposal: do not dispose)."""
    import struct
    from tilemaker_ray.stages.gif import _lzw_encode as enc, _subblocks
    base = np.full((8, 8), 10, dtype=np.uint8)
    gif = bytearray(encode_gif_gray(base))
    assert gif[-1] == 0x3B
    gif.pop()                      # strip trailer
    patch = np.full((2, 3), 200, dtype=np.uint8)
    gif.extend(b"\x2c" + struct.pack("<HHHHB", 4, 5, 3, 2, 0))
    gif.append(8)
    gif.extend(_subblocks(enc(patch.reshape(-1), 8)))
    gif.append(0x3B)
    out = decode_gif(bytes(gif))
    assert out.shape == (2, 8, 8)
    expect = base.copy()
    expect[5:7, 4:7] = 200
    assert np.array_equal(out[1], expect)
    assert np.array_equal(out[0], base)


def test_gif_header_and_magic():
    data = encode_gif_gray(np.zeros((4, 4), dtype=np.uint8))
    assert data[:6] == b"GIF89a"
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + data[6:])


def test_gif_truncated_raises():
    data = encode_gif_gray(np.arange(64, dtype=np.uint8).reshape(8, 8))
    with pytest.raises(ValueError):
        decode_gif(data[:len(data) // 2])
