"""AVI/MJPEG container oracles: roundtrip, metadata, sampling stride,
codec gate, malformed-input behavior."""

import numpy as np
import pytest

from tilemaker_ray.stages.media_codecs import (decode_jpeg_gray,
                                               encode_jpeg_gray)
from tilemaker_ray.stages.video import (decode_avi_frames,
                                        encode_avi_mjpeg, parse_avi)


def _frames(n, h=16, w=24, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w)).astype(np.uint8)
            for _ in range(n)]


def test_roundtrip_decode_matches_direct_jpeg():
    imgs = _frames(5)
    jpegs = [encode_jpeg_gray(im) for im in imgs]
    avi = encode_avi_mjpeg(jpegs, 24, 16, fps=10)
    out = decode_avi_frames(avi)
    assert out.shape == (5, 16, 24)
    for i, j in enumerate(jpegs):
        assert np.array_equal(out[i], decode_jpeg_gray(j))


def test_metadata():
    jpegs = [encode_jpeg_gray(im) for im in _frames(7, h=8, w=8)]
    meta = parse_avi(encode_avi_mjpeg(jpegs, 8, 8, fps=25))
    assert meta["n_frames"] == 7
    assert (meta["width"], meta["height"]) == (8, 8)
    assert meta["fps"] == 25
    assert meta["codec"] == "MJPG"
    assert len(meta["frames"]) == 7


def test_frame_spans_are_exact_jpeg_bytes():
    jpegs = [encode_jpeg_gray(im) for im in _frames(3, seed=4)]
    avi = encode_avi_mjpeg(jpegs, 24, 16)
    meta = parse_avi(avi)
    for (off, ln), j in zip(meta["frames"], jpegs):
        assert avi[off:off + ln] == j


def test_sampling_stride():
    jpegs = [encode_jpeg_gray(im) for im in _frames(10, seed=2)]
    avi = encode_avi_mjpeg(jpegs, 24, 16)
    out = decode_avi_frames(avi, every=3)
    assert out.shape[0] == 4          # frames 0, 3, 6, 9
    assert np.array_equal(out[1], decode_jpeg_gray(jpegs[3]))


def test_odd_length_frame_padding():
    # force an odd-length JPEG body so the even-pad path runs
    imgs = _frames(4, h=12, w=11, seed=9)
    jpegs = [encode_jpeg_gray(im) for im in imgs]
    jpegs = [j if len(j) % 2 else j + b""  # lengths vary; ensure mix
             for j in jpegs]
    avi = encode_avi_mjpeg(jpegs, 11, 12)
    out = decode_avi_frames(avi)
    assert out.shape == (4, 12, 11)
    for i, j in enumerate(jpegs):
        assert np.array_equal(out[i], decode_jpeg_gray(j))


def test_non_mjpeg_codec_gate():
    jpegs = [encode_jpeg_gray(_frames(1)[0])]
    avi = bytearray(encode_avi_mjpeg(jpegs, 24, 16))
    i = avi.find(b"vidsMJPG")
    avi[i + 4:i + 8] = b"H264"
    with pytest.raises(NotImplementedError):
        parse_avi(bytes(avi))


def test_not_avi_raises():
    with pytest.raises(ValueError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        parse_avi(b"nonsense")


def test_truncated_raises():
    jpegs = [encode_jpeg_gray(im) for im in _frames(3)]
    avi = encode_avi_mjpeg(jpegs, 24, 16)
    with pytest.raises(ValueError):
        parse_avi(avi[:len(avi) // 2])
