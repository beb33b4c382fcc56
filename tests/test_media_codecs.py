"""Pure-stdlib PNG/WAV codecs: roundtrips over every filter type,
spec-shape checks, and the real-format media pipeline."""

import struct
import zlib

import numpy as np
import pytest

from tilemaker_ray.stages.media_codecs import (decode_png_gray,
                                               decode_wav_pcm16,
                                               encode_png_gray,
                                               encode_wav_pcm16)


def test_png_roundtrip_all_filters():
    rng = np.random.RandomState(1)
    for f in range(5):
        img = rng.randint(0, 256, (13, 17), dtype=np.uint8)
        data = encode_png_gray(img, filter_type=f)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        out = decode_png_gray(data)
        assert out.dtype == np.uint8 and out.shape == (13, 17)
        assert np.array_equal(out, img), f"filter {f}"


def test_png_gradient_and_degenerate_shapes():
    # gradients stress Sub/Average/Paeth prediction correctness
    img = np.add.outer(np.arange(9, dtype=np.uint8) * 7,
                       np.arange(31, dtype=np.uint8) * 3)
    for f in range(5):
        assert np.array_equal(decode_png_gray(
            encode_png_gray(img, filter_type=f)), img)
    one = np.array([[200]], dtype=np.uint8)
    assert np.array_equal(decode_png_gray(encode_png_gray(one)), one)


def test_png_chunk_crcs_are_valid():
    img = np.zeros((4, 4), dtype=np.uint8)
    data = encode_png_gray(img)
    pos = 8
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag_body = data[pos + 4:pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        assert crc == (zlib.crc32(tag_body) & 0xFFFFFFFF)
        if tag_body[:4] == b"IEND":
            break
        pos += 12 + ln


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png_gray(b"not a png at all")


def test_wav_roundtrip_and_reject():
    rng = np.random.RandomState(2)
    s = rng.randint(-32768, 32767, 333).astype(np.int16)
    data = encode_wav_pcm16(s, rate=8000)
    out, rate = decode_wav_pcm16(data)
    assert rate == 8000 and np.array_equal(out, s)
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFFxxxxJUNK")


def test_real_media_pipeline_features(ray_session):
    from tilemaker_ray.stages.multimodal import (MediaFeatures,
                                                 real_media_dataset,
                                                 synth_real_media_batch)
    out = real_media_dataset(60).map_batches(
        MediaFeatures, concurrency=2, batch_size=16,
        batch_format="pyarrow").to_pandas().set_index("media_id")
    assert len(out) == 60
    # recompute features from the source payloads via the decoders
    src = synth_real_media_batch({"id": np.arange(60)})
    for mid, kind, payload in zip(src["media_id"].to_pylist(),
                                  src["kind"].to_pylist(),
                                  src["payload"].to_pylist()):
        if kind == "image":
            from tilemaker_ray.stages.media_codecs import \
                decode_jpeg_gray
            arr = decode_png_gray(payload) \
                if payload[:8] == b"\x89PNG\r\n\x1a\n" \
                else decode_jpeg_gray(payload)
        else:
            arr, _ = decode_wav_pcm16(payload)
        assert out.loc[mid, "kind"] == kind
        assert abs(out.loc[mid, "mean_val"] - float(arr.mean())) < 1e-9
        assert out.loc[mid, "n_elems"] == arr.size


# --- property-based sweeps (pure kernels, derandomized like
# test_property_geo) ---

from hypothesis import given, settings, strategies as st

DET = {"derandomize": True, "deadline": None}


@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 4),
       st.integers(0, 2**31 - 1))
@settings(max_examples=40, **DET)
def test_png_roundtrip_property(h, w, f, seed):
    img = np.random.RandomState(seed).randint(
        0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(
        decode_png_gray(encode_png_gray(img, filter_type=f)), img)


@given(st.integers(1, 2000), st.integers(0, 2**31 - 1),
       st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=30, **DET)
def test_wav_roundtrip_property(n, seed, rate):
    s = np.random.RandomState(seed).randint(
        -32768, 32767, n).astype(np.int16)
    out, r = decode_wav_pcm16(encode_wav_pcm16(s, rate=rate))
    assert r == rate and np.array_equal(out, s)


# ------------------------------ baseline JPEG ------------------------------

def test_jpeg_roundtrip_smooth_image():
    import numpy as np
    from tilemaker_ray.stages.media_codecs import (decode_jpeg_gray,
                                                   encode_jpeg_gray)
    h, w = 41, 57
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((np.sin(xx / 9.0) + np.cos(yy / 7.0) + 2) / 4 * 255) \
        .astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(img))
    assert out.shape == (h, w)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_jpeg_flat_image_exact_and_q1_near_lossless():
    import numpy as np
    from tilemaker_ray.stages.media_codecs import (decode_jpeg_gray,
                                                   encode_jpeg_gray)
    flat = np.full((16, 24), 130, np.uint8)
    assert np.array_equal(decode_jpeg_gray(encode_jpeg_gray(flat)),
                          flat)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (19, 22), dtype=np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(img,
                                            qtbl=np.ones((8, 8))))
    # quant table of 1s: only DCT float rounding remains
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_property_random_sizes():
    import numpy as np
    from tilemaker_ray.stages.media_codecs import (decode_jpeg_gray,
                                                   encode_jpeg_gray)
    rng = np.random.RandomState(7)
    for _ in range(8):
        h = int(rng.randint(1, 40))
        w = int(rng.randint(1, 40))
        img = rng.randint(0, 256, (h, w), dtype=np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(img,
                                                qtbl=np.ones((8, 8))))
        assert out.shape == (h, w)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


def test_jpeg_rejects_bad_and_unsupported():
    import numpy as np
    import pytest
    from tilemaker_ray.stages.media_codecs import decode_jpeg_gray
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"not a jpeg at all")
    # arithmetic-coded frame (SOF9) refused honestly (progressive SOF2
    # is DECODED since round 5 — see test_jpeg_progressive.py)
    import struct
    fake = (b"\xff\xd8" + b"\xff\xc9" + struct.pack(">H", 11)
            + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(fake)
    # SOF2 with no scan at all is malformed, not unsupported
    fake2 = (b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 11)
             + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
             + b"\xff\xd9")
    with pytest.raises(ValueError):
        decode_jpeg_gray(fake2)


def test_decode_external_dispatches_jpeg():
    import numpy as np
    from tilemaker_ray.stages.media_codecs import encode_jpeg_gray
    from tilemaker_ray.stages.multimodal import decode_external
    img = np.full((9, 11), 77, np.uint8)
    kind, arr = decode_external(encode_jpeg_gray(img))
    assert kind == "image" and arr.shape == (9, 11)
    # DC quantization may shift a flat value by ±1
    assert np.abs(arr.astype(int) - img.astype(int)).max() <= 1


# ------------------------------ perceptual hash -----------------------------

def test_phash_invariances():
    import numpy as np
    from tilemaker_ray.stages.media_codecs import (encode_png_gray,
                                                   decode_png_gray,
                                                   phash64)
    rng = np.random.RandomState(3)
    img = rng.randint(40, 200, (48, 64)).astype(np.uint8)
    p0 = phash64(img)
    # uniform brightness shift lives entirely in DC: identical hash
    assert phash64((img.astype(int) + 10).astype(np.uint8)) == p0
    # lossless PNG re-encode: identical pixels, identical hash
    assert phash64(decode_png_gray(encode_png_gray(img, 3))) == p0
    # a different image is far away
    other = rng.randint(40, 200, (48, 64)).astype(np.uint8)
    assert bin(p0 ^ phash64(other)).count("1") > 12


def test_phash_tiny_image_and_determinism():
    import numpy as np
    from tilemaker_ray.stages.media_codecs import phash64
    img = np.arange(25, dtype=np.uint8).reshape(5, 5)
    assert phash64(img) == phash64(img.copy())


def test_hamming64_near_dups_bands_guarantee(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd
    from tilemaker_ray.stages.dedup import hamming64_near_dups
    rng = np.random.RandomState(5)
    base = np.uint64(rng.randint(0, 2**63))
    sigs, ids = [int(base)], [0]
    # plant signatures at hamming 1..7 from base
    for d in range(1, 8):
        v = int(base)
        for b in rng.choice(64, size=d, replace=False):
            v ^= 1 << int(b)
        sigs.append(v)
        ids.append(d)
    t = pa.table({"media_id": pa.array(ids, pa.int64()),
                  "phash": pa.array(np.asarray(sigs, np.uint64)
                                    .astype(np.int64), pa.int64())})
    out = hamming64_near_dups(rd.from_arrow(t).repartition(2),
                              max_hamming=7, id_col="media_id",
                              sig_col="phash", n_bands=8).to_pandas()
    got = set(map(tuple, out[["doc_a", "doc_b"]].values))
    # full recall for every pair within hamming 7 of base
    for d in range(1, 8):
        assert (0, d) in got, d
    # guarantee violation is refused loudly
    with pytest.raises(ValueError):
        hamming64_near_dups(rd.from_arrow(t), max_hamming=9, n_bands=8)


def test_image_phash_pipeline_pairs(ray_session):
    import ray.data as rd
    from tilemaker_ray.stages.dedup import hamming64_near_dups
    from tilemaker_ray.stages.multimodal import (image_phash_fn,
                                                 real_media_dataset)
    sigs = real_media_dataset(40).map_batches(
        image_phash_fn, batch_format="pyarrow")
    df = sigs.to_pandas()
    assert len(df) == 20            # only the image rows
    assert df["phash"].nunique() > 10


def test_audio_fingerprint_invariances():
    import numpy as np
    from tilemaker_ray.stages.media_codecs import audio_fingerprint64
    rng = np.random.RandomState(11)
    s = (rng.randn(3000) * 5000).astype(np.int16)
    f0 = audio_fingerprint64(s)
    # volume scaling: log energies shift uniformly -> identical hash
    assert audio_fingerprint64(s * 0.25) == f0
    assert audio_fingerprint64(
        (s.astype(np.int32) // 2).astype(np.int16)) == f0
    # unrelated noise clips stay far apart (width-normalized bands)
    hs = [bin(f0 ^ audio_fingerprint64(
        (np.random.RandomState(k).randn(3000) * 5000)
        .astype(np.int16))).count("1") for k in range(20, 30)]
    assert min(hs) > 10
    # short clips don't crash
    assert isinstance(audio_fingerprint64(np.zeros(10, np.int16)), int)


def test_audio_fp_pipeline(ray_session):
    from tilemaker_ray.stages.multimodal import (audio_fingerprint_fn,
                                                 real_media_dataset)
    df = real_media_dataset(40).map_batches(
        audio_fingerprint_fn, batch_format="pyarrow").to_pandas()
    assert len(df) == 20                # only the audio rows
    assert df["afp"].nunique() > 10


def test_unsupported_jpeg_yields_typed_skip_row():
    """Payloads outside the codec envelope (e.g. arithmetic-coded
    JPEG — progressive is inside the envelope since round 5) must
    produce a typed skip row — quantifiable at 100-TB scale — never
    kill the stage."""
    import numpy as np
    import pyarrow as pa
    from tilemaker_ray.stages.multimodal import (MediaFeatures,
                                                 synth_real_media_batch)
    src = synth_real_media_batch({"id": np.arange(8)})
    payloads = src["payload"].to_pylist()
    kinds = src["kind"].to_pylist()
    # forge an arithmetic-coded JPEG: rewrite SOF0 to SOF9
    ji = next(i for i, p in enumerate(payloads)
              if p[:2] == b"\xff\xd8")
    buf = bytearray(payloads[ji])
    sof = buf.find(b"\xff\xc0")
    assert sof > 0
    buf[sof + 1] = 0xC9
    payloads[ji] = bytes(buf)
    t = pa.table({"media_id": src["media_id"], 
                  "kind": pa.array(kinds, pa.string()),
                  "payload": pa.array(payloads, pa.binary())})
    out = MediaFeatures()(t).to_pandas().set_index("media_id")
    skip = out.loc[ji]
    assert skip["n_elems"] == 0
    assert "NotImplementedError" in skip["skip_reason"]
    assert np.isnan(skip["mean_val"]) or skip["mean_val"] is None
    ok = out.drop(index=ji)
    assert (ok["skip_reason"] == "").all()
    assert (ok["n_elems"] > 0).all()


def test_color_jpeg_decodes_to_luma():
    """Baseline YCbCr 4:2:0 color JPEG: the decoder advances through
    the interleaved chroma blocks and returns the luma plane."""
    import numpy as np
    from tilemaker_ray.stages.media_codecs import (decode_jpeg_gray,
                                                   encode_jpeg_color)
    h, w = 37, 53
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([(xx * 3) % 256, (yy * 5) % 256,
                    ((xx + yy) * 2) % 256], axis=2).astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_color(rgb))
    assert out.shape == (h, w)
    luma = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
            + 0.114 * rgb[..., 2])
    # smooth gradient: quantization-level error only
    assert np.abs(out.astype(float) - luma).max() < 8

    # noisy color image: bitstream survives (error bounded by quant)
    rng = np.random.RandomState(5)
    noisy = rng.randint(0, 256, (24, 31, 3), dtype=np.uint8)
    out2 = decode_jpeg_gray(encode_jpeg_color(noisy))
    assert out2.shape == (24, 31)
    luma2 = (0.299 * noisy[..., 0] + 0.587 * noisy[..., 1]
             + 0.114 * noisy[..., 2])
    assert np.abs(out2.astype(float) - luma2).mean() < 40


def test_color_jpeg_odd_dims_and_tiny():
    import numpy as np
    from tilemaker_ray.stages.media_codecs import (decode_jpeg_gray,
                                                   encode_jpeg_color)
    for (h, w) in [(1, 1), (7, 9), (16, 16), (17, 15)]:
        rgb = np.full((h, w, 3), 77, dtype=np.uint8)
        out = decode_jpeg_gray(encode_jpeg_color(rgb))
        assert out.shape == (h, w)
        # constant image: luma 77*0.299+77*0.587+77*0.114 = 77
        assert np.abs(out.astype(float) - 77).max() <= 2


def test_real_media_mix_includes_color_jpeg():
    import numpy as np
    from tilemaker_ray.stages.multimodal import (MediaFeatures,
                                                 synth_real_media_batch)
    src = synth_real_media_batch({"id": np.arange(16)})
    pays = src["payload"].to_pylist()
    # id 6 and 14 are color JPEGs: 3-component SOF0
    for i in (6, 14):
        p = pays[i]
        sof = p.find(b"\xff\xc0")
        assert p[sof + 2 + 2 + 5] == 3
    out = MediaFeatures()(src).to_pandas()
    assert (out["skip_reason"] == "").all()     # everything decodes
    assert (out["n_elems"] > 0).all()


def test_non_interleaved_first_scan_decodes():
    """A 3-component SOF whose first (and only) SOS declares one
    component — the legal baseline multi-scan layout the round-4
    decoder typed-skipped — now decodes: the single scan fills the
    luma grid and the luma plane comes out intact."""
    import struct
    import numpy as np
    from tilemaker_ray.stages.media_codecs import (decode_jpeg_gray,
                                                   encode_jpeg_gray)
    img = np.full((8, 8), 50, np.uint8)
    expect = decode_jpeg_gray(encode_jpeg_gray(img))
    base = bytearray(encode_jpeg_gray(img))
    sof = base.find(b"\xff\xc0")
    # rewrite SOF to declare 3 components (extend the segment)
    comps = bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0])
    body = base[sof + 4:sof + 4 + 6][:5] + b"\x03" + comps
    newsof = b"\xff\xc0" + struct.pack(">H", len(body) + 2) + body
    end = sof + 4 + struct.unpack_from(">H", base, sof + 2)[0] - 2
    patched = bytes(base[:sof]) + newsof + bytes(base[end:])
    out = decode_jpeg_gray(patched)
    assert out.shape == (8, 8)
    np.testing.assert_array_equal(out, expect)


def test_truncated_payload_yields_skip_row_not_crash():
    """Review-found: struct.error from a truncated SOF escaped the
    typed-skip catch and killed the stage."""
    import numpy as np
    import pyarrow as pa
    from tilemaker_ray.stages.multimodal import MediaFeatures
    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "kind": pa.array(["image", "image"], pa.string()),
        "payload": pa.array([b"\xff\xd8\xff\xc0\x00\x04\x08\x00",
                             b"\x89PNG\r\n\x1a\ngarbage"],
                            pa.binary()),
        "width": pa.array([0, 0], pa.int32()),
        "height": pa.array([0, 0], pa.int32()),
        "n_frames": pa.array([0, 0], pa.int32())})
    out = MediaFeatures()(t).to_pandas()
    assert (out["n_elems"] == 0).all()
    assert (out["skip_reason"] != "").all()
