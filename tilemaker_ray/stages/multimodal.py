"""Multimodal (image/audio/video) column plumbing.

No reference analog (tilemaker is geometry-only) — this is the
training-data-pipeline surface the engine adds: opaque ``binary``
payload columns with typed metadata, processed by actor-pool
map_batches stages sized for large rows (small batch_size, Arrow all
the way — SURVEY.md wide-records rule).

Two payload families:

 * REAL formats — 8-bit grayscale PNG and mono PCM16 WAV are decoded
   by the engine's own pure-stdlib codecs (stages/media_codecs.py);
   ``synth_real_media_batch`` produces them and the media query runs
   the actual decoders (all five PNG scanline filters exercised).
 * FAK* plumbing format — a trivially-parsed raw layout kept for the
   wide-record batch-sizing and resize/frame-sample plumbing tests:

    FAKI | u16 w | u16 h | w*h gray bytes          (image)
    FAKA | u32 n | n int16 samples                 (audio)
    FAKV | u16 w | u16 h | u16 nframes | frames    (video)

``decode_external()`` decodes PNG, JPEG (baseline sequential,
non-interleaved multi-scan, AND progressive SOF2; color to its luma
plane) and WAV natively and still raises NotImplementedError for
formats that genuinely need native libs (video containers,
arithmetic-coded JPEG) — the branch a deployment fills with
PIL/libav.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),       # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_frames", pa.int32()),
])


def synth_media_batch(batch: dict) -> pa.Table:
    """Deterministic synthetic media rows from range() ids."""
    ids = np.asarray(batch["id"], dtype=np.int64)
    rows = {k: [] for k in ("media_id", "kind", "payload", "width",
                            "height", "n_frames")}
    for i in ids.tolist():
        kind = ("image", "audio", "video")[i % 3]
        rng = np.random.RandomState(i % (2**31))
        if kind == "image":
            w, h = 16 + (i % 16), 16 + (i % 8)
            px = rng.randint(0, 256, w * h, dtype=np.uint8)
            payload = b"FAKI" + struct.pack("<HH", w, h) + px.tobytes()
            nf = 1
        elif kind == "audio":
            n = 256 + (i % 256)
            samples = rng.randint(-32768, 32767, n, dtype=np.int16)
            payload = b"FAKA" + struct.pack("<I", n) + samples.tobytes()
            w = h = 0
            nf = 0
        else:
            w, h, nf = 8, 8, 4 + (i % 4)
            px = rng.randint(0, 256, w * h * nf, dtype=np.uint8)
            payload = b"FAKV" + struct.pack("<HHH", w, h, nf) + px.tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["n_frames"].append(nf)
    return pa.table({k: pa.array(v, MEDIA_SCHEMA.field(k).type)
                     for k, v in rows.items()}, schema=MEDIA_SCHEMA)


def media_dataset(n: int):
    import ray.data as rd
    # large binary rows → small blocks; keep batches modest
    return rd.range(n).map_batches(synth_media_batch, batch_format="numpy",
                                   batch_size=512)


def decode_external(payload: bytes):
    """Real-format decode: PNG (8-bit grayscale), JPEG (baseline
    sequential, multi-scan AND progressive; color decodes to its
    luma plane), GIF87a/89a (LZW, interlace, animation — multi-frame
    decodes as video), WAV (mono PCM16), and AVI/MJPEG video are all
    decoded by the engine's own pure-stdlib codecs
    (stages/media_codecs.py, stages/gif.py, stages/video.py).
    Formats genuinely needing native libs (H.264/VP9 video,
    arithmetic-coded JPEG) still raise — the branch a deployment
    fills with PIL/libav."""
    from .media_codecs import (decode_jpeg_gray, decode_png_gray,
                               decode_wav_pcm16)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "image", decode_png_gray(payload)
    if payload[:2] == b"\xff\xd8":
        return "image", decode_jpeg_gray(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif
        frames = decode_gif(payload)
        if frames.shape[0] == 1:
            return "image", frames[0]
        return "video", frames
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        samples, _rate = decode_wav_pcm16(payload)
        return "audio", samples
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from .video import decode_avi_frames
        return "video", decode_avi_frames(payload)
    raise NotImplementedError(
        "compressed-codec video (H.264/VP9/…) requires libav — not "
        "available in this container (PNG + JPEG incl. progressive + "
        "GIF + WAV + AVI/MJPEG are decoded natively; FAK* is the "
        "plumbing-test format)")


def _decode(payload: bytes):
    magic = payload[:4]
    if magic == b"FAKI":
        w, h = struct.unpack_from("<HH", payload, 4)
        px = np.frombuffer(payload, dtype=np.uint8, offset=8, count=w * h)
        return "image", px.reshape(h, w)
    if magic == b"FAKA":
        n = struct.unpack_from("<I", payload, 4)[0]
        return "audio", np.frombuffer(payload, dtype=np.int16, offset=8,
                                      count=n)
    if magic == b"FAKV":
        w, h, nf = struct.unpack_from("<HHH", payload, 4)
        px = np.frombuffer(payload, dtype=np.uint8, offset=10,
                           count=w * h * nf)
        return "video", px.reshape(nf, h, w)
    # the live dispatch for real formats (PNG/WAV decode natively;
    # JPEG/video raise)
    return decode_external(payload)


def media_moments(n: int, s: int, ssq: int) -> tuple:
    """mean / population-std from exact integer sums through the IEEE
    expression tree mirrored by the media_codec_features SQL oracle:
    ``mean = CAST(s AS DOUBLE)/n``,
    ``std = sqrt(greatest(CAST(ssq AS DOUBLE)/n - mean*mean, 0))``;
    skip rows (n = 0) yield NULLs on both sides."""
    import math
    if n == 0:
        return None, None
    mean = float(s) / n
    var = float(ssq) / n - mean * mean
    return mean, math.sqrt(max(var, 0.0))


class MediaFeatures:
    """Actor-pool stage: decode + per-item feature extraction. State
    (none heavy here; a model would load in __init__) amortized per
    actor. Output: metadata + numeric features, payload DROPPED (wide
    columns leave the pipeline as early as possible)."""

    def __init__(self):
        self.calls = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.calls += 1
        feats = {"media_id": [], "kind": [], "mean_val": [], "std_val": [],
                 "n_elems": [], "sum_v": [], "sumsq_v": [],
                 "skip_reason": []}
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            # a 100-TB crawl WILL contain payloads outside the codec
            # envelope (arithmetic-coded JPEG, exotic WAV): emit a
            # TYPED skip row (reason quantifiable downstream) instead
            # of killing the run
            try:
                k, arr = _decode(payload)
                reason = ""
            except (NotImplementedError, ValueError, KeyError,
                    IndexError, struct.error, zlib.error, EOFError,
                    OverflowError) as err:
                # malformed payloads surface every one of these from
                # the pure-Python codecs (truncated SOF → struct.error,
                # missing Huffman table → KeyError, …); all of them
                # mean "this record, not this run"
                k, arr, reason = kind, None, \
                    f"{type(err).__name__}: {err}"
            if arr is None:
                n = s = ssq = 0
            else:
                # EXACT integer sufficient statistics (uint8 / int16
                # samples fit int64 comfortably), then mean/std through
                # the explicit IEEE tree a SQL oracle mirrors verbatim:
                # mean = CAST(s AS DOUBLE)/n; var = max(ssq/n−mean², 0)
                a = arr.astype(np.int64, copy=False)
                n = int(a.size)
                s = int(a.sum())
                ssq = int((a * a).sum())
            mean, std = media_moments(n, s, ssq)
            feats["media_id"].append(mid)
            feats["kind"].append(k)
            feats["mean_val"].append(mean)
            feats["std_val"].append(std)
            feats["n_elems"].append(n)
            feats["sum_v"].append(s)
            feats["sumsq_v"].append(ssq)
            feats["skip_reason"].append(reason)
        return pa.table({
            "media_id": pa.array(feats["media_id"], pa.int64()),
            "kind": pa.array(feats["kind"], pa.string()),
            "mean_val": pa.array(feats["mean_val"], pa.float64()),
            "std_val": pa.array(feats["std_val"], pa.float64()),
            "n_elems": pa.array(feats["n_elems"], pa.int64()),
            "sum_v": pa.array(feats["sum_v"], pa.int64()),
            "sumsq_v": pa.array(feats["sumsq_v"], pa.int64()),
            "skip_reason": pa.array(feats["skip_reason"], pa.string()),
        })


class ImageResize:
    """Actor-pool stage: 2× average-pool downsample of image payloads
    (the resize slot; re-encodes the FAK format)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "payload": [], "width": [], "height": []}
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            if kind != "image":
                continue
            _, img = _decode(payload)
            h2, w2 = img.shape[0] // 2 * 2, img.shape[1] // 2 * 2
            small = img[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2) \
                .mean(axis=(1, 3)).astype(np.uint8)
            out["media_id"].append(mid)
            out["payload"].append(b"FAKI"
                                  + struct.pack("<HH", small.shape[1],
                                                small.shape[0])
                                  + small.tobytes())
            out["width"].append(small.shape[1])
            out["height"].append(small.shape[0])
        return pa.table({"media_id": pa.array(out["media_id"], pa.int64()),
                         "payload": pa.array(out["payload"], pa.binary()),
                         "width": pa.array(out["width"], pa.int32()),
                         "height": pa.array(out["height"], pa.int32())})


class FrameSampler:
    """Actor-pool stage: sample every k-th frame of video payloads →
    one image row per sampled frame (flat-map 1→N)."""

    def __init__(self, every: int = 2):
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_idx": [], "payload": []}
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            if kind != "video":
                continue
            _, frames = _decode(payload)
            for fi in range(0, frames.shape[0], self.every):
                img = frames[fi]
                out["media_id"].append(mid)
                out["frame_idx"].append(fi)
                out["payload"].append(
                    b"FAKI" + struct.pack("<HH", img.shape[1], img.shape[0])
                    + img.tobytes())
        return pa.table({"media_id": pa.array(out["media_id"], pa.int64()),
                         "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                         "payload": pa.array(out["payload"], pa.binary())})


def synth_real_media_batch(batch: dict) -> pa.Table:
    """Deterministic REAL-format media rows, cycling four codecs:
    ids ≡ 0 (mod 4) → 8-bit grayscale PNG (cycling all five scanline
    filters so the decoder's every branch runs in production paths),
    ids ≡ 2 (mod 8) → baseline grayscale JPEG, ids ≡ 6 (mod 8) →
    baseline COLOR JPEG (YCbCr 4:2:0, interleaved MCUs — decoded to
    its luma plane), odd ids → mono PCM16 WAV."""
    from .media_codecs import (encode_jpeg_color, encode_jpeg_gray,
                               encode_png_gray, encode_wav_pcm16)
    ids = np.asarray(batch["id"], dtype=np.int64)
    rows = {k: [] for k in ("media_id", "kind", "payload", "width",
                            "height", "n_frames")}
    for i in ids.tolist():
        rng = np.random.RandomState(i % (2**31))
        if i % 2 == 0:
            w, h = 12 + (i % 9), 10 + (i % 7)
            img = rng.randint(0, 256, (h, w), dtype=np.uint8)
            if i % 4 == 0:
                payload = encode_png_gray(img,
                                          filter_type=(i // 2) % 5)
            elif i % 8 == 6:
                rgbimg = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
                payload = encode_jpeg_color(rgbimg)
            else:
                payload = encode_jpeg_gray(img)
            rows["kind"].append("image")
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_frames"].append(1)
        else:
            n = 200 + (i % 200)
            samples = rng.randint(-32768, 32767, n).astype(np.int16)
            payload = encode_wav_pcm16(samples, rate=16000)
            rows["kind"].append("audio")
            rows["width"].append(0)
            rows["height"].append(0)
            rows["n_frames"].append(0)
        rows["media_id"].append(i)
        rows["payload"].append(payload)
    return pa.table({k: pa.array(v, MEDIA_SCHEMA.field(k).type)
                     for k, v in rows.items()}, schema=MEDIA_SCHEMA)


def real_media_dataset(n: int):
    import ray.data as rd
    return rd.range(n).map_batches(synth_real_media_batch,
                                   batch_format="numpy", batch_size=256)


JPEG_VARIANTS = ("baseline", "progressive", "multiscan")


def jpeg_variant_stats_batch(batch) -> pa.Table:
    """map_batches body: ids → one row per (img_id, variant). The SAME
    deterministic image is encoded three ways — baseline interleaved,
    progressive SOF2 (spectral selection + successive approximation),
    and non-interleaved multi-scan baseline — then decoded back by the
    unified decoder (stages/media_codecs.py). Emits exact integer
    sufficient statistics + the 64-bit pHash per variant, so a paired
    SQL oracle over the staged rows can certify that all three
    bitstream layouts decode IDENTICALLY (the progressive scan script
    refines to Al=0, i.e. coefficient equivalence by construction)."""
    from .media_codecs import (decode_jpeg_gray, encode_jpeg_color,
                               encode_jpeg_gray, encode_jpeg_multiscan,
                               encode_jpeg_progressive, phash64)
    ids = np.asarray(batch["id"], dtype=np.int64)
    out = {k: [] for k in ("img_id", "variant", "n_elems", "sum_v",
                           "sumsq_v", "phash")}
    for i in ids.tolist():
        rng = np.random.RandomState((i * 9176 + 11) % (2 ** 31))
        h, w = 16 + (i % 17), 12 + (i % 13)
        if i % 2 == 0:
            img = rng.randint(0, 256, (h, w), dtype=np.uint8)
        else:
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        enc_gray = encode_jpeg_gray if img.ndim == 2 else encode_jpeg_color
        encs = {"baseline": enc_gray(img),
                "progressive": encode_jpeg_progressive(img),
                "multiscan": encode_jpeg_multiscan(img)}
        for variant in JPEG_VARIANTS:
            g = decode_jpeg_gray(encs[variant]).astype(np.int64)
            out["img_id"].append(i)
            out["variant"].append(variant)
            out["n_elems"].append(int(g.size))
            out["sum_v"].append(int(g.sum()))
            out["sumsq_v"].append(int((g * g).sum()))
            out["phash"].append(f"{phash64(g.astype(np.uint8)):016x}")
    return pa.table({
        "img_id": pa.array(out["img_id"], pa.int64()),
        "variant": pa.array(out["variant"], pa.string()),
        "n_elems": pa.array(out["n_elems"], pa.int64()),
        "sum_v": pa.array(out["sum_v"], pa.int64()),
        "sumsq_v": pa.array(out["sumsq_v"], pa.int64()),
        "phash": pa.array(out["phash"], pa.string())})


GIF_VARIANTS = ("plain", "interlaced")


def gif_variant_stats_batch(batch) -> pa.Table:
    """map_batches body: ids → one row per (img_id, variant, frame).
    The SAME deterministic frame stack (1 frame for ids ≢ 0 mod 3,
    animated 3-frame for ids ≡ 0) is encoded as a plain-scanline GIF
    AND a 4-pass-interlaced GIF (stages/gif.py), decoded back through
    the unified ``_decode`` dispatch, and reduced to exact integer
    sufficient statistics + pHash per frame — so the paired SQL oracle
    over the staged rows certifies that both scanline layouts decode
    IDENTICALLY (LZW + interlace row permutation are lossless by
    construction)."""
    from .gif import encode_gif_gray
    from .media_codecs import phash64
    ids = np.asarray(batch["id"], dtype=np.int64)
    out = {k: [] for k in ("img_id", "variant", "frame_idx", "n_elems",
                           "sum_v", "sumsq_v", "phash")}
    for i in ids.tolist():
        rng = np.random.RandomState((i * 7349 + 5) % (2 ** 31))
        h, w = 10 + (i % 11), 9 + (i % 7)
        nf = 3 if i % 3 == 0 else 1
        frames = rng.randint(0, 256, (nf, h, w)).astype(np.uint8)
        for variant, inter in zip(GIF_VARIANTS, (False, True)):
            kind, arr = _decode(encode_gif_gray(frames, interlace=inter))
            if kind == "image":
                arr = arr[None]
            for fi in range(arr.shape[0]):
                g = arr[fi].astype(np.int64)
                out["img_id"].append(i)
                out["variant"].append(variant)
                out["frame_idx"].append(fi)
                out["n_elems"].append(int(g.size))
                out["sum_v"].append(int(g.sum()))
                out["sumsq_v"].append(int((g * g).sum()))
                out["phash"].append(f"{phash64(arr[fi]):016x}")
    return pa.table({
        "img_id": pa.array(out["img_id"], pa.int64()),
        "variant": pa.array(out["variant"], pa.string()),
        "frame_idx": pa.array(out["frame_idx"], pa.int64()),
        "n_elems": pa.array(out["n_elems"], pa.int64()),
        "sum_v": pa.array(out["sum_v"], pa.int64()),
        "sumsq_v": pa.array(out["sumsq_v"], pa.int64()),
        "phash": pa.array(out["phash"], pa.string())})


def video_frame_stats_batch(batch) -> pa.Table:
    """map_batches body: ids → deterministic AVI/MJPEG videos parsed
    + frame-sampled (every 2nd frame decoded; cost ∝ sampled frames,
    not duration). One output row per sampled frame carrying container
    metadata (n_frames from the avih header) and exact integer frame
    statistics; ids ≡ 1 (mod 4) get a +96-brightness scene cut halfway
    so the downstream shot-boundary fold has real positives."""
    from .media_codecs import encode_jpeg_gray
    from .video import decode_avi_frames, encode_avi_mjpeg, parse_avi
    ids = np.asarray(batch["id"], dtype=np.int64)
    out = {k: [] for k in ("vid_id", "n_frames", "fps", "frame_idx",
                           "n_px", "sum_v", "sumsq_v")}
    for i in ids.tolist():
        rng = np.random.RandomState((i * 3917 + 29) % (2 ** 31))
        nf = 4 + (i % 5)
        h, w = 12 + (i % 5), 16 + (i % 9)
        base = rng.randint(0, 128, (h, w)).astype(np.uint8)
        frames = []
        for fi in range(nf):
            f = np.clip(base.astype(np.int64)
                        + rng.randint(-8, 9, (h, w)), 0, 255)
            if i % 4 == 1 and fi >= nf // 2:
                f = np.clip(f + 96, 0, 255)        # scene cut
            frames.append(f.astype(np.uint8))
        avi = encode_avi_mjpeg([encode_jpeg_gray(f) for f in frames],
                               w, h, fps=10 + (i % 3) * 5)
        meta = parse_avi(avi)
        sampled = decode_avi_frames(avi, every=2)
        for si in range(sampled.shape[0]):
            g = sampled[si].astype(np.int64)
            out["vid_id"].append(i)
            out["n_frames"].append(int(meta["n_frames"]))
            out["fps"].append(int(meta["fps"]))
            out["frame_idx"].append(si * 2)
            out["n_px"].append(int(g.size))
            out["sum_v"].append(int(g.sum()))
            out["sumsq_v"].append(int((g * g).sum()))
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


def image_phash_fn(batch: pa.Table) -> pa.Table:
    """map_batches body: media rows → (media_id, phash) for IMAGE
    payloads (PNG/JPEG/FAKI all land here through _decode); non-image
    rows are dropped. Decode + 32×32 DCT per image — actor-pool work,
    vectorized inside the hash kernel."""
    from .media_codecs import phash64
    ids, sigs = [], []
    for mid, kind, payload in zip(
            batch["media_id"].to_pylist(), batch["kind"].to_pylist(),
            batch["payload"].to_pylist()):
        if kind != "image":
            continue
        k, arr = _decode(payload)
        if k != "image":
            continue
        ids.append(mid)
        sigs.append(phash64(arr))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "phash": pa.array(np.asarray(sigs, dtype=np.uint64)
                          .astype(np.int64), pa.int64())})


def audio_fingerprint_fn(batch: pa.Table) -> pa.Table:
    """map_batches body: media rows → (media_id, afp) 64-bit spectral
    fingerprints for AUDIO payloads; other kinds dropped."""
    from .media_codecs import audio_fingerprint64
    ids, sigs = [], []
    for mid, kind, payload in zip(
            batch["media_id"].to_pylist(), batch["kind"].to_pylist(),
            batch["payload"].to_pylist()):
        if kind != "audio":
            continue
        k, arr = _decode(payload)
        if k != "audio":
            continue
        ids.append(mid)
        sigs.append(audio_fingerprint64(arr))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "afp": pa.array(np.asarray(sigs, dtype=np.uint64)
                        .astype(np.int64), pa.int64())})


# --------------------------------------------------------------------
# MIME sniffing (magic-byte container detection)
# --------------------------------------------------------------------
# A 100-TB crawl's media columns arrive mislabeled or unlabeled; the
# first production stage is always "what IS this payload" from its
# leading bytes (the file(1) / WHATWG-sniffing model), because the
# verdict routes each row to the right decoder pool. Reference analog:
# the container probe tilemaker's --input does on .pbf vs .geojson vs
# .shp before picking a reader (src/options_parser.cpp dispatch).

# (mime, offset, magic). FIRST match wins — mirror the paired SQL
# oracle's CASE order exactly. 'wav' must precede the bare RIFF rule;
# all rules fit in the first SNIFF_K bytes.
SNIFF_RULES = [
    ("image/png", 0, b"\x89PNG\r\n\x1a\n"),
    ("image/jpeg", 0, b"\xff\xd8\xff"),
    ("audio/wav", 8, b"WAVE"),          # guarded by RIFF at 0 below
    ("application/riff", 0, b"RIFF"),
    ("application/gzip", 0, b"\x1f\x8b"),
    ("application/zip", 0, b"PK\x03\x04"),
    ("application/pdf", 0, b"%PDF"),
    ("x-fake/image", 0, b"FAKI"),
    ("x-fake/audio", 0, b"FAKA"),
    ("x-fake/video", 0, b"FAKV"),
    ("text/html", 0, b"<"),
]
SNIFF_K = 12  # bytes of prefix any rule may inspect


def prefix_matrix(col, k: int = SNIFF_K):
    """(n, k) zero-padded uint8 prefix matrix + int64 lengths for a
    binary column — pure offsets math on the Arrow buffers (one gather,
    no per-row Python). The zero pad is safe for magic matching: every
    rule also requires length >= offset + len(magic)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_large_binary(arr.type):
        off_dt = np.int64
    else:
        off_dt = np.int32
    # slice-aware: honor arr.offset into the shared buffers
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dt,
                         count=len(arr) + 1 + arr.offset)[arr.offset:]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    starts = offs[:-1].astype(np.int64)
    lengths = (offs[1:].astype(np.int64) - starts)
    idx = starts[:, None] + np.arange(k, dtype=np.int64)[None, :]
    valid = np.arange(k, dtype=np.int64)[None, :] < lengths[:, None]
    mat = data[np.minimum(idx, max(len(data) - 1, 0))] if len(data) \
        else np.zeros((len(arr), k), np.uint8)
    mat = np.where(valid, mat, 0).astype(np.uint8)
    return mat, lengths


def sniff_mime(col) -> pa.Array:
    """Vectorized magic-byte classification of a binary column →
    string mime labels ('empty' for zero-length, 'null' for null
    slots — a failed fetch is not an empty payload — 'unknown'
    otherwise unmatched)."""
    import pyarrow.compute as pc
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
        else col
    mat, lengths = prefix_matrix(arr)
    n = len(lengths)
    out = np.full(n, "unknown", dtype=object)
    undecided = np.ones(n, dtype=bool)
    for mime, off, magic in SNIFF_RULES:
        pat = np.frombuffer(magic, dtype=np.uint8)
        m = (lengths >= off + len(pat)) & undecided
        if mime == "audio/wav":
            riff = np.frombuffer(b"RIFF", dtype=np.uint8)
            m &= (mat[:, 0:4] == riff[None, :]).all(axis=1)
        m &= (mat[:, off:off + len(pat)] == pat[None, :]).all(axis=1)
        out[m] = mime
        undecided &= ~m
    out[undecided & (lengths == 0)] = "empty"
    if arr.null_count:
        out[pc.is_null(arr).to_numpy(zero_copy_only=False)] = "null"
    return pa.array(out.tolist(), pa.string())


def mime_sniff_fn(batch: pa.Table) -> pa.Table:
    """map_batches body: (media_id, payload) → per-mime sufficient
    statistics, combiner-first (the groupby downstream merges per-batch
    partials, so only O(#mimes) rows leave each task)."""
    import pyarrow.compute as pc
    mime = sniff_mime(batch["payload"])
    # binary_length is null-preserving (a null payload contributes no
    # bytes, matching SUM/MIN/MAX-over-NULL on the oracle side) and
    # avoids a second prefix-matrix gather on the hot path
    nb = pc.cast(pc.binary_length(batch["payload"]), pa.int64())
    t = pa.table({"mime": mime, "n": pa.array(np.ones(len(mime), np.int64)),
                  "b": nb, "bmin": nb, "bmax": nb})
    return t.group_by("mime").aggregate(
        [("n", "sum"), ("b", "sum"), ("bmin", "min"), ("bmax", "max")])
