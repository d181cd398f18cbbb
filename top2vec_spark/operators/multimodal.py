"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata.

Decoders: self-describing uncompressed formats decode FOR REAL here in
pure numpy — PPM (P6), 24-bit BMP, PCM-16 WAV — so the image/audio
pipelines are genuinely end-to-end in this container. Codec-bound
formats (JPEG/PNG via Pillow, MP3/FLAC/OGG via soundfile) decode
through import-guarded OPTIONAL-dependency seams (_optional_pil /
_optional_soundfile): on a production image with those libs installed
the branches run for real; only in a lib-less container do they raise
NotImplementedError (tests pin the guard both ways via monkeypatched
imports). A deterministic fake decoder covers plumbing tests at full
batch shape.

Pattern: binary payload + metadata struct travel together; decode /
feature-extract / resize / frame-sample are mapInPandas stages whose
Arrow batches carry numpy buffers, never per-row Python object churn.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL decoder for binary PPM (P6): pure numpy, no image lib.
    Returns (H, W, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval — whitespace/comment-delimited
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to EOL
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    return np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=i).reshape(
        h, w, 3
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """Inverse of decode_ppm (test/fixture helper)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL decoder for uncompressed 24-bit BMP: pure numpy header
    parse, bottom-up row order and 4-byte row padding handled.
    Returns (H, W, 3) uint8 RGB."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    bottom_up = h > 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR -> RGB


def _optional_pil():
    """Import seam for the optional Pillow dependency. Returns the
    ``PIL.Image`` module or None when Pillow is not installed.
    Monkeypatched both ways by tests/test_multimodal.py (the container
    has no Pillow; a production image usually does)."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


def _optional_soundfile():
    """Import seam for the optional soundfile dependency (libsndfile).
    Returns the ``soundfile`` module or None. Monkeypatched both ways
    by tests."""
    try:
        import soundfile  # type: ignore

        return soundfile
    except ImportError:
        return None


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatching REAL decoder: self-describing uncompressed formats
    (PPM P6, 24-bit BMP) decode here in pure numpy — genuinely
    end-to-end in this container. Codec-bound formats (JPEG/PNG)
    decode through the OPTIONAL Pillow seam when importable
    (``np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))``);
    only when Pillow is absent does that branch raise, so the
    NotImplementedError vanishes on a normal production image."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:3] == b"\xff\xd8\xff" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        Image = _optional_pil()
        if Image is not None:
            import io

            return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        raise NotImplementedError(
            "JPEG/PNG decode requires Pillow/libjpeg — not installed in this "
            "container (pip install pillow enables this branch); PPM/BMP "
            "decode natively, or use fake_decode_image for plumbing tests"
        )
    raise ValueError("unrecognized image payload")


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL decoder for PCM-16 WAV (RIFF): pure numpy chunk walk.
    Returns (samples int16 (n, channels), sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, channels, bits, data = 12, None, None, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        sz = int.from_bytes(payload[i + 4 : i + 8], "little")
        body = payload[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise NotImplementedError("only PCM-16 WAV supported")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, channels), rate


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Dispatching audio decoder: PCM-16 RIFF/WAVE decodes natively in
    pure numpy; anything else (MP3, FLAC, OGG, non-16-bit WAV) goes
    through the OPTIONAL soundfile seam when importable — only when
    libsndfile is absent does the codec branch raise. Returns
    (samples int16 (n, channels), sample_rate)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            return decode_wav_pcm16(payload)
        except NotImplementedError:
            pass  # non-16-bit WAV: fall through to soundfile
    sf = _optional_soundfile()
    if sf is not None:
        import io

        data, rate = sf.read(io.BytesIO(payload), dtype="int16", always_2d=True)
        return np.asarray(data, dtype=np.int16), int(rate)
    raise NotImplementedError(
        "compressed/non-PCM16 audio requires soundfile/libsndfile — not "
        "installed in this container (pip install soundfile enables this "
        "branch); PCM-16 WAV decodes natively"
    )


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """Inverse of decode_wav_pcm16 (test/fixture helper)."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    data = s.tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * channels * 2).to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    body = b"WAVEfmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def fake_decode_image(payload: bytes, h: int = 8, w: int = 8) -> np.ndarray:
    """Deterministic stand-in decoder: SHA256-seeded pixel grid with
    the same (H, W, 3) uint8 contract as a real decode."""
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def image_features(
    media: DataFrame, use_real_decoder: bool = False, h: int = 8, w: int = 8
) -> DataFrame:
    """Per-image feature vector (channel means/stds + 8-bin gray
    histogram). Batch shape: one numpy (N, H, W, 3) tensor per Arrow
    batch — the contract a GPU feature extractor would see."""
    decode = decode_image if use_real_decoder else (
        lambda p: fake_decode_image(p, h, w)
    )

    def batch(pdfs):
        for pdf in pdfs:
            imgs = np.stack([decode(bytes(p) if p is not None else b"") for p in pdf["payload"]])
            flat = imgs.reshape(imgs.shape[0], -1, 3).astype(np.float64)
            means = flat.mean(axis=1)
            stds = flat.std(axis=1)
            gray = flat.mean(axis=2)
            hists = np.stack(
                [np.histogram(g, bins=8, range=(0, 256))[0] for g in gray]
            ).astype(np.float64)
            hists /= np.maximum(hists.sum(axis=1, keepdims=True), 1)
            feats = np.hstack([means, stds, hists])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": [f.tolist() for f in feats],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        batch, "media_id long, features array<double>"
    )


def resize_images(
    media: DataFrame, out_h: int, out_w: int, use_real_decoder: bool = False
) -> DataFrame:
    """Nearest-neighbor resize on the decoded tensor, re-emitted as
    raw RGB bytes + updated meta (real pipeline: PIL resize)."""
    decode = decode_image if use_real_decoder else fake_decode_image

    def batch(pdfs):
        for pdf in pdfs:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                img = decode(bytes(p) if p is not None else b"")
                yi = (np.arange(out_h) * img.shape[0] // out_h).astype(int)
                xi = (np.arange(out_w) * img.shape[1] // out_w).astype(int)
                out = img[yi][:, xi]
                rows.append((mid, out.tobytes(), out_w, out_h))
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "width", "height"]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        batch, "media_id long, payload binary, width int, height int"
    )


def audio_features(media: DataFrame, use_real_decoder: bool = True) -> DataFrame:
    """Per-clip audio features over REAL PCM-16 WAV decode (pure
    numpy): duration, RMS, zero-crossing rate, peak. Fake path
    synthesizes a deterministic waveform with the same contract."""

    def fake_decode(payload: bytes):
        seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.integers(-32768, 32767, size=(1600, 1), dtype=np.int16), 16000

    decode = decode_audio if use_real_decoder else fake_decode

    def batch(pdfs):
        for pdf in pdfs:
            out = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                samples, rate = decode(bytes(p) if p is not None else b"")
                mono = samples.astype(np.float64).mean(axis=1)
                dur = mono.size / rate
                rms = float(np.sqrt(np.mean(mono**2))) if mono.size else 0.0
                zc = (
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if mono.size > 1
                    else 0.0
                )
                peak = float(np.abs(mono).max()) if mono.size else 0.0
                out.append((mid, dur, rms, zc, peak))
            yield pd.DataFrame(
                out,
                columns=["media_id", "duration_s", "rms", "zcr", "peak"],
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        batch,
        "media_id long, duration_s double, rms double, zcr double, peak double",
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_ts_ms)
    rows from duration metadata — 1 row -> N rows (UDTF shape via
    explode), the real pipeline decodes at those timestamps."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {
                    "mime": {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
                    "width": 640 if kind == "image" else None,
                    "height": 480 if kind == "image" else None,
                    "duration_ms": 5000 if kind != "image" else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
