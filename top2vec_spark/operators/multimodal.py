"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (image/audio libs are not in this
container — see ``decode_image``): the Spark-side plumbing — schema,
partitioning, Arrow UDF signatures, batch shapes — is real and tested
with a deterministic fake decoder, so swapping in PIL/torchaudio on a
real cluster is a one-function change.

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


def decode_image(payload: bytes) -> np.ndarray:
    """REAL-DECODER SLOT. On a production cluster:

        from PIL import Image; import io
        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))

    Not available in this container -> raise, callers use
    fake_decode_image for tests/benches.
    """
    raise NotImplementedError(
        "image decode requires PIL/libjpeg — not in this container; "
        "use fake_decode_image (deterministic) for plumbing tests"
    )


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
