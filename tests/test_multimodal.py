"""Multimodal plumbing: schemas, batch shapes, deterministic fake
decode (real decoders stubbed — not in this container)."""

from __future__ import annotations

import numpy as np
import pytest

from top2vec_spark.operators.multimodal import (
    decode_image,
    fake_decode_image,
    image_features,
    resize_images,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, 30).cache()


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff")


def test_fake_decode_deterministic():
    a = fake_decode_image(b"payload")
    b = fake_decode_image(b"payload")
    np.testing.assert_array_equal(a, b)
    assert a.shape == (8, 8, 3) and a.dtype == np.uint8
    assert not np.array_equal(a, fake_decode_image(b"other"))


def test_image_features_shape_and_determinism(media):
    out = image_features(media).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images
    for r in out:
        assert len(r["features"]) == 3 + 3 + 8  # means + stds + hist
        hist = r["features"][6:]
        assert sum(hist) == pytest.approx(1.0)
    # rerun identical
    out2 = image_features(media).collect()
    assert {r["media_id"]: r["features"] for r in out} == {
        r["media_id"]: r["features"] for r in out2
    }


def test_resize_contract(media):
    out = resize_images(media, 4, 6).collect()
    for r in out:
        assert r["width"] == 6 and r["height"] == 4
        assert len(bytes(r["payload"])) == 4 * 6 * 3


def test_sample_frames(media):
    out = sample_frames(media, every_ms=1000).collect()
    vids = media.filter("kind = 'video'").count()
    # duration 5000ms, every 1000ms -> ts 0..4999 step 1000 = 5 frames
    assert len(out) == vids * 5
    ts = sorted(r["frame_ts_ms"] for r in out if r["media_id"] == out[0]["media_id"])
    assert ts == [0, 1000, 2000, 3000, 4000]


def test_real_ppm_bmp_decode_roundtrip():
    """Pure-numpy decoders: PPM round-trips exactly; BMP (bottom-up,
    padded rows, BGR) decodes to the same RGB tensor."""
    import numpy as np

    from top2vec_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    assert (decode_image(encode_ppm(img)) == img).all()  # dispatch

    # hand-build a 24-bit bottom-up BMP of the same image
    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = b""
    for y in range(h - 1, -1, -1):
        row = img[y][:, ::-1].tobytes()  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    header = (
        b"BM" + (54 + len(rows)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(rows).to_bytes(4, "little")
        + b"\x00" * 16
    )
    assert (decode_bmp(header + rows) == img).all()
    assert (decode_image(header + rows) == img).all()


def test_real_image_features_over_ppm(spark):
    """image_features with the REAL decoder over PPM payloads: channel
    means match numpy exactly."""
    import numpy as np

    from top2vec_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_ppm,
        image_features,
    )

    rng = np.random.default_rng(4)
    imgs = {i: rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8) for i in range(6)}
    rows = [
        (i, "image", bytearray(encode_ppm(im)),
         {"mime": "image/x-portable-pixmap", "width": 8, "height": 8,
          "duration_ms": None})
        for i, im in imgs.items()
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {
        r["media_id"]: r["features"]
        for r in image_features(media, use_real_decoder=True).collect()
    }
    for i, im in imgs.items():
        expect = im.reshape(-1, 3).mean(axis=0)
        got = np.array(feats[i][:3])
        assert np.allclose(got, expect)


def test_real_wav_decode_and_features(spark):
    import math

    import numpy as np

    from top2vec_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    rate = 8000
    t = np.arange(rate)  # 1 second
    tone = (10000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    payload = encode_wav_pcm16(tone, rate)
    samples, r2 = decode_wav_pcm16(payload)
    assert r2 == rate and (samples[:, 0] == tone).all()

    media = spark.createDataFrame(
        [(0, "audio", bytearray(payload),
          {"mime": "audio/wav", "width": None, "height": None,
           "duration_ms": 1000})],
        MEDIA_SCHEMA,
    )
    f = audio_features(media).collect()[0]
    assert abs(f["duration_s"] - 1.0) < 1e-9
    # RMS of a sine = amplitude / sqrt(2)
    assert abs(f["rms"] - 10000 / math.sqrt(2)) / 10000 < 0.01
    # 440 Hz tone crosses zero ~880 times/s -> zcr ~ 880/8000
    assert abs(f["zcr"] - 880 / 8000) < 0.01


def test_optional_pil_seam_both_ways(monkeypatch):
    """The JPEG/PNG branch must use Pillow WHEN IMPORTABLE and raise
    the documented NotImplementedError only when it is not (round-4
    verdict item 6). The container has no Pillow, so the importable
    direction is exercised through a stub module with PIL's decode
    surface (Image.open(...).convert('RGB') -> array-able)."""
    from top2vec_spark.operators import multimodal as mm

    jpeg_payload = b"\xff\xd8\xff" + b"restofjpeg"
    want = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)

    class _FakeDecoded:
        def convert(self, mode):
            assert mode == "RGB"
            return want  # np.asarray(ndarray) is identity

    class _FakeImageModule:
        @staticmethod
        def open(buf):
            assert buf.read(3) == b"\xff\xd8\xff"
            return _FakeDecoded()

    # importable direction: the seam returns a module -> branch decodes
    monkeypatch.setattr(mm, "_optional_pil", lambda: _FakeImageModule)
    np.testing.assert_array_equal(mm.decode_image(jpeg_payload), want)

    # absent direction: the seam returns None -> documented raise
    monkeypatch.setattr(mm, "_optional_pil", lambda: None)
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.decode_image(jpeg_payload)

    # and the real seam never raises ImportError itself
    assert mm._optional_pil() is None or mm._optional_pil() is not None


def test_optional_soundfile_seam_both_ways(monkeypatch):
    """decode_audio: PCM-16 WAV decodes natively; anything else routes
    through the soundfile seam when importable, else raises the
    documented NotImplementedError."""
    from top2vec_spark.operators import multimodal as mm

    # native path unaffected by the seam
    tone = (1000 * np.sin(np.arange(100))).astype(np.int16)
    wav = mm.encode_wav_pcm16(tone, 8000)
    monkeypatch.setattr(mm, "_optional_soundfile", lambda: None)
    samples, rate = mm.decode_audio(wav)
    assert rate == 8000 and (samples[:, 0] == tone).all()

    mp3_payload = b"ID3\x04fakemp3body"
    with pytest.raises(NotImplementedError, match="soundfile"):
        mm.decode_audio(mp3_payload)

    want = np.full((7, 2), 5, dtype=np.int16)

    class _FakeSoundfile:
        @staticmethod
        def read(buf, dtype, always_2d):
            assert dtype == "int16" and always_2d
            assert buf.read(3) == b"ID3"
            return want, 44100

    monkeypatch.setattr(mm, "_optional_soundfile", lambda: _FakeSoundfile)
    samples, rate = mm.decode_audio(mp3_payload)
    assert rate == 44100
    np.testing.assert_array_equal(samples, want)
