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
