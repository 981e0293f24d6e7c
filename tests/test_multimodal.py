"""Multimodal plumbing: metadata without decode; the stubbed decode path
raises unless the deterministic fake is requested; the fake path exercises
real Arrow batch shapes (1:1 features, 1:N frame sampling)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from nyu_search_engine_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, b"\x89PNG\r\n" + b"a" * 100),
        (1, b"RIFFxxxxWAVE" + b"b" * 9000),
        (2, b""),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_binary_meta(media):
    out = {r["id"]: r for r in multimodal.binary_meta(media, "media_id", "payload").collect()}
    assert out[0]["n_bytes"] == 106
    assert out[0]["header_hex"] == "89504E47"  # PNG magic
    assert out[1]["header_hex"] == "52494646"  # RIFF
    assert out[0]["payload_sha256"] == hashlib.sha256(b"\x89PNG\r\n" + b"a" * 100).hexdigest()
    assert out[2]["n_bytes"] == 0


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="real codec present")
def test_image_features_stub_raises_without_fake(media):
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        multimodal.image_features(media, "media_id", "payload").collect()


@pytest.mark.skipif(not _pil_available(), reason="no image library")
def test_image_features_real_path(spark):
    """Opportunistic real decode: active the day the image grows Pillow.
    An all-gray 16x16 PNG must band-mean to 0.5 (127.5/255) per band."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (16, 16), color=128).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                               "media_id long, payload binary")
    (row,) = multimodal.image_features(df, "media_id", "payload").collect()
    assert row["n_bytes"] == len(buf.getvalue())
    assert all(abs(v - 128.0 / 255.0) < 1e-12 for v in row["feat"])


def test_image_features_fake_path(media):
    out = {r["media_id"]: r for r in
           multimodal.image_features(media, "media_id", "payload",
                                     deterministic_fake=True).collect()}
    assert len(out[0]["feat"]) == 8
    assert out[0]["n_bytes"] == 106
    assert out[2]["feat"] == [0.0] * 8
    # determinism
    again = {r["media_id"]: r for r in
             multimodal.image_features(media, "media_id", "payload",
                                       deterministic_fake=True).collect()}
    assert out[1]["feat"] == again[1]["feat"]


def test_frame_sample_fake_path(media):
    out = multimodal.frame_sample(media, "media_id", "payload",
                                  every_n_bytes=4096,
                                  deterministic_fake=True).collect()
    per_media = {}
    for r in out:
        per_media.setdefault(r["media_id"], []).append(r)
    assert len(per_media[0]) == 1     # 106 bytes -> 1 frame
    assert len(per_media[1]) == 3     # 9012 bytes -> 3 frames
    assert len(per_media[2]) == 1     # empty payload -> 1 sentinel frame
    idxs = sorted(r["frame_idx"] for r in per_media[1])
    assert idxs == [0, 1, 2]
