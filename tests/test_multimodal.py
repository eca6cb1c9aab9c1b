"""Multimodal plumbing: decode stub contract, deterministic features,
frame batch shapes."""

from __future__ import annotations

import pytest

from jsonld_ex_spark.functions.multimodal_ops import (
    FRAME_SIZE,
    decode_media,
    media_features,
    media_frame_sample,
)

from tests.spark_fixtures import spark  # noqa: F401

pytestmark = pytest.mark.spark
SF = "/root/testdata/sf0.001"


def test_decode_stub_contract():
    assert decode_media(b"abc", "image/png") == b"abc"
    with pytest.raises(NotImplementedError):
        decode_media(b"abc", "image/png", strict=True)


def test_media_features_deterministic(spark):  # noqa: F811
    a = sorted(map(repr, media_features(spark, SF).collect()))
    b = sorted(map(repr, media_features(spark, SF).collect()))
    assert a == b
    # exploded shape: exactly 8 (doc_id, feature_idx, value) rows per doc
    rows = media_features(spark, SF).where("doc_id = 0").orderBy("feature_idx").collect()
    assert [r["feature_idx"] for r in rows] == list(range(8))
    assert all(r["value"] >= 0 for r in rows)


def test_frame_sample_shapes(spark):  # noqa: F811
    frames = media_frame_sample(spark, SF)
    rows = frames.where("doc_id = 2").orderBy("frame_idx").collect()
    assert rows, "doc 2 is video/mp4 and must have frames"
    # all frames except the last are exactly FRAME_SIZE bytes
    for r in rows[:-1]:
        assert len(r["frame"]) == FRAME_SIZE
    assert 0 < len(rows[-1]["frame"]) <= FRAME_SIZE
    assert [r["frame_idx"] for r in rows] == list(range(len(rows)))
    # frames reassemble to the original payload
    payload = b"".join(r["frame"] for r in rows)
    text = spark.read.parquet(f"{SF}/documents.parquet").where("doc_id = 2").first()["text"]
    assert payload == text.encode()


def test_decode_media_real_wav():
    """A REAL wav payload decodes to its PCM frames through the stdlib
    wave decoder (decode path is live, not a stub, for audio/wav);
    feature extraction then runs over SAMPLES, not file bytes."""
    import io
    import wave

    import numpy as np

    from jsonld_ex_spark.functions.multimodal_ops import N_FEATURES, decode_media

    pcm = bytes(range(256)) * 4  # 1024 bytes of deterministic "samples"
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm)
    payload = buf.getvalue()
    assert decode_media(payload, "audio/wav") == pcm  # real decode
    assert decode_media(payload, "audio/wav", strict=True) == pcm
    # the feature histogram is over the DECODED bytes
    hist = np.bincount(
        np.frombuffer(decode_media(payload, "audio/wav"), dtype=np.uint8) % N_FEATURES,
        minlength=N_FEATURES,
    )
    assert hist.sum() == len(pcm)


def test_decode_media_fake_path_is_deterministic():
    """Synthetic payloads (utf-8 text, no codec magic) take the fake
    path unchanged — the invariant the gate oracles rely on — and
    strict mode raises for them."""
    import pytest as _pytest

    from jsonld_ex_spark.functions.multimodal_ops import decode_media

    payload = "just some document text".encode()
    for mt in ("audio/wav", "image/png", "video/mp4"):
        assert decode_media(payload, mt) == payload
        with _pytest.raises(NotImplementedError):
            decode_media(payload, mt, strict=True)
