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
