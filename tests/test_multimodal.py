"""Multimodal plumbing checks: binary schema round-trip, deterministic
stub decode, Arrow batch shapes, frame-sampling explode arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.multimodal import (
    FEAT_DIM,
    FRAME_SAMPLE_EVERY,
    decode_media,
    media_decode_features,
    media_frame_sample,
    with_media_columns,
)
from demo_iceberg_permanent_delete_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_media_schema_and_binary_roundtrip(spark):
    media = with_media_columns(load_table(spark, SF_SMOKE, "documents"))
    assert dict(media.dtypes)["media"] == "binary"
    row = media.orderBy("doc_id").first()
    assert isinstance(row["media"], (bytes, bytearray))
    assert row["media_meta"]["n_bytes"] == len(row["media"])
    assert row["media_type"] in ("image", "audio", "video")


def test_decode_is_deterministic_and_stub_raises(spark):
    feats1 = decode_media(b"payload", "image")
    feats2 = decode_media(b"payload", "image")
    assert feats1 == feats2 and len(feats1) == FEAT_DIM
    assert all(0.0 <= f < 1.0 for f in feats1)
    with pytest.raises(NotImplementedError):
        decode_media(b"payload", "image", codec="jpeg")


def test_decode_features_schema_and_determinism(spark):
    out = media_decode_features(spark, SF_SMOKE)
    assert [f.simpleString() for f in out.schema.fields] == [
        "doc_id:bigint",
        "media_type:string",
        "n_bytes:bigint",
        "feat:array<double>",
    ]
    rows = {r["doc_id"]: r for r in out.collect()}
    docs = load_table(spark, SF_SMOKE, "documents")
    assert len(rows) == docs.count()
    # Cross-check one row against a driver-side decode of the same bytes.
    sample = docs.orderBy("doc_id").first()
    assert rows[sample["doc_id"]]["feat"] == pytest.approx(
        decode_media(sample["text"].encode(), "any")
    )


def test_frame_sample_counts(spark):
    media = with_media_columns(load_table(spark, SF_SMOKE, "documents")).filter(
        F.col("media_type") == "video"
    )
    expected = sum(
        -(-int(r["media_meta"]["n_frames"]) // FRAME_SAMPLE_EVERY)
        for r in media.select("media_meta").collect()
    )
    out = media_frame_sample(spark, SF_SMOKE)
    assert out.count() == expected
    first = out.orderBy("doc_id", "frame_index").first()
    assert first["frame_index"] == 0
    assert isinstance(first["frame_bytes"], (bytes, bytearray))
    assert len(first["frame_feat"]) == FEAT_DIM
