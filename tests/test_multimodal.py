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


def test_bmp_roundtrip_and_validation():
    from demo_iceberg_permanent_delete_spark.operators.multimodal import (
        decode_bmp,
        synthesize_bmp,
    )

    blob = synthesize_bmp(b"hello world", width=6, height=4)
    d = decode_bmp(blob)
    assert (d["width"], d["height"]) == (6, 4)
    # uniform payload -> exact channel means
    uni = decode_bmp(synthesize_bmp(bytes([7]), width=8, height=8))
    assert uni["mean_r"] == uni["mean_g"] == uni["mean_b"] == 7.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"JUNK" * 20)
    with _pytest.raises(ValueError, match="truncated"):
        decode_bmp(blob[:-8])


def test_wav_roundtrip_and_validation():
    from demo_iceberg_permanent_delete_spark.operators.multimodal import (
        decode_wav,
        synthesize_wav,
    )

    blob = synthesize_wav(bytes(range(200)), sample_rate=4000)
    d = decode_wav(blob)
    assert d["sample_rate"] == 4000 and d["n_samples"] == 200
    assert d["duration_s"] == 200 / 4000
    # silence (all 128 = zero after recenter) -> rms 0
    silent = decode_wav(synthesize_wav(bytes([128] * 50)))
    assert silent["rms"] == 0.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"RIFFxxxxJUNK")


def test_real_decode_features_end_to_end(spark):
    from demo_iceberg_permanent_delete_spark.operators.multimodal import (
        real_decode_features,
    )
    from tests.conftest import SF_SMOKE

    rows = real_decode_features(spark, SF_SMOKE).collect()
    assert len(rows) == 500
    kinds = {r["media_type"] for r in rows}
    assert kinds == {"image", "audio"}
    for r in rows:
        if r["media_type"] == "image":
            assert r["f1"] == 64.0  # 8x8 default
            assert 0.0 <= r["f2"] <= 255.0
        else:
            assert r["f1"] > 0 and r["f2"] >= 0.0


def test_resize_bmp_nearest_neighbor_exact():
    import struct

    from demo_iceberg_permanent_delete_spark.operators.multimodal import (
        decode_bmp,
        resize_bmp,
    )

    # Hand-built 4x4 gradient: pixel (y, x) = value 16*y + x in every
    # channel; nearest-neighbor 4->2 with half-pixel centers picks source
    # indices floor((d + 0.5) * 4 / 2) = {1, 3}.
    width = height = 4
    row_padded = (width * 3 + 3) & ~3
    pix = bytearray()
    for y in range(height):
        for x in range(width):
            pix.extend([16 * y + x] * 3)
        pix.extend(b"\x00" * (row_padded - width * 3))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    blob = header + bytes(pix)

    small = resize_bmp(blob, 2, 2)
    d = decode_bmp(small)
    assert (d["width"], d["height"]) == (2, 2)
    # selected values: rows {1,3} x cols {1,3} -> 17, 19, 49, 51
    assert d["mean_r"] == (17 + 19 + 49 + 51) / 4
    # upscale: every source pixel replicated, mean of all 16 values
    big = decode_bmp(resize_bmp(blob, 8, 8))
    assert (big["width"], big["height"]) == (8, 8)
    assert big["mean_g"] == sum(16 * y + x for y in range(4) for x in range(4)) / 16
    # 1x1 picks the center pixel floor(0.5*4) = index 2 -> value 16*2+2
    one = decode_bmp(resize_bmp(blob, 1, 1))
    assert one["mean_b"] == 34.0
    with pytest.raises(ValueError, match="invalid target"):
        resize_bmp(blob, 0, 2)
    with pytest.raises(ValueError, match="not a BMP"):
        resize_bmp(b"nope", 2, 2)


def test_media_resize_operator_round_trips(spark):
    from demo_iceberg_permanent_delete_spark.operators.multimodal import (
        decode_bmp,
        media_resize,
    )

    rows = media_resize(spark, SF_SMOKE, out_w=4, out_h=2).collect()
    assert rows and all(r["doc_id"] % 3 == 0 for r in rows)
    for r in rows:
        assert (r["in_w"], r["in_h"]) == (8, 8)
        assert (r["out_w"], r["out_h"]) == (4, 2)
        # output blob is itself a valid decodable BMP of the right size
        d = decode_bmp(bytes(r["resized"]))
        assert (d["width"], d["height"]) == (4, 2)
        assert abs(d["mean_r"] - r["out_mean_r"]) < 1e-9
        assert r["out_bytes"] == len(bytes(r["resized"]))


def test_resample_wav_rate_and_duration():
    from demo_iceberg_permanent_delete_spark.operators.multimodal import (
        decode_wav,
        resample_wav,
        synthesize_wav,
    )

    src = synthesize_wav(bytes(range(200)), sample_rate=8000)  # 25 ms
    down = decode_wav(resample_wav(src, 4000))
    assert down["sample_rate"] == 4000 and down["n_samples"] == 100
    assert abs(down["duration_s"] - 0.025) < 1 / 4000
    up = decode_wav(resample_wav(src, 16000))
    assert up["sample_rate"] == 16000 and up["n_samples"] == 400
    assert abs(up["duration_s"] - 0.025) < 1 / 16000
    # constant signal survives resampling exactly (values are gathered,
    # never interpolated)
    flat = synthesize_wav(bytes([200] * 64), sample_rate=8000)
    r = decode_wav(resample_wav(flat, 3000))
    assert r["rms"] == decode_wav(flat)["rms"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="invalid target"):
        resample_wav(src, 0)
    with _pytest.raises(ValueError, match="not a WAV"):
        resample_wav(b"junk", 4000)


def test_resize_bmp_top_down_input_keeps_orientation():
    import struct

    from demo_iceberg_permanent_delete_spark.operators.multimodal import (
        resize_bmp,
    )

    # 1x2 top-down BMP (negative height): top row value 10, bottom 200.
    width, height = 1, 2
    row_padded = (width * 3 + 3) & ~3
    pix = bytearray()
    for v in (10, 200):  # stored top-first in a top-down BMP
        pix.extend([v] * 3)
        pix.extend(b"\x00" * (row_padded - 3))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, width, -height, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    out = resize_bmp(header + bytes(pix), 1, 2)
    # output is bottom-up: first stored row must be the BOTTOM (200),
    # i.e. the image is not mirrored
    assert out[54] == 200 and out[54 + row_padded] == 10
