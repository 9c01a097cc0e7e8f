"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Spark treats media as opaque ``binary`` columns plus typed metadata; the
heavy decode/feature steps run as Arrow-batched ``mapInPandas`` UDFs.
Decoding is real for uncompressed container formats — 24-bit BMP images
and 16-bit PCM WAV audio are parsed with struct + numpy only
(``decode_bmp`` / ``decode_wav``, exercised end to end by
``real_decode_features``). Compressed codecs (JPEG/MP3/H.264) need
libraries NOT available in this container, so that arm is STUBBED:
``decode_media`` dispatches to a deterministic fake decoder and raises
``NotImplementedError`` if a compressed codec is requested. Everything
Spark-side — the binary schema, Arrow batch shapes, UDF signatures,
partitioning — is real and tested (tests/test_multimodal.py).

The testdata has no media table, so media blobs are synthesized in-query
from ``documents.text`` (utf-8 bytes). The synthesis is deterministic, so
the metadata query is still DuckDB-hash-checked end to end.

Scale notes (100 TB story):
- Binary payloads stay OFF the driver: every transform is executor-side;
  nothing here collects.
- mapInPandas streams Arrow record batches — peak executor memory is one
  batch of blobs, not one partition; cap
  spark.sql.execution.arrow.maxRecordsPerBatch when blobs are large
  (a 10k-row batch of 10 MB videos is 100 GB — set it to ~32).
- Frame sampling explodes rows executor-side; output partition count
  follows the input, so a repartition after heavy explode keeps
  downstream file sizes at the 128 MiB target.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

MEDIA_TYPES = ("image", "audio", "video")

FEAT_DIM = 4
FRAME_SAMPLE_EVERY = 3  # sample every 3rd synthetic frame


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Synthesize the canonical multimodal schema from documents:
    (doc_id, media_type string, media binary, media_meta struct)."""
    media_type = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % len(MEDIA_TYPES)).cast("int") + 1,
    )
    blob = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        media_type.alias("media_type"),
        blob.alias("media"),
        F.struct(
            F.octet_length(blob).alias("n_bytes"),
            (F.col("n_chars") % 32 + 1).cast("int").alias("n_frames"),
            F.lit("synthetic/v1").alias("codec"),
        ).alias("media_meta"),
    )


def _make_fake_decoder(feat_dim: int):
    """Build the deterministic stand-in codec as a CLOSURE.

    Marked STUB: replace with a real decoder (PIL/librosa/pyav) where the
    libraries exist; the Spark-side contract (bytes in, feat_dim floats
    out) is what the pipeline depends on.

    Returned as a nested function on purpose: cloudpickle serializes nested
    functions by value, so executor workers don't need this package on
    their PYTHONPATH (the driver's environment makes no such guarantee).
    """

    def fake_decode(blob: bytes) -> list[float]:
        import hashlib

        h = hashlib.sha256(blob).digest()
        return [
            int.from_bytes(h[i * 4 : i * 4 + 4], "big") / 2**32
            for i in range(feat_dim)
        ]

    return fake_decode


_fake_decode = _make_fake_decoder(FEAT_DIM)


def decode_media(blob: bytes, media_type: str, codec: str = "synthetic/v1") -> list[float]:
    if codec != "synthetic/v1":
        raise NotImplementedError(
            f"real codec {codec!r} for {media_type!r} is not available in this "
            "environment; only the deterministic synthetic decoder is wired"
        )
    return _fake_decode(blob)


# ---------------------------------------------------------------------------
# REAL decoders for uncompressed container formats — no codec libraries
# needed, just header parsing + numpy over the raw payload. Compressed
# codecs (JPEG/MP3/H.264) stay behind the NotImplementedError stub above;
# these two prove the executor-side decode contract on genuine binary
# formats end to end (synthesize → write binary column → mapInPandas
# decode → typed features).
# ---------------------------------------------------------------------------
def synthesize_bmp(payload: bytes, width: int = 8, height: int = 8) -> bytes:
    """A valid uncompressed 24-bit BMP (BITMAPINFOHEADER) whose pixel data
    cycles through ``payload`` — deterministic, real-format bytes."""
    import struct

    row_raw = width * 3
    row_padded = (row_raw + 3) & ~3
    pixel_bytes = row_padded * height
    src = payload or b"\x00"
    pixels = bytearray()
    k = 0
    for _ in range(height):
        for _ in range(row_raw):
            pixels.append(src[k % len(src)])
            k += 1
        pixels.extend(b"\x00" * (row_padded - row_raw))
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    return header + bytes(pixels)


def decode_bmp(blob: bytes) -> dict:
    """Parse an uncompressed 24-bit BMP: dimensions + per-channel means.
    Raises ValueError on malformed/unsupported headers (the honest failure
    mode a real pipeline needs — corrupt assets must not decode to junk)."""
    import struct

    import numpy as np

    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    row_padded = (width * 3 + 3) & ~3
    need = data_offset + row_padded * abs(height)
    if len(blob) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=row_padded * abs(height), offset=data_offset
    ).reshape(abs(height), row_padded)[:, : width * 3].reshape(abs(height), width, 3)
    b, g, r = (rows[..., i].mean() for i in range(3))  # BMP stores BGR
    return {
        "width": int(width),
        "height": int(abs(height)),
        "mean_r": float(r),
        "mean_g": float(g),
        "mean_b": float(b),
    }


def resize_bmp(blob: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of an uncompressed 24-bit BMP, re-encoded
    as the same real format — the resize stage of an image pipeline with
    no stub in the path. Vectorized: the pixel grid is one numpy gather
    on precomputed source indices (no per-pixel Python), so Arrow batches
    through mapInPandas stay C-speed.

    Nearest neighbor is the standard cheap pre-filter before a learned
    encoder's own resampling; the index math (src = floor((dst + 0.5) *
    in / out)) matches the conventional half-pixel-center convention."""
    import struct

    import numpy as np

    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"invalid target size {out_w}x{out_h}")
    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", blob, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    in_h = abs(height)
    row_padded = (width * 3 + 3) & ~3
    need = data_offset + row_padded * in_h
    if len(blob) < need:
        raise ValueError("truncated BMP pixel data")
    grid = np.frombuffer(
        blob, dtype=np.uint8, count=row_padded * in_h, offset=data_offset
    ).reshape(in_h, row_padded)[:, : width * 3].reshape(in_h, width, 3)
    if height < 0:
        # top-down BMP: normalize to the bottom-up storage the (positive
        # out_h) output header declares, else the image mirrors vertically
        grid = grid[::-1]
    ys = np.minimum(((np.arange(out_h) + 0.5) * in_h / out_h).astype(np.int64), in_h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * width / out_w).astype(np.int64), width - 1)
    out = grid[ys][:, xs]  # (out_h, out_w, 3) gather
    row_raw = out_w * 3
    out_padded = (row_raw + 3) & ~3
    rows = np.zeros((out_h, out_padded), dtype=np.uint8)
    rows[:, :row_raw] = out.reshape(out_h, row_raw)
    pixel_bytes = out_padded * out_h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, out_w, out_h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def synthesize_wav(payload: bytes, sample_rate: int = 8000) -> bytes:
    """A valid 16-bit PCM mono WAV whose samples are ``payload`` bytes
    recentered to signed 16-bit — deterministic, real-format audio."""
    import struct

    import numpy as np

    src = np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.int16)
    samples = ((src.astype(np.int32) - 128) * 256).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(samples))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(samples))
        + samples
    )


def resample_wav(blob: bytes, out_rate: int) -> bytes:
    """Nearest-sample resample of a 16-bit PCM mono WAV to ``out_rate``,
    re-encoded as the same real format — the audio twin of
    :func:`resize_bmp` (one numpy gather over precomputed source indices;
    a learned audio encoder does its own band-limited resampling, this is
    the cheap rate-normalization stage before it). Duration is preserved
    to within one sample period."""
    import struct

    import numpy as np

    if out_rate <= 0:
        raise ValueError(f"invalid target rate {out_rate}")
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, in_rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or bits != 16 or channels != 1:
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits}, ch={channels})"
        )
    samples = np.frombuffer(data, dtype="<i2")
    n_in = len(samples)
    n_out = max(1, round(n_in * out_rate / in_rate)) if n_in else 0
    if n_in:
        idx = np.minimum(
            ((np.arange(n_out) + 0.5) * n_in / n_out).astype(np.int64), n_in - 1
        )
        out = samples[idx].astype("<i2").tobytes()
    else:
        out = b""
    fmt_body = struct.pack("<HHIIHH", 1, 1, out_rate, out_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(out))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt_body))
        + fmt_body
        + b"data"
        + struct.pack("<I", len(out))
        + out
    )


def decode_wav(blob: bytes) -> dict:
    """Parse a 16-bit PCM WAV: rate, duration, RMS amplitude. Walks RIFF
    chunks properly (fmt may not be adjacent to data); raises ValueError
    on non-PCM or malformed input."""
    import struct

    import numpy as np

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid, size = blob[pos : pos + 4], struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _byte_rate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (format={audio_format}, bits={bits})")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float64)
    n = len(samples) // channels
    return {
        "sample_rate": int(sample_rate),
        "n_samples": int(n),
        "duration_s": float(n / sample_rate),
        "rms": float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0,
    }


def real_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL decode demo: synthesize genuine BMP/WAV blobs from
    document bytes (even doc_ids → image, odd → audio), carry them through
    a binary column, and decode executor-side with the format parsers
    above — the full production shape with no stub in the path."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def synth_and_decode(batches: Iterator) -> Iterator:
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                payload = text.encode("utf-8")
                if doc_id % 2 == 0:
                    blob = synthesize_bmp(payload)
                    d = decode_bmp(blob)
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media_type": "image",
                            "n_bytes": len(blob),
                            "f1": float(d["width"] * d["height"]),
                            "f2": d["mean_r"],
                        }
                    )
                else:
                    blob = synthesize_wav(payload)
                    d = decode_wav(blob)
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media_type": "audio",
                            "n_bytes": len(blob),
                            "f1": d["duration_s"],
                            "f2": d["rms"],
                        }
                    )
            out = pd.DataFrame(
                rows, columns=["doc_id", "media_type", "n_bytes", "f1", "f2"]
            )
            rows = []
            yield out

    return docs.mapInPandas(
        synth_and_decode,
        "doc_id long, media_type string, n_bytes long, f1 double, f2 double",
    )


def media_resize(
    spark: SparkSession, sf_dir: str, *, out_w: int = 4, out_h: int = 4
) -> DataFrame:
    """The resize stage end-to-end over REAL format bytes: synthesize
    genuine BMPs from image-doc payloads, nearest-neighbor resize
    executor-side (one numpy gather per image), and re-decode the OUTPUT
    blob — proving the resized bytes are themselves a valid asset for the
    next stage. Arrow-batched mapInPandas; no stub anywhere in the path."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") % 3 == 0  # the fixture's image assets
    )

    def resize_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                blob = synthesize_bmp(text.encode("utf-8"))
                src = decode_bmp(blob)
                resized = resize_bmp(blob, out_w, out_h)
                dst = decode_bmp(resized)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "in_w": src["width"],
                        "in_h": src["height"],
                        "out_w": dst["width"],
                        "out_h": dst["height"],
                        "out_bytes": len(resized),
                        "out_mean_r": dst["mean_r"],
                        "resized": resized,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "in_w", "in_h", "out_w", "out_h",
                    "out_bytes", "out_mean_r", "resized",
                ],
            )

    return docs.mapInPandas(
        resize_batches,
        "doc_id long, in_w int, in_h int, out_w int, out_h int, "
        "out_bytes long, out_mean_r double, resized binary",
    )


# ---------------------------------------------------------------------------
# ✓ Binary-column metadata: octet_length + md5 over real binary values —
# proves binary round-trips through the scan/expression layer.
# ---------------------------------------------------------------------------
@query(
    "media_metadata_stats",
    oracle=f"""
    SELECT
      CASE CAST(doc_id % 3 AS INTEGER)
        WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
      END AS media_type,
      count(*) AS n_assets,
      CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      -- DuckDB 1.0's md5 takes VARCHAR only; it hashes the utf-8 bytes,
      -- which is exactly what Spark's md5(binary media) sees.
      min(md5(text)) AS min_digest,
      CAST(max(n_chars % 32 + 1) AS INTEGER) AS max_frames
    FROM documents
    GROUP BY 1
    """,
)
def media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = with_media_columns(load_table(spark, sf_dir, "documents"))
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.col("media_meta.n_bytes")).cast("bigint").alias("total_bytes"),
        F.min(F.md5("media")).alias("min_digest"),
        F.max(F.col("media_meta.n_frames")).alias("max_frames"),
    )


# ---------------------------------------------------------------------------
# ◦ Feature extraction: Arrow-batched decode of the binary column. The
# decoder is the deterministic stub; the batch plumbing is production-real.
# ---------------------------------------------------------------------------
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = with_media_columns(load_table(spark, sf_dir, "documents"))
    decode = _make_fake_decoder(FEAT_DIM)  # closure: no package import on workers

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decode(blob) for blob in pdf["media"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(b) for b in pdf["media"]],
                    "feat": feats,
                }
            )
            yield out

    return media.mapInPandas(
        decode_batches,
        "doc_id long, media_type string, n_bytes long, feat array<double>",
    )


# ---------------------------------------------------------------------------
# ◦ Frame sampling: explode each video asset into sampled frame rows with
# byte-range slices — the shape of a video-pretraining loader.
# ---------------------------------------------------------------------------
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = with_media_columns(load_table(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "video"
    )
    decode = _make_fake_decoder(FEAT_DIM)  # closure: no package import on workers
    sample_every = FRAME_SAMPLE_EVERY

    def sample_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, blob, meta in zip(pdf["doc_id"], pdf["media"], pdf["media_meta"]):
                n_frames = int(meta["n_frames"])
                n_bytes = len(blob)
                for frame in range(0, n_frames, sample_every):
                    lo = (frame * n_bytes) // max(n_frames, 1)
                    hi = ((frame + 1) * n_bytes) // max(n_frames, 1)
                    chunk = bytes(blob[lo:hi])
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_index": frame,
                            "frame_bytes": chunk,
                            "frame_feat": decode(chunk),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_index", "frame_bytes", "frame_feat"])

    return media.mapInPandas(
        sample_batches,
        "doc_id long, frame_index int, frame_bytes binary, frame_feat array<double>",
    )


# ---------------------------------------------------------------------------
# ✓ Composite driver entry: whole-asset decode features + sampled video
# frames under one schema (item_kind 'asset'/'frame'). The driver-facing
# projection is scalar-only (the r2 harness canonicalizer cannot sort
# array<double> columns); the array-feature form stays the internal API
# (media_decode_features / media_frame_sample, unit-tested in
# tests/test_multimodal.py).
#
# Hash-checkable because the stub decoder is sha256-based: feat[0] is
# uint32(sha256(blob)[0:4]) / 2**32, an exact power-of-two division, so
# feat[0] * 2**32 recovers the integer exactly and DuckDB reproduces it
# from sha256 hex. The oracle slices TEXT where Spark slices BYTES — valid
# because the documents fixture is pure ASCII (asserted at sf0.01/0.1;
# sha256(VARCHAR) in DuckDB 1.0 hashes the utf-8 bytes, exactly what the
# executor-side decoder sees).
# ---------------------------------------------------------------------------
_MEDIA_PIPELINE_ORACLE = f"""
WITH media AS (
  SELECT doc_id,
         text,
         octet_length(encode(text)) AS total_bytes,
         CAST(n_chars % 32 + 1 AS INTEGER) AS n_frames
  FROM documents
),
assets AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
         END AS media_type,
         'asset' AS item_kind,
         CAST(-1 AS INTEGER) AS frame_index,
         CAST(total_bytes AS BIGINT) AS n_bytes,
         CAST(('0x' || substr(sha256(text), 1, 8)) AS BIGINT) AS feat0
  FROM media
),
video_frames AS (
  SELECT doc_id, text, total_bytes, n_frames,
         unnest(range(0, n_frames, {FRAME_SAMPLE_EVERY})) AS frame
  FROM media
  WHERE CAST(doc_id % 3 AS INTEGER) = 2
),
frames AS (
  SELECT doc_id,
         'video' AS media_type,
         'frame' AS item_kind,
         CAST(frame AS INTEGER) AS frame_index,
         CAST((frame + 1) * total_bytes // n_frames
              - frame * total_bytes // n_frames AS BIGINT) AS n_bytes,
         CAST(('0x' || substr(sha256(substr(
             text,
             CAST(frame * total_bytes // n_frames AS INTEGER) + 1,
             CAST((frame + 1) * total_bytes // n_frames
                  - frame * total_bytes // n_frames AS INTEGER)
         )), 1, 8)) AS BIGINT) AS feat0
  FROM video_frames
)
SELECT * FROM assets UNION ALL SELECT * FROM frames
"""


@query("media_pipeline", oracle=_MEDIA_PIPELINE_ORACLE)
def media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    # feat[0] == uint32 / 2**32 exactly (53-bit mantissa > 32 bits), so the
    # multiply-back is exact integer recovery, not a float round-trip.
    def _feat0(col: str):
        return (F.element_at(F.col(col), 1) * F.lit(float(2**32))).cast("bigint")

    assets = media_decode_features(spark, sf_dir).select(
        "doc_id",
        "media_type",
        F.lit("asset").alias("item_kind"),
        F.lit(-1).alias("frame_index"),
        "n_bytes",
        _feat0("feat").alias("feat0"),
    )
    frames = media_frame_sample(spark, sf_dir).select(
        "doc_id",
        F.lit("video").alias("media_type"),
        F.lit("frame").alias("item_kind"),
        "frame_index",
        F.octet_length("frame_bytes").cast("long").alias("n_bytes"),
        _feat0("frame_feat").alias("feat0"),
    )
    return assets.unionByName(frames)
