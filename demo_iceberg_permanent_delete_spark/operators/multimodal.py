"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Spark treats media as opaque ``binary`` columns plus typed metadata; the
heavy decode/feature steps run as Arrow-batched ``mapInPandas`` UDFs. The
image/audio codec libraries are NOT available in this container, so the
codec call itself is STUBBED: ``decode_media`` dispatches to a
deterministic fake decoder (hash-seeded features) and raises
``NotImplementedError`` if a real codec is requested. Everything
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
# ◦ Composite driver entry: whole-asset decode features + sampled video
# frames under one schema (item_kind 'asset'/'frame'). Rows-only — the stub
# decoder's float features aren't SQL-expressible; both stages' plumbing is
# unit-tested in tests/test_multimodal.py. (One entry instead of two: the
# driver records at most 50 correctness rows.)
# ---------------------------------------------------------------------------
@query("media_pipeline", oracle=None)
def media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = media_decode_features(spark, sf_dir).select(
        "doc_id",
        "media_type",
        F.lit("asset").alias("item_kind"),
        F.lit(-1).alias("frame_index"),
        "n_bytes",
        "feat",
    )
    frames = media_frame_sample(spark, sf_dir).select(
        "doc_id",
        F.lit("video").alias("media_type"),
        F.lit("frame").alias("item_kind"),
        "frame_index",
        F.octet_length("frame_bytes").cast("long").alias("n_bytes"),
        F.col("frame_feat").alias("feat"),
    )
    return assets.unionByName(frames)
