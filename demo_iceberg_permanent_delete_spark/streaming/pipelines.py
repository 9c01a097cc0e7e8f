"""Streaming pipelines over event data (SURVEY.md §7 Phase 5, §2.8 X5).

Design: every pipeline is a *builder* taking a streaming DataFrame and
returning the transformed streaming DataFrame — identical code paths for a
bounded ``availableNow`` test run and an unbounded production run. The file
source + watermark + window/state operators are the Spark-native answer to
the reference's batch-only summary loop (file_summary_utils.py's
minute-bucket counts re-expressed as a live stream).

Scale notes (100 TB/day story):
- The file source scales by listing parallelism + maxFilesPerTrigger
  (bounded micro-batches, no unbounded memory).
- Watermarks bound all state: window aggregation state is dropped once the
  watermark passes the window end; dedup state once it passes the event
  time. Without them, 100 TB/day of keys would OOM the state store.
- ``session_window`` merges state per key; keys are user_ids (high
  cardinality) so state shards evenly across partitions; shuffle is
  hash(user_id) — same partitioning batch sessionization uses.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # raw nanos (see sources/tables.py)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

WATERMARK = "10 minutes"
WINDOW = "10 minutes"
SESSION_GAP = "10 minutes"


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events.parquet-shaped data.

    ``ts`` arrives as parquet TIMESTAMP(NANOS); the declared schema reads it
    as raw nanos long (the streaming source cannot take per-query confs) and
    converts to a micros timestamp — same semantics as the batch loader.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # The file source derives basePath from a non-glob input path and
        # requires it to be a directory; wrapping the last character in a
        # one-character glob class makes the source treat the parent as
        # basePath while matching exactly this file.
        path = f"{path[:-1]}[{path[-1]}]"
    df = reader.parquet(path)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_count_stream(events: DataFrame) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (append mode:
    a window is emitted exactly once, when the watermark passes its end)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_window_stream(events: DataFrame) -> DataFrame:
    """Watermarked session windows per user (gap-based, merging state)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", SESSION_GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def streaming_dedup(events: DataFrame) -> DataFrame:
    """Streaming exact dedup on event_id with watermark-bounded state:
    duplicates arriving within the watermark horizon are dropped; state is
    evicted after it — the streaming twin of operators/dedup.dedup_exact."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(
    stream_df: DataFrame,
    *,
    output_mode: str = "append",
    timeout_s: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a bounded (availableNow) pass of the stream into a memory sink
    and return the sink contents as a batch DataFrame.

    ``state_partitions`` sizes the stateful-operator partitioning
    (``spark.sql.shuffle.partitions`` captured at query start — Spark pins
    it into the checkpoint, so it must be chosen *before* the first batch).
    Every state partition pays a per-batch state-store commit (delta file +
    fsync); measured at sf0.1 this fixed cost dominates: 32 partitions →
    7.1s, 8 → 1.9s for the same 100k-row dedup. Size it to expected state
    volume: thousands on a real cluster, single digits for a bounded local
    run. ``None`` keeps the session's setting."""
    spark = stream_df.sparkSession
    name = f"sink_{uuid.uuid4().hex[:12]}"
    checkpoint = os.path.join(tempfile.mkdtemp(prefix="ckpt_"), "cp")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if state_partitions is not None:
            # Spark reads this at first-batch planning, not at .start() —
            # keep it set until the bounded query terminates.
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        try:
            if not q.awaitTermination(timeout_s):
                raise TimeoutError(f"stream {name} did not finish in {timeout_s}s")
        finally:
            if q.isActive:
                q.stop()
    finally:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", before)
    return spark.table(name)
