"""Driver-contract entries for the streaming surface.

Each query runs a bounded ``availableNow`` pass of a streaming pipeline
over ``events.parquet`` and returns the sink contents. In a single-batch
bounded run the watermark drops nothing, so complete/append-mode outputs
are fully deterministic and DuckDB-oracle-checkable — a stronger gate than
rows-only. (The late-data/watermark semantics that CAN'T be expressed in
batch SQL are exercised in tests/test_streaming.py with multi-batch
triggers.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import table_path
from demo_iceberg_permanent_delete_spark.streaming.pipelines import (
    read_event_stream,
    run_available_now,
    session_window_stream,
    interval_join_stream,
    streaming_dedup,
    tumbling_count_stream,
    user_profile_stream,
)

# Stateful-operator partition count for these bounded contract runs: each
# state partition costs a per-batch state-store commit (~50-200 ms of delta
# file + fsync), so 32 partitions of fixed overhead dwarf the ≤100k-row
# state itself (measured 7.1s → 1.9s on streaming_dedup at sf0.1). On an
# unbounded production stream this would be sized to state volume instead
# (see run_available_now docstring).
_STATE_PARTITIONS = 4
# applyInPandasWithState (the user-profile entry) prefers MORE state
# partitions: its per-batch cost is the Python worker round-trip per
# partition's groups, which parallelizes, where the JVM stateful ops'
# cost is the per-partition state-store commit, which doesn't. Swept
# round 12 (min-of-3, alternating): dedup+ivjoin 3.79 s @8 -> 2.57 s @4,
# tumbling 1.03 -> 0.89, session 1.21 -> 1.10, but user_profiles
# 1.78/2.33 @8 vs 2.48/3.12 @4 in both reps — so it keeps 8. RocksDB
# provider re-measured and still loses at this scale (4.27 s on the
# dedup composite). Full A/B table in BASELINE.md. Production sizing
# unchanged: state volume, not this bounded-run constant.
_PROFILE_STATE_PARTITIONS = 8


@query(
    "streaming_tumbling_counts",
    oracle="""
    SELECT
      -- CAST: DuckDB's to_timestamp is TIMESTAMPTZ, Spark windows are
      -- plain TIMESTAMP (same drift as tumbling_window_agg, CORRECTNESS_r01)
      CAST(to_timestamp((epoch_us(ts) // 600000000) * 600) AS TIMESTAMP) AS window_start,
      CAST(to_timestamp((epoch_us(ts) // 600000000) * 600 + 600) AS TIMESTAMP) AS window_end,
      event_type,
      count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, table_path(sf_dir, "events"))
    return run_available_now(
        tumbling_count_stream(stream),
        output_mode="complete",
        state_partitions=_STATE_PARTITIONS,
    )


@query(
    "streaming_session_windows",
    oracle="""
    WITH flagged AS (
      SELECT
        user_id, ts,
        CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 600000000
             THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    numbered AS (
      SELECT *,
        -- BIGINT pin: DuckDB windowed sum(int) is HUGEINT (grouped away
        -- below, but pinned against future reshapes — CORRECTNESS_r01)
        CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS session_seq
      FROM flagged
    )
    SELECT
      min(ts) AS session_start,
      -- session_window's end = last event time + gap
      max(ts) + INTERVAL 10 MINUTE AS session_end,
      user_id,
      count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, table_path(sf_dir, "events"))
    return run_available_now(
        session_window_stream(stream),
        output_mode="complete",
        state_partitions=_STATE_PARTITIONS,
    )


@query(
    "streaming_user_profiles",
    oracle="""
    WITH per_type AS (
      SELECT user_id, event_type, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    prof AS (
      SELECT
        user_id,
        count(*) AS n_events,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
        min(ts) AS first_ts,
        max(ts) AS last_ts
      FROM events GROUP BY 1
    )
    SELECT p.user_id, p.n_events, p.total_value, p.first_ts, p.last_ts,
           count(*) AS n_types, max(t.c) AS top_type_count
    FROM prof p JOIN per_type t ON p.user_id = t.user_id
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def streaming_user_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState, update mode): the
    per-user running profile. One bounded batch ⇒ each user emits exactly
    one row, equal to the batch aggregate the oracle computes."""
    stream = read_event_stream(spark, table_path(sf_dir, "events"))
    return run_available_now(
        user_profile_stream(stream),
        output_mode="update",
        state_partitions=_PROFILE_STATE_PARTITIONS,
    )


@query(
    "streaming_dedup_events",
    oracle="""
    SELECT 'dedup' AS part, event_id, ts, user_id, event_type, value, props,
           CAST(NULL AS BIGINT) AS id2, CAST(NULL AS TIMESTAMP) AS ts2
    FROM (
      SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn
      FROM events
    )
    WHERE rn = 1
    UNION ALL BY NAME
    SELECT 'ivjoin' AS part, p.event_id AS event_id, p.ts AS ts,
           p.user_id AS user_id, 'interval_pair' AS event_type,
           CAST(NULL AS DOUBLE) AS value, CAST(NULL AS VARCHAR) AS props,
           a.event_id AS id2, a.ts AS ts2
    FROM events p
    JOIN events a ON a.user_id = p.user_id
      AND epoch_us(a.ts) > epoch_us(p.ts)
      AND epoch_us(a.ts) <= epoch_us(p.ts) + 600000000
    WHERE p.event_type = 'purchase'
    """,
)
def streaming_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite: streaming exact dedup + stream-stream interval join
    ('ivjoin' part — every same-user activity within 10 min after each
    purchase). Bounded single-batch runs, so both are deterministic and
    the oracle is the equivalent batch SQL.

    The two bounded queries share nothing but the source path, so they
    run CONCURRENTLY (run_available_now_many, guide §2.6): each streaming
    query schedules its micro-batch from its own thread, and overlapping
    them hides one side's fixed costs (state-store commits, sink writes)
    behind the other's compute — measured 3.9 s → ~2.6 s at sf0.1 with
    results identical by construction (separate checkpoints and sinks)."""
    path = table_path(sf_dir, "events")
    purchases = read_event_stream(spark, path).filter(
        F.col("event_type") == "purchase"
    )
    activity = read_event_stream(spark, path)
    from demo_iceberg_permanent_delete_spark.streaming.pipelines import (
        run_available_now_many,
    )

    dedup_sink, ivjoin_sink = run_available_now_many(
        [
            streaming_dedup(read_event_stream(spark, path)),
            interval_join_stream(purchases, activity),
        ],
        output_modes="append",
        state_partitions=_STATE_PARTITIONS,
    )
    deduped = dedup_sink.select(
        F.lit("dedup").alias("part"),
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        "props",
        F.lit(None).cast("long").alias("id2"),
        F.lit(None).cast("timestamp").alias("ts2"),
    )
    pairs = ivjoin_sink.select(
        F.lit("ivjoin").alias("part"),
        F.col("purchase_id").alias("event_id"),
        F.col("p_ts").alias("ts"),
        "user_id",
        F.lit("interval_pair").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
        F.col("click_id").alias("id2"),
        F.col("c_ts").alias("ts2"),
    )
    return deduped.unionByName(pairs)
