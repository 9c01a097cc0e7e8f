"""Window / analytic operators (SURVEY.md §2.8 X5/X6).

The reference has no window functions (§2.8 — its pandas diff engine is the
closest analog), but the north-star extension surface requires event-stream
analytics: ranking windows, running frames, tumbling time windows, and
lag-gap sessionization over the ``events`` table.

Scale notes (100 TB story):
- Every window here partitions by a high-cardinality key (``user_id``,
  ``o_custkey``, ``o_orderpriority``) — one hash shuffle, then the window
  evaluates within partitions with no further exchange. A window with a
  global ORDER BY and no PARTITION BY would serialize on one task; none of
  these do that.
- Sessionization is two window passes over the *same* partitioning
  (lag → boundary flag → running sum), so Catalyst plans a single Exchange
  reused by both Window operators — check `.explain`: one
  ``Exchange hashpartitioning(user_id)`` feeding both.
- Tumbling windows are a pure projection (epoch-aligned bucketing), not a
  shuffle: the only exchange is the final aggregation's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.functions.scalars import dsum
from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

# Session gap: 10 minutes, in microseconds (epoch-µs arithmetic keeps the
# DuckDB comparison integer-exact; casting timestamps to float seconds
# would not be).
SESSION_GAP_US = 10 * 60 * 1_000_000


# ---------------------------------------------------------------------------
# X6: ranking/analytic battery — rank, dense_rank, row_number, lag, lead
# over a keyed partition PLUS a running aggregate with an explicit ROWS
# frame, in one scan with two window specs (one driver entry — the driver
# records at most 50 correctness rows). Unique tiebreak (o_orderkey) keeps
# every ranked value deterministic for the oracle; the running sum is
# decimal-exact (float running sums would drift between engines by rounding
# asymmetry even with the frame pinning order). Two different partitionings
# ⇒ two exchanges, same as the queries run separately — packing adds no
# shuffle.
# ---------------------------------------------------------------------------
@query(
    "ranking_running_windows",
    oracle="""
    SELECT
      o_orderkey,
      o_custkey,
      o_orderpriority,
      o_totalprice,
      o_orderdate,
      rank()       OVER w AS price_rank,
      dense_rank() OVER w AS price_dense_rank,
      row_number() OVER w AS price_row_number,
      lag(o_totalprice)  OVER w AS prev_price,
      lead(o_totalprice) OVER w AS next_price,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate ASC, o_orderkey ASC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def ranking_running_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderpriority",
        "o_totalprice",
        "o_orderdate",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.row_number().over(w).alias("price_row_number"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
        .over(w_run)
        .cast("double")
        .alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# X5 (batch): time-window aggregation composite over events via F.window —
# a tumbling 10-minute part plus a sliding (hopping) 10-minute/5-minute
# part, discriminated by `win_kind`. Both are epoch-aligned, so the DuckDB
# twin is integer epoch math; the sliding twin enumerates each row's two
# member windows (duration/slide = 2) with an unnest cross join — exactly
# what Spark's TimeWindow expression generates internally.
#
# Scale note: Spark plans the sliding window as a Generate (explode of the
# per-row window list) followed by the same partial/final hash aggregate as
# the tumble — duplication factor = duration/slide (2 here), map-side
# combined before the single exchange. No extra shuffle vs the tumble.
# ---------------------------------------------------------------------------
@query(
    "tumbling_window_agg",
    oracle="""
    SELECT
      'tumble' AS win_kind,
      -- DuckDB's to_timestamp returns TIMESTAMP WITH TIME ZONE; pin plain
      -- TIMESTAMP to match Spark's window().start (CORRECTNESS_r01 drift)
      CAST(to_timestamp((epoch_us(ts) // 600000000) * 600) AS TIMESTAMP) AS window_start,
      event_type,
      count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 2, 3
    UNION ALL
    SELECT
      'slide' AS win_kind,
      CAST(to_timestamp(((epoch_us(ts) // 300000000) - hop.i) * 300) AS TIMESTAMP) AS window_start,
      event_type,
      count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) hop
    GROUP BY 2, 3
    """,
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # ONE scan + one row-proportional exchange: aggregate to the common
    # 5-minute grid first (slide = gcd(duration, hop)), then derive both
    # window kinds from the tiny base frame — the tumble rolls up pairs of
    # buckets, the slide explodes each bucket into its two member windows.
    # Decimal re-aggregation is associative-exact, so this equals
    # aggregating the raw rows per window directly (which is what r2 did,
    # at the cost of scanning events twice). The follow-up aggregates
    # exchange ~|buckets × types| rows, not ~|events|.
    from demo_iceberg_permanent_delete_spark.functions.scalars import dec

    base = (
        ev.groupBy(F.window("ts", "5 minutes").alias("w5"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(dec("value")).alias("dv"))
        .select(F.col("w5.start").alias("b_start"), "event_type", "n", "dv")
    )

    def rollup(bucketed: DataFrame, kind: str) -> DataFrame:
        return (
            bucketed.groupBy("window_start", "event_type")
            .agg(
                F.sum("n").alias("n_events"),
                F.sum("dv").cast("double").alias("total_value"),
            )
            .select(
                F.lit(kind).alias("win_kind"),
                "window_start",
                "event_type",
                "n_events",
                "total_value",
            )
        )

    tumble = rollup(
        base.withColumn(
            "window_start",
            F.timestamp_seconds(F.floor(F.unix_timestamp("b_start") / 600) * 600),
        ),
        "tumble",
    )
    slide = rollup(
        base.select(
            F.explode(
                F.array(
                    F.col("b_start"),
                    F.col("b_start") - F.expr("INTERVAL 5 MINUTES"),
                )
            ).alias("window_start"),
            "event_type",
            "n",
            "dv",
        ),
        "slide",
    )
    return tumble.unionByName(slide)


# ---------------------------------------------------------------------------
# X5: lag-gap sessionization — the classic two-pass window program:
#   1. lag(ts) per user → boundary flag where gap > 10 min (or first event);
#   2. running sum of flags → session sequence number;
#   3. aggregate per (user, session).
# ---------------------------------------------------------------------------
@query(
    "sessionization",
    oracle=f"""
    WITH flagged AS (
      SELECT
        user_id, event_id, ts, value,
        CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
               OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
             THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    numbered AS (
      SELECT *,
        -- DuckDB's windowed sum(int) is HUGEINT (int128 → float64 via
        -- pandas); pin BIGINT to match Spark (CORRECTNESS_r01 drift)
        CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      FROM flagged
    )
    SELECT
      user_id,
      session_seq,
      count(*) AS n_events,
      min(ts) AS session_start,
      max(ts) AS session_end,
      CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(w)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(prev_us.isNull() | (us - prev_us > SESSION_GAP_US), 1)
        .otherwise(0)
        .alias("is_start"),
    )
    numbered = flagged.withColumn("session_seq", F.sum("is_start").over(frame))
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dsum("value").alias("session_value"),
    )
