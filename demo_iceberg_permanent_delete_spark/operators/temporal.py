"""Temporal joins: as-of join and bounded range join (extension surface).

The reference has no join beyond equi-joins (SURVEY.md §2.8 — "no sort-merge
or range/as-of join"), but event-time analytics at 100 TB needs both:

- **As-of join** — for each left row, the latest right row with the same key
  and ``right_time <= left_time`` (attribution: "which purchase preceded this
  event"). A naive SQL formulation is an inequality join that Spark plans as
  BroadcastNestedLoopJoin — O(n·m) per key and a driver-killer at scale. The
  scalable shape used here is *union + running last*: tag both sides, union,
  then one window pass per key ordered by (time, side) carrying the last
  non-null right payload forward. Exactly one hash Exchange on the key, no
  join operator at all, and no per-key blowup regardless of skew.
- **Bounded range join** — aggregate right rows falling in a fixed-length
  window after each left anchor ("activity within 10 minutes of purchase").
  The scalable shape is *duration-width bucketing*: with bucket width equal
  to the window length, every matching point lies in the anchor's bucket or
  the next one, so exploding each anchor to 2 bucket ids turns the interval
  predicate into an equi-join on (key, bucket) with a residual filter —
  a shuffled hash/sort-merge join, never a nested loop. Each point lives in
  exactly one bucket, so no pair is produced twice.

Both are generic helpers plus one label-packed driver query over ``events``
(the driver records at most 50 correctness rows; see __spark_entry__).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.functions.scalars import dsum
from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

# Post-anchor activity window: 10 minutes, in epoch-microseconds (integer
# arithmetic keeps the DuckDB comparison exact; float seconds would not).
RANGE_WINDOW_US = 10 * 60 * 1_000_000

# Resample grid step: 1 hour in epoch-microseconds.
RESAMPLE_STEP_US = 3600 * 1_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: Mapping[str, str],
) -> DataFrame:
    """Backward-inclusive as-of join: attach to each left row the payload of
    the latest right row with the same ``on`` key and right_time <= left_time.

    ``payload`` maps output column name -> right-side column. Unmatched left
    rows keep every payload column NULL. The right side must be unique per
    (key, time) — dedupe upstream (ties would make "the latest" ambiguous in
    any engine).

    Scale shape: one Exchange hashpartitioning(on) + sort; window evaluation
    is streaming within each partition. No join operator, no nested loop.
    """
    r = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(src).alias(f"__p_{out}") for out, src in payload.items()],
    )
    l = left.withColumn("__t", F.col(left_time)).withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # At equal time the right row sorts first (side 0 < 1) => inclusive <=.
    w = (
        Window.partitionBy(on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for out in payload:
        u = u.withColumn(out, F.last(f"__p_{out}", ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).drop(
        "__t", "__side", *[f"__p_{out}" for out in payload]
    )


def range_agg_join(
    anchors: DataFrame,
    points: DataFrame,
    on: str,
    anchor_time_us: str,
    point_time_us: str,
    window_us: int,
    aggs: Mapping[str, Column],
) -> DataFrame:
    """Aggregate, per anchor row, the points with the same key falling
    strictly after the anchor and within ``window_us`` of it:
    ``anchor_t < point_t <= anchor_t + window_us`` (epoch-µs columns).

    Returns the anchors' columns plus one column per ``aggs`` entry
    (aggregations evaluated over each anchor's matched points; COUNT is 0 and
    sums are NULL for anchors with no match — left-join semantics).

    Scale shape: bucket width == window length, so a matching point is always
    in the anchor's bucket or the next; anchors explode to those 2 bucket ids
    and the interval predicate becomes an equi-join on (key, bucket) plus a
    residual time filter. Planned as a shuffled equi-join — never
    BroadcastNestedLoopJoin. Each point has exactly one bucket id, so no
    (anchor, point) pair joins twice and no post-join dedup is needed.
    """
    # Integer division (epoch-µs are non-negative) — float floor(a/b) is
    # precision-fragile near 2^53.
    a_bucket = F.expr(f"{anchor_time_us} div {window_us}")
    a = anchors.withColumn("__b", F.explode(F.array(a_bucket, a_bucket + 1)))
    p = points.select(
        F.col(on).alias("__p_key"),
        F.expr(f"{point_time_us} div {window_us}").alias("__p_b"),
        F.col(point_time_us).alias("__p_t"),
        *[c for c in points.columns if c not in (on, point_time_us)],
    )
    cond = (
        (F.col(on) == F.col("__p_key"))
        & (F.col("__b") == F.col("__p_b"))
        & (F.col("__p_t") > F.col(anchor_time_us))
        & (F.col("__p_t") <= F.col(anchor_time_us) + F.lit(window_us))
    )
    joined = a.join(p, cond, "left")
    group_cols = [c for c in anchors.columns]
    return joined.groupBy(*group_cols).agg(
        *[agg.alias(out) for out, agg in aggs.items()]
    )


def resample_ffill(
    df: DataFrame,
    *,
    key: str,
    time_us_col: str,
    id_col: str,
    value_col: str,
    step_us: int = RESAMPLE_STEP_US,
) -> DataFrame:
    """Fixed-grid resampling with forward fill: per ``key``, one row per
    ``step_us`` bucket from the key's first to last observation, carrying
    ``n`` (observations in the bucket, 0 for gaps) and ``val`` (the last
    observed ``value_col`` at or before the bucket, forward-filled across
    gaps). The classic time-series densification step (metric dashboards,
    feature snapshots at training time).

    Determinism: "last observed" is the max of a (time, id, value) struct —
    lexicographic, so the unique ``id_col`` breaks time ties identically
    in any engine. Scale shape: one (key, bucket) hash aggregate
    (map-side combinable), a key-level min/max to size each grid, a
    per-key ``sequence`` explode (rows ≈ span/step per key — bounded by
    the time span, independent of observation count), one equi-join back,
    and one window pass for the fill; every Exchange is keyed, nothing is
    driver-side.
    """
    bucket = F.expr(f"{time_us_col} div {step_us}")
    b = df.groupBy(F.col(key), bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max(
            F.struct(
                F.col(time_us_col).alias("t"),
                F.col(id_col).alias("i"),
                F.col(value_col).alias("v"),
            )
        ).alias("mx"),
    )
    spans = b.groupBy(key).agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = spans.select(key, F.explode(F.sequence("lo", "hi")).alias("bucket"))
    joined = grid.join(b, [key, "bucket"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        F.col(key),
        F.col("bucket"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.last(F.col("mx")["v"], ignorenulls=True).over(w).alias("val"),
    )


# ---------------------------------------------------------------------------
# Driver query: both temporal joins over events, label-packed.
#  - 'asof' rows: every event attributed to the latest purchase of the same
#    user at-or-before it (NULL right_id/val when the user has no earlier
#    purchase).
#  - 'range' rows: every purchase with the count and exact sum-of-value of
#    the same user's events in the 10 minutes strictly after it.
# Purchases are deduped to one per (user_id, ts) — max event_id — so "the
# latest" is well-defined in both engines (DuckDB's ASOF picks an arbitrary
# row among time ties otherwise).
# ---------------------------------------------------------------------------
@query(
    "temporal_asof_range_join",
    oracle=f"""
    WITH anchors AS (
      SELECT user_id, ts, event_id, value
      FROM events
      WHERE event_type = 'purchase'
      QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ),
    asof_part AS (
      SELECT 'asof' AS part, e.event_id AS left_id, e.user_id AS join_key,
             a.event_id AS right_id, a.value AS val
      FROM events e
      ASOF LEFT JOIN anchors a ON e.user_id = a.user_id AND e.ts >= a.ts
    ),
    range_part AS (
      SELECT 'range' AS part, a.event_id AS left_id, a.user_id AS join_key,
             count(e.event_id) AS right_id,
             CAST(sum(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS val
      FROM anchors a
      LEFT JOIN events e ON e.user_id = a.user_id
        AND epoch_us(e.ts) > epoch_us(a.ts)
        AND epoch_us(e.ts) <= epoch_us(a.ts) + {RANGE_WINDOW_US}
      GROUP BY a.event_id, a.user_id
    ),
    rs_b AS (
      SELECT user_id, epoch_us(ts) // {RESAMPLE_STEP_US} AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             max(struct_pack(t := epoch_us(ts), i := event_id, v := value)) AS mx
      FROM events GROUP BY 1, 2
    ),
    rs_spans AS (
      SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM rs_b GROUP BY 1
    ),
    rs_grid AS (
      SELECT user_id, unnest(generate_series(lo, hi)) AS bucket FROM rs_spans
    ),
    rs_filled AS (
      SELECT g.user_id, g.bucket, coalesce(b.n, 0) AS n,
             last_value(b.mx.v IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val
      FROM rs_grid g LEFT JOIN rs_b b USING (user_id, bucket)
    ),
    resample_part AS (
      SELECT 'resample' AS part, bucket AS left_id, user_id AS join_key,
             n AS right_id, val
      FROM rs_filled
    )
    SELECT * FROM asof_part UNION ALL SELECT * FROM range_part
    UNION ALL SELECT * FROM resample_part
    """,
)
def temporal_asof_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    rn = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    anchors = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("__rn", F.row_number().over(rn))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    asof = asof_join(
        events.select("event_id", "user_id", "ts"),
        anchors,
        on="user_id",
        left_time="ts",
        right_time="ts",
        payload={"right_id": "event_id", "val": "value"},
    ).select(
        F.lit("asof").alias("part"),
        F.col("event_id").alias("left_id"),
        F.col("user_id").alias("join_key"),
        "right_id",
        "val",
    )

    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    rng = range_agg_join(
        anchors.select(
            F.col("event_id").alias("a_id"),
            F.col("user_id"),
            us("ts").alias("a_us"),
        ),
        events.select("user_id", us("ts").alias("p_us"), "event_id", "value"),
        on="user_id",
        anchor_time_us="a_us",
        point_time_us="p_us",
        window_us=RANGE_WINDOW_US,
        aggs={"right_id": F.count("event_id"), "val": dsum("value")},
    ).select(
        F.lit("range").alias("part"),
        F.col("a_id").alias("left_id"),
        F.col("user_id").alias("join_key"),
        "right_id",
        "val",
    )

    resample = resample_ffill(
        events.select("user_id", us("ts").alias("t_us"), "event_id", "value"),
        key="user_id",
        time_us_col="t_us",
        id_col="event_id",
        value_col="value",
    ).select(
        F.lit("resample").alias("part"),
        F.col("bucket").alias("left_id"),
        F.col("user_id").alias("join_key"),
        F.col("n").alias("right_id"),
        "val",
    )

    return asof.unionByName(rng).unionByName(resample)
