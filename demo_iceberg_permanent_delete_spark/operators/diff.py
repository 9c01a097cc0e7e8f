"""The diff engine (SURVEY.md §2.6) — Spark-native port of the reference's
pandas ``diff_summaries`` (notebooks/utils/diff_utils.py:9-80).

The reference normalizes two summary frames, groups them, then computes
ADDED / REMOVED / CHANGED / UNCHANGED per group via an inner merge plus two
indicator-based anti-joins (diff_utils.py:52-71). The idiomatic Spark port is
a single FULL OUTER join on the group keys with ``coalesce``-based delta
arithmetic and a CASE over the null sides — one shuffle instead of three
joins, and no driver-side pandas at any scale.

Here the two "summary snapshots" are derived deterministically from the
`events` table (old = even event_ids, new = event_ids not divisible by 3) so
the whole program is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table


def summarize(df: DataFrame, predicate) -> DataFrame:
    """Minute-bucketed count summary, the reference's summary row shape
    (file_summary_utils.py:91-104 / FIXTURES.md `file_summary`)."""
    return (
        df.filter(predicate)
        .groupBy(
            F.col("event_type").alias("file_type"),
            F.date_trunc("minute", F.col("ts")).alias("created_minute"),
        )
        .agg(F.count(F.lit(1)).alias("files_in_catalog"))
    )


def diff_summaries(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """Label per-group deltas between two summaries.

    Port of diff_utils.py:52-80: inner-join CHANGED/UNCHANGED + two anti-join
    branches (ADDED rows only in `new`, REMOVED rows only in `old`, delta
    negated) — collapsed into one full-outer join.
    """
    o = old.withColumnRenamed("files_in_catalog", "old_count").alias("o")
    n = new.withColumnRenamed("files_in_catalog", "new_count").alias("n")
    joined = o.join(n, on=keys, how="full_outer")
    delta = F.coalesce(F.col("new_count"), F.lit(0)) - F.coalesce(F.col("old_count"), F.lit(0))
    status = (
        F.when(F.col("old_count").isNull(), F.lit("ADDED"))
        .when(F.col("new_count").isNull(), F.lit("REMOVED"))
        .when(delta == 0, F.lit("UNCHANGED"))
        .otherwise(F.lit("CHANGED"))
    )
    return joined.select(
        *keys,
        F.coalesce(F.col("old_count"), F.lit(0)).alias("old_count"),
        F.coalesce(F.col("new_count"), F.lit(0)).alias("new_count"),
        delta.alias("delta"),
        status.alias("status"),
    )


_DIFF_ORACLE = """
WITH old_summary AS (
  SELECT event_type AS file_type,
         date_trunc('minute', ts) AS created_minute,
         count(*) AS old_count
  FROM events WHERE event_id % 2 = 0
  GROUP BY 1, 2
),
new_summary AS (
  SELECT event_type AS file_type,
         date_trunc('minute', ts) AS created_minute,
         count(*) AS new_count
  FROM events WHERE event_id % 3 != 0
  GROUP BY 1, 2
)
SELECT
  COALESCE(o.file_type, n.file_type) AS file_type,
  COALESCE(o.created_minute, n.created_minute) AS created_minute,
  COALESCE(o.old_count, 0) AS old_count,
  COALESCE(n.new_count, 0) AS new_count,
  COALESCE(n.new_count, 0) - COALESCE(o.old_count, 0) AS delta,
  CASE
    WHEN o.old_count IS NULL THEN 'ADDED'
    WHEN n.new_count IS NULL THEN 'REMOVED'
    WHEN COALESCE(n.new_count, 0) - COALESCE(o.old_count, 0) = 0 THEN 'UNCHANGED'
    ELSE 'CHANGED'
  END AS status
FROM old_summary o
FULL OUTER JOIN new_summary n
  ON o.file_type = n.file_type AND o.created_minute = n.created_minute
"""


@query("diff_summaries", oracle=_DIFF_ORACLE)
def diff_summaries_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    old = summarize(ev, F.col("event_id") % 2 == 0)
    new = summarize(ev, F.col("event_id") % 3 != 0)
    return diff_summaries(old, new, keys=["file_type", "created_minute"])
