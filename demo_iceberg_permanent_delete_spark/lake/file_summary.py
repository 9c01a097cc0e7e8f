"""File-summary analytics — port of the reference's flagship metadata query
(notebooks/utils/file_summary_utils.py:18-179, called ~11× from the
notebook, e.g. iceberg_pii_deletion_demo.py:94,124).

Once the six metadata relations exist as temp views, the reference-shaped
SQL runs nearly verbatim: 3 CTEs over snapshots/all_manifests/
metadata_log_entries with two left self-joins and LEAST, UNION ALL, a
minute-bucketed GROUP BY count (query 1, :45-105); an all_entries CTE with
status != 2, a USING join, MIN aggregates and a CASE content decode
(query 2, :130-154); lit run_id/operation columns (:107-108,156-157) and a
schema-aligned unionByName (:164-169).

Everything stays in Spark — the reference's final ``toPandas`` display hop
is the caller's choice, not the engine's.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The relations the summary statements actually read (register_metadata_views
# subset — the other 8 metadata views would be built and never queried).
_SUMMARY_VIEWS = [
    "snapshots",
    "all_manifests",
    "metadata_log_entries",
    "all_entries",
]

# Output shape: FIXTURES.md `file_summary` (DDL-declared empty frame in the
# reference at file_summary_utils.py:165-166).
SUMMARY_DDL = (
    "prefix string, file_type string, file_format string, "
    "created_minute timestamp, files_in_catalog long, run_id string, operation string"
)

_METADATA_SUMMARY_SQL = """
WITH snapshot_files AS (
  SELECT /*+ BROADCAST(s2) */
    s1.manifest_list AS file_path,
    'manifest_lists' AS file_type,
    'json' AS file_format,
    LEAST(s1.committed_at, s2.committed_at) AS created_at
  FROM {p}__snapshots s1
  LEFT JOIN {p}__snapshots s2 ON s1.parent_id = s2.snapshot_id
  WHERE s1.manifest_list IS NOT NULL
),
manifest_files AS (
  SELECT /*+ BROADCAST(s1) */
    m.path AS file_path,
    'manifests' AS file_type,
    'json' AS file_format,
    s1.committed_at AS created_at
  FROM {p}__all_manifests m
  LEFT JOIN {p}__snapshots s1 ON m.added_snapshot_id = s1.snapshot_id
),
metadata_files AS (
  SELECT
    file AS file_path,
    'metadata_log_entries' AS file_type,
    'json' AS file_format,
    timestamp AS created_at
  FROM {p}__metadata_log_entries
),
all_meta AS (
  SELECT * FROM snapshot_files
  UNION ALL
  SELECT * FROM manifest_files
  UNION ALL
  SELECT * FROM metadata_files
)
SELECT
  'metadata' AS prefix,
  file_type,
  file_format,
  date_trunc('minute', created_at) AS created_minute,
  COUNT(*) AS files_in_catalog
FROM all_meta
GROUP BY file_type, file_format, date_trunc('minute', created_at)
"""

_DATA_SUMMARY_SQL = """
WITH entries AS (
  SELECT /*+ BROADCAST(s) */
    e.data_file.file_path AS file_path,
    MIN(e.data_file.content) AS content,
    MIN(s.committed_at) AS created_at
  FROM {p}__all_entries e
  LEFT JOIN {p}__snapshots s ON e.snapshot_id = s.snapshot_id
  WHERE e.status != 2
  GROUP BY e.data_file.file_path
)
SELECT
  'data' AS prefix,
  CASE content
    WHEN 0 THEN 'data'
    WHEN 1 THEN 'position_deletes'
    WHEN 2 THEN 'equality_deletes'
    ELSE CONCAT('unknown (', CAST(content AS STRING), ')')
  END AS file_type,
  'parquet' AS file_format,
  date_trunc('minute', created_at) AS created_minute,
  COUNT(*) AS files_in_catalog
FROM entries
GROUP BY content, date_trunc('minute', created_at)
"""

_DEBUG_RECENT_SNAPSHOTS_SQL = """
SELECT m.path, m.added_snapshot_id, s.committed_at
FROM {p}__all_manifests m
JOIN {p}__snapshots s ON m.added_snapshot_id = s.snapshot_id
ORDER BY s.committed_at DESC
LIMIT 10
"""


def summarize_files(table, operation: str, run_id: str | None = None) -> DataFrame:
    """Current file inventory bucketed by type/format/minute (the
    before/after probe the reference brackets every lifecycle step with)."""
    spark = table.spark
    prefix = f"fs_{uuid.uuid4().hex[:8]}"
    # only the four relations the two statements read — building all 12
    # views would pay ~3x the registration cost for relations never used
    table.register_metadata_views(prefix=prefix, views=_SUMMARY_VIEWS)
    run_id = run_id or uuid.uuid4().hex[:12]

    meta_summary = spark.sql(_METADATA_SUMMARY_SQL.format(p=prefix))
    data_summary = spark.sql(_DATA_SUMMARY_SQL.format(p=prefix))

    combined = (
        meta_summary.withColumn("run_id", F.lit(run_id))
        .withColumn("operation", F.lit(operation))
        .unionByName(
            data_summary.withColumn("run_id", F.lit(run_id)).withColumn(
                "operation", F.lit(operation)
            )
        )
    )
    from demo_iceberg_permanent_delete_spark.lake.table import _empty_frame

    # schema-pinning union: the JVM-only empty frame (a 32-partition
    # Python-RDD empty frame added a full-width worker job to every run)
    empty = _empty_frame(spark, SUMMARY_DDL)
    return empty.unionByName(combined).orderBy("created_minute", "file_type", "file_format")


_METADATA_SUMMARY_DET_SQL = """
WITH snapshot_files AS (
  SELECT /*+ BROADCAST(s2) */
    s1.manifest_list AS file_path,
    'manifest_lists' AS file_type,
    'json' AS file_format,
    LEAST(s1.committed_at, s2.committed_at) AS created_at
  FROM {p}__snapshots s1
  LEFT JOIN {p}__snapshots s2 ON s1.parent_id = s2.snapshot_id
  WHERE s1.manifest_list IS NOT NULL
),
manifest_files AS (
  SELECT /*+ BROADCAST(s1) */
    m.path AS file_path,
    'manifests' AS file_type,
    'json' AS file_format,
    s1.committed_at AS created_at
  FROM {p}__all_manifests m
  LEFT JOIN {p}__snapshots s1 ON m.added_snapshot_id = s1.snapshot_id
),
metadata_files AS (
  SELECT
    file AS file_path,
    'metadata_log_entries' AS file_type,
    'json' AS file_format,
    timestamp AS created_at
  FROM {p}__metadata_log_entries
),
all_meta AS (
  SELECT * FROM snapshot_files
  UNION ALL
  SELECT * FROM manifest_files
  UNION ALL
  SELECT * FROM metadata_files
)
SELECT
  'metadata' AS prefix,
  file_type,
  file_format,
  created_at,
  COUNT(*) AS files_in_catalog,
  CAST(NULL AS BIGINT) AS records
FROM all_meta
GROUP BY file_type, file_format, created_at
"""

_DATA_SUMMARY_DET_SQL = """
WITH entries AS (
  SELECT /*+ BROADCAST(s) */
    e.data_file.file_path AS file_path,
    MIN(e.data_file.content) AS content,
    MIN(e.data_file.record_count) AS record_count,
    MIN(s.committed_at) AS created_at
  FROM {p}__all_entries e
  LEFT JOIN {p}__snapshots s ON e.snapshot_id = s.snapshot_id
  WHERE e.status != 2
  GROUP BY e.data_file.file_path
)
SELECT
  'data' AS prefix,
  CASE content
    WHEN 0 THEN 'data'
    WHEN 1 THEN 'position_deletes'
    WHEN 2 THEN 'equality_deletes'
    ELSE CONCAT('unknown (', CAST(content AS STRING), ')')
  END AS file_type,
  'parquet' AS file_format,
  created_at,
  COUNT(*) AS files_in_catalog,
  SUM(record_count) AS records
FROM entries
GROUP BY content, created_at
"""


def summarize_files_deterministic(
    table, operation: str, run_id: str = "fixed"
) -> DataFrame:
    """Hash-checkable variant of ``summarize_files`` (same CTE/join/decode
    pipeline over the same metadata views): wall-clock minute buckets are
    replaced by the commit ORDINAL (dense_rank over the exact commit
    instants the reference query derives — LEAST-of-self-join for manifest
    lists included), run_id is a caller-fixed literal instead of a uuid,
    and each group additionally sums record_count so the oracle has a
    data-dependent column to pin, not just file counts.

    The ordinal is PER file_type (dense_rank over that type's distinct
    commit instants): metadata-log timestamps don't coincide with snapshot
    committed_at instants (a log entry records when a version was
    superseded), so a global rank would shift with scheduling jitter while
    the per-type sequence is fixed by the lifecycle's commit order."""
    spark = table.spark
    prefix = f"fs_{uuid.uuid4().hex[:8]}"
    table.register_metadata_views(prefix=prefix, views=_SUMMARY_VIEWS)
    meta_summary = spark.sql(_METADATA_SUMMARY_DET_SQL.format(p=prefix))
    data_summary = spark.sql(_DATA_SUMMARY_DET_SQL.format(p=prefix))
    combined = (
        meta_summary.unionByName(data_summary)
        .withColumn("run_id", F.lit(run_id))
        .withColumn("operation", F.lit(operation))
    )
    from pyspark.sql import Window

    # Tiny frame (one row per type×commit); the window is over ~10 rows,
    # not data-proportional.
    ordinal = F.dense_rank().over(
        Window.partitionBy("file_type").orderBy("created_at")
    )
    return combined.withColumn("commit_ordinal", ordinal).drop("created_at")


def recent_snapshots_debug(table) -> DataFrame:
    """The reference's debug query (file_summary_utils.py:116-125)."""
    prefix = f"fs_{uuid.uuid4().hex[:8]}"
    table.register_metadata_views(
        prefix=prefix, views=["all_manifests", "snapshots"]
    )
    return table.spark.sql(_DEBUG_RECENT_SNAPSHOTS_SQL.format(p=prefix))


def write_summary(summary: DataFrame, path: str) -> None:
    """Partitioned summary sink (file_summary_utils.py:172-176:
    repartition(run_id) + partitionBy(run_id) append)."""
    summary.repartition("run_id").write.mode("append").partitionBy("run_id").parquet(path)
