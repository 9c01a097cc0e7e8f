"""Filesystem listing source (SURVEY.md §2.1 S9).

The reference walks the warehouse through the Hadoop FileSystem via py4j
(notebooks/utils/s3_utils.py:8-38 — ls_s3_with_date / ls_s3_recursive,
modification times scaled /1000). Our warehouse is local-FS, so the listing
is a plain os.walk surfaced as a DataFrame; the Hadoop-FS path is kept as a
fallback for object stores.

The listing feeds orphan detection as a *relation* — listing ANTI JOIN
metadata — which is the scalable shape: at 100 TB the listing itself is
millions of rows and the join runs distributed, never as a driver-side set
difference (maintenance.py only collects the final, small, orphan list).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LISTING_SCHEMA = T.StructType(
    [
        T.StructField("file_path", T.StringType()),
        T.StructField("file_size", T.LongType()),
        T.StructField("modified_at", T.TimestampType()),
    ]
)


def list_files(
    spark: SparkSession,
    root: str,
    suffix: str | None = None,
    use_hadoop_fs: bool = False,
) -> DataFrame:
    """Recursive listing of ``root`` as (file_path, file_size, modified_at)."""
    if use_hadoop_fs:
        return _list_files_hadoop(spark, root, suffix)
    rows = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if suffix and not fn.endswith(suffix):
                continue
            p = os.path.join(dirpath, fn)
            st = os.stat(p)
            rows.append(
                (
                    p,
                    st.st_size,
                    dt.datetime.fromtimestamp(st.st_mtime, dt.timezone.utc).replace(tzinfo=None),
                )
            )
    # one Arrow batch, not a defaultParallelism-sliced Python RDD — each
    # consumer's collect otherwise launches a full-width Python-worker job
    # for a metadata-sized listing (the _local_frame rule)
    from demo_iceberg_permanent_delete_spark.lake.table import _local_frame

    return _local_frame(spark, rows, LISTING_SCHEMA)


def _list_files_hadoop(spark: SparkSession, root: str, suffix: str | None) -> DataFrame:
    """Hadoop FileSystem walk via py4j — the reference's mechanism
    (s3_utils.py:20-38), kept for object-store warehouses."""
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(root)
    fs = path.getFileSystem(conf)
    rows = []
    if not fs.exists(path):
        from demo_iceberg_permanent_delete_spark.lake.table import _empty_frame

        return _empty_frame(spark, LISTING_SCHEMA)
    it = fs.listFiles(path, True)  # recursive
    while it.hasNext():
        status = it.next()
        p = status.getPath().toUri().getPath()
        if suffix and not p.endswith(suffix):
            continue
        rows.append(
            (
                p,
                status.getLen(),
                dt.datetime.fromtimestamp(
                    status.getModificationTime() / 1000, dt.timezone.utc
                ).replace(tzinfo=None),
            )
        )
    # one Arrow batch, not a defaultParallelism-sliced Python RDD — each
    # consumer's collect otherwise launches a full-width Python-worker job
    # for a metadata-sized listing (the _local_frame rule)
    from demo_iceberg_permanent_delete_spark.lake.table import _local_frame

    return _local_frame(spark, rows, LISTING_SCHEMA)
