"""The snapshot-table layer — a native Iceberg-like table format over
Parquet + JSON metadata, built Spark-first.

Re-implements the capabilities the reference exercises through the Iceberg
runtime (reference: notebooks/iceberg_pii_deletion_demo.py, docker-compose
REST catalog) without any Iceberg JAR: snapshots + time travel, metadata
tables, merge-on-read position deletes, copy-on-write updates, and the four
maintenance procedures (expire_snapshots, remove_orphan_files,
rewrite_data_files, rewrite_position_delete_files) plus the delete-file
audit.

Public API::

    from demo_iceberg_permanent_delete_spark.lake import Catalog
    cat = Catalog(spark, warehouse="/path/to/warehouse")
    cat.create_namespace("default")
    t = cat.create_table("default.pii_data", schema_ddl, properties={...})
    t.insert(df)
    t.delete("case_id = 'case-2'")        # MOR or COW per table property
    t.read()                              # current snapshot, deletes merged
    t.read(snapshot_id=...)               # time travel
    t.meta("files") / t.meta("history")   # metadata relations as DataFrames
    t.expire_snapshots(older_than=...)
    t.remove_orphan_files(older_than=..., dry_run=True)
    t.rewrite_data_files()
    t.rewrite_position_delete_files()
"""

from demo_iceberg_permanent_delete_spark.lake.catalog import Catalog
from demo_iceberg_permanent_delete_spark.lake.errors import (
    NoSuchTableError,
    SnapshotNotFoundError,
    UnsafeOperationError,
)
from demo_iceberg_permanent_delete_spark.lake.planner import (
    plan_join,
    scan_estimate,
)
from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine
from demo_iceberg_permanent_delete_spark.lake.table import LakeTable

__all__ = [
    "Catalog",
    "LakeEngine",
    "LakeTable",
    "NoSuchTableError",
    "SnapshotNotFoundError",
    "UnsafeOperationError",
    "plan_join",
    "scan_estimate",
]
