"""PySpark-native analytics engine with the query and data-processing
capabilities of ``datagero/demo-iceberg-permanent-delete`` (reference studied at
/root/reference, read-only), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for local testing + cluster scale.
- ``sources``    : parquet table loaders, filesystem listing source.
- ``operators``  : relational / dedup / similarity / text / window operators.
- ``functions``  : scalar + vector helper column functions.
- ``lake``       : the snapshot-table layer (native Iceberg-like format over
                   Parquet: snapshots, MOR position deletes, time travel,
                   expire/orphan/rewrite maintenance).
- ``streaming``  : Structured Streaming surface (watermarks, windows, dedup).
- ``plans``      : plan-inspection helpers (pushdown/broadcast assertions).
"""

__version__ = "0.1.0"
