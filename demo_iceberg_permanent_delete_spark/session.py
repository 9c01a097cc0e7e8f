"""SparkSession factory.

The reference delegates all session wiring to docker-compose
(reference: docker-compose.yml:23-42 — Iceberg catalog, S3A, extensions).
We need none of that: our lake layer (``lake/``) is pure Parquet + JSON
metadata, so the session is a stock Spark session tuned for:

- Arrow-accelerated Python interchange (reference uses ``toPandas`` at
  ~12 call sites, e.g. notebooks/iceberg_pii_deletion_demo.py:114);
- AQE with coalescing + skew-join handling, the 100 TB story: at scale
  the same code runs with runtime re-planning instead of hand-tuning;
- UTC session timezone so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "demo-iceberg-permanent-delete-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Local mode for tests (``local[N]``); on a real cluster the same
    configuration holds — AQE re-plans shuffle partition counts at
    runtime so ``shuffle_partitions`` is only an upper bound hint.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # ---- correctness-critical for the DuckDB oracle ----
        .config("spark.sql.session.timeZone", "UTC")
        # ---- Python interchange ----
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ---- adaptive execution: the scale story ----
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # INT96 (Spark's legacy default) carries no parquet min/max stats,
        # which blinds manifest-level timestamp pruning; micros is the
        # modern Iceberg-compatible physical type and keeps footer stats.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # parquet scan parallelism: 128 MiB splits (also the compaction
        # target the reference uses: notebooks/iceberg_pii_deletion_demo.py:428)
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
