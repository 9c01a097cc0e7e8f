"""Bucketed-table co-location: pay the shuffle ONCE at write time.

At 100 TB the dominant cost of a repeated fact-to-fact join (lineitem ⋈
orders on orderkey, every day) is re-shuffling both sides on every run.
Spark's bucketing writes each side pre-hash-partitioned into N buckets on
the join key (`df.write.bucketBy(N, key).sortBy(key)`); a join of two
tables bucketed on the same key with the same N then reads bucket i of
each side into the same task — NO Exchange in the plan, and with sortBy
the SortMergeJoin's per-partition sort is free too. Same effect for
groupBy on the bucket key.

tests/test_bucketed.py asserts the no-Exchange plan rather than trusting
this note.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str] | str,
    buckets: int,
    *,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed parquet table registered as ``name``.

    ``buckets`` must match between tables meant to co-join (and should be
    sized so one bucket ≈ one task's worth of data at the target scale:
    100 TB / 128 MiB-ish tasks → tens of thousands of buckets).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back with its bucket spec intact (plain
    ``spark.read.parquet`` on the files would lose it)."""
    return spark.table(name)
