"""Iceberg ``.partitions`` metadata-table parity (lake/table.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.lake import Catalog


def _rows(ts_day: int, n: int, base: int = 0):
    return [
        (base + i, f"v{i}", dt.datetime(2024, 6, ts_day, 10, 0, i))
        for i in range(n)
    ]


def test_partitions_view_identity_and_days(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.pt",
        "id bigint, v string, ts timestamp",
        partition_by=["days(ts)"],
    )
    t.insert(spark.createDataFrame(_rows(5, 4), "id long, v string, ts timestamp"))
    t.insert(spark.createDataFrame(_rows(6, 3, 100), "id long, v string, ts timestamp"))

    parts = {
        tuple(sorted(r["partition"].items())): r
        for r in t.meta("partitions").collect()
    }
    assert (("days(ts)", "2024-06-05"),) in parts
    assert (("days(ts)", "2024-06-06"),) in parts
    assert parts[(("days(ts)", "2024-06-05"),)]["record_count"] == 4
    assert parts[(("days(ts)", "2024-06-06"),)]["record_count"] == 3
    assert all(r["file_count"] >= 1 for r in parts.values())

    # record counts must reconcile with the table scan
    total = sum(r["record_count"] for r in parts.values())
    assert total == t.read().count()


def test_partitions_view_unpartitioned_single_row(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.up", "id bigint, v string")
    t.insert(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    rows = t.meta("partitions").collect()
    assert len(rows) == 1
    assert rows[0]["partition"] == {}
    assert rows[0]["record_count"] == 2


def test_partitions_view_empty_table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.et", "id bigint", partition_by=["id"])
    assert t.meta("partitions").count() == 0


def test_partitions_view_bucket_transform(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.transforms import bucket_of

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.bp", "id bigint, v string", partition_by=["bucket(4, id)"]
    )
    t.insert(
        spark.createDataFrame([(i, f"v{i}") for i in range(20)], "id long, v string")
    )
    parts = {r["partition"]["bucket(4, id)"]: r["record_count"] for r in t.meta("partitions").collect()}
    expect: dict[str, int] = {}
    for i in range(20):
        b = str(bucket_of(i, 4))
        expect[b] = expect.get(b, 0) + 1
    assert parts == expect


def test_partitions_registered_as_temp_view(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.rv", "id bigint", partition_by=["id"])
    t.insert(spark.createDataFrame([(1,), (1,), (2,)], "id long"))
    t.register_metadata_views()
    got = spark.sql(
        "SELECT partition['id'] AS p, record_count FROM default_rv__partitions ORDER BY p"
    ).collect()
    assert [(r["p"], r["record_count"]) for r in got] == [("1", 2), ("2", 1)]
