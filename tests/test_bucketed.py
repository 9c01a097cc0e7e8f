"""Bucketed co-location (sources/bucketed.py): the write-once-shuffle-never
contract must be visible in the physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.plans import explain_str
from demo_iceberg_permanent_delete_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from demo_iceberg_permanent_delete_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    write_bucketed(li, "bt_lineitem", "l_orderkey", 8, path=str(base / "li"))
    write_bucketed(orders, "bt_orders", "o_orderkey", 8, path=str(base / "ord"))
    yield (
        read_bucketed(spark, "bt_lineitem"),
        read_bucketed(spark, "bt_orders"),
        li,
        orders,
    )
    spark.sql("DROP TABLE IF EXISTS bt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bt_orders")


def _no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    return prev


def test_cobucketed_join_has_no_exchange(spark, bucketed):
    bli, bord, li, orders = bucketed
    prev = _no_broadcast(spark)
    try:
        joined = bli.join(bord, bli["l_orderkey"] == bord["o_orderkey"])
        plan = explain_str(joined)
        assert "Exchange" not in plan, f"co-bucketed join still shuffles:\n{plan}"

        # the plain-parquet twin DOES shuffle — bucketing is what removed it
        plain = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        assert "Exchange" in explain_str(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cobucketed_join_matches_plain_join(spark, bucketed):
    bli, bord, li, orders = bucketed
    fast = (
        bli.join(bord, bli["l_orderkey"] == bord["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
    )
    slow = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed):
    bli, _, _, _ = bucketed
    agg = bli.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("qty"))
    plan = explain_str(agg)
    assert "Exchange" not in plan, f"bucket-key aggregation shuffles:\n{plan}"
