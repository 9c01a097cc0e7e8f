"""Skew-resistant join strategies (operators/skew.py): result parity with
the plain join plus the plan shapes that make them worth having."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.skew import (
    hot_cold_join,
    salted_join,
)
from demo_iceberg_permanent_delete_spark.plans import explain_str
from demo_iceberg_permanent_delete_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def sides(spark):
    left = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    right = load_table(spark, SF_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    return left, right


def test_salted_inner_join_matches_plain(spark, sides):
    left, right = sides
    plain = left.join(right, "l_orderkey")
    salted = salted_join(left, right, "l_orderkey", salts=4)
    assert salted.columns == plain.columns
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_left_join_matches_plain(spark, sides):
    left, right = sides
    # make some left keys matchless so the outer semantics are exercised
    r = right.filter(F.col("l_orderkey") % 2 == 0)
    plain = left.join(r, "l_orderkey", "left")
    salted = salted_join(left, r, "l_orderkey", how="left", salts=4)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_join_shuffles_on_key_and_salt(spark, sides):
    left, right = sides
    # force the shuffle path (at smoke scale the salted right side fits a
    # broadcast, which hides the exchange salting exists to scatter)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = explain_str(salted_join(left, right, "l_orderkey", salts=4))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "__salt" in plan, "salt column absent from the physical plan"
    # the exchange must partition on (key, salt), not key alone
    assert any(
        "hashpartitioning" in line and "l_orderkey" in line and "__salt" in line
        for line in plan.splitlines()
    ), f"no (key, salt) hashpartitioning in plan:\n{plan}"


def test_salted_join_rejects_right_outer(sides):
    left, right = sides
    with pytest.raises(ValueError):
        salted_join(left, right, "l_orderkey", how="right")


def test_hot_cold_join_matches_plain(spark, sides):
    left, right = sides
    plain = left.join(right, "l_orderkey")
    # low threshold → several hot keys take the broadcast path
    mixed = hot_cold_join(left, right, "l_orderkey", hot_threshold=5)
    assert _sorted_rows(mixed) == _sorted_rows(plain)


def test_hot_cold_left_join_matches_plain(spark, sides):
    left, right = sides
    r = right.filter(F.col("l_orderkey") % 2 == 0)
    plain = left.join(r, "l_orderkey", "left")
    mixed = hot_cold_join(left, r, "l_orderkey", how="left", hot_threshold=5)
    assert _sorted_rows(mixed) == _sorted_rows(plain)


def test_hot_cold_join_broadcasts_hot_half(spark, sides):
    left, right = sides
    plan = explain_str(hot_cold_join(left, right, "l_orderkey", hot_threshold=5))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_hot_cold_join_no_hot_keys_degenerates_to_plain(spark, sides):
    left, right = sides
    plain = left.join(right, "l_orderkey")
    cold = hot_cold_join(left, right, "l_orderkey", hot_threshold=10**9)
    assert _sorted_rows(cold) == _sorted_rows(plain)


def test_hot_cold_join_bounds_driver_collection(sides):
    left, right = sides
    with pytest.raises(ValueError, match="hot keys"):
        hot_cold_join(left, right, "l_orderkey", hot_threshold=0, max_hot_keys=2)
