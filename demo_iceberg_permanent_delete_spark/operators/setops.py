"""Set operations, semi/anti joins, and multi-dimensional aggregates
(SURVEY.md §2.8 X7).

The reference reaches anti-join semantics only through the pandas
``merge(indicator=True)`` idiom (notebooks/utils/diff_utils.py:58-71) and
never uses INTERSECT/EXCEPT or grouping sets. These queries make the full
surface first-class.

Scale notes (100 TB story):
- Semi/anti joins ship only the join keys of the probe side — Spark's
  LeftSemi/LeftAnti physical operators never materialize the right payload.
  The build side here (orders keys) is distinct-projected before the join so
  the shuffle carries unique keys, not the fact table.
- INTERSECT/EXCEPT compile to aggregate + join plans under AQE; both inputs
  are key-projections, so the shuffles are minimal-width.
- ROLLUP/CUBE expand to grouping-set repetition on the map side; partial
  aggregation still applies, so the shuffle carries one row per
  (group, grouping-set) not per input row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.functions.scalars import dsum
from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# INTERSECT (distinct semantics): customers that ordered in BOTH statuses.
# ---------------------------------------------------------------------------
@query(
    "intersect_keys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f_side = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_side = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f_side.intersect(o_side)


# ---------------------------------------------------------------------------
# EXCEPT ALL (multiset difference, preserves multiplicity).
# ---------------------------------------------------------------------------
@query(
    "except_all_keys",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 50000
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def except_all_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 50000).select("o_custkey")
    pending = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return big.exceptAll(pending)


# ---------------------------------------------------------------------------
# LEFT SEMI join — customers having at least one high-value order
# (EXISTS shape; the pandas indicator='both' analog).
# ---------------------------------------------------------------------------
@query(
    "semi_join_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    )
    """,
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    keys = (
        orders.filter(F.col("o_totalprice") > 100000).select("o_custkey").distinct()
    )
    return customer.join(
        keys, customer["c_custkey"] == keys["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


# ---------------------------------------------------------------------------
# LEFT ANTI join — customers with no PENDING order (NOT EXISTS; the pandas
# indicator='left_only' idiom of diff_utils.py:58-71 as a native operator).
# The subset predicate keeps the result non-empty at every scale factor.
# ---------------------------------------------------------------------------
@query(
    "anti_join_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
    """,
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    keys = (
        orders.filter(F.col("o_orderstatus") == "P").select("o_custkey").distinct()
    )
    return customer.join(
        keys, customer["c_custkey"] == keys["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# ROLLUP — hierarchical totals (nation → segment → grand total), with
# GROUPING() so total rows are distinguishable from genuine NULL keys.
# ---------------------------------------------------------------------------
@query(
    "rollup_summary",
    oracle="""
    SELECT
      c_nationkey,
      c_mktsegment,
      GROUPING(c_nationkey) AS g_nation,
      GROUPING(c_mktsegment) AS g_segment,
      count(*) AS n_customers,
      CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_balance
    FROM customer
    GROUP BY ROLLUP (c_nationkey, c_mktsegment)
    """,
)
def rollup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.rollup("c_nationkey", "c_mktsegment").agg(
        F.grouping("c_nationkey").cast("long").alias("g_nation"),
        F.grouping("c_mktsegment").cast("long").alias("g_segment"),
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal").alias("total_balance"),
    ).select(
        "c_nationkey",
        "c_mktsegment",
        "g_nation",
        "g_segment",
        "n_customers",
        "total_balance",
    )


# ---------------------------------------------------------------------------
# CUBE — all grouping combinations across two dimensions.
# ---------------------------------------------------------------------------
@query(
    "cube_summary",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      GROUPING(o_orderstatus) AS g_status,
      GROUPING(o_orderpriority) AS g_priority,
      count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    ).select(
        "o_orderstatus",
        "o_orderpriority",
        "g_status",
        "g_priority",
        "n_orders",
        "total_price",
    )
