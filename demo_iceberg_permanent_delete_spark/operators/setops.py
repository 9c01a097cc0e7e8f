"""Set operations, semi/anti joins, and multi-dimensional aggregates
(SURVEY.md §2.8 X7).

The reference reaches anti-join semantics only through the pandas
``merge(indicator=True)`` idiom (notebooks/utils/diff_utils.py:58-71) and
never uses INTERSECT/EXCEPT or grouping sets. These queries make the full
surface first-class. Pairs of related operators share one driver entry with
an ``op``/``grp_src`` label column (the driver records at most 50
correctness rows; packing keeps every operator hash-checked).

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
- The UNION ALL packing adds no exchange: each branch keeps its own plan and
  the union is a no-shuffle concatenation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.functions.scalars import dsum
from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# INTERSECT (distinct semantics) + EXCEPT ALL (multiset difference,
# preserves multiplicity), labeled by op.
# ---------------------------------------------------------------------------
@query(
    "set_ops_keys",
    oracle="""
    SELECT 'intersect' AS op, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'except_all' AS op, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE o_totalprice > 50000
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    )
    """,
)
def set_ops_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f_side = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_side = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    big = orders.filter(F.col("o_totalprice") > 50000).select("o_custkey")
    pending = orders.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    inter = f_side.intersect(o_side).select(
        F.lit("intersect").alias("op"), "o_custkey"
    )
    exc = big.exceptAll(pending).select(
        F.lit("except_all").alias("op"), "o_custkey"
    )
    return inter.unionByName(exc)


# ---------------------------------------------------------------------------
# LEFT SEMI (EXISTS: customers with a high-value order) + LEFT ANTI
# (NOT EXISTS: customers with no PENDING order — the pandas
# indicator='left_only' idiom of diff_utils.py:58-71 as a native operator).
# ---------------------------------------------------------------------------
@query(
    "semi_anti_customers",
    oracle="""
    SELECT 'semi' AS op, c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    )
    UNION ALL
    SELECT 'anti' AS op, c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
    """,
)
def semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big_keys = (
        orders.filter(F.col("o_totalprice") > 100000).select("o_custkey").distinct()
    )
    pending_keys = (
        orders.filter(F.col("o_orderstatus") == "P").select("o_custkey").distinct()
    )
    semi = customer.join(
        big_keys, customer["c_custkey"] == big_keys["o_custkey"], "left_semi"
    ).select(F.lit("semi").alias("op"), "c_custkey", "c_name")
    anti = customer.join(
        pending_keys, customer["c_custkey"] == pending_keys["o_custkey"], "left_anti"
    ).select(F.lit("anti").alias("op"), "c_custkey", "c_name")
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# ROLLUP (hierarchical totals over customer) + CUBE (all grouping
# combinations over orders) with GROUPING() markers, unified under a
# grp_src label and text-cast dimensions.
# ---------------------------------------------------------------------------
@query(
    "rollup_cube_summary",
    oracle="""
    SELECT
      'customer_rollup' AS grp_src,
      CAST(c_nationkey AS VARCHAR) AS dim1,
      c_mktsegment AS dim2,
      GROUPING(c_nationkey) AS g_dim1,
      GROUPING(c_mktsegment) AS g_dim2,
      count(*) AS n_rows,
      CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM customer
    GROUP BY ROLLUP (c_nationkey, c_mktsegment)
    UNION ALL
    SELECT
      'orders_cube' AS grp_src,
      o_orderstatus AS dim1,
      o_orderpriority AS dim2,
      GROUPING(o_orderstatus) AS g_dim1,
      GROUPING(o_orderpriority) AS g_dim2,
      count(*) AS n_rows,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def rollup_cube_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    roll = (
        customer.rollup("c_nationkey", "c_mktsegment")
        .agg(
            F.grouping("c_nationkey").cast("long").alias("g_dim1"),
            F.grouping("c_mktsegment").cast("long").alias("g_dim2"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum("c_acctbal").alias("total_value"),
        )
        .select(
            F.lit("customer_rollup").alias("grp_src"),
            F.col("c_nationkey").cast("string").alias("dim1"),
            F.col("c_mktsegment").alias("dim2"),
            "g_dim1",
            "g_dim2",
            "n_rows",
            "total_value",
        )
    )
    cube = (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_dim1"),
            F.grouping("o_orderpriority").cast("long").alias("g_dim2"),
            F.count(F.lit(1)).alias("n_rows"),
            dsum("o_totalprice").alias("total_value"),
        )
        .select(
            F.lit("orders_cube").alias("grp_src"),
            F.col("o_orderstatus").alias("dim1"),
            F.col("o_orderpriority").alias("dim2"),
            "g_dim1",
            "g_dim2",
            "n_rows",
            "total_value",
        )
    )
    return roll.unionByName(cube)
