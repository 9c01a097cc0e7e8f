"""Multi-join analytical queries (TPC-H-shaped) + JSON extraction.

The reference's analytics never joins more than two relations at once
(file_summary_utils.py:65-68); these queries prove the engine at the
multi-way-join depth a real warehouse workload needs, on the same testdata
the driver checks.

Scale notes (100 TB story):
- Star joins broadcast every dimension (region/nation/customer/supplier):
  the fact table (lineitem) is never shuffled for the join itself — the
  only exchange is the final aggregation's, carrying one row per group.
  At 100 TB the dimension tables are still MBs; broadcast remains right.
- The orders⋈lineitem join is fact-to-fact: it shuffles on the join key.
  At scale both sides would be bucketed by orderkey at write time
  (`bucketBy(orderkey)`) to delete this exchange — noted in SCALE.md.
- revenue aggregates use exact scaled-bigint cents math (registry.py
  conventions; functions/scalars.cents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.functions.scalars import cents
from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

# Revenue as exact scaled-bigint math (see functions/scalars.cents): both
# engines sum identical int64s and convert with the same IEEE int64→double
# op — faster than decimal(38) aggregation and parity-stable at any sum
# magnitude below int64 overflow.
_REVENUE_CENTS_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT) "
    "* (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


def _revenue_cents() -> F.Column:
    return cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))


def revenue_double(sum_col: F.Column) -> F.Column:
    """Surface a summed revenue-cents column as currency double."""
    return sum_col.cast("double") / 10000.0


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: shipping-priority revenue — segment-filtered customer ⋈
# orders ⋈ lineitem, grouped, top-10 by revenue.
# ---------------------------------------------------------------------------
@query(
    "shipping_priority_revenue",
    oracle=f"""
    SELECT
      l.l_orderkey,
      CAST(sum({_REVENUE_CENTS_SQL}) AS DOUBLE) / 10000.0 AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def shipping_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.expr("TIMESTAMP '1995-03-15 00:00:00'")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue_double(F.sum(_revenue_cents())).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: local-supplier revenue by nation — five-way star join
# (region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier with the
# same-nation constraint), grouped by nation.
# ---------------------------------------------------------------------------
@query(
    "nation_revenue",
    oracle=f"""
    SELECT
      n.n_name AS nation,
      CAST(sum({_REVENUE_CENTS_SQL}) AS DOUBLE) / 10000.0 AS revenue,
      count(*) AS n_items
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    dims = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            revenue_double(F.sum(_revenue_cents())).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# JSON extraction over events.props — the semi-structured column the
# reference never touches; standard pipeline need.
# ---------------------------------------------------------------------------
@query(
    "json_props_stats",
    oracle="""
    SELECT
      event_type,
      count(*) AS n_events,
      CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Parse the JSON once in a projection, aggregate the extracted value —
    # three aggregates over the same get_json_object expression would
    # re-parse the document per aggregate (measured 2.4× slower at sf0.1).
    k = F.get_json_object("props", "$.k").cast("bigint").alias("k")
    return (
        ev.select("event_type", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
