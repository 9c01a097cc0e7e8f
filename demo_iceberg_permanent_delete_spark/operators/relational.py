"""Relational operator library (SURVEY.md §2.4 / §2.5).

Each query re-expresses an operator pattern the reference exercises —
projections, filters, CTE+UNION summaries, left/inner/self joins, hash
aggregates, sorts, LIMIT, DISTINCT, CASE decode, nested-struct projection,
and the scalar functions F1-F10 — retargeted at the driver's TPC-H-ish
testdata so every one is DuckDB-oracle-checkable.

Reference provenance is cited per query (file:line into /root/reference).

Scale notes (100 TB story):
- All queries are single-pass declarative plans: filters and projections sit
  directly on the parquet scan so Catalyst pushes them into the reader.
- Joins against small dimensions (nation, region, customer at dimension
  scale) are explicitly ``F.broadcast`` — no shuffle of the fact table.
- Aggregates are partial (map-side combine) by construction via groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.functions.scalars import cents
from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-style pricing summary (SURVEY §7 Phase 1; R1/R9/R11 +
# exact aggregation). Groups: hash aggregate with map-side combine; the
# only shuffle carries ~|groups| rows per partition.
#
# Money math runs on scaled BIGINTs (cents — see functions/scalars.cents):
# all inputs are 2dp, so round(x*100) is exact and the three-factor charge
# product is exact integer arithmetic. This is both faster than decimal(38)
# aggregation in the single-row-group scan hot path (the r2 decimal form
# cost ~0.4 s of the ~1.0 s query at sf0.1) and parity-stronger: both
# engines sum identical int64s, and int64→double is the same IEEE op
# everywhere, with no decimal→double engine-specific rounding ceiling.
# ---------------------------------------------------------------------------
@query(
    "pricing_summary",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_quantity * 100) AS BIGINT) AS qc,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_discount * 100) AS BIGINT) AS dc,
             CAST(round(l_tax * 100) AS BIGINT) AS tc
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(sum(qc) AS DOUBLE) / 100.0 AS sum_qty,
      CAST(sum(pc) AS DOUBLE) / 100.0 AS sum_base_price,
      CAST(sum(pc * (100 - dc)) AS DOUBLE) / 10000.0 AS sum_disc_price,
      CAST(sum(pc * (100 - dc) * (100 + tc)) AS DOUBLE) / 1000000.0 AS sum_charge,
      CAST(sum(qc) AS DOUBLE) / 100.0 / count(*) AS avg_qty,
      CAST(sum(pc) AS DOUBLE) / 100.0 / count(*) AS avg_price,
      CAST(sum(dc) AS DOUBLE) / 100.0 / count(*) AS avg_disc,
      count(*) AS count_order
    FROM c
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qc, pc, dc, tc = (
        cents("l_quantity"),
        cents("l_extendedprice"),
        cents("l_discount"),
        cents("l_tax"),
    )
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP '1998-09-02 00:00:00'"))
        .select("l_returnflag", "l_linestatus", qc.alias("qc"), pc.alias("pc"),
                dc.alias("dc"), tc.alias("tc"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum("qc").cast("double") / 100.0).alias("sum_qty"),
            (F.sum("pc").cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(F.col("pc") * (F.lit(100) - F.col("dc"))).cast("double") / 10000.0)
            .alias("sum_disc_price"),
            (
                F.sum(
                    F.col("pc") * (F.lit(100) - F.col("dc")) * (F.lit(100) + F.col("tc"))
                ).cast("double")
                / 1000000.0
            ).alias("sum_charge"),
            (F.sum("qc").cast("double") / 100.0 / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum("pc").cast("double") / 100.0 / F.count(F.lit(1))).alias("avg_price"),
            (F.sum("dc").cast("double") / 100.0 / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Minute-bucketed activity summary — the reference's core summary shape
# (GROUP BY …, date_trunc('minute', ts) + COUNT(*),
#  notebooks/utils/file_summary_utils.py:91-104) over `events`.
# ---------------------------------------------------------------------------
@query(
    "events_minute_summary",
    oracle="""
    SELECT
      event_type,
      date_trunc('minute', ts) AS created_minute,
      count(*) AS files_in_catalog
    FROM events
    GROUP BY event_type, date_trunc('minute', ts)
    """,
)
def events_minute_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("created_minute")
    ).agg(F.count(F.lit(1)).alias("files_in_catalog"))


# ---------------------------------------------------------------------------
# CTE + UNION ALL + hash aggregate — the reference's flagship metadata query
# shape (3 CTEs, UNION ALL, minute-bucket count:
#  notebooks/utils/file_summary_utils.py:45-105), expressed via spark.sql to
# exercise the SQL front-end exactly as the reference does (R3/R4/R9).
# ---------------------------------------------------------------------------
_CTE_UNION_SQL = """
WITH order_files AS (
  SELECT 'orders' AS prefix,
         o_orderpriority AS file_type,
         date_trunc('minute', o_orderdate) AS created_minute
  FROM {orders}
),
event_files AS (
  SELECT 'events' AS prefix,
         event_type AS file_type,
         date_trunc('minute', ts) AS created_minute
  FROM {events}
),
all_files AS (
  SELECT * FROM order_files
  UNION ALL
  SELECT * FROM event_files
)
SELECT prefix, file_type, created_minute, count(*) AS files_in_catalog
FROM all_files
GROUP BY prefix, file_type, created_minute
"""


@query("cte_union_summary", oracle=_CTE_UNION_SQL.format(orders="orders", events="events"))
def cte_union_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("rel_orders")
    load_table(spark, sf_dir, "events").createOrReplaceTempView("rel_events")
    return spark.sql(_CTE_UNION_SQL.format(orders="rel_orders", events="rel_events"))


# ---------------------------------------------------------------------------
# LEFT OUTER equi-join + LEAST + IS NOT NULL
# (file_summary_utils.py:54,65-80: snapshots left-joined, LEAST over the two
#  committed_at columns). Dimension side broadcast: at 100 TB `customer` as a
# dim table still fits the broadcast threshold per-partition strategy; here it
# demonstrates the shuffle-free join plan.
# ---------------------------------------------------------------------------
def left_join_least(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.alias("o")
        .join(
            F.broadcast(customer.alias("c")),
            F.col("o.o_custkey") == F.col("c.c_custkey"),
            "left",
        )
        .filter(F.col("o.o_totalprice").isNotNull())
        .select(
            F.col("o.o_orderkey"),
            F.col("c.c_name"),
            F.least(F.col("o.o_totalprice"), F.col("c.c_acctbal")).alias("least_value"),
        )
    )


# ---------------------------------------------------------------------------
# INNER JOIN USING + ORDER BY … DESC + LIMIT — the reference's debug query
# (file_summary_utils.py:116-125: JOIN snapshots USING (snapshot_id)
#  ORDER BY committed_at DESC LIMIT 10). Unique tiebreak key keeps the LIMIT
# deterministic for the oracle.
# ---------------------------------------------------------------------------
def join_using_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    return (
        orders.join(F.broadcast(customer), "custkey", "inner")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "c_name")
    )


# ---------------------------------------------------------------------------
# Self-join (R8 — snapshots joined twice as s1/s2,
#  file_summary_utils.py:65-68): nation paired with nation within a region.
# ---------------------------------------------------------------------------
def self_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    n1, n2 = nation.alias("n1"), nation.alias("n2")
    return (
        n1.join(
            n2,
            (F.col("n1.n_regionkey") == F.col("n2.n_regionkey"))
            & (F.col("n1.n_nationkey") < F.col("n2.n_nationkey")),
        )
        .select(
            F.col("n1.n_regionkey").alias("regionkey"),
            F.col("n1.n_name").alias("nation_a"),
            F.col("n2.n_name").alias("nation_b"),
        )
    )


# ---------------------------------------------------------------------------
# Composite driver entry for the join family (R6 LEFT join + LEAST, R7 JOIN
# USING + ORDER BY/LIMIT, R8 self-join, plus the salted skew join from
# operators/skew.py) — round-2 consolidation under the driver's 50-row
# correctness cap. Each part keeps its original plan shape (broadcast
# dimension joins asserted in tests/test_plans.py, (key,salt) partitioning
# in tests/test_skew.py); the composite just normalizes the outputs into
# one (part,k1,s1,s2,v) union so all parts stay hash-checked in a single
# driver row. The salted part's oracle is the PLAIN join — salting must be
# invisible in the result.
# ---------------------------------------------------------------------------
@query(
    "join_suite",
    oracle="""
    SELECT 'left' AS part,
           o.o_orderkey AS k1,
           c.c_name AS s1,
           CAST(NULL AS VARCHAR) AS s2,
           LEAST(o.o_totalprice, c.c_acctbal) AS v
    FROM orders o
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice IS NOT NULL
    UNION ALL
    SELECT 'topn' AS part, k1, s1, s2, v FROM (
      SELECT o_orderkey AS k1, c_name AS s1,
             CAST(NULL AS VARCHAR) AS s2, o_totalprice AS v
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 10
    )
    UNION ALL
    SELECT 'pairs' AS part,
           CAST(n1.n_regionkey AS BIGINT) AS k1,
           n1.n_name AS s1,
           n2.n_name AS s2,
           CAST(NULL AS DOUBLE) AS v
    FROM nation n1
    JOIN nation n2
      ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
    UNION ALL
    SELECT 'salted' AS part,
           count(*) AS k1,
           o.o_orderpriority AS s1,
           CAST(NULL AS VARCHAR) AS s2,
           -- scaled-bigint revenue (functions/scalars.cents): identical
           -- int64 sums in both engines, one shared IEEE int64→double op
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS DOUBLE) / 10000.0 AS v
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    left_part = left_join_least(spark, sf_dir).select(
        F.lit("left").alias("part"),
        F.col("o_orderkey").alias("k1"),
        F.col("c_name").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.col("least_value").alias("v"),
    )
    topn_part = join_using_limit(spark, sf_dir).select(
        F.lit("topn").alias("part"),
        F.col("o_orderkey").alias("k1"),
        F.col("c_name").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.col("o_totalprice").alias("v"),
    )
    pairs_part = self_join_pairs(spark, sf_dir).select(
        F.lit("pairs").alias("part"),
        F.col("regionkey").cast("long").alias("k1"),
        F.col("nation_a").alias("s1"),
        F.col("nation_b").alias("s2"),
        F.lit(None).cast("double").alias("v"),
    )
    salted_part = salted_revenue_by_priority(spark, sf_dir).select(
        F.lit("salted").alias("part"),
        F.col("n_items").alias("k1"),
        F.col("o_orderpriority").alias("s1"),
        F.lit(None).cast("string").alias("s2"),
        F.col("revenue").alias("v"),
    )
    return (
        left_part.unionByName(topn_part)
        .unionByName(pairs_part)
        .unionByName(salted_part)
    )


def salted_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact lineitem ⋈ orders through ``salted_join`` (the skew
    scatter from operators/skew.py), aggregated to revenue per priority —
    proves the salt changes the shuffle, not the answer."""
    from demo_iceberg_permanent_delete_spark.operators.analytics import (
        _revenue_cents,
        revenue_double,
    )
    from demo_iceberg_permanent_delete_spark.operators.skew import salted_join

    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(
        lineitem, orders, "l_orderkey", salts=4, salt_expr=F.xxhash64("l_extendedprice")
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        revenue_double(F.sum(_revenue_cents())).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# DISTINCT projection (R13 — cleanup_utils.py:184:
#  .select('file_path').distinct()).
# ---------------------------------------------------------------------------
@query(
    "distinct_case_decode",
    oracle="""
    SELECT DISTINCT
      c_mktsegment,
      c_nationkey,
      CASE CAST(c_nationkey % 3 AS INTEGER)
        WHEN 0 THEN 'data'
        WHEN 1 THEN 'position_deletes'
        WHEN 2 THEN 'equality_deletes'
        ELSE 'unknown'
      END AS content_type,
      CASE
        WHEN c_mktsegment = 'BUILDING' THEN 'accepted'
        WHEN c_mktsegment = 'MACHINERY' THEN 'returned'
        ELSE concat('other (', c_mktsegment, ')')
      END AS segment_desc
    FROM customer
    WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
      AND c_mktsegment != 'X'
    """,
)
def distinct_case_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (R13) + CASE WHEN decode, simple + searched with
    ELSE fallback (R14 — the content/status decodes at
    file_summary_utils.py:119-120,143-148) + IN-list / != predicates (R2),
    composited in one scan (the driver records at most 50 correctness rows).
    """
    cust = load_table(spark, sf_dir, "customer")
    content = (F.col("c_nationkey") % 3).cast("int")
    return (
        cust.filter(F.col("c_nationkey").isin(*range(13)) & (F.col("c_mktsegment") != "X"))
        .select(
            "c_mktsegment",
            "c_nationkey",
            F.when(content == 0, "data")
            .when(content == 1, "position_deletes")
            .when(content == 2, "equality_deletes")
            .otherwise("unknown")
            .alias("content_type"),
            F.when(F.col("c_mktsegment") == "BUILDING", F.lit("accepted"))
            .when(F.col("c_mktsegment") == "MACHINERY", F.lit("returned"))
            .otherwise(F.concat(F.lit("other ("), F.col("c_mktsegment"), F.lit(")")))
            .alias("segment_desc"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Nested-struct construction + dotted-field projection (R15 —
#  e.data_file.file_path access, file_summary_utils.py:118,134-135) PLUS the
# scalar function battery F1-F10 (SURVEY §2.5): date_trunc, LEAST, CONCAT,
# DATE/TIMESTAMP literals, regexp_extract, date_format (strftime analog,
# diff_utils.py:26), epoch-ms→timestamp (s3_utils.py:16,37). One scan of
# orders covers both; Catalyst prunes the struct's unused field.
# (Composite: the driver records at most 50 correctness rows, so operator
# queries are packed without losing coverage — see __spark_entry__.)
# ---------------------------------------------------------------------------
@query(
    "scalar_struct_functions",
    oracle="""
    SELECT
      o_orderkey AS entry_key,
      o_orderstatus AS status,
      o_totalprice AS record_value,
      date_trunc('minute', o_orderdate) AS trunc_minute,
      LEAST(o_totalprice, 150000.0) AS capped_price,
      concat('snapshot (', o_orderstatus, ')') AS status_label,
      (o_orderdate >= TIMESTAMP '1995-01-01 00:00:00') AS is_modern,
      CAST(o_orderdate AS DATE) AS order_date,
      strftime(o_orderdate, '%Y-%m-%d %H:%M:00') AS minute_str,
      regexp_extract(o_orderpriority, '([0-9]+)', 1) AS priority_num,
      epoch_ms(o_orderkey * 1000 + 500) AS synth_ts
    FROM orders
    WHERE o_orderstatus != 'X'
    """,
)
def scalar_struct_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    nested = orders.select(
        F.col("o_orderkey").alias("entry_key"),
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("record_value"),
            F.col("o_orderpriority").alias("unused_field"),
        ).alias("data_file"),
        "o_orderdate",
        "o_orderpriority",
    )
    return nested.filter(F.col("data_file.status") != "X").select(
        "entry_key",
        F.col("data_file.status").alias("status"),
        F.col("data_file.record_value").alias("record_value"),
        F.date_trunc("minute", F.col("o_orderdate")).alias("trunc_minute"),
        F.least(F.col("data_file.record_value"), F.lit(150000.0)).alias("capped_price"),
        F.concat(F.lit("snapshot ("), F.col("data_file.status"), F.lit(")")).alias(
            "status_label"
        ),
        (F.col("o_orderdate") >= F.expr("TIMESTAMP '1995-01-01 00:00:00'")).alias("is_modern"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:00").alias("minute_str"),
        F.regexp_extract(F.col("o_orderpriority"), "([0-9]+)", 1).alias("priority_num"),
        F.timestamp_millis(F.col("entry_key") * 1000 + 500).alias("synth_ts"),
    )


# ---------------------------------------------------------------------------
# unionByName — schema-aligned union (R5, file_summary_utils.py:169), with
# deliberately different column orders on the two sides.
# ---------------------------------------------------------------------------
# R5 unionByName: driver slot ceded to training_data_prep (chunking.py),
# which unions its three differently-ordered parts by name — same coverage,
# hash-checked there. This variant stays for direct use and pytest.
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    a = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("record_key"),
        F.lit("orders").alias("source"),
        F.col("o_totalprice").alias("amount"),
    )
    b = customer.filter(F.col("c_acctbal") > 0).select(
        F.col("c_acctbal").alias("amount"),
        F.col("c_custkey").alias("record_key"),
        F.lit("customer").alias("source"),
    )
    return a.unionByName(b)
