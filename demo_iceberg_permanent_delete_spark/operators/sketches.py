"""Approximate / sketch aggregates (SURVEY.md §2.8 X8).

Absent from the reference; required by the north-star surface. Approximate
results are engine-specific (Spark HLL++ vs DuckDB HLL give different
estimates), so the approx battery is declared rows-only (no oracle) and is
paired with an exact twin that IS hash-checked — the twin also serves as the
accuracy yardstick in tests. Each side packs distinct-counts and
percentiles into one driver entry (the driver records at most 50
correctness rows).

Scale notes (100 TB story):
- approx_count_distinct is THE scale play: constant-size HLL sketch per
  group merged map-side, vs an exact distinct whose shuffle carries every
  distinct value. At 100 TB the exact variant may be infeasible; the sketch
  is always one pass.
- percentile_approx (GK/KLL-style) likewise merges bounded sketches;
  exact percentile requires a full sort or collect of each group.
- Packing both aggregates into one groupBy is itself the scale-correct
  shape: one shuffle on l_returnflag serves every aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Exact twins — the hash-checked yardstick: distinct counts + interpolated
# percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, both
# a+(b-a)*frac) in ONE grouped pass.
# ---------------------------------------------------------------------------
@query(
    "sketch_exact_summary",
    oracle="""
    SELECT
      l_returnflag,
      count(DISTINCT l_partkey) AS n_parts,
      count(DISTINCT l_suppkey) AS n_suppliers,
      count(*) AS n_rows,
      quantile_cont(l_extendedprice, 0.5)  AS p50_price,
      quantile_cont(l_extendedprice, 0.95) AS p95_price,
      min(l_extendedprice) AS min_price,
      max(l_extendedprice) AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def sketch_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # Two multi-DISTINCT aggregates + a percentile in ONE groupBy would
    # compile to an Expand that triplicates every input row (measured 2×
    # slower than two passes at sf0.1); two narrow aggregates joined on the
    # 3-row group key keep each scan column-pruned and Expand-free.
    distincts = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    percentiles = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50_price"),
        F.percentile("l_extendedprice", 0.95).alias("p95_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    # The sketch battery's bounded-error agreement with this exact twin is
    # pinned in tests/test_sketches.py — NOT here: an in-query self-check
    # would pay a second full lineitem scan + aggregate on every bench and
    # driver invocation for a guarantee pytest already provides (same
    # rationale as cosine_topk's exact-vs-BLAS split).
    return distincts.join(percentiles, "l_returnflag")


# ---------------------------------------------------------------------------
# Sketch battery (estimates are implementation-specific so there is no
# DuckDB twin): HLL++ distinct counts + bounded-memory mergeable percentile
# sketches. Accuracy vs the exact twin asserted in tests/test_sketches.py.
# ---------------------------------------------------------------------------
def sketch_approx_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("n_parts_approx"),
        F.approx_count_distinct("l_suppkey", rsd=0.01).alias("n_suppliers_approx"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_price_approx"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("p95_price_approx"),
        F.count(F.lit(1)).alias("n_rows"),
    )
