"""Plan-shape regression tests: the properties the 100 TB design depends
on must be visible in the physical plan, not assumed."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.relational import (
    join_using_limit,
    left_join_least,
    pricing_summary,
)
from demo_iceberg_permanent_delete_spark.plans import (
    has_broadcast_join,
    has_whole_stage_codegen,
    pushed_filters,
    read_schema_columns,
)
from demo_iceberg_permanent_delete_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def test_filter_pushdown_reaches_parquet_scan(spark):
    df = load_table(spark, SF_ORACLE, "lineitem").filter(
        (F.col("l_quantity") > 30) & F.col("l_returnflag").isin("A", "R")
    )
    pushed = " ".join(pushed_filters(df))
    assert "l_quantity" in pushed, f"quantity filter not pushed: {pushed}"
    assert "l_returnflag" in pushed, f"returnflag IN-filter not pushed: {pushed}"


def test_column_pruning_on_narrow_projection(spark):
    df = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey", "l_quantity")
    schemas = read_schema_columns(df)
    assert schemas, "no parquet scan found"
    assert schemas[0] == ["l_orderkey", "l_quantity"], (
        f"scan reads more than the projection: {schemas[0]}"
    )


def test_pricing_summary_prunes_to_used_columns(spark):
    df = pricing_summary(spark, SF_ORACLE)
    (cols,) = read_schema_columns(df)
    # 7 of 11 lineitem columns are referenced; the scan must not read more.
    assert set(cols) == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    }, cols


def test_dimension_joins_are_broadcast(spark):
    assert has_broadcast_join(left_join_least(spark, SF_ORACLE))
    assert has_broadcast_join(join_using_limit(spark, SF_ORACLE))


def test_aggregation_stays_in_codegen(spark):
    assert has_whole_stage_codegen(pricing_summary(spark, SF_ORACLE))


def test_doc_fingerprint_single_exchange(spark):
    """The groupBy(doc_id) must reuse the pre-hash repartition(doc_id)
    exchange: exactly one shuffle in the whole fingerprint plan (the
    design claim in operators/text.py:doc_fingerprint)."""
    from demo_iceberg_permanent_delete_spark.operators.text import doc_fingerprint

    plan = (
        doc_fingerprint(spark, SF_ORACLE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 exchange, plan has {n_exchanges}:\n{plan}"


def test_contamination_benchmark_is_broadcast(spark):
    """The benchmark n-gram set must broadcast — the corpus side may not
    shuffle its gram rows for the join (operators/contamination.py)."""
    from demo_iceberg_permanent_delete_spark.operators.contamination import (
        benchmark_ngram_contamination,
    )
    from demo_iceberg_permanent_delete_spark.sources.tables import load_table as _lt

    docs = _lt(spark, SF_ORACLE, "documents")
    assert has_broadcast_join(benchmark_ngram_contamination(docs))


def test_ivf_assignment_broadcasts_centroids_no_cartesian(spark):
    """IVF's scale shape: K centroids broadcast against an unshuffled
    corpus — the plan must contain a broadcast join and NO cartesian /
    nested-loop over corpus x corpus (operators/similarity.py)."""
    from demo_iceberg_permanent_delete_spark.operators.similarity import ivf_topk
    from demo_iceberg_permanent_delete_spark.plans import explain_str

    plan = explain_str(ivf_topk(spark, SF_ORACLE))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" in plan or "BroadcastExchange" in plan, plan


def test_lake_schema_evolution_join_is_stats_broadcast(spark, tmp_path):
    """The driver-visible lake_schema_evolution join must carry the
    stats-CHOSEN broadcast: with Catalyst's own byte heuristic disabled
    (autoBroadcastJoinThreshold=-1) only the planner's manifest-truth
    estimate can produce a BroadcastHashJoin (lake/planner.plan_join, the
    production call site wired in operators/lake_queries.py)."""
    from demo_iceberg_permanent_delete_spark.lake import Catalog, plan_join
    from demo_iceberg_permanent_delete_spark.plans import explain_str

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        cat = Catalog(spark, str(tmp_path / "wh"))
        cat.create_namespace("default")
        fact = cat.create_table("default.fact", "k bigint, v bigint")
        fact.insert(spark.range(5000).selectExpr("id AS k", "id * 2 AS v"))
        dim = cat.create_table("default.dim", "k bigint, name string")
        dim.insert(
            spark.range(50).selectExpr("id AS k", "concat('n', id) AS name")
        )
        joined, decision = plan_join(fact, dim, on="k")
        assert decision["strategy"] == "broadcast_right", decision
        plan = explain_str(joined)
        assert "BroadcastHashJoin" in plan, plan
        assert joined.count() == 50
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sql_facade_select_injects_stats_broadcast(spark, tmp_path):
    """Any facade SELECT over lake tables gets the manifest-informed
    broadcast hint at view registration (lake/sql.py _select): with the
    session heuristic disabled, a two-lake-table join must still plan a
    BroadcastHashJoin — the loop Iceberg closes by reporting stats to
    Catalyst's CBO."""
    from demo_iceberg_permanent_delete_spark.lake import LakeEngine
    from demo_iceberg_permanent_delete_spark.plans import explain_str

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        eng = LakeEngine(spark, str(tmp_path / "wh"))
        eng.sql("CREATE NAMESPACE IF NOT EXISTS default")
        eng.sql("CREATE TABLE default.fact (k bigint, v bigint) USING iceberg")
        eng.sql("CREATE TABLE default.dim (k bigint, name string) USING iceberg")
        eng.table("default.fact").insert(
            spark.range(5000).selectExpr("id AS k", "id * 2 AS v")
        )
        eng.table("default.dim").insert(
            spark.range(50).selectExpr("id AS k", "concat('n', id) AS name")
        )
        df = eng.sql(
            "SELECT f.k, f.v, d.name FROM default.fact f "
            "JOIN default.dim d ON f.k = d.k"
        )
        plan = explain_str(df)
        assert "BroadcastHashJoin" in plan, plan
        assert df.count() == 50
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sql_facade_predicate_scoped_broadcast_hint(spark, tmp_path):
    """Round-5 brief item 1: the facade passes the statement's own WHERE
    into scan_estimate at view registration (lake/scanscope.py), so a
    fat table whose PRUNED file set fits under the threshold gets the
    broadcast hint — while the same table unfiltered does not. The
    threshold is pinned strictly between the filtered and unfiltered
    manifest estimates, so only predicate scoping can flip the decision
    (Catalyst's own non-CBO filter stats keep the child's full
    sizeInBytes, and both raw sides sit above the threshold)."""
    from demo_iceberg_permanent_delete_spark.lake import LakeEngine
    from demo_iceberg_permanent_delete_spark.lake.planner import scan_estimate
    from demo_iceberg_permanent_delete_spark.plans import explain_str

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS default")
    eng.sql(
        "CREATE TABLE default.fat (k bigint, day string, payload string) "
        "USING iceberg"
    )
    eng.sql("CREATE TABLE default.big (k bigint, note string) USING iceberg")
    fat = eng.table("default.fat")
    for d in range(8):
        # one insert per day → one data file per day with tight day
        # min/max in its manifest entry, so `day = 'dN'` prunes to 1 file
        fat.insert(
            spark.range(400).selectExpr(
                "id AS k",
                f"'d{d}' AS day",
                "repeat(uuid(), 4) AS payload",
            )
        )
    eng.table("default.big").insert(
        spark.range(12000).selectExpr("id AS k", "repeat(uuid(), 4) AS note")
    )

    full = scan_estimate(fat)["bytes"]
    pruned = scan_estimate(fat, "day = 'd3'")["bytes"]
    assert 0 < pruned < full, (pruned, full)
    threshold = (pruned + full) // 2
    big = scan_estimate(eng.table("default.big"))["bytes"]
    assert big > threshold, (big, threshold)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(threshold))
    try:
        filtered = eng.sql(
            "SELECT b.k, b.note, f.payload FROM default.big b "
            "JOIN default.fat f ON b.k = f.k WHERE f.day = 'd3'"
        )
        assert "BroadcastHashJoin" in explain_str(filtered), explain_str(
            filtered
        )
        assert filtered.count() == 400

        unfiltered = eng.sql(
            "SELECT b.k, b.note, f.payload FROM default.big b "
            "JOIN default.fat f ON b.k = f.k"
        )
        assert "BroadcastHashJoin" not in explain_str(unfiltered), explain_str(
            unfiltered
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
