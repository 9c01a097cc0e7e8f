"""Stats-driven join planning (lake/planner.py): ANALYZE NDV + manifest
byte/row totals choose the join strategy — the loop Iceberg closes by
feeding Puffin stats to Catalyst's CBO. The decisive test: with
Catalyst's own broadcast heuristic DISABLED, the planner's stats still
flip the dim join to a BroadcastHashJoin."""

from __future__ import annotations

import pytest

from tests.conftest import one_part
from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.lake.planner import (
    plan_join,
    scan_estimate,
)
from demo_iceberg_permanent_delete_spark.plans import has_broadcast_join


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    """A small dim (50 rows) and a larger fact (20k rows) lake table."""
    wh = tmp_path_factory.mktemp("planner-wh")
    cat = Catalog(spark, str(wh))
    cat.create_namespace("default")
    dim = cat.create_table("default.dim", "k bigint, name string")
    dim.insert(
        one_part(spark, 
            [(i, f"dim-{i}") for i in range(50)], "k long, name string"
        )
    )
    fact = cat.create_table("default.fact", "k bigint, amount bigint")
    fact.insert(
        spark.createDataFrame(
            [(i % 50, i) for i in range(20_000)], "k long, amount long"
        ).repartition(4)
    )
    return dim, fact


def test_stats_flip_join_to_broadcast(spark, tables):
    dim, fact = tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # Control: Catalyst alone (heuristic disabled) shuffles both sides.
        naive = fact.read().join(dim.read(), on="k")
        assert not has_broadcast_join(naive), (
            "control join must not broadcast with the heuristic disabled"
        )
        # The planner's manifest stats flip it.
        joined, decision = plan_join(fact, dim, on="k")
        assert decision["strategy"] == "broadcast_right", decision
        assert has_broadcast_join(joined), "stats must force a broadcast join"
        assert joined.count() == 20_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_shuffle_when_nothing_fits(spark, tables):
    dim, fact = tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined, decision = plan_join(fact, dim, on="k", broadcast_threshold=1)
        assert decision["strategy"] == "shuffle"
        assert not has_broadcast_join(joined)
        assert joined.count() == 20_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_broadcast_side_respects_outer_semantics(tables):
    dim, fact = tables
    # Left-outer: only the right side may be broadcast; if the right side
    # is the big fact table and doesn't fit, fall back to shuffle even
    # though the left dim would fit.
    joined, decision = plan_join(
        dim, fact, on="k", how="left", broadcast_threshold=10_000
    )
    assert decision["strategy"] == "shuffle", decision
    # Inner with the same threshold broadcasts the dim.
    joined, decision = plan_join(dim, fact, on="k", how="inner",
                                 broadcast_threshold=10_000)
    assert decision["strategy"] == "broadcast_left", decision
    assert has_broadcast_join(joined)


def test_ndv_output_estimate_and_skew_hint(tables):
    dim, fact = tables
    dim.compute_table_stats()
    fact.compute_table_stats()
    joined, decision = plan_join(fact, dim, on="k")
    assert decision["stats_fresh"] == (True, True)
    est = decision["est_output_rows"]
    actual = joined.count()
    # HLL NDV error is a few percent; System-R containment is exact here
    # (every fact key hits the dim), so the estimate must be close.
    assert est is not None and abs(est - actual) / actual < 0.15, (est, actual)
    # fact side: 20k rows over ~50 distinct keys = multiplicity ~400 ≫ 64
    assert decision["skew_hint"] == ["left"], decision


def test_skew_hint_escalates_to_salted_join(spark, tmp_path):
    """No broadcast fits + fresh NDV flags the probe side → the planner
    picks the deterministic salted join and the result is identical."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    dim = cat.create_table("default.dim", "k bigint, name string")
    dim.insert(
        one_part(spark, [(i, f"dim-{i}") for i in range(50)], "k long, name string")
    )
    fact = cat.create_table("default.fact", "k bigint, amount bigint")
    fact.insert(
        spark.createDataFrame(
            [(i % 50, i) for i in range(20_000)], "k long, amount long"
        ).repartition(4)
    )
    dim.compute_table_stats()
    fact.compute_table_stats()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined, decision = plan_join(fact, dim, on="k", broadcast_threshold=1)
        assert decision["strategy"] == "salted", decision
        assert "left" in decision["skew_hint"]
        plain = fact.read().join(dim.read(), "k")
        assert joined.count() == plain.count() == 20_000
        # appends sketch-merge into the stats now, so the skew signal
        # SURVIVES an insert; a delete (unsubtractable from a sketch)
        # stales them, and without the skew signal the same sizes shuffle
        fact.insert(one_part(spark, [(0, 99_999)], "k long, amount long"))
        _, decision_ins = plan_join(fact, dim, on="k", broadcast_threshold=1)
        assert decision_ins["strategy"] == "salted", decision_ins
        fact.delete("amount = 99999")
        joined2, decision2 = plan_join(fact, dim, on="k", broadcast_threshold=1)
        assert decision2["strategy"] == "shuffle", decision2
        assert decision2["stats_fresh"] == (False, True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_estimates_track_deletes_and_staleness(spark, tmp_path):
    # Own table (NOT the module-scoped `tables` fixture): this test flips
    # MOR mode and deletes 4k rows — mutating the shared fixture made
    # every later test order-dependent.
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    fact = cat.create_table("default.fact_mut", "k bigint, amount bigint")
    fact.insert(
        spark.createDataFrame(
            [(i % 50, i) for i in range(20_000)], "k long, amount long"
        ).repartition(4)
    )
    before = scan_estimate(fact)
    assert before["rows"] == 20_000
    assert before["bytes"] > 0
    fact.compute_table_stats()
    assert scan_estimate(fact)["stats_fresh"]
    # MOR delete shrinks the live-row estimate without a data read …
    fact.set_properties({"write.delete.mode": "merge-on-read"})
    fact.delete("k < 10")
    after = scan_estimate(fact)
    assert after["rows"] == 20_000 - 4_000
    assert after["bytes"] < before["bytes"]
    # … and the new snapshot makes the ANALYZE stats stale.
    assert not after["stats_fresh"]
    assert after["ndv"] == {}


def test_predicate_scopes_the_estimate(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.days", "day bigint, v bigint")
    for d in range(4):
        t.insert(
            one_part(spark, 
                [(d, i) for i in range(1000)], "day long, v long"
            )
        )
    full = scan_estimate(t)
    one = scan_estimate(t, "day = 2")
    assert full["rows"] == 4_000
    assert one["rows"] == 1_000
    assert 0 < one["bytes"] < full["bytes"]


def test_scoped_estimate_prorates_deletes(spark, tmp_path):
    """A narrow predicate must not have the TABLE-wIDE tombstone count
    subtracted wholesale (that collapses the estimate to 0 rows and flips
    plan_join to a catastrophic broadcast); deletes prorate by the
    candidates' row share."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.days",
        "day bigint, v bigint",
        properties={"write.delete.mode": "merge-on-read"},
    )
    for d in range(4):
        t.insert(
            one_part(spark, [(d, i) for i in range(1000)], "day long, v long")
        )
    t.delete("day = 3")  # 1000 tombstones, none in day 2
    est = scan_estimate(t, "day = 2")
    # prorated: 1000 candidate rows minus 1000 * (1000/4000) = 750
    assert est["rows"] == 750
    assert est["bytes"] > 0
    # unscoped stays exact
    assert scan_estimate(t)["rows"] == 3000


def test_broadcast_threshold_parses_spark_suffixes(spark):
    from demo_iceberg_permanent_delete_spark.lake.planner import (
        DEFAULT_BROADCAST_THRESHOLD,
        _broadcast_threshold,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        for raw, want in (
            ("1g", 1024**3),
            ("10mb", 10 * 1024**2),
            ("512k", 512 * 1024),
            ("2048b", 2048),
            ("1048576", 1048576),
            # Spark validates the conf value at set(), so unparseable
            # strings can't reach the parser through a real session; the
            # fallback stays as defense-in-depth only.
            ("-1", DEFAULT_BROADCAST_THRESHOLD),
        ):
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", raw)
            assert _broadcast_threshold(spark, None) == want, raw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_composite_key_ndv_estimate(spark, tmp_path):
    """Multi-key joins use the independence estimate NDV(tuple) ~ prod of
    per-column NDVs, capped at the side's row count."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    left = cat.create_table("default.l", "a bigint, b bigint, v bigint")
    # 20 x 5 = 100 distinct (a, b) pairs over 2000 rows
    left.insert(
        one_part(
            spark,
            [(i % 20, i % 5, i) for i in range(2_000)],
            "a long, b long, v long",
        )
    )
    right = cat.create_table("default.r", "a bigint, b bigint, w bigint")
    right.insert(
        one_part(
            spark,
            [(a, b, a * 10 + b) for a in range(20) for b in range(5)],
            "a long, b long, w long",
        )
    )
    left.compute_table_stats()
    right.compute_table_stats()
    joined, decision = plan_join(left, right, on=["a", "b"])
    actual = joined.count()
    assert actual == 2_000
    est = decision["est_output_rows"]
    # exact containment: 2000 * 100 / max(100, 100) = 2000 (HLL few-% err)
    assert est is not None and abs(est - actual) / actual < 0.1, (est, actual)
    # left multiplicity 2000/100 = 20 < 64: no skew flag
    assert decision["skew_hint"] == []


def test_eq_delete_rows_shrink_fresh_estimate_and_flip_join(spark, tmp_path):
    """Round-5 brief item 2: an eq-delete-heavy table's estimate must
    account for the masked rows when statistics are fresh. Stats stay
    fresh only across appends, so fresh stats always post-date the eq
    delete — ANALYZE's row_count already counted live rows, making the
    masked total EXACT (manifest_live − row_count) rather than the NDV
    containment guess. The estimate must drop below the broadcast
    threshold and flip plan_join to broadcast_right."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    heavy = cat.create_table("default.heavy", "grp bigint, pad string")
    heavy.insert(
        spark.createDataFrame(
            [(i % 100, "x" * 200) for i in range(10_000)],
            "grp long, pad string",
        ).repartition(4)
    )
    # mask 95 of 100 groups → 9_500 of 10_000 rows
    heavy.equality_delete(
        spark.createDataFrame([(g,) for g in range(95)], "grp long")
    )

    # stale stats (none computed): conservative upper bound, no subtraction
    stale = scan_estimate(heavy)
    assert stale["rows"] == 10_000
    assert stale["rows_exact_upper_bound"] is True
    assert stale["eq_masked_rows_est"] is None

    # fresh stats post-date the delete → exact masked total
    heavy.compute_table_stats()
    est = scan_estimate(heavy)
    assert est["eq_masked_rows_est"] == 9_500
    assert est["rows"] == 500
    assert est["rows_exact_upper_bound"] is False
    assert 0 < est["bytes"] < stale["bytes"] // 10

    # an append keeps stats fresh and the estimate tracks the new rows
    heavy.insert(
        spark.createDataFrame([(200, "y")], "grp long, pad string")
    )
    est2 = scan_estimate(heavy)
    assert est2["stats_fresh"] is True
    assert est2["rows"] == 501

    fact = cat.create_table("default.factx", "grp bigint, amount bigint")
    fact.insert(
        spark.createDataFrame(
            [(i % 100, i) for i in range(20_000)], "grp long, amount long"
        ).repartition(4)
    )
    # threshold strictly between the masked-aware estimate and the
    # upper-bound estimate: only the eq-delete subtraction can flip it
    threshold = (est2["bytes"] + stale["bytes"]) // 2
    joined, decision = plan_join(
        fact, heavy, on="grp", broadcast_threshold=threshold
    )
    assert decision["strategy"] == "broadcast_right", decision
    assert has_broadcast_join(joined)
    # 5 surviving groups × 200 fact rows × 100 heavy rows per group
    assert joined.count() == 5 * 200 * 100


def test_delete_pressure_ratio_includes_eq_masked_rows(spark, tmp_path):
    """plan_compaction's delete_pressure folds the exact eq-masked total
    into `ratio` when statistics are fresh (round-5 brief item 2)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.eqp", "k bigint, flag string")
    t.insert(
        one_part(
            spark,
            [(i, "R" if i % 2 else "N") for i in range(50)],
            "k bigint, flag string",
        )
    )
    t.equality_delete(spark.createDataFrame([("R",)], "flag string"))
    dp = t.plan_compaction()["delete_pressure"]
    assert dp["eq_masked_rows_est"] is None  # stale stats → unknowable
    assert dp["ratio"] == 0.0
    t.compute_table_stats()
    dp = t.plan_compaction()["delete_pressure"]
    assert dp["eq_masked_rows_est"] == 25
    assert dp["ratio"] == 0.5
