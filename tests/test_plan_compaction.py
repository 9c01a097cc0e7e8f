"""Compaction planning (lake/maintenance.plan_compaction): manifest-only
candidate selection feeding scoped rewrite_data_files — Iceberg's binpack
candidate selection re-expressed over the JSON-manifest lake."""

from __future__ import annotations

import datetime as dt

from tests.conftest import one_part
from demo_iceberg_permanent_delete_spark.lake import Catalog


def test_small_file_groups_and_scoped_rewrite(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.days", "ts timestamp, v bigint", partition_by=["days(ts)"]
    )
    # day 1: five tiny files (the small-file problem); day 2: one file
    for i in range(5):
        t.insert(
            one_part(
                spark,
                [(dt.datetime(2024, 6, 5, 10, 0, i), i)],
                "ts timestamp, v bigint",
            )
        )
    t.insert(
        one_part(
            spark,
            [(dt.datetime(2024, 6, 6, 10, 0, 0), 99)],
            "ts timestamp, v bigint",
        )
    )
    plan = t.plan_compaction(min_input_files=4)
    assert len(plan["groups"]) == 1
    g = plan["groups"][0]
    assert g["partition"] == {"days(ts)": "2024-06-05"}
    assert g["file_count"] == 5
    assert g["where"] is not None and "2024-06-05" in g["where"]
    # the emitted predicate drives a scoped rewrite: 5 small files -> 1,
    # the other day's file untouched
    before = {e.file_path for e in t.metadata.current_snapshot().data_files()}
    stats = t.rewrite_data_files(where=g["where"])
    assert stats["rewritten_data_files_count"] == 5
    after = t.metadata.current_snapshot().data_files()
    assert len(after) == 2
    untouched = [e for e in after if e.file_path in before]
    assert len(untouched) == 1  # day-2 file carried over
    assert t.read().count() == 6
    # post-compaction the plan is clean
    assert t.plan_compaction(min_input_files=4)["groups"] == []


def test_identity_partition_where_and_quoting(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.ident", "label string, v bigint", partition_by=["label"]
    )
    for i in range(4):
        t.insert(
            one_part(spark, [("it's-a", i)], "label string, v bigint")
        )
    plan = t.plan_compaction(min_input_files=3)
    [g] = plan["groups"]
    assert g["where"] == "label = 'it''s-a'"
    stats = t.rewrite_data_files(where=g["where"])
    assert stats["rewritten_data_files_count"] == 4
    assert t.read().count() == 4


def test_delete_pressure_recommendation(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.mor",
        "k bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(one_part(spark, [(i, f"v{i}") for i in range(100)], "k bigint, v string"))
    p0 = t.plan_compaction()
    assert p0["delete_pressure"]["recommend_rewrite"] is False
    t.delete("k < 30")
    p1 = t.plan_compaction()
    dp = p1["delete_pressure"]
    # exact: DV record_count is the deleted-row cardinality
    assert dp["deleted_rows"] == 30 and dp["data_records"] == 100
    assert dp["ratio"] == 0.3 and dp["recommend_rewrite"] is True
    t.rewrite_data_files()
    assert t.plan_compaction()["delete_pressure"]["recommend_rewrite"] is False


def test_value_transform_matches_spark_transforms(spark):
    """plan_compaction's Python twin of transforms.transform_column must
    agree with the Spark expression on manifest-stat representations
    (JSON-roundtripped: timestamps/dates arrive as isoformat strings)."""
    from demo_iceberg_permanent_delete_spark.lake.maintenance import (
        _value_transform,
    )
    from demo_iceberg_permanent_delete_spark.lake.transforms import (
        parse_partition_by,
        transform_column,
    )

    ts = [
        dt.datetime(2024, 6, 5, 23, 59, 59),
        dt.datetime(1999, 12, 31, 0, 0, 1),
        dt.datetime(2024, 2, 29, 12, 30, 0),
    ]
    strs = ["hello world", "ab", "x" * 40, "naïve-ütf"]
    ints = [-17, -1, 0, 1, 7, 99, 12345]
    cases = [
        ("days(ts)", "ts timestamp", [(t,) for t in ts], lambda v: v.isoformat()),
        ("hours(ts)", "ts timestamp", [(t,) for t in ts], lambda v: v.isoformat()),
        ("months(ts)", "ts timestamp", [(t,) for t in ts], lambda v: v.isoformat()),
        ("truncate(4, s)", "s string", [(s,) for s in strs], str),
        ("truncate(10, k)", "k bigint", [(i,) for i in ints], lambda v: v),
        ("k", "k bigint", [(i,) for i in ints], lambda v: v),
    ]
    for spec, ddl, rows, stat_repr in cases:
        [fld] = parse_partition_by([spec])
        df = one_part(spark, rows, ddl)
        col = df.schema.fields[0]
        got = [
            r[0]
            for r in df.select(
                transform_column(fld, col.dataType).cast("string")
            ).collect()
        ]
        for (value,), spark_val in zip(rows, got):
            mine = _value_transform(fld, stat_repr(value))
            assert str(mine) == str(spark_val), (spec, value, mine, spark_val)


def test_sql_call_plan_compaction(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS default")
    eng.sql("CREATE TABLE default.t (k bigint, v string) USING iceberg")
    for i in range(4):
        eng.sql(f"INSERT INTO default.t VALUES ({i}, 'v{i}')")
    rows = eng.sql("CALL demo.system.plan_compaction('default.t')").collect()
    [g] = rows
    assert g["file_count"] == 4 and g["recommend_rewrite"] is False
    assert g["delete_ratio"] == 0.0


def test_ungrouped_files_and_unpartitioned(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.flat", "k bigint, v string")
    for lo in (0, 100, 200, 300):
        t.insert(
            one_part(
                spark,
                [(lo + i, f"v{i}") for i in range(5)],
                "k bigint, v string",
            )
        )
    plan = t.plan_compaction(min_input_files=4)
    # unpartitioned: all files group under the empty partition tuple
    [g] = plan["groups"]
    assert g["partition"] is None or g["partition"] == {}
    assert g["file_count"] == 4


def test_compact_executes_plan_per_partition(spark, tmp_path):
    """The closed maintenance loop: fragmented multi-partition table → one
    compact() call → each partition at one file, untouched partitions
    untouched, per-group scoped commits (never cross-partition binpack)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.frag", "label string, v bigint", partition_by=["label"]
    )
    for label, n in (("a", 5), ("b", 4), ("c", 1)):
        for i in range(n):
            t.insert(one_part(spark, [(label, i)], "label string, v bigint"))
    before_c = [
        e
        for e in t.metadata.current_snapshot().data_files()
        if e.min_values.get("label") == "c"
    ]
    summary = t.compact(min_input_files=4)
    assert summary["full_rewrite"] is False
    assert summary["groups_compacted"] == 2  # a and b; c below min_input
    assert summary["rewritten_data_files_count"] == 9
    after = t.metadata.current_snapshot().data_files()
    by_label: dict[str, int] = {}
    for e in after:
        by_label[e.min_values.get("label")] = by_label.get(
            e.min_values.get("label"), 0
        ) + 1
    assert by_label == {"a": 1, "b": 1, "c": 1}
    # the c file was carried over, not rewritten
    assert before_c[0].file_path in {e.file_path for e in after}
    assert t.read().count() == 10
    # idempotent: a second call finds nothing
    again = t.compact(min_input_files=4)
    assert again["groups_compacted"] == 0 and again["full_rewrite"] is False


def test_compact_full_rewrite_purges_delete_files(spark, tmp_path):
    """Under delete pressure compact() escalates to one full rewrite that
    makes MOR tombstones physical (zero delete files survive)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.morc",
        "k bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(one_part(spark, [(i, f"v{i}") for i in range(100)], "k bigint, v string"))
    t.delete("k < 30")
    summary = t.compact()
    assert summary["full_rewrite"] is True
    assert not t.metadata.current_snapshot().delete_files()
    assert t.read().count() == 70


def test_eq_delete_pressure_recommends_rewrite(spark, tmp_path):
    """Equality deletes mask an unknowable row count, but their presence
    alone must surface as pressure (read-path anti-join amplification) and
    compact() must apply them physically."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.eq", "k bigint, flag string")
    t.insert(
        one_part(
            spark,
            [(i, "R" if i % 2 else "N") for i in range(50)],
            "k bigint, flag string",
        )
    )
    t.equality_delete(spark.createDataFrame([("R",)], "flag string"))
    dp = t.plan_compaction()["delete_pressure"]
    assert dp["eq_delete_files"] == 1 and dp["recommend_rewrite"] is True
    from demo_iceberg_permanent_delete_spark.lake import scan_estimate

    est = scan_estimate(t)
    assert est["eq_delete_files"] == 1 and est["rows_exact_upper_bound"] is True
    assert est["rows"] == 50  # upper bound: eq-deletes not subtracted
    summary = t.compact()
    assert summary["full_rewrite"] is True
    assert not t.metadata.current_snapshot().delete_files()
    assert t.read().count() == 25


def test_unattributable_files_reported_separately(spark, tmp_path):
    """Files whose partition can't be derived from stats (value-straddling
    files) land in `ungrouped`, never in a compactable group — a scheduler
    binpacking them would interleave partitions."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.strad", "label string, v bigint", partition_by=["label"]
    )
    # 4 files straddling two label values: partition underivable
    for i in range(4):
        t.insert(
            one_part(
                spark, [("a", i), ("b", i)], "label string, v bigint"
            )
        )
    plan = t.plan_compaction(min_input_files=2)
    assert plan["groups"] == []
    assert plan["ungrouped"]["file_count"] == 4
    summary = t.compact(min_input_files=2)
    assert summary["groups_compacted"] == 0
    assert summary["ungrouped_files"] == 4


def test_sql_call_compact(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS default")
    eng.sql(
        "CREATE TABLE default.t (k bigint, v string) USING iceberg "
        "PARTITIONED BY (k)"
    )
    for i in range(4):
        eng.sql(f"INSERT INTO default.t VALUES (7, 'v{i}')")
    [row] = eng.sql("CALL demo.system.compact('default.t')").collect()
    assert row["groups_compacted"] == 1 and row["rewritten_data_files_count"] == 4
    assert (
        len(eng.table("default.t").metadata.current_snapshot().data_files()) == 1
    )


def test_compact_on_empty_table_is_noop(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.empty", "k bigint, v string")
    summary = t.compact()
    assert summary["groups_compacted"] == 0 and summary["full_rewrite"] is False
    assert summary["ungrouped_files"] == 0


def test_compact_unpartitioned_table(spark, tmp_path):
    """File-scoped selection needs no derivable predicate: unpartitioned
    fragmented tables compact too (the simplest and most common layout)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.flat2", "k bigint, v string")
    for lo in (0, 100, 200, 300, 400):
        t.insert(
            one_part(spark, [(lo + i, f"v{i}") for i in range(5)], "k bigint, v string")
        )
    summary = t.compact(min_input_files=4)
    assert summary["groups_compacted"] == 1
    assert summary["rewritten_data_files_count"] == 5
    assert len(t.metadata.current_snapshot().data_files()) == 1
    assert t.read().count() == 25


def test_compact_skips_target_sized_neighbors(spark, tmp_path):
    """The planned group is a FILE list: an already-target-sized file in
    the same partition must not be re-written by compact()."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.mix", "label string, v bigint", partition_by=["label"]
    )
    # one "big" file (not small by the tiny threshold) + 4 tiny ones, same partition
    t.insert(
        one_part(
            spark, [("a", i) for i in range(2000)], "label string, v bigint"
        )
    )
    big = {e.file_path for e in t.metadata.current_snapshot().data_files()}
    for i in range(4):
        t.insert(one_part(spark, [("a", 10_000 + i)], "label string, v bigint"))
    # threshold chosen so only the 4 single-row files count as small
    small_target = 4096
    plan = t.plan_compaction(
        target_file_size_bytes=small_target * 2, min_input_files=4
    )
    [g] = plan["groups"]
    assert g["file_count"] == 4 and not (set(g["files"]) & big)
    summary = t.compact(
        target_file_size_bytes=small_target * 2, min_input_files=4
    )
    assert summary["rewritten_data_files_count"] == 4
    after = {e.file_path for e in t.metadata.current_snapshot().data_files()}
    assert big <= after, "the target-sized neighbor must be carried over untouched"
    assert t.read().count() == 2004


def test_sql_plan_compaction_surfaces_eq_deletes_and_ungrouped(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS default")
    eng.sql(
        "CREATE TABLE default.s (label string, v bigint) USING iceberg "
        "PARTITIONED BY (label)"
    )
    t = eng.table("default.s")
    # straddling files -> ungrouped; eq delete -> eq_delete_files visible
    for i in range(2):
        t.insert(one_part(spark, [("a", i), ("b", i)], "label string, v bigint"))
    t.equality_delete(spark.createDataFrame([("a",)], "label string"))
    rows = eng.sql("CALL demo.system.plan_compaction('default.s')").collect()
    by_part = {r["partition"]: r for r in rows}
    assert "__ungrouped__" in by_part
    assert by_part["__ungrouped__"]["file_count"] == 2
    assert all(r["eq_delete_files"] == 1 for r in rows)
    assert all(r["recommend_rewrite"] for r in rows)


def test_multi_field_partition_where_conjunction(spark, tmp_path):
    """Multi-field identity/day specs emit a usable AND-conjunction
    `where`; the emitted predicate drives a manual scoped rewrite."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.two",
        "region string, ts timestamp, v bigint",
        partition_by=["region", "days(ts)"],
    )
    for i in range(4):
        t.insert(
            one_part(
                spark,
                [("eu", dt.datetime(2024, 6, 5, 10, 0, i), i)],
                "region string, ts timestamp, v bigint",
            )
        )
    t.insert(
        one_part(
            spark,
            [("us", dt.datetime(2024, 6, 5, 11, 0, 0), 99)],
            "region string, ts timestamp, v bigint",
        )
    )
    plan = t.plan_compaction(min_input_files=4)
    [g] = plan["groups"]
    assert g["where"] is not None
    assert "region = 'eu'" in g["where"] and "2024-06-05" in g["where"]
    stats = t.rewrite_data_files(where=g["where"])
    assert stats["rewritten_data_files_count"] == 4
    assert t.read().count() == 5
