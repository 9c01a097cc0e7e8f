"""Changelog scan (Iceberg create_changelog_view parity): INSERT/DELETE
row feeds per commit, ordinals, net-changes mode, replace-skip, and the
SQL procedure surface."""

from __future__ import annotations

import pytest

from tests.conftest import one_part
from demo_iceberg_permanent_delete_spark.lake import Catalog

DDL = "k bigint, v string"


def _rows(df):
    return sorted(
        (r["_change_type"], r["_change_ordinal"], r["k"], r["v"])
        for r in df.collect()
    )


@pytest.fixture
def table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.chg", DDL, properties={"write.delete.mode": "merge-on-read"}
    )
    t.insert(spark.createDataFrame([(1, "a"), (2, "b")], DDL))
    t.insert(spark.createDataFrame([(3, "c")], DDL))
    return t


def test_appends_emit_inserts_with_ordinals(table):
    assert _rows(table.changes()) == [
        ("INSERT", 0, 1, "a"),
        ("INSERT", 0, 2, "b"),
        ("INSERT", 1, 3, "c"),
    ]
    # range bounds: after the first commit only the second shows
    first = table.metadata.snapshots[0].snapshot_id
    assert _rows(table.changes(start_snapshot_id=first)) == [("INSERT", 0, 3, "c")]


def test_mor_delete_emits_exact_deletes(table):
    table.delete("k = 2")
    got = _rows(table.changes())
    assert ("DELETE", 2, 2, "b") in got
    assert len([g for g in got if g[0] == "DELETE"]) == 1
    # snapshot id stamped and consistent per commit
    by_snap = {
        r["_change_ordinal"]: r["_commit_snapshot_id"]
        for r in table.changes().collect()
    }
    assert by_snap[2] == table.metadata.current_snapshot_id


def test_cow_delete_raw_and_net(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh2"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.cow", DDL, properties={"write.delete.mode": "copy-on-write"}
    )
    t.insert(one_part(spark, [(1, "a"), (2, "b"), (3, "c")], DDL))
    t.delete("k = 2")
    raw = _rows(t.changes())
    # raw: file-level — old file's rows deleted, kept rows re-inserted
    assert ("DELETE", 1, 2, "b") in raw
    assert ("INSERT", 1, 1, "a") in raw and ("INSERT", 1, 3, "c") in raw
    net = _rows(t.changes(net=True))
    assert [g for g in net if g[1] == 1] == [("DELETE", 1, 2, "b")]


def test_cow_update_net_is_before_after_pair(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh3"))
    cat.create_namespace("default")
    t = cat.create_table("default.upd", DDL)
    t.insert(one_part(spark, [(1, "a"), (2, "b")], DDL))
    t.update({"v": None}, "k = 2")
    net = [g for g in _rows(t.changes(net=True)) if g[1] == 1]
    assert net == [("DELETE", 1, 2, "b"), ("INSERT", 1, 2, None)]


def test_replace_snapshots_skipped(table):
    table.delete("k = 2")
    before = _rows(table.changes())
    table.rewrite_data_files()  # compaction: layout change only
    assert _rows(table.changes()) == before
    # and the rewrite snapshot consumed no ordinal
    assert max(g[1] for g in before) == 2


def test_equality_delete_changelog(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh4"))
    cat.create_namespace("default")
    t = cat.create_table("default.eqc", DDL)
    t.insert(spark.createDataFrame([(1, "a"), (2, "b"), (2, "x")], DDL))
    t.equality_delete(spark.createDataFrame([(2,)], "k bigint"))
    got = [g for g in _rows(t.changes()) if g[0] == "DELETE"]
    assert got == [("DELETE", 1, 2, "b"), ("DELETE", 1, 2, "x")]


def test_empty_table_changelog(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh5"))
    cat.create_namespace("default")
    t = cat.create_table("default.empty", DDL)
    df = t.changes()
    assert df.count() == 0
    assert df.columns == ["k", "v", "_change_type", "_change_ordinal", "_commit_snapshot_id"]


def test_changelog_via_sql_procedure(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh6"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql(f"CREATE TABLE demo.default.cl ({DDL}) USING iceberg")
    eng.sql("INSERT INTO demo.default.cl VALUES (1, 'a'), (2, 'b')")
    out = eng.sql(
        "CALL demo.system.create_changelog_view(table => 'default.cl', "
        "changelog_view => 'cl_changes')"
    ).collect()
    assert out[0]["changelog_view"] == "cl_changes"
    got = spark.sql(
        "SELECT k, _change_type FROM cl_changes ORDER BY k"
    ).collect()
    assert [(r["k"], r["_change_type"]) for r in got] == [
        (1, "INSERT"),
        (2, "INSERT"),
    ]
