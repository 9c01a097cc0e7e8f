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


def test_remove_carryovers_cancels_rewrite_pairs(spark, tmp_path):
    """COW update: kept rows appear as identical DELETE+INSERT pairs in
    the raw feed; remove_carryovers cancels exactly those (multiset —
    duplicate rows cancel pairwise, survivors keep their count)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.carry", DDL)
    # (1,'a') duplicated on purpose: both copies are carry-overs of the
    # update commit and BOTH must cancel
    t.insert(one_part(spark, [(1, "a"), (1, "a"), (2, "b"), (3, "c")], DDL))
    t.update({"v": None}, "k = 2")
    raw = [g for g in _rows(t.changes()) if g[1] == 1]
    assert ("DELETE", 1, 1, "a") in raw and ("INSERT", 1, 1, "a") in raw
    got = [g for g in _rows(t.changes(remove_carryovers=True)) if g[1] == 1]
    assert got == [("DELETE", 1, 2, "b"), ("INSERT", 1, 2, None)]
    # ordinal-0 inserts untouched, duplicates preserved
    assert [g for g in _rows(t.changes(remove_carryovers=True)) if g[1] == 0] == [
        ("INSERT", 0, 1, "a"),
        ("INSERT", 0, 1, "a"),
        ("INSERT", 0, 2, "b"),
        ("INSERT", 0, 3, "c"),
    ]


def test_compute_updates_pairs_images(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.cu", DDL)
    t.insert(one_part(spark, [(1, "a"), (2, "b"), (3, "c")], DDL))
    t.update({"v": None}, "k = 2")
    got = _rows(t.changes(compute_updates=True, identifier_columns=["k"]))
    assert [g for g in got if g[1] == 1] == [
        ("UPDATE_AFTER", 1, 2, None),
        ("UPDATE_BEFORE", 1, 2, "b"),
    ]
    # lone deletes/inserts keep their labels
    t.delete("k = 3")
    got = _rows(t.changes(compute_updates=True, identifier_columns=["k"]))
    assert ("DELETE", 2, 3, "c") in got
    # default identifier columns come from the table's identifier fields
    t.set_identifier_fields(["k"])
    assert _rows(t.changes(compute_updates=True)) == got


def test_compute_updates_guards(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.gu", DDL)
    t.insert(one_part(spark, [(2, "b"), (2, "x")], DDL))
    with pytest.raises(ValueError, match="net_changes and compute_updates"):
        t.changes(net=True, compute_updates=True, identifier_columns=["k"])
    with pytest.raises(ValueError, match="identifier_columns or table"):
        t.changes(compute_updates=True)
    with pytest.raises(ValueError, match="not in table"):
        t.changes(compute_updates=True, identifier_columns=["nope"])
    # a key with two updates in one commit cannot be paired: the in-plan
    # guard raises at consumption time, naming the columns
    t.update({"v": None}, "k = 2")
    with pytest.raises(Exception, match="not unique within commit"):
        t.changes(compute_updates=True, identifier_columns=["k"]).collect()


def test_compute_updates_key_change_stays_delete_insert(spark, tmp_path):
    """An update that MOVES a row to a new identifier value is not an
    update pair — value-based pairing sees DELETE(old key) + INSERT(new
    key), exactly Iceberg's semantics."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.mv", DDL)
    t.insert(one_part(spark, [(1, "a"), (2, "b")], DDL))
    t.update({"k": 9}, "k = 2")
    got = [
        g
        for g in _rows(t.changes(compute_updates=True, identifier_columns=["k"]))
        if g[1] == 1
    ]
    assert got == [("DELETE", 1, 2, "b"), ("INSERT", 1, 9, "b")]


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


def test_changelog_procedure_update_images_and_timestamps(spark, tmp_path):
    """The Iceberg argument surface: identifier_columns => array(...)
    turns compute_updates on (Iceberg's defaulting), carry-overs are
    removed by default with remove_carryovers => false as the escape
    hatch, and start/end-timestamp options resolve through the same
    at-or-before rule as TIMESTAMP AS OF."""
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql(
        "CREATE TABLE demo.default.cl (k bigint, v string) USING iceberg "
        "TBLPROPERTIES ('write.update.mode'='copy-on-write')"
    )
    # one data file (one_part), so the COW update's rewrite carries
    # rows 1 and 3 over
    eng.catalog.load_table("default.cl").insert(
        one_part(spark, [(1, "a"), (2, "b"), (3, "c")], DDL)
    )
    eng.sql("UPDATE demo.default.cl SET v = 'B' WHERE k = 2")
    eng.sql(
        "CALL demo.system.create_changelog_view(table => 'default.cl', "
        "changelog_view => 'u1', identifier_columns => array('k'))"
    )
    got = sorted(
        (r["_change_type"], r["k"], r["v"])
        for r in spark.sql("SELECT * FROM u1 WHERE _change_ordinal = 1").collect()
    )
    assert got == [("UPDATE_AFTER", 2, "B"), ("UPDATE_BEFORE", 2, "b")]

    # default: carry-overs removed (COW update rewrote rows 1 and 3)
    eng.sql(
        "CALL demo.system.create_changelog_view(table => 'default.cl', "
        "changelog_view => 'u2')"
    )
    ord1 = sorted(
        (r["_change_type"], r["k"])
        for r in spark.sql("SELECT * FROM u2 WHERE _change_ordinal = 1").collect()
    )
    assert ord1 == [("DELETE", 2), ("INSERT", 2)]
    eng.sql(
        "CALL demo.system.create_changelog_view(table => 'default.cl', "
        "changelog_view => 'u3', remove_carryovers => false)"
    )
    assert spark.sql("SELECT * FROM u3 WHERE _change_ordinal = 1").count() == 6

    # net_changes + compute_updates rejected (Iceberg parity)
    with pytest.raises(ValueError, match="net_changes and compute_updates"):
        eng.sql(
            "CALL demo.system.create_changelog_view(table => 'default.cl', "
            "changelog_view => 'u4', net_changes => true, "
            "compute_updates => true, identifier_columns => array('k'))"
        )

    # timestamp range options: before-creation start = everything,
    # before-creation end = empty feed
    eng.sql(
        "CALL demo.system.create_changelog_view(table => 'default.cl', "
        "changelog_view => 'u5', options => map('start-timestamp', '1'))"
    )
    assert spark.sql("SELECT * FROM u5").count() > 0
    eng.sql(
        "CALL demo.system.create_changelog_view(table => 'default.cl', "
        "changelog_view => 'u6', options => map('end-timestamp', '1'))"
    )
    assert spark.sql("SELECT * FROM u6").count() == 0
    # end-timestamp 'now' covers both commits
    import time

    now_ms = int(time.time() * 1000) + 60_000
    eng.sql(
        "CALL demo.system.create_changelog_view(table => 'default.cl', "
        f"changelog_view => 'u7', options => map('end-timestamp', '{now_ms}'))"
    )
    assert (
        spark.sql("SELECT max(_change_ordinal) AS m FROM u7").collect()[0]["m"] == 1
    )


def test_changelog_timestamps_resolve_on_main_ancestry(spark, tmp_path):
    """Timestamp options must resolve against the MAIN ancestry: a
    WAP-staged or branch commit that is the newest snapshot must neither
    leak unpublished rows into the view nor fail the ancestry check
    (review finding — plain snapshot_as_of scans all snapshots)."""
    import time

    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql("CREATE TABLE demo.default.tb (k bigint, v string) USING iceberg")
    eng.sql("INSERT INTO demo.default.tb VALUES (1, 'a')")
    # newest snapshots: one branch commit and one wap.id-staged commit
    eng.sql("ALTER TABLE demo.default.tb CREATE BRANCH dev")
    eng.sql("INSERT INTO demo.default.tb.branch_dev VALUES (9, 'branch-only')")
    spark.conf.set("spark.wap.id", "w1")
    try:
        eng.sql("INSERT INTO demo.default.tb VALUES (8, 'staged-only')")
    finally:
        spark.conf.unset("spark.wap.id")
    now_ms = int(time.time() * 1000) + 60_000
    eng.sql(
        "CALL demo.system.create_changelog_view(table => 'default.tb', "
        f"changelog_view => 'tb1', options => map('end-timestamp', '{now_ms}'))"
    )
    got = sorted((r["k"], r["v"]) for r in spark.sql("SELECT * FROM tb1").collect())
    assert got == [(1, "a")]  # neither the branch nor the staged row
    # a start just after the main head: empty feed, not an ancestry error
    eng.sql(
        "CALL demo.system.create_changelog_view(table => 'default.tb', "
        f"changelog_view => 'tb2', options => map('start-timestamp', '{now_ms}'))"
    )
    assert spark.sql("SELECT * FROM tb2").count() == 0


def test_pair_update_images_public_postprocessor(spark, tmp_path):
    """pair_update_images (Iceberg's ChangelogIterator as a public
    operator) equals changes(compute_updates=True) applied to the same
    range, rides extra columns (lineage) untouched, and validates its
    input is a changelog frame."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.pp", DDL)
    t.insert(one_part(spark, [(1, "a"), (2, "b")], DDL))
    t.update({"v": None}, "k = 2")
    via_flag = _rows(t.changes(compute_updates=True, identifier_columns=["k"]))
    via_post = _rows(
        t.pair_update_images(t.changes(), identifier_columns=["k"])
    )
    assert via_post == via_flag
    with pytest.raises(ValueError, match="not a changelog frame"):
        t.pair_update_images(t.read(), identifier_columns=["k"])


def test_pair_update_images_idempotent(spark, tmp_path):
    """Re-applying the post-processor must pass already-paired rows
    through untouched (review finding: the carry-over cancel used to
    silently drop every non-DELETE/INSERT label)."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.idem", DDL)
    t.insert(one_part(spark, [(1, "a"), (2, "b")], DDL))
    t.update({"v": None}, "k = 2")
    once = t.pair_update_images(t.changes(), identifier_columns=["k"])
    twice = t.pair_update_images(once, identifier_columns=["k"])
    assert _rows(twice) == _rows(once)
    assert ("UPDATE_BEFORE", 1, 2, "b") in _rows(twice)
