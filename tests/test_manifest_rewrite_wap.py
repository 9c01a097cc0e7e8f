"""rewrite_manifests (manifest-chain compaction) and write-audit-publish
(branch writes + cherrypick_snapshot / fast_forward('main')).

Iceberg parity surfaces: CALL rewrite_manifests, CALL cherrypick_snapshot,
CALL fast_forward — the manifest optimizer + WAP publish procedures the
reference's catalog stack (docker-compose.yml:23-30) ships alongside the
maintenance procedures its notebook exercises.
"""

from __future__ import annotations

import os

import pytest

from demo_iceberg_permanent_delete_spark.lake import Catalog

DDL = "k bigint, v string"


@pytest.fixture
def table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.mrw", DDL)
    t.insert(spark.createDataFrame([(1, "a"), (2, "b")], DDL))
    return t


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_rewrite_manifests_folds_chain(table, spark):
    for i in range(2, 12):
        table.insert(spark.createDataFrame([(i * 10, f"r{i}")], DDL))
    meta = table.metadata
    head = meta.current_snapshot_id
    assert meta.chain_length(head) == 11
    before = _rows(table.read())
    mid_id = meta.snapshots[4].snapshot_id
    mid_rows = _rows(table.read(snapshot_id=mid_id))

    stats = table.rewrite_manifests()
    assert stats == {"rewritten_manifests_count": 11, "added_manifests_count": 1}
    # same head snapshot, now O(1) reconstruction; data unchanged
    assert table.metadata.current_snapshot_id == head
    assert table.metadata.chain_length(head) == 1
    assert _rows(table.read()) == before
    # time travel to pre-rewrite snapshots is untouched
    assert _rows(table.read(snapshot_id=mid_id)) == mid_rows

    # a reloaded handle resolves from the persisted base manifest alone
    fresh = Catalog(spark, table.location.rsplit("/default/", 1)[0]).load_table(
        "default.mrw"
    )
    assert fresh.metadata.chain_length(head) == 1
    assert _rows(fresh.read()) == before

    # next commit parents on the base: chain grows from 1, not 11
    table.insert(spark.createDataFrame([(999, "z")], DDL))
    assert table.metadata.chain_length(table.metadata.current_snapshot_id) == 2

    # idempotent below threshold: a 1-long chain is left alone
    table.rewrite_manifests()
    assert table.rewrite_manifests() == {
        "rewritten_manifests_count": 0,
        "added_manifests_count": 0,
    }


def test_rewrite_manifests_old_delta_becomes_orphan(table, spark):
    table.insert(spark.createDataFrame([(3, "c")], DDL))
    head = table.metadata.snapshot_by_id(table.metadata.current_snapshot_id)
    old_manifest = head.manifest_file
    table.rewrite_manifests()
    assert head.manifest_file != old_manifest
    assert os.path.exists(old_manifest)  # kept for stale readers
    import datetime as dt

    # Action path (bypasses the 3-day window) with an immediate cutoff —
    # the reference's cleanup_utils.py:49-67 "immediate" shape
    orphans = table.remove_orphan_files(
        older_than=dt.datetime.now(dt.timezone.utc) + dt.timedelta(days=1),
        enforce_safety=False,
    )
    assert old_manifest in orphans
    assert not os.path.exists(old_manifest)
    # table still fully readable after GC
    assert table.read().count() == 3


def test_wap_branch_write_then_fast_forward_publish(table, spark):
    table.create_branch("audit")
    staged = table.insert(
        spark.createDataFrame([(100, "staged")], DDL), branch="audit"
    )
    # write: branch advanced, main untouched
    assert table.resolve_ref("audit") == staged.snapshot_id
    assert _rows(table.read()) == [(1, "a"), (2, "b")]
    # audit: the staged rows are readable through the branch
    assert (100, "staged") in _rows(table.read(ref="audit"))
    # publish: branch head is a descendant of main → fast-forward
    table.fast_forward("main", staged.snapshot_id)
    assert table.metadata.current_snapshot_id == staged.snapshot_id
    assert (100, "staged") in _rows(table.read())


def test_fast_forward_main_rejects_non_descendant(table, spark):
    table.create_branch("audit")
    staged = table.insert(spark.createDataFrame([(100, "s")], DDL), branch="audit")
    # main moves independently → branch head no longer a descendant
    table.insert(spark.createDataFrame([(200, "m")], DDL))
    with pytest.raises(ValueError, match="not a descendant"):
        table.fast_forward("main", staged.snapshot_id)


def test_cherrypick_replays_staged_changes(table, spark):
    table.create_branch("audit")
    staged = table.insert(spark.createDataFrame([(100, "s")], DDL), branch="audit")
    table.insert(spark.createDataFrame([(200, "m")], DDL))  # main diverges
    snap = table.cherrypick_snapshot(staged.snapshot_id)
    assert snap.summary["source-snapshot-id"] == staged.snapshot_id
    got = _rows(table.read())
    assert (100, "s") in got and (200, "m") in got and (1, "a") in got
    # cherry-picking an ancestor whose files are already present is a
    # well-defined no-op (the change set dedupes by path)
    first = table.metadata.snapshots[0].snapshot_id
    table.cherrypick_snapshot(first)
    assert _rows(table.read()) == got


def test_cherrypick_survives_rewrite_manifests_fold(table, spark):
    """rewrite_manifests folds every ref head — including a staged WAP
    branch — but the staged change set must still be replayable
    (metadata.change_set reconstructs it vs the parent)."""
    table.create_branch("audit")
    staged = table.insert(spark.createDataFrame([(100, "s")], DDL), branch="audit")
    table.insert(spark.createDataFrame([(200, "m")], DDL))  # main diverges
    stats = table.rewrite_manifests()  # folds main head AND audit head
    assert stats["added_manifests_count"] == 2
    table.cherrypick_snapshot(staged.snapshot_id)
    got = _rows(table.read())
    assert (100, "s") in got and (200, "m") in got and len(got) == 4


def test_changelog_unaffected_by_rewrite_manifests(table, spark):
    """CDC must report per-commit changes, not the folded full set."""
    s1 = table.metadata.current_snapshot_id
    table.insert(spark.createDataFrame([(3, "c")], DDL))
    table.rewrite_manifests()  # head delta folded to a 3-row base
    chg = table.changes(start_snapshot_id=s1).collect()
    assert sorted((r["k"], r["_change_type"]) for r in chg) == [(3, "INSERT")], (
        "changelog after fold must contain only the second commit's row"
    )


def test_insert_unknown_branch_raises(table, spark):
    with pytest.raises(KeyError, match="unknown branch"):
        table.insert(spark.createDataFrame([(1, "x")], DDL), branch="nope")


def test_procedures_via_sql_facade(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS default")
    eng.sql("CREATE TABLE default.wapt (k bigint, v string) USING iceberg")
    eng.sql("INSERT INTO default.wapt VALUES (1, 'a')")
    eng.sql("INSERT INTO default.wapt VALUES (2, 'b')")

    row = eng.sql("CALL demo.system.rewrite_manifests('default.wapt')").first()
    assert row["rewritten_manifests_count"] == 2
    assert row["added_manifests_count"] == 1

    # single-writer discipline: reload the handle after every facade commit
    # (eng.table() loads fresh; a long-lived handle would be a stale writer)
    t = eng.table("default.wapt")
    t.create_branch("audit")
    staged = t.insert(spark.createDataFrame([(3, "c")], DDL), branch="audit")
    row = eng.sql(
        f"CALL demo.system.fast_forward('default.wapt', 'main', {staged.snapshot_id})"
    ).first()
    assert row["updated_ref"] == staged.snapshot_id
    assert eng.sql("SELECT COUNT(*) AS n FROM default.wapt").first()["n"] == 3

    t = eng.table("default.wapt")
    t.create_branch("audit2", staged.snapshot_id)
    staged2 = t.insert(spark.createDataFrame([(4, "d")], DDL), branch="audit2")
    t.insert(spark.createDataFrame([(5, "e")], DDL))  # main diverges
    row = eng.sql(
        f"CALL demo.system.cherrypick_snapshot('default.wapt', {staged2.snapshot_id})"
    ).first()
    assert row["source_snapshot_id"] == staged2.snapshot_id
    assert eng.sql("SELECT COUNT(*) AS n FROM default.wapt").first()["n"] == 5


def test_add_files_registers_in_place(spark, tmp_path, table):
    ext = str(tmp_path / "external")
    spark.createDataFrame(
        [(10, "x"), (11, "y"), (12, "z")], DDL
    ).repartition(2).write.mode("overwrite").parquet(ext)

    stats = table.add_files(ext)
    assert stats["added_records_count"] == 3
    assert stats["added_files_count"] >= 1
    got = _rows(table.read())
    assert (10, "x") in got and (1, "a") in got and len(got) == 5

    # in place: registered paths live under the external dir, not data/
    snap = table.metadata.current_snapshot()
    added = [
        e for e in snap.data_files() if e.added_snapshot_id == snap.snapshot_id
    ]
    assert added and all(e.file_path.startswith(ext) for e in added)
    # footer stats landed → pruning works on the imported files
    assert all(e.min_values.get("k") is not None for e in added)
    # time travel: pre-import snapshot unchanged
    prev = table.metadata.snapshots[-2].snapshot_id
    assert len(_rows(table.read(snapshot_id=prev))) == 2

    # schema-incompatible file is refused
    bad = str(tmp_path / "bad")
    spark.createDataFrame([(1,)], "k bigint").write.mode("overwrite").parquet(bad)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing table columns"):
        table.add_files(bad)


def test_add_files_via_sql_call(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS default")
    eng.sql("CREATE TABLE default.imp (k bigint, v string) USING iceberg")
    ext = str(tmp_path / "ext")
    spark.createDataFrame([(1, "a"), (2, "b")], DDL).write.mode("overwrite").parquet(ext)
    row = eng.sql(
        f"CALL demo.system.add_files(table => 'default.imp', source_table => '`parquet`.`{ext}`')"
    ).first()
    assert row["added_records_count"] == 2
    assert eng.sql("SELECT COUNT(*) AS n FROM default.imp").first()["n"] == 2


def test_add_files_rejects_duplicates(spark, tmp_path, table):
    ext = str(tmp_path / "ext2")
    spark.createDataFrame([(50, "q")], DDL).write.mode("overwrite").parquet(ext)
    assert table.add_files(ext)["added_records_count"] == 1
    with pytest.raises(ValueError, match="already registered"):
        table.add_files(ext)
    assert table.read().count() == 3  # nothing double-counted


def test_ctas_if_not_exists_is_noop_on_existing(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS default")
    eng.sql("CREATE TABLE default.ct (k bigint, v string) USING iceberg")
    eng.sql("INSERT INTO default.ct VALUES (1, 'a')")
    ctas = "CREATE TABLE IF NOT EXISTS default.ct AS SELECT * FROM default.ct"
    row = eng.sql(ctas).first()
    assert row["status"] == "already exists"
    assert eng.sql("SELECT COUNT(*) AS n FROM default.ct").first()["n"] == 1
    row = eng.sql(ctas).first()  # idempotent re-run
    assert eng.sql("SELECT COUNT(*) AS n FROM default.ct").first()["n"] == 1
