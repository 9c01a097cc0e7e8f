"""Row lineage (Iceberg v3): ``read(lineage=True)`` exposes ``_row_id``
(stable row identity) and ``_last_updated_sequence_number`` (the data
sequence of the commit that last modified the row). Appended files
inherit ids from the manifest's per-file first_row_id; row-carrying
rewrites (COW UPDATE/DELETE/MERGE, MOR update copies, compaction)
MATERIALIZE the columns physically so identity survives file rewrites."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import one_part
from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.lake.maintenance import (
    rewrite_data_files,
)

DDL = "k bigint, name string, v double"
LIN = ["_row_id", "_last_updated_sequence_number"]


def _table(spark, tmp_path, name="default.lin", ddl=DDL, props=None):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    return cat.create_table(name, ddl, properties=props or {})


def _rows(spark, data):
    return one_part(spark, data, DDL)


def _lineage(t):
    return {
        r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in t.read(lineage=True).collect()
    }


def test_appends_assign_contiguous_ids_and_sequences(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.insert(_rows(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]))
    t.insert(_rows(spark, [(4, "d", 4.0), (5, "e", 5.0)]))
    lin = _lineage(t)
    assert sorted(rid for rid, _ in lin.values()) == [0, 1, 2, 3, 4]
    assert {seq for _, seq in (lin[1], lin[2], lin[3])} == {1}
    assert {seq for _, seq in (lin[4], lin[5])} == {2}
    assert t.metadata.next_row_id == 5
    # plain read is untouched: no lineage columns
    assert set(t.read().columns) == {"k", "name", "v"}


def test_cow_update_preserves_ids_updated_row_bumps_sequence(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.insert(_rows(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]))
    before = _lineage(t)
    snap = t.update({"v": 99.0}, "k = 2")
    after = _lineage(t)
    # identity is stable across the whole-file rewrite
    assert {k: rid for k, (rid, _) in after.items()} == {
        k: rid for k, (rid, _) in before.items()
    }
    assert after[2][1] == snap.sequence_number
    assert after[1][1] == before[1][1]
    assert after[3][1] == before[3][1]
    # the replacement file physically materializes both columns
    import pyarrow.parquet as pq

    new = [
        e
        for e in t.metadata.current_snapshot().data_files()
        if e.added_snapshot_id == snap.snapshot_id
    ]
    assert new
    names = {c.name for c in pq.read_schema(new[0].file_path)}
    assert set(LIN) <= names


def test_mor_update_copies_keep_id_and_bump_sequence(spark, tmp_path):
    t = _table(
        spark, tmp_path, props={"write.update.mode": "merge-on-read"}
    )
    t.insert(_rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    before = _lineage(t)
    snap = t.update({"v": -1.0}, "k = 1")
    after = _lineage(t)
    assert after[1][0] == before[1][0]  # id survives the MOR copy
    assert after[1][1] == snap.sequence_number
    assert after[2] == before[2]


def test_cow_delete_preserves_survivor_lineage(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.insert(_rows(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]))
    before = _lineage(t)
    t.delete("k = 2")
    after = _lineage(t)
    assert after == {1: before[1], 3: before[3]}


def test_compaction_preserves_lineage(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.insert(_rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.insert(_rows(spark, [(3, "c", 3.0)]))
    t.update({"v": 7.0}, "k = 3")
    before = _lineage(t)
    rewrite_data_files(t)
    after = _lineage(t)
    assert after == before


def test_merge_keeps_target_ids_and_assigns_fresh_insert_ids(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.insert(_rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    before = _lineage(t)
    watermark = t.metadata.next_row_id
    snap = t.merge(_rows(spark, [(2, "B", 20.0), (9, "i", 9.0)]), on=["k"])
    after = _lineage(t)
    assert after[1] == before[1]  # untouched row carried verbatim
    assert after[2][0] == before[2][0]  # updated row keeps identity
    assert after[2][1] == snap.sequence_number
    assert after[9][0] >= watermark  # insert draws from the fresh range
    rids = [rid for rid, _ in after.values()]
    assert len(rids) == len(set(rids))


def test_pre_upgrade_entries_read_null_lineage(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.insert(_rows(spark, [(1, "a", 1.0)]))
    for e in t.metadata.current_snapshot().manifest:
        e.first_row_id = None
        e.sequence_number = None
    rows = t.read(lineage=True).collect()
    assert rows[0]["_row_id"] is None
    assert rows[0]["_last_updated_sequence_number"] is None


def test_reserved_name_guard_raises_but_dml_degrades(spark, tmp_path):
    t = _table(
        spark, tmp_path, name="default.clash", ddl="k bigint, _row_id bigint"
    )
    t.insert(one_part(spark, [(1, 10)], "k bigint, _row_id bigint"))
    try:
        t.read(lineage=True)
        raise AssertionError("expected ValueError for reserved column")
    except ValueError as err:
        assert "_row_id" in str(err)
    # DML on the clashing table still works (lineage silently skipped)
    t.update({"k": 5}, "_row_id = 10")
    assert [r["k"] for r in t.read().collect()] == [5]


def test_time_travel_lineage(spark, tmp_path):
    t = _table(spark, tmp_path)
    s1 = t.insert(_rows(spark, [(1, "a", 1.0)]))
    t.update({"v": 2.0}, "k = 1")
    old = {
        r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in t.read(snapshot_id=s1.snapshot_id, lineage=True).collect()
    }
    assert old[1] == (0, s1.sequence_number)


def test_sql_lineage_relation(spark, tmp_path):
    """`<table>.lineage` through the SQL facade: the table's rows plus the
    two lineage metadata columns (facade stand-in for Iceberg's hidden
    ``SELECT _row_id FROM t`` columns)."""
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh_sql"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql("CREATE TABLE demo.default.lint (k BIGINT, v STRING) USING iceberg")
    eng.sql("INSERT INTO demo.default.lint VALUES (1, 'a'), (2, 'b')")
    eng.sql("UPDATE demo.default.lint SET v = 'B' WHERE k = 2")
    rows = {
        r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in eng.sql(
            "SELECT k, _row_id, _last_updated_sequence_number "
            "FROM demo.default.lint.lineage"
        ).collect()
    }
    assert rows[1][0] != rows[2][0]
    assert rows[2][1] > rows[1][1]  # the update bumped only k=2


def test_lineage_on_empty_table(spark, tmp_path):
    t = _table(spark, tmp_path, name="default.linempty")
    df = t.read(lineage=True)
    assert set(LIN) <= set(df.columns)
    assert df.count() == 0


def test_changelog_lineage_pairs_update_rows(spark, tmp_path):
    """changes(lineage=True): a COW UPDATE's DELETE and INSERT rows share
    one _row_id, so consumers pair them into row-level updates."""
    t = _table(spark, tmp_path, name="default.lincdc")
    t.insert(_rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    first = t.metadata.current_snapshot_id
    t.update({"v": 99.0}, "k = 2")
    ch = t.changes(start_snapshot_id=first, lineage=True).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r["_change_type"], []).append(r)
    # the updated row appears on both sides under ONE identity
    upd_del = [r for r in by_type["DELETE"] if r["k"] == 2]
    upd_ins = [r for r in by_type["INSERT"] if r["k"] == 2 and r["v"] == 99.0]
    assert len(upd_del) == 1 and len(upd_ins) == 1
    assert upd_del[0]["_row_id"] == upd_ins[0]["_row_id"]
    # the carried row (k=1) nets away identity-wise
    net = t.changes(start_snapshot_id=first, net=True, lineage=True).collect()
    ks = sorted((r["k"], r["_change_type"]) for r in net)
    assert ks == [(2, "DELETE"), (2, "INSERT")]


def test_changelog_lineage_mor_delete(spark, tmp_path):
    """MOR position-delete commits emit DELETE rows with the masked rows'
    original _row_id (read through the parent's referenced files)."""
    t = _table(
        spark,
        tmp_path,
        name="default.linmor",
        props={"write.delete.mode": "merge-on-read"},
    )
    t.insert(_rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    before = _lineage(t)
    first = t.metadata.current_snapshot_id
    t.delete("k = 1")
    ch = t.changes(start_snapshot_id=first, lineage=True).collect()
    assert len(ch) == 1
    assert ch[0]["_change_type"] == "DELETE"
    assert ch[0]["_row_id"] == before[1][0]


def test_lineage_survives_rename_column(spark, tmp_path):
    """RENAME COLUMN routes reads through the conforming reader — the
    lineage extra-fields path must ride along (old files resolve the
    renamed column by its historical name AND keep their row ids)."""
    t = _table(spark, tmp_path, name="default.linren")
    t.insert(_rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    before = _lineage(t)
    t.rename_column("name", "label")
    rows = {
        r["k"]: (r["label"], r["_row_id"], r["_last_updated_sequence_number"])
        for r in t.read(lineage=True).collect()
    }
    assert rows[1][0] == "a" and rows[2][0] == "b"
    assert {k: v[1] for k, v in rows.items()} == {
        k: rid for k, (rid, _) in before.items()
    }
    # and a COW update through the renamed schema still carries ids
    snap = t.update({"label": "B"}, "k = 2")
    after = {
        r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in t.read(lineage=True).collect()
    }
    assert after[2][0] == before[2][0]
    assert after[2][1] == snap.sequence_number
    assert after[1] == before[1]


def test_lineage_survives_sharded_fold(spark, tmp_path):
    """rewrite_manifests on a partitioned table shards the fold; the
    folded entries carry their original first_row_id/sequence, so a
    lineage read after the fold is identical to before."""
    from demo_iceberg_permanent_delete_spark.lake.maintenance import (
        rewrite_manifests,
    )

    cat = Catalog(spark, str(tmp_path / "whs"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.linshard", DDL, partition_by=["name"]
    )
    for grp in ("a", "b", "c"):
        t.insert(
            one_part(
                spark,
                [(ord(grp), grp, 1.0), (ord(grp) + 100, grp, 2.0)],
                DDL,
            )
        )
    before = _lineage(t)
    rewrite_manifests(t)
    t.refresh()
    assert _lineage(t) == before


def test_wap_publish_and_cherrypick_preserve_lineage(spark, tmp_path):
    """WAP staging and both publish paths keep row identity: staged rows
    draw fresh ids at the branch commit and carry them to main unchanged;
    a cherry-pick onto a diverged main replays the SAME entries."""
    t = _table(spark, tmp_path, name="default.linwap")
    t.insert(_rows(spark, [(1, "a", 1.0)]))
    before = _lineage(t)

    # fast-forward publish
    t.create_branch("audit")
    staged = t.insert(_rows(spark, [(2, "b", 2.0)]), branch="audit")
    staged_lin = {
        r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in t.read(ref="audit", lineage=True).collect()
    }
    assert staged_lin[1] == before[1]
    assert staged_lin[2][0] not in {rid for rid, _ in before.values()}
    assert staged_lin[2][1] == staged.sequence_number
    t.fast_forward("main", staged.snapshot_id)
    assert _lineage(t) == staged_lin

    # cherry-pick publish onto a DIVERGED main
    t.create_branch("audit2")
    staged2 = t.insert(_rows(spark, [(3, "c", 3.0)]), branch="audit2")
    t.insert(_rows(spark, [(4, "d", 4.0)]))  # main diverges
    staged2_lin = {
        r["k"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in t.read(ref="audit2", lineage=True).collect()
    }
    t.cherrypick_snapshot(staged2.snapshot_id)
    after = _lineage(t)
    assert after[3] == staged2_lin[3]  # replayed entry keeps its identity
    rids = [rid for rid, _ in after.values()]
    assert len(rids) == len(set(rids))
