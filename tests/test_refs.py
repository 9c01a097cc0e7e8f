"""Snapshot refs (Iceberg tags & branches): named time travel, immutability
rules, expiry protection, the .refs metadata view, and persistence."""

from __future__ import annotations

import datetime as dt

import pytest

from demo_iceberg_permanent_delete_spark.lake import Catalog, SnapshotNotFoundError

DDL = "k bigint, v string"


@pytest.fixture
def table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.reft", DDL)
    t.insert(spark.createDataFrame([(1, "a"), (2, "b")], DDL))
    t.insert(spark.createDataFrame([(3, "c")], DDL))
    return t


def test_tag_read_and_immutability(table, spark):
    snaps = table.metadata.snapshots
    table.create_tag("after-first", snaps[0].snapshot_id)
    assert table.read(ref="after-first").count() == 2
    assert table.read(ref="main").count() == 3
    with pytest.raises(ValueError, match="immutable"):
        table.fast_forward("after-first")
    with pytest.raises(ValueError, match="already exists"):
        table.create_tag("after-first")
    with pytest.raises(SnapshotNotFoundError):
        table.read(ref="nope")


def test_branch_fast_forward(table, spark):
    first = table.metadata.snapshots[0].snapshot_id
    table.create_branch("audit", first)
    assert table.read(ref="audit").count() == 2
    table.fast_forward("audit")  # to current
    assert table.read(ref="audit").count() == 3
    table.drop_ref("audit")
    with pytest.raises(SnapshotNotFoundError):
        table.read(ref="audit")


def test_refs_protect_snapshots_from_expiry(table):
    first = table.metadata.snapshots[0].snapshot_id
    table.create_tag("keep", first)
    stats = table.expire_snapshots(
        older_than=dt.datetime.now(dt.timezone.utc) + dt.timedelta(days=1)
    )
    assert stats["expired_snapshots"] == 0  # tag saved the old snapshot
    assert table.read(ref="keep").count() == 2
    # dropping the tag releases it
    table.drop_ref("keep")
    stats = table.expire_snapshots(
        older_than=dt.datetime.now(dt.timezone.utc) + dt.timedelta(days=1)
    )
    assert stats["expired_snapshots"] == 1


def test_refs_view_and_persistence(table, spark, tmp_path):
    first = table.metadata.snapshots[0].snapshot_id
    table.create_tag("v1", first)
    table.create_branch("dev")
    rows = {r["name"]: (r["type"], r["snapshot_id"]) for r in table.meta("refs").collect()}
    assert rows["main"] == ("BRANCH", table.metadata.current_snapshot_id)
    assert rows["v1"] == ("TAG", first)
    assert rows["dev"][0] == "BRANCH"
    # refs survive a metadata reload
    reloaded = Catalog(spark, str(tmp_path / "wh")).load_table("default.reft")
    assert reloaded.resolve_ref("v1") == first
    assert reloaded.read(ref="v1").count() == 2


def test_refs_via_sql_facade(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql(f"CREATE TABLE demo.default.rt ({DDL}) USING iceberg")
    eng.sql("INSERT INTO demo.default.rt VALUES (1, 'a')")
    t = eng.table("demo.default.rt")
    t.create_tag("release")
    got = eng.sql("SELECT name, type FROM demo.default.rt.refs ORDER BY name").collect()
    assert [(r["name"], r["type"]) for r in got] == [
        ("main", "BRANCH"),
        ("release", "TAG"),
    ]
