"""Optimistic concurrency: CAS metadata commits, append rebase-and-retry,
and conflict surfacing for read-modify-write operations (Iceberg's
conflict model — the job the reference delegated to its REST catalog)."""

from __future__ import annotations

import pytest

from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.lake.errors import CommitConflictError

DDL = "k bigint, v string"


@pytest.fixture
def warehouse(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.cc", DDL)
    t.insert(spark.createDataFrame([(1, "a")], DDL))
    return cat


def test_concurrent_appends_both_land(spark, warehouse):
    # two independent handles on the same table, both loaded at version N
    a = warehouse.load_table("default.cc")
    b = warehouse.load_table("default.cc")
    a.insert(spark.createDataFrame([(2, "from-a")], DDL))
    # b is now stale; its commit CAS-fails once, rebases, retries
    b.insert(spark.createDataFrame([(3, "from-b")], DDL))
    final = warehouse.load_table("default.cc")
    rows = sorted((r["k"], r["v"]) for r in final.read().collect())
    assert rows == [(1, "a"), (2, "from-a"), (3, "from-b")]
    # linear history: b's append parents on a's commit
    snaps = final.metadata.snapshots
    assert snaps[-1].parent_id == snaps[-2].snapshot_id


def test_stale_rmw_commit_raises_not_clobbers(spark, warehouse):
    a = warehouse.load_table("default.cc")
    b = warehouse.load_table("default.cc")
    a.insert(spark.createDataFrame([(2, "winner")], DDL))
    # a stale read-modify-write (property change) must surface the conflict,
    # not silently overwrite a's commit
    b.metadata.properties["owner"] = "b"
    with pytest.raises(CommitConflictError):
        b.metadata.commit()
    final = warehouse.load_table("default.cc")
    assert final.read().count() == 2  # a's append survived
    assert "owner" not in final.properties


def test_stale_delete_surfaces_conflict(spark, warehouse):
    a = warehouse.load_table("default.cc")
    b = warehouse.load_table("default.cc")
    a.insert(spark.createDataFrame([(2, "x")], DDL))
    with pytest.raises(CommitConflictError):
        b.delete("k = 1")
    # nothing from b landed; a's state intact
    final = warehouse.load_table("default.cc")
    assert final.read().count() == 2


def test_failed_append_leaves_no_readable_garbage(spark, warehouse):
    import datetime as dt

    a = warehouse.load_table("default.cc")
    b = warehouse.load_table("default.cc")
    a.insert(spark.createDataFrame([(2, "x")], DDL))
    b.insert(spark.createDataFrame([(3, "y")], DDL))  # retried internally
    final = warehouse.load_table("default.cc")
    # the abandoned first-attempt delta manifest is orphaned and GC-able
    orphans = final.remove_orphan_files(
        older_than=dt.datetime.now(dt.timezone.utc) + dt.timedelta(days=1),
        enforce_safety=False,
    )
    # after GC every retained snapshot still resolves
    final = warehouse.load_table("default.cc")
    assert final.read().count() == 3
    for s in final.metadata.snapshots:
        assert s.manifest is not None
    assert all("manifest" in o or o.endswith(".parquet") for o in orphans)


def test_insert_extra_properties_survive_conflict_retry(spark, warehouse):
    a = warehouse.load_table("default.cc")
    b = warehouse.load_table("default.cc")
    a.insert(spark.createDataFrame([(2, "x")], DDL))
    # b's commit conflicts once and rebases; the property must still land
    # in the same (retried) commit as the snapshot
    b.insert(
        spark.createDataFrame([(3, "y")], DDL),
        extra_properties={"streaming.last-committed-batch-id": "7"},
    )
    final = warehouse.load_table("default.cc")
    assert final.read().count() == 3
    assert final.properties["streaming.last-committed-batch-id"] == "7"
