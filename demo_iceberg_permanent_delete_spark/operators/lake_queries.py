"""Driver-contract queries that exercise the lake layer end-to-end with
DuckDB-checkable results (SURVEY.md §2.2 D5-D7, §2.3 M4).

Trick: build a lake table *from the driver's own testdata* (a deterministic
lineitem subset), run the lifecycle op, and read the table back — the result
is then plain SQL over `lineitem` for the oracle. This makes the MOR delete
path, COW update path, time travel, and rewrite compaction *hash-checked*,
not just pytest-asserted.

Each call uses a fresh temp warehouse; the subset (l_orderkey % 10 = 0)
keeps the per-query write volume small at sf0.01 while still spanning many
files/partitions.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.lake import Catalog, plan_join
from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

_LINEITEM_DDL = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp"
)

_SUBSET = "l_orderkey % 10 = 0"


def _subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").filter(_SUBSET)


def _fresh_table(spark: SparkSession, sf_dir: str, properties: dict[str, str]):
    warehouse = tempfile.mkdtemp(prefix="lakeq-")
    cat = Catalog(spark, warehouse)
    cat.create_namespace("default")
    t = cat.create_table("default.lineitem_lake", _LINEITEM_DDL, properties=properties)
    t.insert(_subset(spark, sf_dir))
    return t, warehouse


@query(
    "lake_delete_modes",
    oracle=f"""
    SELECT 'merge-on-read' AS delete_mode, * FROM lineitem
    WHERE {_SUBSET} AND NOT COALESCE(l_returnflag = 'R', FALSE)
    UNION ALL
    SELECT 'copy-on-write' AS delete_mode, * FROM lineitem
    WHERE {_SUBSET} AND NOT COALESCE(l_returnflag = 'R', FALSE)
    """,
)
def lake_delete_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 both ways, one hash-checked entry (the driver records at most 50
    correctness rows): the same logical DELETE via merge-on-read
    (position-delete files; the read-side anti-join masks exactly the
    predicate rows) and via copy-on-write (files rewritten, no delete files
    in the manifest) — both reads must equal the same oracle.

    The MOR leg runs the X79 write-audit-publish DELETE (round 11, under
    the hash): staged with ``wap_id`` — pointer unmoved, summary stamped,
    invisible — then published by the cherry-pick ``publish_changes``
    rides, so the hashed read proves the staged-then-published delete
    equals a direct one. This is the reference's audited-PII-deletion
    story end to end.

    The two tables live in separate warehouses and share nothing, so
    their lifecycles run CONCURRENTLY (run_concurrent, guide §2.6) —
    each leg checkpoints its own read inside its thread, so the final
    union is plan-free. Same rows, same commits per table; measured
    4.2 s → ~2.6 s at sf0.1."""
    from demo_iceberg_permanent_delete_spark.parallel import run_concurrent

    def mor_leg() -> DataFrame:
        t_mor, wh_mor = _fresh_table(
            spark, sf_dir, {"write.delete.mode": "merge-on-read"}
        )
        try:
            head = t_mor.metadata.current_snapshot_id
            staged = t_mor.delete("l_returnflag = 'R'", wap_id="gdpr-audit")
            assert t_mor.metadata.current_snapshot_id == head, "stage moved main"
            assert staged.summary.get("wap.id") == "gdpr-audit"
            assert staged.delete_files(), "staged MOR delete must carry a DV"
            t_mor.cherrypick_snapshot(staged.snapshot_id)  # the publish step
            assert any(
                e.content == 1
                for e in t_mor.metadata.current_snapshot().manifest
            ), "MOR delete must produce position-delete files"
            # localCheckpoint truncates lineage so the result survives the
            # warehouse teardown below
            return (
                t_mor.read()
                .select(F.lit("merge-on-read").alias("delete_mode"), "*")
                .localCheckpoint(eager=True)
            )
        finally:
            shutil.rmtree(wh_mor, ignore_errors=True)

    def cow_leg() -> DataFrame:
        t_cow, wh_cow = _fresh_table(
            spark, sf_dir, {"write.delete.mode": "copy-on-write"}
        )
        try:
            t_cow.delete("l_returnflag = 'R'")
            assert all(
                e.content == 0
                for e in t_cow.metadata.current_snapshot().manifest
            ), "COW delete must not produce delete files"
            return (
                t_cow.read()
                .select(F.lit("copy-on-write").alias("delete_mode"), "*")
                .localCheckpoint(eager=True)
            )
        finally:
            shutil.rmtree(wh_cow, ignore_errors=True)

    mor, cow = run_concurrent(mor_leg, cow_leg)
    return mor.unionByName(cow)


@query(
    "lake_cow_update",
    oracle=f"""
    SELECT
      l_orderkey, l_partkey, l_suppkey, l_linenumber,
      CASE WHEN l_returnflag = 'R' THEN NULL ELSE l_quantity END AS l_quantity,
      l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
    FROM lineitem
    WHERE {_SUBSET}
    """,
)
def lake_cow_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COW UPDATE … SET col = NULL WHERE pred — the reference's PII-nulling
    pattern (iceberg_pii_deletion_demo.py:228-235)."""
    t, warehouse = _fresh_table(spark, sf_dir, {"write.update.mode": "copy-on-write"})
    try:
        t.update({"l_quantity": None}, "l_returnflag = 'R'")
        return t.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


@query(
    "lake_time_travel_rollback",
    oracle=f"""
    SELECT 'time_travel' AS path, * FROM lineitem WHERE {_SUBSET}
    UNION ALL
    SELECT 'as_of' AS path, * FROM lineitem WHERE {_SUBSET}
    UNION ALL
    SELECT 'tag' AS path, * FROM lineitem WHERE {_SUBSET}
    UNION ALL
    SELECT 'branch' AS path, * FROM lineitem WHERE {_SUBSET}
    UNION ALL
    SELECT 'rollback' AS path, * FROM lineitem WHERE {_SUBSET}
    UNION ALL
    SELECT 'wap' AS path, * FROM lineitem
    WHERE ({_SUBSET}) OR l_orderkey % 10 = 5
    """,
)
def lake_time_travel_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every time-travel surface + rollback in one hash-checked entry —
    routed through the SQL FACADE's rewrite machinery (round-9 brief
    item 1: the regex identifier rewriting is the repo's riskiest
    correctness surface, so it runs under the DuckDB hash, not just
    pytest): after a MOR delete, (a) ``FOR VERSION AS OF`` the pre-delete
    snapshot makes the deleted rows reappear (reference:
    spark.read.option('snapshot-id', id), iceberg_pii_deletion_demo.py:261),
    (b) ``TIMESTAMP AS OF`` the first commit's epoch-ms resolves to the
    same snapshot, (c) a tag read via the ``t.tag_<name>`` suffix and
    (d) a branch via ``t.branch_<name>`` (Iceberg ref-suffix
    identifiers), (e) CALL rollback_to_snapshot points the table back and
    the current read goes through CREATE VIEW + view-on-view expansion —
    those five reads equal the full subset — and (f) a
    write-audit-publish cycle: stage a batch on the branch,
    cherrypick_snapshot onto main, rewrite_manifests folds the chain, and
    the published read adds exactly the staged rows. Each facade read
    asserts the pinned-view substitution IN ITS PLAN (the X39 style), so
    the rewrite path is demonstrably what produced the hashed rows."""
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    t, warehouse = _fresh_table(spark, sf_dir, {"write.delete.mode": "merge-on-read"})
    try:
        engine = LakeEngine(spark, warehouse)
        first = t.metadata.current_snapshot()
        t.create_tag("v1")
        t.create_branch("audit", first.snapshot_id)
        t.delete("l_returnflag = 'R'")
        # commit-time ms resolution: commits are file writes, so a same-ms
        # collision cannot realistically happen — assert loudly rather than
        # hash-mismatch if it ever does
        assert t.snapshot_as_of(first.committed_at_ms) == first.snapshot_id
        refs = {r["name"]: r["type"] for r in t.meta("refs").collect()}
        assert refs == {"main": "BRANCH", "v1": "TAG", "audit": "BRANCH"}

        def _plan_of(df: DataFrame) -> str:
            return df._jdf.queryExecution().analyzed().toString()

        tbl = "default.lineitem_lake"
        parts = [
            engine.sql(
                f"SELECT 'time_travel' AS path, * FROM {tbl} "
                f"FOR VERSION AS OF {first.snapshot_id}"
            ),
            engine.sql(
                f"SELECT 'as_of' AS path, * FROM {tbl} "
                f"TIMESTAMP AS OF {first.committed_at_ms}"
            ),
            engine.sql(f"SELECT 'tag' AS path, * FROM {tbl}.tag_v1"),
            engine.sql(f"SELECT 'branch' AS path, * FROM {tbl}.branch_audit"),
        ]
        # the rewrite is demonstrably in each plan: the travel clauses
        # resolved to snapshot-pinned temp views, the suffixes to ref views
        pin = f"default__lineitem_lake__v{first.snapshot_id}"
        assert pin in _plan_of(parts[0]) and pin in _plan_of(parts[1])
        assert "default__lineitem_lake__tag_v1" in _plan_of(parts[2])
        assert "default__lineitem_lake__branch_audit" in _plan_of(parts[3])
        t.rollback_to_snapshot(first.snapshot_id)
        assert t.metadata.current_snapshot_id == first.snapshot_id
        # (e) the post-rollback read goes through catalog-view expansion,
        # recursively (view on view) — the riskiest rewrite after travel
        engine.sql(f"CREATE VIEW default.ttr_base AS SELECT * FROM {tbl}")
        engine.sql(
            "CREATE VIEW default.ttr_roll AS SELECT * FROM default.ttr_base"
        )
        rolled = engine.sql("SELECT 'rollback' AS path, * FROM default.ttr_roll")
        assert "view__default__ttr_roll" in _plan_of(rolled)
        parts.append(rolled)
        # (f) write-audit-publish: stage a second batch on the audit
        # branch (main untouched), publish by cherry-picking the staged
        # change set onto main, then fold the manifest chain — the final
        # read must show base subset + staged batch, hash-checked
        staged = t.insert(
            load_table(spark, sf_dir, "lineitem").filter("l_orderkey % 10 = 5"),
            branch="audit",
        )
        assert t.metadata.current_snapshot_id == first.snapshot_id, (
            "branch write must not move main"
        )
        t.cherrypick_snapshot(staged.snapshot_id)
        stats = t.rewrite_manifests()
        assert stats["added_manifests_count"] >= 1
        assert t.metadata.chain_length(t.metadata.current_snapshot_id) == 1
        parts.append(t.read().select(F.lit("wap").alias("path"), "*"))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


@query(
    "lake_rewrite_purge",
    oracle=f"""
    SELECT * FROM lineitem
    WHERE {_SUBSET} AND NOT COALESCE(l_returnflag = 'R', FALSE)
    """,
)
def lake_rewrite_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOR delete + rewrite_data_files compaction: deletes applied
    physically, zero delete files remain, result unchanged
    (iceberg_pii_deletion_demo.py:421-433)."""
    t, warehouse = _fresh_table(spark, sf_dir, {"write.delete.mode": "merge-on-read"})
    try:
        t.delete("l_returnflag = 'R'")
        stats = t.rewrite_data_files()
        assert stats["removed_delete_files_count"] >= 1
        assert not t.metadata.current_snapshot().delete_files()
        return t.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


@query(
    "lake_expire_snapshots",
    oracle=f"""
    SELECT * FROM lineitem
    WHERE {_SUBSET} AND NOT COALESCE(l_returnflag = 'R', FALSE)
    """,
)
def lake_expire_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 expire_snapshots (iceberg_pii_deletion_demo.py:289-305): after a
    MOR delete, expiring everything older than now leaves exactly the
    current snapshot, blocks time travel to the pre-delete state, and the
    surviving read equals the post-delete result."""
    import datetime as _dt

    from demo_iceberg_permanent_delete_spark.lake.errors import SnapshotNotFoundError

    t, warehouse = _fresh_table(spark, sf_dir, {"write.delete.mode": "merge-on-read"})
    try:
        snap_before = t.metadata.current_snapshot_id
        t.delete("l_returnflag = 'R'")
        stats = t.expire_snapshots(_dt.datetime.now(_dt.timezone.utc))
        assert stats["expired_snapshots"] >= 1
        assert len(t.metadata.snapshots) == 1, "only the current snapshot survives"
        try:
            t.read(snapshot_id=snap_before)
            raise AssertionError("time travel to an expired snapshot must raise")
        except SnapshotNotFoundError:
            pass
        return t.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


@query(
    "lake_orphan_cleanup",
    oracle=f"""
    SELECT * FROM lineitem WHERE {_SUBSET}
    """,
)
def lake_orphan_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2/M3 remove_orphan_files (cleanup_utils.py:26-67): a parquet file
    planted in the table location but referenced by no snapshot is listed by
    dry_run, protected by the 3-day SQL safety window (expected failure,
    iceberg_pii_deletion_demo.py:343-358), then deleted via the Action path;
    the table read is untouched."""
    import datetime as _dt
    import os as _os

    from demo_iceberg_permanent_delete_spark.lake.errors import UnsafeOperationError

    t, warehouse = _fresh_table(spark, sf_dir, {})
    try:
        orphan = _os.path.join(t.data_dir, "orphan-plant.parquet")
        spark.range(10).coalesce(1).write.mode("overwrite").parquet(orphan + ".tmp")
        part = next(
            f for f in _os.listdir(orphan + ".tmp") if f.endswith(".parquet")
        )
        _os.replace(_os.path.join(orphan + ".tmp", part), orphan)
        shutil.rmtree(orphan + ".tmp", ignore_errors=True)

        future = _dt.datetime.now(_dt.timezone.utc) + _dt.timedelta(days=365)
        try:
            t.remove_orphan_files(future)
            raise AssertionError("future cutoff must be refused by the safety window")
        except UnsafeOperationError:
            pass
        listed = t.remove_orphan_files(future, dry_run=True, enforce_safety=False)
        assert listed == [orphan], f"dry_run must list exactly the orphan, got {listed}"
        removed = t.remove_orphan_files(future, enforce_safety=False)
        assert removed == [orphan] and not _os.path.exists(orphan)
        return t.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


@query(
    "lake_delete_audit",
    oracle=f"""
    SELECT * FROM lineitem
    WHERE {_SUBSET} AND l_returnflag = 'R'
    """,
)
def lake_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 delete-file audit (cleanup_utils.py:133-202): after a MOR delete
    the position-deleted rows remain physically readable in the data files —
    deleted_rows() recovers exactly the predicate's rows, the reference's
    "PII still exists" proof. After rewrite_data_files the same audit
    returns zero rows (permanence)."""
    t, warehouse = _fresh_table(spark, sf_dir, {"write.delete.mode": "merge-on-read"})
    try:
        t.delete("l_returnflag = 'R'")
        persisted = t.deleted_rows().localCheckpoint(eager=True)
        t.rewrite_data_files()
        assert t.deleted_rows().count() == 0, "post-rewrite audit must be empty"
        return persisted
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


_ORDERS_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


@query(
    "lake_merge_upsert",
    oracle="""
    SELECT
      o_orderkey, o_custkey, o_orderstatus,
      CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 1000
           ELSE o_totalprice END AS o_totalprice,
      o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 10 = 5
    """,
)
def lake_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (COW upsert) on the unique o_orderkey key: matched rows
    ('F'-status orders) arrive with o_totalprice bumped and replace the
    target row (UPDATE SET *), unmatched source rows (a disjoint orderkey
    slice) are inserted — one snapshot, only affected files rewritten.
    Merging on lineitem's non-unique key raises MergeCardinalityError
    (covered in tests/test_sql_facade.py).

    The MERGE runs through the SQL facade against the ``t.branch_stage``
    suffix target (X75 branch-DML routing — round-10's biggest pytest-only
    rewrite surface, now under the DuckDB hash): the whole
    read-modify-write plans against the branch head, main is asserted
    untouched in-metadata, and ``CALL fast_forward`` publishes the branch
    before the hashed read — so a routing bug (MERGE landing on main, the
    ref not advancing, publish skipping files) breaks the hash, not just a
    unit test."""
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    warehouse = tempfile.mkdtemp(prefix="lakeq-")
    eng = LakeEngine(spark, warehouse)
    eng.sql("CREATE NAMESPACE demo.default")
    eng.sql(f"CREATE TABLE demo.default.orders_lake ({_ORDERS_DDL}) USING iceberg")
    t = eng.table("default.orders_lake")
    try:
        orders = load_table(spark, sf_dir, "orders")
        t.insert(orders.filter("o_orderkey % 10 = 0"))
        main_head = t.metadata.current_snapshot_id
        eng.sql("ALTER TABLE default.orders_lake CREATE BRANCH stage")
        source = orders.filter(
            "(o_orderkey % 10 = 0 AND o_orderstatus = 'F') OR o_orderkey % 10 = 5"
        ).withColumn(
            "o_totalprice",
            F.when(
                F.expr("o_orderkey % 10 = 0"), F.col("o_totalprice") + 1000
            ).otherwise(F.col("o_totalprice")),
        )
        source.createOrReplaceTempView("merge_upsert_src")
        eng.sql(
            "MERGE INTO demo.default.orders_lake.branch_stage t "
            "USING (SELECT * FROM merge_upsert_src) s "
            "ON t.o_orderkey = s.o_orderkey "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        # branch routing asserted in-metadata: main's pointer did not move
        # and the staged commit sits only on the branch ref (reload — the
        # facade statements committed through their own table instance)
        t = eng.table("default.orders_lake")
        assert t.metadata.current_snapshot_id == main_head, "main moved"
        staged_head = t.resolve_ref("stage")
        assert staged_head != main_head, "branch ref did not advance"
        snap = t.metadata.snapshot_by_id(staged_head)
        assert snap.parent_id == main_head
        assert snap.summary["rewritten-files"] >= 1
        assert snap.summary["inserted-files"] >= 1
        # publish: fast-forward main onto the audited branch head
        eng.sql(
            f"CALL demo.system.fast_forward('default.orders_lake', 'main', {staged_head})"
        )
        assert (
            eng.table("default.orders_lake").metadata.current_snapshot_id
            == staged_head
        )
        return eng.sql(
            "SELECT * FROM demo.default.orders_lake"
        ).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView("merge_upsert_src")
        shutil.rmtree(warehouse, ignore_errors=True)


@query(
    "lake_rewrite_position_deletes",
    oracle=f"""
    SELECT * FROM lineitem
    WHERE {_SUBSET}
      AND NOT COALESCE(l_returnflag = 'R', FALSE)
      AND NOT COALESCE(l_linestatus = 'O', FALSE)
    """,
)
def lake_rewrite_position_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 rewrite_position_delete_files (iceberg_pii_deletion_demo.py:
    436-447): two MOR deletes leave multiple position-delete files;
    consolidation merges them into fewer files (the reference's
    post-condition :449-466 — delete-file count drops) without changing
    the read result."""
    t, warehouse = _fresh_table(spark, sf_dir, {"write.delete.mode": "merge-on-read"})
    try:
        t.delete("l_returnflag = 'R'")
        t.delete("l_linestatus = 'O'")
        before = len(t.metadata.current_snapshot().delete_files())
        assert before >= 2, "two MOR deletes must produce ≥2 delete files"
        stats = t.rewrite_position_delete_files()
        after = len(t.metadata.current_snapshot().delete_files())
        assert stats["rewritten_delete_files_count"] == before
        assert after < before, f"consolidation must shrink {before} -> {after}"
        return t.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


_UPDATE_PRED = "l_returnflag = 'N' AND l_linenumber = 1"


@query(
    "lake_incremental_read",
    oracle=f"""
    SELECT 'appends' AS feed, 'INSERT' AS _change_type, 0 AS _change_ordinal, *
    FROM lineitem WHERE l_orderkey % 10 = 5
    UNION ALL
    SELECT 'changelog', 'INSERT', 0, * FROM lineitem WHERE {_SUBSET}
    UNION ALL
    SELECT 'changelog', 'INSERT', 1, * FROM lineitem WHERE l_orderkey % 10 = 5
    UNION ALL
    SELECT 'changelog', 'DELETE', 2, * FROM lineitem
    WHERE (({_SUBSET}) OR l_orderkey % 10 = 5)
      AND COALESCE(l_returnflag = 'R', FALSE)
    UNION ALL
    SELECT 'lineage_update', 'UPDATE_PRE', 3, * FROM lineitem
    WHERE l_orderkey % 100 = 0 AND {_UPDATE_PRED}
    UNION ALL
    SELECT 'lineage_update', 'UPDATE_POST', 3,
      l_orderkey, l_partkey, l_suppkey, l_linenumber,
      l_quantity + 1000 AS l_quantity, l_extendedprice, l_discount, l_tax,
      l_returnflag, l_linestatus, l_shipdate
    FROM lineitem
    WHERE l_orderkey % 100 = 0 AND {_UPDATE_PRED}
    UNION ALL
    SELECT 'value_update', 'UPDATE_BEFORE', 4, * FROM lineitem
    WHERE l_orderkey % 100 = 0 AND {_UPDATE_PRED}
    UNION ALL
    SELECT 'value_update', 'UPDATE_AFTER', 4,
      l_orderkey, l_partkey, l_suppkey, l_linenumber,
      l_quantity + 1000 AS l_quantity, l_extendedprice, l_discount, l_tax,
      l_returnflag, l_linestatus, l_shipdate
    FROM lineitem
    WHERE l_orderkey % 100 = 0 AND {_UPDATE_PRED}
    """,
)
def lake_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental/CDC reads, the Iceberg surfaces in one hash-checked
    entry: (a) the incremental append scan — reading the range after the
    first snapshot returns exactly the second batch, manifest-only
    planning; (b) the changelog scan (create_changelog_view parity) over
    insert → insert → MOR delete, emitting INSERT rows per append ordinal
    and DELETE rows for exactly the position-deleted rows; (c) row-lineage
    changelog pairing (X54, hash-checked per the round-8 verdict): a MOR
    UPDATE's DELETE and INSERT changelog rows are joined 1:1 on ``_row_id``
    via ``changes(lineage=True)`` — the pairing itself is the assertion
    (a value-matching consumer could not distinguish which old row became
    which new row; identity can) — and the paired old/new images are
    emitted as UPDATE_PRE/UPDATE_POST feeds the oracle reproduces from
    plain SQL. The lineage feed runs on a dedicated 1/100-of-lineitem
    table — the semantics are table-size-independent and the changelog
    lineage read re-reads every referenced file, so a small table keeps
    the entry's bench cost at the pre-extension level."""
    from demo_iceberg_permanent_delete_spark.parallel import run_concurrent

    li = load_table(spark, sf_dir, "lineitem")

    def append_changelog_leg() -> DataFrame:
        """Feeds (a)+(b) on the main table — independent of the lineage
        table, so it runs in its own thread (guide §2.6) and checkpoints
        its union so teardown-safety costs no extra final pass."""
        t, warehouse = _fresh_table(
            spark, sf_dir, {"write.delete.mode": "merge-on-read"}
        )
        try:
            snap1 = t.metadata.current_snapshot_id
            t.insert(li.filter("l_orderkey % 10 = 5"))
            inc = t.incremental_read(from_snapshot_id=snap1).select(
                F.lit("appends").alias("feed"),
                F.lit("INSERT").alias("_change_type"),
                F.lit(0).alias("_change_ordinal"),
                "*",
            )
            t.delete("l_returnflag = 'R'")
            chg = (
                t.changes()
                .drop("_commit_snapshot_id")
                .select(F.lit("changelog").alias("feed"), "*")
            )
            return inc.unionByName(chg).localCheckpoint(eager=True)
        finally:
            shutil.rmtree(warehouse, ignore_errors=True)

    def lineage_leg() -> DataFrame:
        """Feeds (c)+(d): MOR update on the small lineage table, then pair
        its changelog rows by row identity / by identifier values."""
        warehouse = tempfile.mkdtemp(prefix="lakeq-")
        cat2 = Catalog(spark, warehouse)
        cat2.create_namespace("default")
        try:
            t2 = cat2.create_table(
                "default.lineitem_upd",
                _LINEITEM_DDL,
                properties={"write.update.mode": "merge-on-read"},
            )
            t2.insert(li.filter("l_orderkey % 100 = 0"))
            pre_update_head = t2.metadata.current_snapshot_id
            t2.update({"l_quantity": F.col("l_quantity") + 1000}, _UPDATE_PRED)
            data_cols = [c.strip().split()[0] for c in _LINEITEM_DDL.split(",")]
            upd = t2.changes(
                start_snapshot_id=pre_update_head, lineage=True
            ).localCheckpoint(eager=True)
            pre = upd.filter(F.col("_change_type") == "DELETE").select(
                "_row_id", *data_cols
            )
            post = upd.filter(F.col("_change_type") == "INSERT").select(
                "_row_id", *data_cols
            )
            pairs = pre.alias("d").join(
                post.alias("i"), on="_row_id", how="inner"
            ).localCheckpoint(eager=True)
            n_pre, n_post, n_pairs = pre.count(), post.count(), pairs.count()
            assert 0 < n_pairs == n_pre == n_post, (
                f"lineage pairing must be a bijection: {n_pre=} {n_post=} {n_pairs=}"
            )

            def _feed(side: str, kind: str) -> DataFrame:
                return pairs.select(
                    F.lit("lineage_update").alias("feed"),
                    F.lit(kind).alias("_change_type"),
                    F.lit(3).alias("_change_ordinal"),
                    *[F.col(f"{side}.{c}").alias(c) for c in data_cols],
                )

            paired = _feed("d", "UPDATE_PRE").unionByName(
                _feed("i", "UPDATE_POST")
            )
            # (d) the VALUE-matching counterpart (round-11): the same MOR
            # update's changelog rows paired by identifier columns via
            # pair_update_images — the public post-processor behind
            # changes(compute_updates=True), Iceberg's create_changelog_view
            # pre/post-image mode — applied to the ALREADY-CHECKPOINTED
            # changelog above rather than paying a second changelog read.
            # The UPDATE_BEFORE/UPDATE_AFTER relabeling itself sits under
            # the hash: a mispair or a carry-over leak would flip labels or
            # leak extra rows and break it. (l_orderkey, l_linenumber) alone
            # is NOT unique in the synthetic lineitem — the guard correctly
            # refuses it; the widened key is unique within the updated
            # subset at every bundled SF and none of its columns are touched
            # by the update
            value_paired = t2.pair_update_images(
                upd,
                identifier_columns=[
                    "l_orderkey",
                    "l_linenumber",
                    "l_partkey",
                    "l_suppkey",
                ],
            ).select(
                F.lit("value_update").alias("feed"),
                "_change_type",
                F.lit(4).alias("_change_ordinal"),
                *data_cols,
            )
            # pairs is checkpointed and upd's derivation is checkpointed,
            # so materializing the two paired feeds is join/projection
            # over driver-local blocks — cheap, and teardown-safe
            return paired.unionByName(value_paired).localCheckpoint(eager=True)
        finally:
            shutil.rmtree(warehouse, ignore_errors=True)

    main_feeds, lineage_feeds = run_concurrent(append_changelog_leg, lineage_leg)
    return main_feeds.unionByName(lineage_feeds)


@query(
    "lake_schema_evolution",
    oracle="""
    WITH evolved AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority, CAST(NULL AS VARCHAR) AS o_note,
             'web' AS o_channel
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority, 'backfill' AS o_note,
             'web' AS o_channel
      FROM orders WHERE o_orderkey % 10 = 5
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority, CAST(NULL AS VARCHAR) AS o_note,
             'app' AS o_channel
      FROM orders WHERE o_orderkey % 10 = 7
    ),
    dim AS (
      SELECT c_custkey AS o_custkey, c_mktsegment
      FROM customer WHERE c_custkey % 3 = 0
    )
    SELECT e.*, d.c_mktsegment
    FROM evolved e JOIN dim d USING (o_custkey)
    """,
)
def lake_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE ADD COLUMN then append: pre-evolution files null-fill the
    new column at read (declared-schema scans), post-evolution rows carry
    values — no file rewrite anywhere. A second ADD COLUMN carries an
    INITIAL DEFAULT (X55, hash-checked per the round-8 verdict): every row
    written before the add reads the default ('web') across BOTH earlier
    eras with zero rewrites, while the post-add batch carries its physical
    value ('app') — the era boundary rides the hashed output. The evolved
    table is then joined to a customer-segment dimension lake table through
    the stats-driven planner (lake/planner.plan_join): the manifest-truth
    byte estimate picks the broadcast side — the decision Iceberg feeds
    Catalyst via reported stats (reference docker-compose.yml:23-30 wires
    the Iceberg extensions for exactly this), made here from this layer's
    manifests."""
    warehouse = tempfile.mkdtemp(prefix="lakeq-")
    cat = Catalog(spark, warehouse)
    cat.create_namespace("default")
    t = cat.create_table("default.orders_evolve", _ORDERS_DDL)
    try:
        orders = load_table(spark, sf_dir, "orders")
        t.insert(orders.filter("o_orderkey % 10 = 0"))
        t.add_column("o_note", "string")
        t.insert(
            orders.filter("o_orderkey % 10 = 5").withColumn(
                "o_note", F.lit("backfill")
            )
        )
        t.add_column("o_channel", "string", default="web")
        t.insert(
            orders.filter("o_orderkey % 10 = 7")
            .withColumn("o_note", F.lit(None).cast("string"))
            .withColumn("o_channel", F.lit("app"))
        )
        # the defaulted column is metadata-resolved, not rewritten: files
        # from both pre-add eras carry no physical o_channel at all
        no_chan = [
            e
            for e in t.metadata.current_snapshot().data_files()
            if "o_channel" not in e.min_values
        ]
        assert no_chan, "pre-add files must not physically carry o_channel"
        dim = cat.create_table(
            "default.cust_dim", "o_custkey bigint, c_mktsegment string"
        )
        dim.insert(
            load_table(spark, sf_dir, "customer")
            .filter("c_custkey % 3 = 0")
            .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
        )
        joined, decision = plan_join(t, dim, on="o_custkey")
        # consistency, not a fixed strategy: at larger SFs the dim may
        # legitimately outgrow the broadcast threshold and shuffle
        if decision["right_bytes"] <= decision["threshold"]:
            assert decision["strategy"] == "broadcast_right", decision

        # Facade per-scan pruning, driver-visible (X39/X41): a SQL
        # statement whose WHERE provably scopes this table registers the
        # manifest-PRUNED scan (lake/scanscope.py → scan(prune_only)).
        # `o_note IS NULL` prunes the era-2 files via their recorded
        # null_count=0 while era-1 files (no o_note stats) and era-3
        # files (all-null o_note) are conservatively kept — so the scan
        # must read strictly fewer files than the table holds, and its
        # count must equal the manifest-derived null-note row total.
        from demo_iceberg_permanent_delete_spark.lake import LakeEngine

        eng = LakeEngine(spark, warehouse)
        pruned = eng.sql(
            "SELECT o_orderkey FROM default.orders_evolve "
            "WHERE o_note IS NULL"
        )
        data_files = t.metadata.current_snapshot().data_files()
        n_scan = len(
            {f for f in pruned.inputFiles() if f.endswith(".parquet")}
        )
        assert 0 < n_scan < len(data_files), (n_scan, len(data_files))
        expected = sum(
            e.record_count
            if "o_note" not in e.null_counts
            else e.null_counts["o_note"]
            for e in data_files
        )
        assert pruned.count() == expected, (pruned.count(), expected)
        return joined.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


_UPSERT_SLICE = "l_orderkey % 100 = 50 AND l_linenumber = 1"


@query(
    "lake_eq_delete",
    oracle=f"""
    WITH cur AS (
      SELECT * FROM lineitem
      WHERE {_SUBSET} AND NOT COALESCE(l_returnflag = 'R', FALSE)
      UNION ALL
      SELECT * FROM lineitem WHERE l_orderkey % 10 = 5
    )
    SELECT * FROM cur WHERE NOT ({_UPSERT_SLICE})
    UNION ALL
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
           l_quantity + 500 AS l_quantity, l_extendedprice, l_discount,
           l_tax, l_returnflag, l_linestatus, l_shipdate
    FROM lineitem WHERE {_UPSERT_SLICE}
    """,
)
def lake_eq_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-delete round trip (content=2 — the one Iceberg delete
    mechanism the reference only *decodes*, file_summary_utils.py:146):
    delete key l_returnflag='R' via an equality-delete file (no data scan
    at write), then append a second batch whose 'R' rows must SURVIVE (the
    delete applies only to files committed before it — sequence rule).
    An equality-delete UPSERT (X56, the Flink-writer commit: one eq-delete
    file on the keys + the batch's data files in one add-only snapshot)
    then replaces one key slice — including re-inserting slice rows the
    first eq-delete had masked — which the oracle reproduces as a plain
    key-exclusion union. rewrite_data_files then purges every delete file
    and makes the erasure physical."""
    t, warehouse = _fresh_table(spark, sf_dir, {})
    try:
        from demo_iceberg_permanent_delete_spark.lake.table import _local_frame

        # one Arrow batch, not a 32-slice Python parallelize
        t.equality_delete(_local_frame(spark, [("R",)], "l_returnflag string"))
        assert any(
            e.content == 2 for e in t.metadata.current_snapshot().manifest
        ), "equality delete must add a content=2 file"
        li = load_table(spark, sf_dir, "lineitem")
        t.insert(li.filter("l_orderkey % 10 = 5"))
        t.upsert(
            li.filter(_UPSERT_SLICE).withColumn(
                "l_quantity", F.col("l_quantity") + 500
            ),
            on=["l_orderkey", "l_linenumber"],
        )
        result = t.read().localCheckpoint(eager=True)

        # X36 driver-visible (round-5 verdict item 6): the compaction
        # planner must flag the live eq-delete file as delete pressure
        # (ANY eq file recommends the rewrite that applies it physically
        # — its read cost is a per-scan anti-join), and compact() — not a
        # bare rewrite call — must orchestrate that as one full rewrite.
        # The exact masked-row figure (stats-fresh path, X40) stays
        # pytest-pinned in test_stats_planner.py; an ANALYZE here would
        # add a table scan to this entry for an assertion the suite
        # already owns.
        from demo_iceberg_permanent_delete_spark.lake.maintenance import (
            compact,
            plan_compaction,
        )

        dp = plan_compaction(t)["delete_pressure"]
        # the original key delete plus the upsert's eq-delete file
        assert dp["eq_delete_files"] == 2 and dp["recommend_rewrite"], dp
        # physical purge: the delete-pressure-triggered full rewrite
        # applies the equality deletes and drops the delete file; the
        # batch-1 'R' rows are gone from raw parquet
        summary = compact(t)
        assert summary["full_rewrite"], summary
        assert not t.metadata.current_snapshot().delete_files()
        live = sum(
            e.record_count
            for e in t.metadata.current_snapshot().data_files()
        )
        assert live == result.count(), (live, "manifest rows ≠ visible rows")
        raw = t.read(apply_deletes=False)
        # ONE aggregate pass for both erasure assertions (two counts were
        # two full raw scans). The upsert slice legitimately re-inserted
        # its 'R' rows AFTER the key delete — excluded from the check.
        erased, survived = raw.select(
            F.sum(
                F.when(
                    F.expr(
                        f"l_orderkey % 10 = 0 AND l_returnflag = 'R' "
                        f"AND NOT ({_UPSERT_SLICE})"
                    ),
                    1,
                ).otherwise(0)
            ),
            F.sum(
                F.when(
                    F.expr("l_orderkey % 10 = 5 AND l_returnflag = 'R'"), 1
                ).otherwise(0)
            ),
        ).first()
        assert erased == 0, "post-rewrite raw files must not contain the eq-deleted rows"
        assert survived > 0
        return result
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)


@query(
    "lake_clustering",
    oracle=f"""
    SELECT 'hidden_partitioning' AS part, * FROM lineitem
    WHERE {_SUBSET} AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    UNION ALL
    SELECT 'zorder' AS part, * FROM lineitem
    WHERE {_SUBSET} AND l_orderkey <= 4000 AND l_partkey <= 600
    """,
)
def lake_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both physical-clustering surfaces in one hash-checked entry.

    (a) Hidden partitioning (Iceberg transform spec parity — the catalog
    stack the reference delegates to, docker-compose.yml:23-30): a table
    PARTITIONED BY days(l_shipdate), bucket(4, l_orderkey); writes
    range-cluster on the transform values and the planner prunes files
    from a predicate on the RAW column — the query never mentions a
    partition column, which is Iceberg's core hidden-partitioning claim.
    (Point-lookup bucket pruning with a leading bucket field is asserted
    in tests/test_hidden_partitioning.py.)

    (b) Z-order rewrite (CALL rewrite_data_files strategy=sort,
    sort_order='zorder(...)'): after interleaved-bit clustering on
    (l_orderkey, l_partkey), file min/max stats prune on EITHER column and
    the two-sided corner box opens few files.
    """
    from demo_iceberg_permanent_delete_spark.lake.pruning import candidate_files
    from demo_iceberg_permanent_delete_spark.parallel import run_concurrent

    def hidden_partitioning_leg() -> DataFrame:
        warehouse = tempfile.mkdtemp(prefix="lakeq-")
        cat = Catalog(spark, warehouse)
        cat.create_namespace("default")
        hp = cat.create_table(
            "default.lineitem_hp",
            _LINEITEM_DDL,
            partition_by=["days(l_shipdate)", "bucket(4, l_orderkey)"],
            properties={"write.distribution.partitions": "8"},
        )
        try:
            hp.insert(_subset(spark, sf_dir))
            hp_pred = "l_shipdate < TIMESTAMP '1998-01-01 00:00:00'"
            entries = hp.metadata.current_snapshot().data_files()
            cand = candidate_files(entries, hp_pred, hp._partition_fields)
            assert len(entries) >= 4, "range-clustered write must produce several files"
            assert 0 < len(cand) < len(entries), (
                f"raw-column predicate must prune: {len(cand)}/{len(entries)}"
            )
            # X70 differential, in-query (the X39 style): the MANIFEST-served
            # `.partitions` view (write-time harvested counts — every entry of
            # this engine-written table carries them, so no data file is
            # opened) must agree with a groupBy over the data itself, per
            # partition tuple, before the hashed scan below is trusted.
            assert all(e.partition_counts is not None for e in entries)
            from demo_iceberg_permanent_delete_spark.lake.transforms import (
                transform_column,
            )

            view = {
                tuple(sorted(r["partition"].items())): r["record_count"]
                for r in hp.meta("partitions").collect()
            }
            raw = hp.read()
            types = {f.name: f.dataType for f in raw.schema.fields}
            truth = {
                tuple(
                    sorted(
                        (fld.spec, r[f"__p{i}"])
                        for i, fld in enumerate(hp._partition_fields)
                    )
                ): r["n"]
                for r in raw.select(
                    *[
                        transform_column(fld, types[fld.source])
                        .cast("string")
                        .alias(f"__p{i}")
                        for i, fld in enumerate(hp._partition_fields)
                    ]
                )
                .groupBy(*[f"__p{i}" for i in range(len(hp._partition_fields))])
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            assert view == truth, "manifest-served .partitions != data truth"
            return (
                hp.scan(hp_pred)
                .select(F.lit("hidden_partitioning").alias("part"), "*")
                .localCheckpoint(eager=True)
            )
        finally:
            shutil.rmtree(warehouse, ignore_errors=True)

    def zorder_leg() -> DataFrame:
        warehouse = tempfile.mkdtemp(prefix="lakeq-")
        cat = Catalog(spark, warehouse)
        cat.create_namespace("default")
        try:
            zt = cat.create_table("default.lineitem_z", _LINEITEM_DDL)
            zt.insert(_subset(spark, sf_dir))
            # size the target from actual bytes so the rewrite yields ~6 files
            # at any SF (a fixed 16 KiB under-splits the sf0.001 smoke subset)
            total = sum(
                e.file_size_in_bytes
                for e in zt.metadata.current_snapshot().data_files()
            )
            zt.rewrite_data_files(
                sort_order="zorder(l_orderkey, l_partkey)",
                target_file_size_bytes=max(1024, min(16 * 1024, total // 6)),
            )
            entries = zt.metadata.current_snapshot().data_files()
            assert len(entries) >= 4, "small target size must yield several files"
            z_pred = "l_orderkey <= 4000 AND l_partkey <= 600"
            # pruning is only expectable when the corner predicate is actually
            # selective at this SF (at sf0.001 the keys top out near the corner
            # itself, so every z-range legitimately intersects it)
            max_ok = max(int(e.max_values["l_orderkey"]) for e in entries)
            if max_ok >= 4 * 4000:
                by_order = candidate_files(entries, "l_orderkey <= 4000")
                by_part = candidate_files(entries, "l_partkey <= 600")
                assert len(by_order) < len(entries), "zorder must prune on dim 1"
                assert len(by_part) < len(entries), "zorder must prune on dim 2"
                corner = candidate_files(entries, z_pred)
                assert len(corner) <= min(len(by_order), len(by_part))
            return (
                zt.scan(z_pred)
                .select(F.lit("zorder").alias("part"), "*")
                .localCheckpoint(eager=True)
            )
        finally:
            shutil.rmtree(warehouse, ignore_errors=True)

    # the two tables live in separate warehouses and share nothing — run
    # their lifecycles concurrently (guide §2.6); each leg checkpoints its
    # own scan, so the union below is plan-free and teardown-safe
    hp_part, z_part = run_concurrent(hidden_partitioning_leg, zorder_leg)
    return hp_part.unionByName(z_part)


@query(
    "lake_file_summary",
    oracle=f"""
    WITH stats AS (
      SELECT count(*) AS n_rows,
             count(*) FILTER (WHERE l_returnflag = 'R') AS n_del
      FROM lineitem WHERE {_SUBSET}
    ),
    expected(prefix, file_type, file_format, files_in_catalog, rec_kind,
             commit_ordinal) AS (
      VALUES
        -- create, insert, delete each write one metadata version
        ('metadata', 'metadata_log_entries', 'json', 1, NULL, 1),
        ('metadata', 'metadata_log_entries', 'json', 1, NULL, 2),
        ('metadata', 'metadata_log_entries', 'json', 1, NULL, 3),
        -- both snapshots' manifest lists bucket at the insert commit:
        -- the reference dates each list LEAST(own, parent committed_at)
        ('metadata', 'manifest_lists', 'json', 2, NULL, 1),
        -- one manifest per snapshot (insert, delete)
        ('metadata', 'manifests', 'json', 1, NULL, 1),
        ('metadata', 'manifests', 'json', 1, NULL, 2),
        -- insert repartitions to exactly 2 data files; the MOR delete
        -- bin-packs its deletion vectors into ONE delete file whose
        -- record_count is the DV cardinality (= rows deleted)
        ('data', 'data', 'parquet', 2, 'rows', 1),
        ('data', 'position_deletes', 'parquet', 1, 'dels', 1)
    )
    SELECT prefix, file_type, file_format,
           CAST(files_in_catalog AS BIGINT) AS files_in_catalog,
           CAST(CASE rec_kind WHEN 'rows' THEN n_rows WHEN 'dels' THEN n_del
                END AS BIGINT) AS records,
           'fixed' AS run_id, 'post_delete' AS operation,
           CAST(commit_ordinal AS INTEGER) AS commit_ordinal
    FROM expected CROSS JOIN stats
    """,
)
def lake_file_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship metadata analytics (summarize_files,
    file_summary_utils.py:18-179) over a real lifecycle (create → insert →
    MOR delete), in its hash-checkable form: commit ordinals instead of
    wall-clock minute buckets and a fixed run_id (the two nondeterminism
    sources in the reference shape), plus per-group record sums.

    The lifecycle is pinned so the inventory is predictable: the insert
    repartitions to exactly 2 data files, so file counts and per-type
    ordinals are implementation constants in the oracle, while the record
    sums (total subset rows; deleted 'R' rows) are genuinely data-derived
    from `lineitem`. The wall-clock variant remains `summarize_files` —
    same CTE/self-join/UNION/decode pipeline, pytest-covered."""
    from demo_iceberg_permanent_delete_spark.lake.file_summary import (
        summarize_files_deterministic,
    )

    warehouse = tempfile.mkdtemp(prefix="lakeq-")
    cat = Catalog(spark, warehouse)
    cat.create_namespace("default")
    t = cat.create_table(
        "default.lineitem_lake",
        _LINEITEM_DDL,
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(_subset(spark, sf_dir).repartition(2, "l_orderkey"))
    try:
        t.delete("l_returnflag = 'R'")
        return summarize_files_deterministic(
            t, operation="post_delete"
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)
