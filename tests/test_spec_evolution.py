"""Partition-spec evolution + WRITE ORDERED BY (lake/table.py, lake/sql.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.lake.pruning import candidate_files


@pytest.fixture
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("default")
    return c


def test_add_partition_field_prunes_new_files_keeps_old_readable(spark, cat):
    t = cat.create_table(
        "default.pe", "id bigint, v string",
        properties={"write.distribution.partitions": "4"},
    )
    s1 = t.insert(
        spark.createDataFrame([(i, "old") for i in range(40)], "id long, v string")
    )
    t.add_partition_field("bucket(4, id)")
    assert t.metadata.partition_by == ["bucket(4, id)"]
    # same id range again so raw min/max bounds cannot distinguish specs
    t.insert(spark.createDataFrame([(i, "new") for i in range(40)], "id long, v string"))

    # all 80 rows remain readable across both specs
    assert t.read().count() == 80

    snap = t.metadata.current_snapshot()
    old_paths = {e.file_path for e in snap.data_files() if e.added_snapshot_id == s1.snapshot_id}
    old_files = [e for e in snap.data_files() if e.file_path in old_paths]
    new_files = [e for e in snap.data_files() if e.file_path not in old_paths]
    assert old_files and new_files

    # pruning on the bucketed column: old-spec files (no synthetic stats)
    # that cover the id are conservatively kept; new-spec files prune by
    # bucket even though their raw id bounds all cover the probe
    cands = candidate_files(snap.data_files(), "id = 5", t._partition_fields)
    cand_paths = {e.file_path for e in cands}
    covering_old = [
        e for e in old_files
        if int(e.min_values["id"]) <= 5 <= int(e.max_values["id"])
    ]
    assert all(e.file_path in cand_paths for e in covering_old)  # sound
    assert len([e for e in new_files if e.file_path in cand_paths]) < len(new_files)


def test_drop_partition_field(spark, cat):
    t = cat.create_table("default.pd", "id bigint, ts timestamp",
                         partition_by=["days(ts)", "bucket(4, id)"])
    t.drop_partition_field("bucket(4, id)")
    assert t.metadata.partition_by == ["days(ts)"]
    with pytest.raises(ValueError, match="not found"):
        t.drop_partition_field("bucket(4, id)")
    with pytest.raises(ValueError, match="already present"):
        t.add_partition_field("date(ts)")  # same canonical transform as days


def test_replace_partition_field(spark, cat):
    """REPLACE = atomic drop+add: one spec id, one commit, position kept."""
    t = cat.create_table(
        "default.pr", "id bigint, ts timestamp",
        partition_by=["days(ts)", "bucket(4, id)"],
    )
    commits_before = len(t.metadata.metadata_log)
    spec_before = t.metadata.default_spec_id
    t.replace_partition_field("days(ts)", "months(ts)")
    assert t.metadata.partition_by == ["months(ts)", "bucket(4, id)"]
    # exactly one commit, exactly one new spec id (no intermediate
    # dropped-state spec from a drop-then-add)
    assert len(t.metadata.metadata_log) == commits_before + 1
    assert t.metadata.default_spec_id == spec_before + 1
    log_ids = [e["spec_id"] for e in t.metadata.spec_log()]
    assert log_ids == [spec_before, spec_before + 1]

    with pytest.raises(ValueError, match="not found"):
        t.replace_partition_field("days(ts)", "years(ts)")
    with pytest.raises(ValueError, match="already present"):
        t.replace_partition_field("months(ts)", "bucket(4, id)")
    # data written under both specs stays readable
    t.insert(
        spark.sql(
            "SELECT id, timestamp'2024-03-05 00:00:00' + make_interval(0,0,0,int(id)) AS ts "
            "FROM range(20)"
        )
    )
    t.replace_partition_field("months(ts)", "days(ts)")
    t.insert(
        spark.sql(
            "SELECT id + 100 AS id, timestamp'2024-06-01 00:00:00' AS ts FROM range(5)"
        )
    )
    assert t.read().count() == 25


def test_replace_partition_field_sql(spark, cat):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, cat.warehouse)
    eng.sql(
        "CREATE TABLE default.prs (id bigint, ts timestamp) USING iceberg "
        "PARTITIONED BY (days(ts))"
    )
    eng.sql("ALTER TABLE default.prs REPLACE PARTITION FIELD days(ts) WITH months(ts)")
    assert cat.load_table("default.prs").metadata.partition_by == ["months(ts)"]
    with pytest.raises(ValueError, match="AS <name> is not supported"):
        eng.sql(
            "ALTER TABLE default.prs REPLACE PARTITION FIELD months(ts) "
            "WITH years(ts) AS yr"
        )


def test_write_ordered_by_tightens_bounds(spark, cat):
    t = cat.create_table(
        "default.so", "id bigint, v string",
        properties={"write.distribution.partitions": "4"},
    )
    t.set_sort_order("id")
    import random

    rng = random.Random(7)
    ids = list(range(1000))
    rng.shuffle(ids)
    t.insert(spark.createDataFrame([(i, f"v{i}") for i in ids], "id long, v string"))

    snap = t.metadata.current_snapshot()
    files = snap.data_files()
    assert len(files) == 4
    # ordered write → non-overlapping id ranges across files
    bounds = sorted((int(e.min_values["id"]), int(e.max_values["id"])) for e in files)
    for (lo1, hi1), (lo2, _hi2) in zip(bounds, bounds[1:]):
        assert hi1 < lo2
    # point lookup prunes to exactly one file
    assert len(candidate_files(files, "id = 500", [])) == 1


def test_sort_order_sql_surface(spark, cat):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, cat.warehouse)
    eng.sql("CREATE TABLE default.sq (id bigint, v string) USING iceberg")
    eng.sql("ALTER TABLE default.sq WRITE ORDERED BY (id DESC)")
    t = cat.load_table("default.sq")
    assert t.properties["write.sort-order"] == "id DESC"
    eng.sql("ALTER TABLE default.sq WRITE UNORDERED")
    assert "write.sort-order" not in cat.load_table("default.sq").properties

    eng.sql("ALTER TABLE default.sq ADD PARTITION FIELD bucket(8, id)")
    assert cat.load_table("default.sq").metadata.partition_by == ["bucket(8, id)"]
    eng.sql("ALTER TABLE default.sq DROP PARTITION FIELD bucket(8, id)")
    assert cat.load_table("default.sq").metadata.partition_by == []

    with pytest.raises(ValueError, match="not in table schema"):
        t.set_sort_order("nope")


def test_write_distribution_mode(spark, cat):
    """Iceberg's write.distribution-mode: range (default, tight bounds),
    hash (one value per dimension per task, no range sample), none (no
    shuffle). All three read back identically and keep exact partition
    counts in .partitions; a typo fails the write loudly."""
    rows = [(i, f"2024-06-{(i % 3) + 5:02d}") for i in range(60)]

    def mk(name, mode):
        t = cat.create_table(
            f"default.{name}", "id bigint, d date",
            partition_by=["d"],
            properties={"write.distribution-mode": mode} if mode else {},
        )
        t.insert(
            spark.createDataFrame(rows, "id long, d string").selectExpr(
                "id", "CAST(d AS date) AS d"
            )
        )
        return t

    expected = {f"2024-06-{k + 5:02d}": 20 for k in range(3)}
    for name, mode in (("wr", None), ("wh", "hash"), ("wn", "none")):
        t = mk(name, mode)
        assert t.read().count() == 60
        got = {
            r["partition"]["d"]: r["record_count"]
            for r in t.meta("partitions").collect()
        }
        assert got == expected, (name, got)

    # hash mode: each partition value lands in exactly one task's files
    # → at most one file per value (60 tiny rows, 3 values)
    th = cat.load_table("default.wh")
    per_value: dict = {}
    for e in th.metadata.current_snapshot().data_files():
        for pmap, _n in e.partition_counts or []:
            per_value.setdefault(pmap["d"], set()).add(e.file_path)
    assert all(len(files) == 1 for files in per_value.values())

    t = cat.create_table(
        "default.wx", "id bigint, d date", partition_by=["d"],
        properties={"write.distribution-mode": "zorder"},
    )
    with pytest.raises(ValueError, match="range|hash|none"):
        t.insert(spark.sql("SELECT 1 AS id, date'2024-06-05' AS d"))
