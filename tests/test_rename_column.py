"""ALTER TABLE RENAME COLUMN: metadata-only rename with name-chain reads.

Files written before a rename keep the old physical column; the read path
must resolve them through the rename history (never silently null-fill),
DML predicates on the new name must hit pre-rename rows, and manifest
pruning must keep working against stats keyed by the old physical name.
Iceberg does this with field IDs (public spec); we own the format, so the
metadata records explicit name chains."""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import one_part
from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.lake.pruning import candidate_files

DDL = "k bigint, email string, v double"


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, str(tmp_path / "wh"))


@pytest.fixture()
def table(spark, cat):
    cat.create_namespace("default")
    t = cat.create_table(
        "default.people", DDL, properties={"write.delete.mode": "merge-on-read"}
    )
    rows = [(i, f"user{i}@example.com", float(i)) for i in range(100)]
    t.insert(one_part(spark, rows, DDL))
    return t


def test_rename_reads_old_and_new_files(spark, table):
    table.rename_column("email", "contact_email")
    # post-rename write lands under the NEW physical name
    table.insert(
        one_part(spark, 
            [(100, "late@example.com", 100.0)],
            "k bigint, contact_email string, v double",
        )
    )
    df = table.read()
    assert df.columns == ["k", "contact_email", "v"]
    vals = {r["k"]: r["contact_email"] for r in df.collect()}
    assert vals[5] == "user5@example.com"  # pre-rename file, resolved by chain
    assert vals[100] == "late@example.com"  # post-rename file
    assert len(vals) == 101 and all(v is not None for v in vals.values())


def test_rename_chain_and_collision_guards(spark, table):
    table.rename_column("email", "contact")
    table.rename_column("contact", "contact_email")
    assert table.metadata.renames == {"contact_email": ["contact", "email"]}
    vals = {r["k"]: r["contact_email"] for r in table.read().collect()}
    assert vals[7] == "user7@example.com"
    with pytest.raises(ValueError, match="already in use"):
        table.rename_column("v", "contact")  # retired physical name
    with pytest.raises(ValueError, match="already in use"):
        table.rename_column("v", "k")  # live name
    with pytest.raises(ValueError, match="no such column"):
        table.rename_column("ghost", "x")
    with pytest.raises(ValueError, match="retired physical name"):
        table.add_column("email", "string")


def test_dml_on_renamed_column_hits_old_files(spark, table):
    table.rename_column("email", "contact_email")
    # MOR delete predicated on the NEW name must mask pre-rename rows
    table.delete("contact_email = 'user3@example.com'")
    remaining = {r["k"] for r in table.read().collect()}
    assert 3 not in remaining and len(remaining) == 99
    # COW update through the new name (PII-nulling pattern)
    table.set_properties({"write.update.mode": "copy-on-write"})
    table.update({"contact_email": None}, "k = 5")
    vals = {r["k"]: r["contact_email"] for r in table.read().collect()}
    assert vals[5] is None and vals[6] == "user6@example.com"


def test_pruning_uses_alias_stats(spark, table):
    # three disjoint-range files under the OLD name, then rename
    for lo in (1000, 2000):
        rows = [(lo + i, f"user{lo + i}@example.com", float(i)) for i in range(50)]
        table.insert(one_part(spark, rows, DDL))
    table.rename_column("k", "row_id")
    entries = table.metadata.current_snapshot().data_files()
    assert all("row_id" not in (e.min_values or {}) for e in entries)
    cand = candidate_files(entries, "row_id = 2042", aliases=table.metadata.renames)
    assert len(cand) == 1  # old-name stats pruned 2 of 3 files
    # and the pruned scan still returns the right row
    got = table.scan("row_id = 2042").collect()
    assert len(got) == 1 and got[0]["row_id"] == 2042


def test_time_travel_reads_through_current_schema(spark, table):
    snap = table.metadata.current_snapshot_id
    table.rename_column("email", "contact_email")
    old = table.read(snapshot_id=snap)
    assert old.columns == ["k", "contact_email", "v"]
    assert old.filter("contact_email IS NULL").count() == 0


def test_drop_kills_chain_no_resurrection(spark, table):
    table.rename_column("email", "contact_email")
    table.drop_column("contact_email")
    assert "contact_email" not in table.metadata.renames
    # EVERY name in the dropped chain is tombstoned — by-name parquet
    # resolution cannot do Iceberg's fresh-field-id trick, so re-adding
    # either the dropped logical name or a retired physical name could
    # resurrect values from files written under that name. Conservative
    # block (tests/test_advice_regressions.py covers the attack sequence).
    for retired in ("contact_email", "email"):
        with pytest.raises(ValueError, match="retired"):
            table.add_column(retired, "string")
    # a genuinely fresh name still works and null-fills
    table.add_column("contact_email2", "string")
    vals = {r["k"]: r["contact_email2"] for r in table.read().collect()}
    assert all(v is None for v in vals.values())


def test_rename_blocked_by_equality_deletes_and_partitions(spark, cat):
    cat.create_namespace("default")
    t = cat.create_table("default.parted", DDL, partition_by=["bucket(4, k)"])
    t.insert(
        one_part(spark, [(1, "a@example.com", 1.0)], DDL)
    )
    with pytest.raises(ValueError, match="partition source"):
        t.rename_column("k", "row_id")

    t2 = cat.create_table("default.eqd", DDL)
    t2.insert(
        one_part(spark, [(1, "a@example.com", 1.0)], DDL)
    )
    t2.equality_delete(spark.createDataFrame([("a@example.com",)], "email string"))
    with pytest.raises(ValueError, match="equality-delete"):
        t2.rename_column("email", "contact_email")


def test_sql_facade_rename(spark, cat):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, cat.warehouse)
    eng.sql("CREATE NAMESPACE IF NOT EXISTS default")
    eng.sql("CREATE TABLE default.t (a bigint, b string) USING iceberg")
    eng.sql("INSERT INTO default.t VALUES (1, 'x')")
    eng.sql("ALTER TABLE default.t RENAME COLUMN b TO label")
    rows = eng.sql("SELECT a, label FROM default.t").collect()
    assert [(r["a"], r["label"]) for r in rows] == [(1, "x")]


def test_datasource_reads_through_rename(spark, cat):
    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import register

    register(spark)
    cat.create_namespace("default")
    t = cat.create_table("default.ds", DDL)
    t.insert(
        one_part(
            spark, [(i, f"user{i}@example.com", float(i)) for i in range(10)], DDL
        )
    )
    t.rename_column("email", "contact_email")
    df = (
        spark.read.format("lakehouse")
        .option("location", t.metadata.location)
        .load()
    )
    vals = {r["k"]: r["contact_email"] for r in df.collect()}
    assert vals[4] == "user4@example.com" and len(vals) == 10


def test_alter_column_type_widening(spark, cat):
    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import register

    cat.create_namespace("default")
    t = cat.create_table("default.widen", "k int, v float, s string")
    t.insert(
        one_part(spark, [(1, 1.5, "a"), (2, 2.5, "b")], "k int, v float, s string")
    )
    t.alter_column_type("k", "bigint")
    t.alter_column_type("v", "double")
    # pre-promotion files upcast in place; post-promotion writes land wide
    t.insert(
        one_part(spark, 
            [(3_000_000_000, 3.5, "c")], "k bigint, v double, s string"
        )
    )
    df = t.read()
    assert dict(df.dtypes)["k"] == "bigint" and dict(df.dtypes)["v"] == "double"
    got = {r["k"]: r["v"] for r in df.collect()}
    assert got == {1: 1.5, 2: 2.5, 3_000_000_000: 3.5}
    # pruning on mixed-width stats stays sound
    assert t.scan("k = 3000000000").count() == 1
    assert t.scan("k = 2").count() == 1
    # MOR delete through the widened column hits an old-width file
    t.set_properties({"write.delete.mode": "merge-on-read"})
    t.delete("k = 1")
    assert {r["k"] for r in t.read().collect()} == {2, 3_000_000_000}
    # Python DataSource conforms via arrow cast
    register(spark)
    ds = (
        spark.read.format("lakehouse")
        .option("location", t.metadata.location)
        .load()
    )
    assert {r["k"] for r in ds.collect()} == {2, 3_000_000_000}
    # non-widening promotions are rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="widening"):
        t.alter_column_type("k", "int")
    with _pytest.raises(ValueError, match="widening"):
        t.alter_column_type("s", "bigint")
    with _pytest.raises(ValueError, match="no such column"):
        t.alter_column_type("ghost", "bigint")


def test_alter_column_type_sql_grammar(spark, cat):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, cat.warehouse)
    eng.sql("CREATE NAMESPACE IF NOT EXISTS default")
    eng.sql("CREATE TABLE default.wt (a int, b float) USING iceberg")
    eng.sql("INSERT INTO default.wt VALUES (7, 1.5)")
    eng.sql("ALTER TABLE default.wt ALTER COLUMN a TYPE bigint")
    rows = eng.sql("SELECT a, b FROM default.wt").collect()
    assert rows[0]["a"] == 7
    assert dict(eng.sql("SELECT a, b FROM default.wt").dtypes)["a"] == "bigint"
