"""Complex-typed columns (array/map/struct) through the lake engine, and
nested struct evolution (Iceberg's dotted ADD COLUMN path).

The scalar surface is exercised everywhere else; these tests lock in
that the full DML + changelog + metadata stack works when columns are
nested, and that nested ADD COLUMN is pure metadata on BOTH read paths
(JVM parquet null-fills missing subfields natively; the Arrow DataSource
through its recursive struct conformance)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.lake import Catalog

DDL = "id bigint, tags array<string>, attrs map<string,string>, loc struct<lat:double,lon:double>"


def _df(spark, n, base=0):
    return spark.sql(
        f"SELECT id + {base} AS id, array('t', CAST(id AS string)) AS tags, "
        "map('k', CAST(id AS string)) AS attrs, "
        "named_struct('lat', CAST(id AS double), 'lon', 2.0d) AS loc "
        f"FROM range({n})"
    )


@pytest.fixture
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("default")
    return c


def test_complex_roundtrip_and_dml(spark, cat):
    t = cat.create_table("default.cx", DDL)
    t.insert(_df(spark, 5))
    assert t.read().count() == 5
    assert t.read().filter("loc.lat = 3.0").first()["attrs"] == {"k": "3"}
    # COW delete with a nested predicate
    t.delete("loc.lat >= 4")
    assert sorted(r["id"] for r in t.read().collect()) == [0, 1, 2, 3]
    # update writing an array value
    t.update({"tags": F.array(F.lit("z"))}, "id = 2")
    assert t.read().filter("id = 2").first()["tags"] == ["z"]


def test_complex_mor_eq_delete_changelog(spark, cat):
    t = cat.create_table(
        "default.cm", DDL, properties={"write.delete.mode": "merge-on-read"}
    )
    t.insert(_df(spark, 6))
    t.delete("loc.lat >= 4")  # MOR position deletes, nested predicate
    assert sorted(r["id"] for r in t.read().collect()) == [0, 1, 2, 3]
    t.equality_delete(spark.createDataFrame([(0,)], "id bigint"), ["id"])
    assert sorted(r["id"] for r in t.read().collect()) == [1, 2, 3]
    got = sorted(
        (r["_change_type"], r["id"]) for r in t.changes().collect()
    )
    assert got.count(("DELETE", 0)) == 1 and got.count(("DELETE", 4)) == 1
    # complex values ride the changelog intact
    ins2 = [
        r
        for r in t.changes().collect()
        if r["_change_type"] == "INSERT" and r["id"] == 2
    ]
    assert ins2[0]["loc"]["lat"] == 2.0 and ins2[0]["tags"] == ["t", "2"]


def test_nested_add_column_metadata_only(spark, cat):
    t = cat.create_table("default.nx", "id bigint, loc struct<lat:double,lon:double>")
    t.insert(
        spark.sql(
            "SELECT id, named_struct('lat', CAST(id AS double), 'lon', 2.0d) AS loc "
            "FROM range(3)"
        )
    )
    files_before = {
        e.file_path for e in t.metadata.current_snapshot().data_files()
    }
    t.add_column("loc.alt", "double")
    assert t.schema()["loc"].dataType.fieldNames() == ["lat", "lon", "alt"]
    # pure metadata: same physical files, old rows null-fill the subfield
    assert {
        e.file_path for e in t.metadata.current_snapshot().data_files()
    } == files_before
    assert [r["loc"]["alt"] for r in t.read().collect()] == [None] * 3
    # new writes carry the field; both generations coexist
    t.insert(
        spark.sql(
            "SELECT id + 10 AS id, "
            "named_struct('lat', 0.0d, 'lon', 0.0d, 'alt', 9.0d) AS loc "
            "FROM range(2)"
        )
    )
    vals = {r["id"]: r["loc"]["alt"] for r in t.read().collect()}
    assert vals[0] is None and vals[10] == 9.0
    # deeper chain: struct-in-struct
    t.add_column("loc.meta", "struct<src:string>")
    t.add_column("loc.meta.conf", "double")
    assert (
        t.schema()["loc"].dataType["meta"].dataType.fieldNames()
        == ["src", "conf"]
    )
    assert t.read().filter("id = 10").first()["loc"]["meta"] is None


def test_nested_add_column_sql_and_guards(spark, cat):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, cat.warehouse)
    eng.sql(
        "CREATE TABLE default.ng (id bigint, loc struct<lat:double,lon:double>) "
        "USING iceberg"
    )
    eng.sql("ALTER TABLE default.ng ADD COLUMN loc.alt double")
    t = cat.load_table("default.ng")
    assert t.schema()["loc"].dataType.fieldNames() == ["lat", "lon", "alt"]

    with pytest.raises(ValueError, match="already exists"):
        t.add_column("loc.alt", "double")
    with pytest.raises(ValueError, match="no field"):
        t.add_column("nope.alt", "double")
    with pytest.raises(ValueError, match="struct paths only"):
        t.add_column("id.sub", "double")
    with pytest.raises(ValueError, match="cannot carry a DEFAULT"):
        t.add_column("loc.d", "double", default=1.0)
    with pytest.raises(ValueError, match="not supported"):
        t.rename_column("loc.alt", "loc.height")
    with pytest.raises(ValueError, match="not supported"):
        t.alter_column_type("loc.lat", "double")
    # the SQL spellings hit the same guards
    with pytest.raises(ValueError, match="not supported"):
        eng.sql("ALTER TABLE default.ng RENAME COLUMN loc.alt TO loc.height")
    with pytest.raises(ValueError, match="not supported"):
        eng.sql("ALTER TABLE default.ng ALTER COLUMN loc.lat TYPE double")
    with pytest.raises(ValueError, match="not supported"):
        eng.sql("ALTER TABLE default.ng ALTER COLUMN loc.lat SET DEFAULT 1.0")


def test_nested_add_column_arrow_datasource_read(spark, cat, tmp_path):
    """The Arrow read path can't lean on the JVM's nested null-fill:
    _conform rebuilds evolved structs field-by-field (old files widen
    with null subfields, struct-level nulls preserved)."""
    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        register,
    )

    register(spark)
    t = cat.create_table("default.na", "id bigint, loc struct<lat:double,lon:double>")
    t.insert(
        spark.sql(
            "SELECT id, IF(id = 1, CAST(NULL AS struct<lat:double,lon:double>), "
            "named_struct('lat', CAST(id AS double), 'lon', 2.0d)) AS loc "
            "FROM range(3)"
        )
    )
    t.add_column("loc.alt", "double")
    t.insert(
        spark.sql(
            "SELECT 10 AS id, named_struct('lat', 0.0d, 'lon', 0.0d, 'alt', 9.0d) AS loc"
        )
    )
    got = {
        r["id"]: r["loc"]
        for r in spark.read.format("lakehouse")
        .option("location", t.metadata.location)
        .load()
        .collect()
    }
    assert got[1] is None  # struct-level null survives the widening
    assert got[0]["lat"] == 0.0 and got[0]["alt"] is None
    assert got[10]["alt"] == 9.0
    # and it matches the JVM read exactly
    jvm = {r["id"]: r["loc"] for r in t.read().collect()}
    assert got == jvm


def test_nested_drop_column(spark, cat):
    """Dotted DROP COLUMN removes a nested struct field — pure metadata
    on both readers (extra file subfields never surface), tombstoned so
    a re-add can't resurrect old values; the last field of a struct is
    refused."""
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine
    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        register,
    )

    eng = LakeEngine(spark, cat.warehouse)
    eng.sql(
        "CREATE TABLE default.nd (id bigint, "
        "loc struct<lat:double,lon:double,alt:double>) USING iceberg"
    )
    t = cat.load_table("default.nd")
    t.insert(
        spark.sql(
            "SELECT id, named_struct('lat', CAST(id AS double), 'lon', 2.0d, "
            "'alt', 9.0d) AS loc FROM range(3)"
        )
    )
    files_before = {
        e.file_path for e in t.metadata.current_snapshot().data_files()
    }
    eng.sql("ALTER TABLE default.nd DROP COLUMN loc.alt")
    t.refresh()
    assert t.schema()["loc"].dataType.fieldNames() == ["lat", "lon"]
    # metadata-only, and the dropped subfield never surfaces — JVM read
    assert {
        e.file_path for e in t.metadata.current_snapshot().data_files()
    } == files_before
    row = t.read().filter("id = 1").first()
    assert row["loc"].asDict() == {"lat": 1.0, "lon": 2.0}
    # Arrow DataSource read narrows identically
    register(spark)
    arow = (
        spark.read.format("lakehouse")
        .option("location", t.metadata.location)
        .load()
        .filter("id = 1")
        .first()
    )
    assert arow["loc"].asDict() == {"lat": 1.0, "lon": 2.0}
    # the tombstone blocks re-adding the path
    with pytest.raises(ValueError, match="was dropped"):
        t.add_column("loc.alt", "double")
    # a different leaf still adds fine
    t.add_column("loc.elev", "double")
    # last-field refusal
    eng.sql("ALTER TABLE default.nd ADD COLUMN one struct<only:int>")
    t.refresh()
    with pytest.raises(ValueError, match="last"):
        t.drop_column("one.only")
    with pytest.raises(ValueError, match="no field"):
        t.drop_column("loc.nope")


def test_nested_update_set(spark, cat):
    """UPDATE … SET loc.alt = expr (Spark/Iceberg nested assignment):
    grouped per struct with withField, validated against the schema
    (withField would silently ADD an unknown path), gated by the
    predicate, NULL structs stay NULL; works in COW and MOR modes and
    through the SQL facade."""
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, cat.warehouse)
    eng.sql(
        "CREATE TABLE default.nu (id bigint, "
        "loc struct<lat:double,lon:double,meta:struct<src:string>>) USING iceberg"
    )
    t = cat.load_table("default.nu")
    t.insert(
        spark.sql(
            "SELECT id, IF(id = 2, CAST(NULL AS "
            "struct<lat:double,lon:double,meta:struct<src:string>>), "
            "named_struct('lat', CAST(id AS double), 'lon', 2.0d, "
            "'meta', named_struct('src', 'a'))) AS loc FROM range(3)"
        )
    )
    eng.sql("UPDATE default.nu SET loc.lon = 9.0, loc.meta.src = 'b' WHERE id = 1")
    t.refresh()
    rows = {r["id"]: r["loc"] for r in t.read().collect()}
    assert rows[1]["lon"] == 9.0 and rows[1]["meta"]["src"] == "b"
    assert rows[1]["lat"] == 1.0  # untouched sibling
    assert rows[0]["lon"] == 2.0 and rows[0]["meta"]["src"] == "a"  # ungated
    assert rows[2] is None  # NULL struct stays NULL

    # MOR mode too
    eng.sql(
        "ALTER TABLE default.nu SET TBLPROPERTIES "
        "('write.update.mode'='merge-on-read')"
    )
    eng.sql("UPDATE default.nu SET loc.lat = -1.0 WHERE id = 0")
    t.refresh()
    rows = {r["id"]: r["loc"] for r in t.read().collect()}
    assert rows[0]["lat"] == -1.0 and rows[0]["lon"] == 2.0

    # guards: unknown path, whole+nested clash
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no field"):
        t.update({"loc.nope": 1.0}, "id = 0")
    with _pytest.raises(ValueError, match="both wholly and by nested"):
        t.update({"loc": None, "loc.lat": 1.0}, "id = 0")
    with _pytest.raises(ValueError, match="not in table schema"):
        t.update({"nope.lat": 1.0}, "id = 0")


def test_merge_nested_assignment_refused(spark, cat):
    """MERGE's projection looks assignments up by column name — a dotted
    key would be silently ignored, so it's refused loudly."""
    t = cat.create_table(
        "default.mg", "id bigint, loc struct<lat:double,lon:double>"
    )
    t.insert(
        spark.sql("SELECT 1 AS id, named_struct('lat', 1.0d, 'lon', 2.0d) AS loc")
    )
    src = spark.sql("SELECT 1 AS id")
    with pytest.raises(ValueError, match="not assignable in MERGE"):
        t.merge(
            src, ["id"], assignments={"loc.lat": "9.9"}, insert_unmatched=False
        )


def test_review_fixes_nested_ddl(spark, cat):
    """Third-review regressions: SQL-path MERGE nested target errors
    loudly (the facade strips dotted SET targets); rename carries nested
    tombstones; fileless nested drop doesn't tombstone; UPDATE rejects
    prefix-conflicting nested assignments."""
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, cat.warehouse)
    eng.sql(
        "CREATE TABLE default.rf (id bigint, "
        "loc struct<lat:double,alt:double>, lat double) USING iceberg"
    )
    t = cat.load_table("default.rf")
    t.insert(
        spark.sql(
            "SELECT 1 AS id, named_struct('lat', 1.0d, 'alt', 5.0d) AS loc, "
            "7.0d AS lat"
        )
    )
    # SQL MERGE with a nested target must error, not silently write the
    # same-named TOP-LEVEL column (t.loc.lat strips to 'lat'!)
    with pytest.raises(ValueError, match="not in table schema|nested"):
        eng.sql(
            "MERGE INTO default.rf t USING (SELECT 1 AS id, 9.9 AS v) s "
            "ON t.id = s.id WHEN MATCHED THEN UPDATE SET t.loc.lat = s.v"
        )
    t.refresh()
    assert t.read().first()["lat"] == 7.0  # top-level column untouched

    # rename carries nested tombstones: loc.alt dropped, loc→loc2,
    # re-adding loc2.alt must stay refused
    t.drop_column("loc.alt")
    t.rename_column("loc", "loc2")
    with pytest.raises(ValueError, match="was dropped"):
        t.add_column("loc2.alt", "double")

    # fileless table: nested drop leaves no tombstone
    t2 = cat.create_table("default.rf2", "id bigint, s struct<a:int,b:int>")
    t2.drop_column("s.b")
    t2.add_column("s.b", "int")  # no files to leak from → allowed
    assert t2.schema()["s"].dataType.fieldNames() == ["a", "b"]

    # prefix-conflicting nested assignments are rejected
    t3 = cat.create_table(
        "default.rf3", "id bigint, s struct<m:struct<x:int>,y:int>"
    )
    t3.insert(spark.sql(
        "SELECT 1 AS id, named_struct('m', named_struct('x', 1), 'y', 2) AS s"
    ))
    with pytest.raises(ValueError, match="prefix of the other"):
        t3.update({"s.m": None, "s.m.x": 9}, "id = 1")
