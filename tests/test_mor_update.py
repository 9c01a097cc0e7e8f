"""Merge-on-read UPDATE (lake/table.py _update_mor): position-delete the
matched rows + append their updated versions; pre-update values persist
physically until rewrite — the reference's PII-persistence point applied
to UPDATE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.lake.maintenance import rewrite_data_files


@pytest.fixture
def table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.mu",
        "id bigint, email string, name string",
        properties={"write.update.mode": "merge-on-read"},
    )
    t.insert(
        spark.createDataFrame(
            [(i, f"u{i}@x.com", f"name{i}") for i in range(10)],
            "id long, email string, name string",
        )
    )
    return t


def test_mor_update_read_and_physical_persistence(spark, table):
    t = table
    files_before = {e.file_path for e in t.metadata.current_snapshot().data_files()}
    snap = t.update({"email": None, "name": F.lit("REDACTED")}, "id >= 7")
    assert snap is not None and snap.operation == "overwrite"

    # logical read shows the update; untouched rows intact
    rows = {r["id"]: (r["email"], r["name"]) for r in t.read().collect()}
    for i in range(7):
        assert rows[i] == (f"u{i}@x.com", f"name{i}")
    for i in range(7, 10):
        assert rows[i] == (None, "REDACTED")

    # MOR: original data files were NOT rewritten — old values persist
    files_after = {e.file_path for e in t.metadata.current_snapshot().data_files()}
    assert files_before <= files_after  # originals still referenced
    cur = t.metadata.current_snapshot()
    assert any(e.content == 1 for e in cur.manifest)  # position deletes added
    audited = {r["id"] for r in t.deleted_rows().collect()}
    assert audited == {7, 8, 9}  # pre-update rows physically present

    # rewrite makes it physical: delete files gone, audit empty
    rewrite_data_files(t, rewrite_all=True)
    assert not [e for e in t.metadata.current_snapshot().manifest if e.content == 1]
    assert t.deleted_rows().count() == 0
    rows2 = {r["id"]: r["email"] for r in t.read().collect()}
    assert rows2[9] is None and rows2[0] == "u0@x.com"


def test_mor_update_no_match_no_commit(spark, table):
    before = table.metadata.current_snapshot_id
    assert table.update({"email": None}, "id > 1000") is None
    assert table.metadata.current_snapshot_id == before


def test_mor_update_assignments_see_pre_update_row(spark, table):
    # swap email/name — both RHS must resolve against the original row
    table.update(
        {"email": F.col("name"), "name": F.col("email")}, "id = 3"
    )
    r = {x["id"]: x for x in table.read().collect()}[3]
    assert (r["email"], r["name"]) == ("name3", "u3@x.com")


def test_mor_update_time_travel_sees_old_values(spark, table):
    pre = table.metadata.current_snapshot_id
    table.update({"email": None}, "id = 1")
    old = {r["id"]: r["email"] for r in table.read(snapshot_id=pre).collect()}
    assert old[1] == "u1@x.com"
