"""Predicate-scoped rewrite_data_files (Iceberg's ``where =>`` option):
only candidate files are rewritten, untouched files and delete files are
carried over, and the dangling tombstones a partial rewrite leaves behind
are consolidated away by rewrite_position_delete_files — Iceberg's
documented partial-compaction behavior."""

from __future__ import annotations

import pytest

from tests.conftest import one_part
from demo_iceberg_permanent_delete_spark.lake import Catalog

DDL = "k bigint, name string, v double"


@pytest.fixture()
def table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.scoped", DDL, properties={"write.delete.mode": "merge-on-read"}
    )
    for lo in (0, 100, 200):
        rows = [(lo + i, f"name-{lo + i}", float(i)) for i in range(100)]
        t.insert(one_part(spark, rows, DDL))
    return t


def test_scoped_rewrite_touches_only_candidates(spark, table):
    t = table
    t.delete("k = 5")  # tombstone into the k∈[0,100) file
    t.delete("k = 205")  # tombstone into the k∈[200,300) file
    before = {e.file_path for e in t.metadata.current_snapshot().data_files()}
    n_deletes = len(t.metadata.current_snapshot().delete_files())
    assert n_deletes >= 1

    stats = t.rewrite_data_files(where="k < 100")
    assert stats["rewritten_data_files_count"] == 1
    assert stats["removed_delete_files_count"] == 0  # carried, not dropped

    snap = t.metadata.current_snapshot()
    after = {e.file_path for e in snap.data_files()}
    # exactly one old file replaced; the other two survive untouched
    assert len(before & after) == 2
    assert len(after - before) == stats["added_data_files_count"]
    assert len(snap.delete_files()) == n_deletes

    # read correctness: k=5 now physically gone, k=205 still tombstone-masked
    keys = {r["k"] for r in t.read().collect()}
    assert 5 not in keys and 205 not in keys and len(keys) == 298

    # consolidation drops the now-dangling k=5 tombstone rows
    t.rewrite_position_delete_files()
    dels = t.metadata.current_snapshot().delete_files()
    rows = spark.read.parquet(*[e.file_path for e in dels]).collect()
    live_paths = {e.file_path for e in t.metadata.current_snapshot().data_files()}
    assert all(r["file_path"] in live_paths for r in rows)
    keys = {r["k"] for r in t.read().collect()}
    assert 5 not in keys and 205 not in keys and len(keys) == 298


def test_scoped_rewrite_no_candidates_is_noop(spark, table):
    v = table.metadata.version
    stats = table.rewrite_data_files(where="k = 99999")
    assert stats == {"rewritten_data_files_count": 0, "added_data_files_count": 0}
    assert table.metadata.version == v


def test_scoped_rewrite_via_call(spark, table):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, table.location.rsplit("/default/", 1)[0])
    before = {e.file_path for e in table.metadata.current_snapshot().data_files()}
    out = eng.sql(
        "CALL demo.system.rewrite_data_files(table => 'default.scoped', "
        "where => 'k >= 200')"
    ).collect()
    assert out[0]["rewritten_data_files_count"] == 1
    table.refresh()
    after = {e.file_path for e in table.metadata.current_snapshot().data_files()}
    assert len(before & after) == 2
