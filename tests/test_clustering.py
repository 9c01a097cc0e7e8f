"""Z-order rewrite clustering: Morton-code correctness, multi-dimension
pruning improvement, and the SQL procedure surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.lake.clustering import (
    cluster_by_zorder,
    zorder_value,
)
from demo_iceberg_permanent_delete_spark.lake.pruning import candidate_files

DDL = "x bigint, y bigint, name string"


def test_zorder_value_is_morton_code(spark):
    df = spark.createDataFrame(
        [(x, y, "r") for x in range(4) for y in range(4)], DDL
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_value(df, ["x", "y"], bits=2)).collect()
    }
    # x bit b -> position 2b; y bit b -> position 2b+1
    def morton(x, y):
        return sum(((x >> b) & 1) << (2 * b) | ((y >> b) & 1) << (2 * b + 1)
                   for b in range(2))

    assert got == {(x, y): morton(x, y) for x in range(4) for y in range(4)}


def test_zorder_rejects_strings_and_unknown_columns(spark):
    df = spark.createDataFrame([(1, 2, "s")], DDL)
    with pytest.raises(ValueError, match="unsupported type"):
        zorder_value(df, ["name"])
    with pytest.raises(ValueError, match="unknown zorder column"):
        zorder_value(df, ["nope"])


def _grid_table(spark, tmp_path, n=64):
    """Shuffled (x, y) grid: every insert file spans both full ranges."""
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.grid", DDL)
    rows = [((i * 7919) % n, (i * 104729) % n, f"r{i}") for i in range(n * n)]
    t.insert(spark.createDataFrame(rows, DDL).repartition(8))
    return t


def test_zorder_rewrite_prunes_on_both_dimensions(spark, tmp_path):
    t = _grid_table(spark, tmp_path)
    before = t.metadata.current_snapshot().data_files()
    # pre-clustering: shuffled inserts leave every file spanning both ranges
    assert len(candidate_files(before, "x < 8")) == len(before)
    assert len(candidate_files(before, "y < 8")) == len(before)

    stats = t.rewrite_data_files(
        sort_order="zorder(x, y)", target_file_size_bytes=2 * 1024
    )
    assert stats["added_data_files_count"] >= 12
    entries = t.metadata.current_snapshot().data_files()
    x_hits = len(candidate_files(entries, "x < 8"))
    y_hits = len(candidate_files(entries, "y < 8"))
    # both dimensions must prune now — the point of interleaving
    assert x_hits < len(entries), (x_hits, len(entries))
    assert y_hits < len(entries), (y_hits, len(entries))
    # the corner box is one contiguous z-run → prunes to almost nothing
    corner = len(candidate_files(entries, "x < 8 AND y < 8"))
    assert corner <= max(2, len(entries) // 4), (corner, len(entries))
    # data survives byte-identically
    assert t.read().count() == 64 * 64
    assert t.scan("x < 8").count() == t.read().filter("x < 8").count()


def test_hierarchical_sort_rewrite_clusters_leading_column(spark, tmp_path):
    t = _grid_table(spark, tmp_path)
    t.rewrite_data_files(sort_order=["x", "y"], target_file_size_bytes=4 * 1024)
    entries = t.metadata.current_snapshot().data_files()
    assert len(candidate_files(entries, "x < 8")) < len(entries)
    assert t.read().count() == 64 * 64


def test_sql_call_with_zorder(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql(f"CREATE TABLE demo.default.g ({DDL}) USING iceberg")
    t = eng.catalog.load_table("default.g")
    rows = [((i * 7919) % 32, (i * 104729) % 32, f"r{i}") for i in range(4096)]
    t.insert(spark.createDataFrame(rows, DDL).repartition(4))
    out = eng.sql(
        "CALL demo.system.rewrite_data_files(table => 'default.g', "
        "strategy => 'sort', sort_order => 'zorder(x, y)', "
        "options => map('target-file-size-bytes', '2048'))"
    ).collect()[0]
    assert out["added_data_files_count"] >= 8
    # reload: the CALL committed through the engine's own table handle
    entries = (
        eng.catalog.load_table("default.g").metadata.current_snapshot().data_files()
    )
    assert len(candidate_files(entries, "x < 4 AND y < 4")) < len(entries)
