"""Manifest-level pruning bounds (metadata.scoped_manifest + Snapshot.
delta_bounds) — the manifest-list partition_summaries role: a scoped scan
skips whole delta manifest files, without opening them, when their
header-recorded bounds prove no added data file can match. Round-6
verdict item 3."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.lake.metadata import (
    ManifestDelta,
    ManifestEntry,
    summarize_delta,
)


@pytest.fixture
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("default")
    return c


def _entry(path, lo, hi, n=10, content=0, nulls=None):
    return ManifestEntry(
        file_path=path,
        content=content,
        record_count=n,
        file_size_in_bytes=1000,
        min_values={"v": lo},
        max_values={"v": hi},
        null_counts=nulls or {},
    )


def test_summarize_delta_folds_bounds_and_flags():
    d = ManifestDelta(
        added=[
            _entry("a", 0, 9, nulls={"v": 0}),
            _entry("b", 20, 29, nulls={"v": 2}),
        ]
    )
    s = summarize_delta(d)
    assert s["removes"] == 0 and s["data_only"] is True
    assert s["record_count"] == 20
    assert s["min_values"]["v"] == 0 and s["max_values"]["v"] == 29
    assert s["null_counts"]["v"] == 2
    # a delete file in the delta clears data_only (skipping would
    # resurrect deleted rows); a remove clears pure-append
    s2 = summarize_delta(
        ManifestDelta(added=[_entry("a", 0, 9), _entry("d", 0, 9, content=1)])
    )
    assert s2["data_only"] is False
    assert summarize_delta(ManifestDelta(removed=["x"]))["removes"] == 1
    # a column one entry lacks bounds for is omitted (unknown→unprunable)
    e3 = _entry("c", 1, 2)
    e3.min_values = {}
    e3.max_values = {}
    s3 = summarize_delta(ManifestDelta(added=[_entry("a", 0, 9), e3]))
    assert "v" not in s3["min_values"]


def _fresh(cat, name):
    """Reload the table from disk: empty delta/full caches, so
    delta_file_reads counts real file opens."""
    return cat.load_table(name)


def test_scoped_scan_opens_only_matching_deltas(registered_cat):
    cat, spark = registered_cat
    t = cat.create_table("default.mb1", "id bigint, v bigint")
    for c in range(3):  # disjoint v ranges per commit
        rows = [(c * 10 + i, c * 100 + i) for i in range(10)]
        t.insert(spark.createDataFrame(rows, "id long, v long"))
    t = _fresh(cat, "default.mb1")
    assert t.metadata.delta_file_reads == 0
    got = sorted(r["v"] for r in t.scan("v <= 5").collect())
    assert got == [0, 1, 2, 3, 4, 5]
    # three delta files exist; only the matching one was opened
    assert t.metadata.delta_file_reads == 1
    # a predicate spanning two commits opens exactly those two
    t2 = _fresh(cat, "default.mb1")
    got2 = sorted(r["v"] for r in t2.scan("v >= 105").collect())
    assert got2 == [105, 106, 107, 108, 109] + [200 + i for i in range(10)]
    assert t2.metadata.delta_file_reads == 2


def test_scoped_scan_never_skips_delete_bearing_deltas(registered_cat):
    cat, spark = registered_cat
    t = cat.create_table(
        "default.mb2",
        "id bigint, v bigint",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(spark.createDataFrame([(i, i) for i in range(10)], "id long, v long"))
    t.insert(
        spark.createDataFrame([(i, i) for i in range(10, 20)], "id long, v long")
    )
    t.delete("v >= 15")  # MOR: adds a position-delete file in its own delta
    t.insert(
        spark.createDataFrame([(i, i) for i in range(20, 30)], "id long, v long")
    )
    t = _fresh(cat, "default.mb2")
    # the delete applies even though its TARGET files' delta may be read
    # while others are skipped
    got = sorted(r["v"] for r in t.scan("v >= 10").collect())
    assert got == list(range(10, 15)) + list(range(20, 30))
    # scoping away from the deleted range stays correct too, and the
    # delete-bearing delta is still opened (data_only=False → never skip)
    t2 = _fresh(cat, "default.mb2")
    got2 = sorted(r["v"] for r in t2.scan("v <= 5").collect())
    assert got2 == [0, 1, 2, 3, 4, 5]


def test_bounds_survive_commit_reload_with_dates(registered_cat):
    cat, spark = registered_cat
    t = cat.create_table("default.mb3", "id bigint, d date")
    for c in range(3):
        rows = [
            (c * 10 + i, dt.date(2024, c + 1, i + 1)) for i in range(10)
        ]
        t.insert(spark.createDataFrame(rows, "id long, d date"))
    t = _fresh(cat, "default.mb3")
    for s in t.metadata.snapshots:
        b = s.delta_bounds
        assert b is not None and b["data_only"] and b["removes"] == 0
        assert "d" in b["min_values"]  # ISO strings after the roundtrip
    got = sorted(r["id"] for r in t.scan("d >= DATE '2024-03-01'").collect())
    assert got == list(range(20, 30))
    assert t.metadata.delta_file_reads == 1


def test_rewrite_manifests_populates_bounds_on_folded_base(registered_cat):
    from demo_iceberg_permanent_delete_spark.lake.maintenance import (
        rewrite_manifests,
    )

    cat, spark = registered_cat
    t = cat.create_table("default.mb4", "id bigint, v bigint")
    for c in range(3):
        rows = [(c * 10 + i, c * 100 + i) for i in range(10)]
        t.insert(spark.createDataFrame(rows, "id long, v long"))
    rewrite_manifests(t)
    t.insert(
        spark.createDataFrame([(90 + i, 900 + i) for i in range(10)], "id long, v long")
    )
    t = _fresh(cat, "default.mb4")
    base = [s for s in t.metadata.snapshots if s.base]
    assert base and all(s.delta_bounds is not None for s in base)
    # predicate inside the NEW append only: the folded base (bounds
    # 0..209, data-only, no removes) is skipped entirely
    got = sorted(r["v"] for r in t.scan("v >= 900").collect())
    assert got == [900 + i for i in range(10)]
    assert t.metadata.delta_file_reads == 1
    # predicate inside the folded range: base read, new append skipped
    t2 = _fresh(cat, "default.mb4")
    got2 = sorted(r["v"] for r in t2.scan("v BETWEEN 100 AND 105").collect())
    assert got2 == [100, 101, 102, 103, 104, 105]
    assert t2.metadata.delta_file_reads == 1


def test_scoped_equals_full_scan_differential(registered_cat):
    """Safety net: for a table mixing appends, COW deletes and updates,
    scan(pred) must equal read().filter(pred) for every predicate."""
    cat, spark = registered_cat
    t = cat.create_table("default.mb5", "id bigint, v bigint")
    t.insert(spark.createDataFrame([(i, i) for i in range(20)], "id long, v long"))
    t.insert(
        spark.createDataFrame([(i, i) for i in range(20, 40)], "id long, v long")
    )
    t.delete("v BETWEEN 5 AND 7")  # COW: remove + rewrite in one delta
    t.update({"v": F.col("v") + 1000}, "v >= 35")
    t.insert(
        spark.createDataFrame([(i, i) for i in range(40, 50)], "id long, v long")
    )
    for pred in (
        "v < 10",
        "v >= 1030",
        "v BETWEEN 20 AND 45",
        "v = 6",
        "v IS NOT NULL",
    ):
        t_fresh = _fresh(cat, "default.mb5")
        got = sorted(r["v"] for r in t_fresh.scan(pred).collect())
        want = sorted(r["v"] for r in t_fresh.read().filter(pred).collect())
        assert got == want, pred


def test_datasource_batch_read_uses_manifest_skip(registered_cat):
    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        register,
    )

    cat, spark = registered_cat
    register(spark)
    t = cat.create_table("default.mb6", "id bigint, v bigint")
    for c in range(3):
        rows = [(c * 10 + i, c * 100 + i) for i in range(10)]
        t.insert(spark.createDataFrame(rows, "id long, v long"))
    df = (
        spark.read.format("lakehouse")
        .option("location", t.metadata.location)
        .load()
        .filter("v >= 200")
    )
    assert sorted(r["v"] for r in df.collect()) == [200 + i for i in range(10)]


@pytest.fixture
def registered_cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("default")
    return c, spark


def test_summarize_delta_caps_columns_with_priority_first():
    wide = ManifestEntry(
        file_path="w",
        content=0,
        record_count=5,
        file_size_in_bytes=10,
        min_values={f"c{i:03d}": i for i in range(60)} | {"zz_part": 1},
        max_values={f"c{i:03d}": i for i in range(60)} | {"zz_part": 2},
    )
    s = summarize_delta(ManifestDelta(added=[wide]), priority_cols=["zz_part"])
    assert len(s["min_values"]) == 32  # root-document growth is bounded
    assert "zz_part" in s["min_values"]  # priority column never crowded out
    assert "c000" in s["min_values"] and "c059" not in s["min_values"]


def test_commit_summary_carries_record_counts(registered_cat):
    """added-records/removed-records in the snapshot header: the CDC
    stream's admission cost reads these instead of resolving the parent
    manifest per poll (round-6 review finding)."""
    from tests.conftest import one_part

    cat, spark = registered_cat
    t = cat.create_table("default.mb7", "id bigint, v bigint")
    t.insert(one_part(spark, [(i, i) for i in range(10)], "id long, v long"))
    t.delete("v < 3")  # COW: removes the one file, rewrites 7 survivors
    s = cat.load_table("default.mb7").metadata.current_snapshot().summary
    assert s["added-records"] == 7 and s["removed-records"] == 10


def test_bounds_cap_counts_only_successful_folds():
    """A delta mixing evolved/foreign files: columns that fail the fold
    (absent in some entry) must not consume cap slots (round-6 review
    finding — the first cut capped BEFORE folding, and 32 unfoldable
    names crowded out every summarizable column)."""
    rich = ManifestEntry(
        file_path="rich",
        content=0,
        record_count=5,
        file_size_in_bytes=10,
        min_values={f"a{i:03d}": i for i in range(40)} | {"zz": 1},
        max_values={f"a{i:03d}": i for i in range(40)} | {"zz": 2},
    )
    poor = ManifestEntry(
        file_path="poor",
        content=0,
        record_count=5,
        file_size_in_bytes=10,
        min_values={"zz": 5},
        max_values={"zz": 6},
    )
    s = summarize_delta(ManifestDelta(added=[rich, poor]))
    # the a* columns are absent in `poor` (shared-set rule drops them);
    # zz folds and must not be crowded out by 40 unfoldable names
    assert s["min_values"] == {"zz": 1} and s["max_values"] == {"zz": 6}
    # null-count priority order: partition column first even when it
    # sorts last
    nulls_rich = ManifestEntry(
        file_path="n1",
        content=0,
        record_count=5,
        file_size_in_bytes=10,
        min_values={f"a{i:03d}": i for i in range(40)} | {"zz": 1},
        max_values={f"a{i:03d}": i for i in range(40)} | {"zz": 2},
        null_counts={f"a{i:03d}": 0 for i in range(40)} | {"zz": 3},
    )
    s2 = summarize_delta(
        ManifestDelta(added=[nulls_rich]), priority_cols=["zz"]
    )
    assert "zz" in s2["null_counts"] and s2["null_counts"]["zz"] == 3
    # all-NULL partition column: null stats but NO min/max (footer
    # has_min_max false) — null priority must come from priority_cols
    # directly, not via the min/max shared set
    all_null = ManifestEntry(
        file_path="n2",
        content=0,
        record_count=5,
        file_size_in_bytes=10,
        min_values={f"a{i:03d}": i for i in range(40)},
        max_values={f"a{i:03d}": i for i in range(40)},
        null_counts={f"a{i:03d}": 0 for i in range(40)} | {"zz": 5},
    )
    s3 = summarize_delta(
        ManifestDelta(added=[all_null]), priority_cols=["zz"]
    )
    assert s3["null_counts"].get("zz") == 5


# ------------------------------------------------ property: skip soundness
def test_scoped_manifest_soundness_property():
    """Hypothesis: for random delta chains (appends with random/missing
    bounds, removes, delete files, base folds) and random predicates on
    one column, scoped_manifest must (a) keep every data file the
    per-file pruner would keep, (b) keep EVERY delete file, (c) never
    invent entries — pure metadata level, no Spark session."""
    import shutil
    import tempfile

    from hypothesis import given, settings, strategies as st

    from demo_iceberg_permanent_delete_spark.lake.metadata import (
        TableMetadata,
    )
    from demo_iceberg_permanent_delete_spark.lake.pruning import (
        candidate_files,
    )

    file_st = st.tuples(
        st.integers(-50, 50),  # lo
        st.integers(0, 30),  # extent (hi = lo + extent)
        st.sampled_from(["stats", "no_stats", "null_count"]),
    )
    op_st = st.one_of(
        st.tuples(st.just("append"), st.lists(file_st, min_size=1, max_size=4)),
        st.tuples(st.just("remove_some"), st.integers(0, 3)),
        st.tuples(st.just("add_delete_file"), st.none()),
        st.tuples(st.just("fold_base"), st.none()),
    )
    pred_st = st.one_of(
        st.tuples(st.sampled_from(["<", "<=", "=", ">", ">="]), st.integers(-60, 60)).map(
            lambda t: f"v {t[0]} {t[1]}"
        ),
        st.tuples(st.integers(-60, 60), st.integers(0, 40)).map(
            lambda t: f"v BETWEEN {t[0]} AND {t[0] + t[1]}"
        ),
        st.just("v IS NULL"),
        st.just("v IS NOT NULL"),
    )

    counter = iter(range(10**9))

    @settings(max_examples=40, deadline=None)
    @given(ops=st.lists(op_st, min_size=1, max_size=6), pred=pred_st)
    def run(ops, pred):
        loc = tempfile.mkdtemp(prefix="mbprop-")
        try:
            meta = TableMetadata(
                name="default.prop",
                location=loc,
                schema_ddl="id bigint, v bigint",
                properties={},
            )
            current: list[ManifestEntry] = []
            for kind, arg in ops:
                if kind == "append":
                    added = []
                    for lo, ext, mode in arg:
                        n = next(counter)
                        e = ManifestEntry(
                            file_path=f"{loc}/data/f{n}.parquet",
                            content=0,
                            record_count=10,
                            file_size_in_bytes=100,
                            min_values={} if mode == "no_stats" else {"v": lo},
                            max_values={} if mode == "no_stats" else {"v": lo + ext},
                            null_counts={"v": 10 if mode == "null_count" else 0}
                            if mode != "no_stats"
                            else {},
                        )
                        added.append(e)
                    current = current + added
                    meta.add_snapshot("append", list(current))
                elif kind == "remove_some":
                    if not current:
                        continue
                    survivors = current[arg:]
                    if len(survivors) == len(current):
                        continue
                    current = survivors
                    meta.add_snapshot("delete", list(current))
                elif kind == "add_delete_file":
                    n = next(counter)
                    d = ManifestEntry(
                        file_path=f"{loc}/data/del{n}.parquet",
                        content=1,
                        record_count=3,
                        file_size_in_bytes=50,
                    )
                    current = current + [d]
                    meta.add_snapshot("delete", list(current))
                elif kind == "fold_base":
                    if meta.current_snapshot_id is None:
                        continue
                    meta.materialize_base(meta.current_snapshot_id)
            if meta.current_snapshot_id is None:
                return
            meta.commit()

            fresh = TableMetadata.load(loc)
            snap = fresh.current_snapshot()
            full = snap.manifest
            fresh2 = TableMetadata.load(loc)  # empty caches for the scoped walk
            scoped = fresh2.scoped_manifest(
                fresh2.current_snapshot(), pred
            )
            full_paths = {e.file_path for e in full}
            scoped_paths = {e.file_path for e in scoped}
            matching = {
                e.file_path
                for e in candidate_files(
                    [e for e in full if e.content == 0], pred
                )
            }
            deletes = {e.file_path for e in full if e.content != 0}
            assert matching <= scoped_paths, (pred, matching - scoped_paths)
            assert deletes <= scoped_paths, (pred, deletes - scoped_paths)
            assert scoped_paths <= full_paths, (pred, scoped_paths - full_paths)
        finally:
            shutil.rmtree(loc, ignore_errors=True)

    run()


def test_scan_paths_tolerate_unknown_partition_spec(registered_cat):
    """Pruning-only consumers parse the partition spec leniently: a table
    carrying a transform this reader doesn't know (newer/foreign writer)
    stays READABLE — scan (string and Column predicates) and
    read_with_positions just don't prune on it — while the write path
    stays strict (clustering on an unknown transform would be wrong)."""
    cat, spark = registered_cat
    t = cat.create_table("default.mb8", "id bigint, v bigint")
    t.insert(spark.createDataFrame([(i, i) for i in range(10)], "id long, v long"))
    t.metadata.partition_by.append("mystery_transform(v, 7)")
    t.metadata.commit()
    t2 = cat.load_table("default.mb8")
    assert sorted(r["v"] for r in t2.scan("v <= 5").collect()) == list(range(6))
    assert t2.scan(F.col("v") <= 5).count() == 6
    assert t2.read_with_positions().count() == 10
    with pytest.raises(ValueError, match="unsupported partition transform"):
        t2.insert(spark.createDataFrame([(99, 99)], "id long, v long"))
