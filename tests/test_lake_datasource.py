"""Python DataSource for the lake format (sources/lake_datasource.py X29):
batch read (MOR deletes, schema evolution, snapshot-id travel, pruning),
streaming incremental read, and the distributed Arrow writer."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.sources.lake_datasource import register


@pytest.fixture(scope="module")
def registered(spark):
    register(spark)
    return spark


@pytest.fixture
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "wh"))
    c.create_namespace("default")
    return c


def _read(spark, t):
    return (
        spark.read.format("lakehouse")
        .option("location", t.metadata.location)
        .load()
    )


def test_batch_read_matches_table_read(registered, cat):
    spark = registered
    t = cat.create_table("default.ds1", "id bigint, v string")
    t.insert(spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id long, v string"))
    got = {(r["id"], r["v"]) for r in _read(spark, t).collect()}
    assert got == {(i, f"v{i}") for i in range(10)}


def test_batch_read_applies_position_deletes(registered, cat):
    spark = registered
    t = cat.create_table(
        "default.ds2",
        "id bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id long, v string"))
    t.delete("id >= 7")
    assert {r["id"] for r in _read(spark, t).collect()} == set(range(7))


def test_batch_read_applies_equality_deletes_with_seq_rule(registered, cat):
    spark = registered
    t = cat.create_table("default.ds3", "id bigint, v string")
    t.insert(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.equality_delete(spark.createDataFrame([(2,)], "id long"), ["id"])
    # re-insert after the delete: sequence rule must keep the new row
    t.insert(spark.createDataFrame([(2, "b2")], "id long, v string"))
    got = {(r["id"], r["v"]) for r in _read(spark, t).collect()}
    assert got == {(1, "a"), (2, "b2")}


def test_batch_read_snapshot_travel_and_schema_evolution(registered, cat):
    spark = registered
    t = cat.create_table("default.ds4", "id bigint, v string")
    s1 = t.insert(spark.createDataFrame([(1, "a")], "id long, v string"))
    t.add_column("extra", "bigint")
    t.insert(spark.createDataFrame([(2, "b", 20)], "id long, v string, extra long"))

    cur = _read(spark, t)
    assert set(cur.columns) == {"id", "v", "extra"}
    rows = {r["id"]: r["extra"] for r in cur.collect()}
    assert rows == {1: None, 2: 20}  # old file null-fills the added column

    old = (
        spark.read.format("lakehouse")
        .option("location", t.metadata.location)
        .option("snapshot-id", str(s1.snapshot_id))
        .load()
    )
    assert {r["id"] for r in old.collect()} == {1}


def test_batch_pushdown_prunes_files(registered, cat):
    spark = registered
    t = cat.create_table("default.ds5", "id bigint, v string")
    t.insert(spark.createDataFrame([(i, "lo") for i in range(100)], "id long, v string"))
    t.insert(
        spark.createDataFrame([(i, "hi") for i in range(1000, 1100)], "id long, v string")
    )
    df = _read(spark, t).filter(F.col("id") >= 1000)
    assert {r["v"] for r in df.collect()} == {"hi"}
    # the pruning path is exercised via the same predicate translation the
    # reader uses; correctness (sound skipping) is what matters here


def test_writer_append_and_overwrite(registered, cat):
    spark = registered
    t = cat.create_table("default.ds6", "id bigint, v string")
    src = spark.createDataFrame([(i, f"v{i}") for i in range(50)], "id long, v string")
    (
        src.repartition(4)
        .write.format("lakehouse")
        .option("location", t.metadata.location)
        .mode("append")
        .save()
    )
    t2 = cat.load_table("default.ds6")
    assert t2.read().count() == 50
    snap = t2.metadata.current_snapshot()
    assert snap.operation == "append"
    assert len(snap.data_files()) >= 1

    # stats harvested: manifest prunes like a table-API write
    spark.createDataFrame([(999, "x")], "id long, v string").write.format(
        "lakehouse"
    ).option("location", t.metadata.location).mode("append").save()
    t3 = cat.load_table("default.ds6")
    assert t3.read().count() == 51

    src.limit(5).write.format("lakehouse").option(
        "location", t.metadata.location
    ).mode("overwrite").save()
    t4 = cat.load_table("default.ds6")
    assert t4.read().count() == 5
    assert t4.metadata.current_snapshot().operation == "overwrite"
    # history preserved: time travel to the pre-overwrite snapshot works
    assert t4.read(snapshot_id=t3.metadata.current_snapshot_id).count() == 51


def test_writer_roundtrip_via_datasource_read(registered, cat):
    spark = registered
    t = cat.create_table("default.ds7", "id bigint, ts timestamp")
    import datetime as dt

    rows = [(i, dt.datetime(2024, 6, 1, 12, 0, i)) for i in range(7)]
    spark.createDataFrame(rows, "id long, ts timestamp").write.format(
        "lakehouse"
    ).option("location", t.metadata.location).mode("append").save()
    got = {(r["id"], r["ts"]) for r in _read(spark, t).collect()}
    assert got == set(rows)


def test_stream_read_incremental(registered, cat, tmp_path):
    spark = registered
    t = cat.create_table("default.ds8", "id bigint, v string")
    t.insert(spark.createDataFrame([(0, "pre")], "id long, v string"))  # pre-stream

    out_dir = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_batch():
        stream = (
            spark.readStream.format("lakehouse")
            .option("location", t.metadata.location)
            .option("starting-offset", "earliest")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch()
    first = {(r["id"], r["v"]) for r in spark.read.parquet(out_dir).collect()}
    assert first == {(0, "pre")}

    t.insert(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.insert(spark.createDataFrame([(3, "c")], "id long, v string"))
    run_batch()
    second = {(r["id"], r["v"]) for r in spark.read.parquet(out_dir).collect()}
    assert second == {(0, "pre"), (1, "a"), (2, "b"), (3, "c")}

    # no new commits → a third run adds nothing (exactly-once per file)
    run_batch()
    third = spark.read.parquet(out_dir).count()
    assert third == 4


# ------------------------------------------------------------ CDC stream
def _cdc_stream_rows(spark, t, out_dir, ckpt, starting="earliest"):
    stream = (
        spark.readStream.format("lakehouse")
        .option("location", t.metadata.location)
        .option("mode", "cdc")
        .option("starting-offset", starting)
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.slow
def test_cdc_stream_matches_batch_changes(registered, cat, tmp_path):
    """Differential check against the hash-checked batch changelog: after
    a mixed DML sequence (append, MOR delete w/ DV, MOR row-tombstone
    delete, COW delete, equality delete, compaction), one availableNow
    CDC pass must emit exactly LakeTable.changes() — same rows, same
    change types, same per-commit ordinals."""
    spark = registered
    from tests.conftest import one_part

    t = cat.create_table(
        "default.cdc1",
        "id bigint, grp string, v bigint",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(
        one_part(
            spark,
            [(i, f"g{i % 4}", i * 10) for i in range(40)],
            "id bigint, grp string, v bigint",
        )
    )
    t.delete("id < 5")  # MOR + deletion vectors (default layout)
    t.set_properties({"write.delete.vector.enabled": "false"})
    t.delete("id >= 35")  # MOR row-tombstone layout
    t.insert(
        one_part(
            spark,
            [(100 + i, "new", i) for i in range(6)],
            "id bigint, grp string, v bigint",
        )
    )
    t.equality_delete(spark.createDataFrame([("g2",)], "grp string"))
    t.set_properties({"write.delete.mode": "copy-on-write"})
    t.delete("v = 20")  # COW: removes+rewrites files
    t.rewrite_data_files()  # replace snapshot: must emit NOTHING

    got = _cdc_stream_rows(
        spark, t, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    want = t.changes(None, None)
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got.select(*want.columns)) == _canon(want)


@pytest.mark.slow
def test_cdc_stream_incremental_batches(registered, cat, tmp_path):
    """Offsets resume across runs: each availableNow pass emits exactly
    the NEW commits' changes (per-range ordinals, like changes() over
    that range)."""
    spark = registered
    from tests.conftest import one_part

    t = cat.create_table(
        "default.cdc2",
        "id bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(one_part(spark, [(i, f"v{i}") for i in range(10)], "id bigint, v string"))
    s0 = t.metadata.current_snapshot_id
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    first = _cdc_stream_rows(spark, t, out, ck)
    assert _canon(first.select(*t.changes(None, None).columns)) == _canon(
        t.changes(None, None)
    )

    t.delete("id < 3")
    t.insert(one_part(spark, [(50, "x")], "id bigint, v string"))
    _cdc_stream_rows(spark, t, out, ck)
    all_rows = spark.read.parquet(out)
    # second pass contributed exactly changes(s0, current)
    second = t.changes(s0, None)
    assert all_rows.count() == t.changes(None, s0).count() + second.count()
    got_second = all_rows.join(
        all_rows.filter(F.col("_commit_snapshot_id") == s0),
        ["_commit_snapshot_id"],
        "left_anti",
    )
    assert _canon(got_second.select(*second.columns)) == _canon(second)


@pytest.mark.slow
def test_cdc_and_batch_handle_null_equality_keys(registered, cat, tmp_path):
    """eqNullSafe parity: an equality delete whose key is NULL must mask
    NULL-key rows in the datasource batch read AND emit them as CDC
    DELETEs — Arrow joins never match nulls, so the key machinery adds
    (filled, is_null) companions."""
    spark = registered
    from tests.conftest import one_part

    t = cat.create_table(
        "default.nulleq",
        "id bigint, grp string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(
        one_part(
            spark,
            [(1, "a"), (2, None), (3, "b"), (4, None)],
            "id bigint, grp string",
        )
    )
    t.equality_delete(spark.createDataFrame([(None,)], "grp string"))
    # table read, datasource batch read, and batch changelog all agree
    want = {(1, "a"), (3, "b")}
    assert {(r["id"], r["grp"]) for r in t.read().collect()} == want
    assert {(r["id"], r["grp"]) for r in _read(spark, t).collect()} == want
    got = _cdc_stream_rows(
        spark, t, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    changes = t.changes(None, None)
    assert _canon(got.select(*changes.columns)) == _canon(changes)
    deleted = {
        (r["id"], r["grp"])
        for r in got.filter(F.col("_change_type") == "DELETE").collect()
    }
    assert deleted == {(2, None), (4, None)}


def test_cdc_eq_delete_after_column_rename(registered, cat, tmp_path):
    """Files written before RENAME COLUMN resolve equality keys through
    their physical name — the raw-table select used to KeyError."""
    spark = registered
    from tests.conftest import one_part

    t = cat.create_table(
        "default.renameeq",
        "id bigint, grp string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(
        one_part(spark, [(1, "a"), (2, "b"), (3, "a")], "id bigint, grp string")
    )
    t.rename_column("grp", "segment")
    t.equality_delete(spark.createDataFrame([("a",)], "segment string"))
    want = {(2, "b")}
    assert {(r["id"], r["segment"]) for r in t.read().collect()} == want
    assert {(r["id"], r["segment"]) for r in _read(spark, t).collect()} == want
    got = _cdc_stream_rows(
        spark, t, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    changes = t.changes(None, None)
    assert _canon(got.select(*changes.columns)) == _canon(changes)


def test_batch_read_rejects_cdc_mode(registered, cat):
    spark = registered
    t = cat.create_table("default.nocdc", "id bigint")
    t.insert(spark.range(3).selectExpr("id"))
    with pytest.raises(Exception, match="STREAMING option"):
        (
            spark.read.format("lakehouse")
            .option("location", t.metadata.location)
            .option("mode", "cdc")
            .load()
            .collect()
        )


def test_stream_starting_timestamp(registered, cat, tmp_path):
    """starting-timestamp (epoch ms) includes every commit at/after the
    timestamp — Iceberg's stream-from-timestamp option."""
    spark = registered
    from tests.conftest import one_part

    t = cat.create_table("default.ts0", "id bigint, v string")
    t.insert(one_part(spark, [(1, "old")], "id bigint, v string"))
    cutoff = t.metadata.current_snapshot().committed_at_ms + 1
    t.insert(one_part(spark, [(2, "new")], "id bigint, v string"))
    t.insert(one_part(spark, [(3, "newer")], "id bigint, v string"))

    stream = (
        spark.readStream.format("lakehouse")
        .option("location", t.metadata.location)
        .option("starting-timestamp", str(cutoff))
        .load()
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["id"], r["v"]) for r in spark.read.parquet(out).collect()}
    assert got == {(2, "new"), (3, "newer")}


@pytest.mark.slow
def test_source_works_from_foreign_cwd(tmp_path):
    """Harness portability: the DataSource's worker processes do not
    inherit the driver's sys.path, and this Spark build's driver-side
    python_streaming_source_runner receives no pyFiles — register() ships
    the package by addPyFile (data workers) and serializes this module by
    value with a sys.path self-heal (runner). A driver running from a
    foreign cwd with only sys.path pointing at the repo must stream CDC
    rows successfully."""
    import subprocess
    import sys as _sys

    script = """
import sys, tempfile
sys.path.insert(0, "/root/repo")
from demo_iceberg_permanent_delete_spark.session import get_spark
from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.sources.lake_datasource import register
spark = get_spark(app_name="foreign-cwd", master="local[4]")
spark.sparkContext.setLogLevel("ERROR")
register(spark)
cat = Catalog(spark, tempfile.mkdtemp())
cat.create_namespace("default")
t = cat.create_table("default.x", "id bigint")
t.insert(spark.range(5).selectExpr("id"))
out = tempfile.mkdtemp()
q = (spark.readStream.format("lakehouse")
    .option("location", t.metadata.location)
    .option("mode", "cdc").option("starting-offset", "earliest").load()
    .writeStream.format("parquet").option("path", out + "/o")
    .option("checkpointLocation", out + "/c")
    .trigger(availableNow=True).start())
q.awaitTermination(90)
n_stream = spark.read.parquet(out + "/o").count()
n_batch = (spark.read.format("lakehouse")
    .option("location", t.metadata.location).load().count())
print("RESULT", n_stream, n_batch)
"""
    r = subprocess.run(
        [_sys.executable, "-c", script],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=240,
        env={k: v for k, v in __import__("os").environ.items()},
    )
    assert "RESULT 5 5" in r.stdout, r.stdout[-2000:] + r.stderr[-2000:]


def test_eq_delete_on_column_added_after_first_files(registered, cat):
    """A non-string equality key on a column ADDED after the first files:
    pre-ADD files contribute all-null keys of a different physical shape
    — the canonical-string key join must neither crash (string/int64
    join-type mismatch) nor diverge from the table read."""
    spark = registered
    from tests.conftest import one_part

    t = cat.create_table(
        "default.addedeq",
        "id bigint",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(one_part(spark, [(1,), (2,)], "id bigint"))  # predates 'extra'
    t.add_column("extra", "bigint")
    t.insert(one_part(spark, [(3, 30), (4, None)], "id bigint, extra bigint"))
    # delete extra=30 AND the NULLs (pre-ADD rows read as NULL extra)
    t.equality_delete(spark.createDataFrame([(30,), (None,)], "extra bigint"))
    want = {(r["id"], r["extra"]) for r in t.read().collect()}
    got = {(r["id"], r["extra"]) for r in _read(spark, t).collect()}
    assert got == want == set()  # every row matched a key


def test_eq_delete_null_date_key(registered, cat):
    """Date-typed NULL equality key: no integer- or string-zero exists
    for date32, the old fill path silently skipped null matching."""
    spark = registered
    import datetime as dt

    from tests.conftest import one_part

    t = cat.create_table(
        "default.dateeq",
        "id bigint, d date",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(
        one_part(
            spark,
            [(1, dt.date(2024, 6, 1)), (2, None), (3, dt.date(2024, 6, 2))],
            "id bigint, d date",
        )
    )
    t.equality_delete(spark.createDataFrame([(None,)], "d date"))
    want = {(1, dt.date(2024, 6, 1)), (3, dt.date(2024, 6, 2))}
    assert {(r["id"], r["d"]) for r in t.read().collect()} == want
    assert {(r["id"], r["d"]) for r in _read(spark, t).collect()} == want


def test_binary_equality_delete_key_batch_and_cdc(registered, cat, tmp_path):
    """Round-5 brief item 5: equality deletes keyed on a BINARY column
    round-trip through the datasource batch read and the CDC stream.
    Binary keys canonicalize to large_binary on both join sides (exact
    byte equality, matching the batch changes() Spark join), including
    non-UTF8 bytes, NULL keys (eqNullSafe), and the sequence rule (a
    same-key row appended AFTER the delete survives)."""
    spark = registered
    from tests.conftest import one_part

    t = cat.create_table(
        "default.bineq",
        "id bigint, tok binary",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(
        one_part(
            spark,
            [
                (1, bytearray(b"\x00\xff\xfe")),  # non-UTF8
                (2, bytearray(b"keep")),
                (3, None),
                (4, bytearray(b"")),  # empty bytes, distinct from NULL
            ],
            "id bigint, tok binary",
        )
    )
    t.equality_delete(
        spark.createDataFrame(
            [(bytearray(b"\x00\xff\xfe"),), (None,)], "tok binary"
        )
    )
    # sequence rule: appended after the delete → must survive
    t.insert(
        one_part(spark, [(5, bytearray(b"\x00\xff\xfe"))], "id bigint, tok binary")
    )

    want = {(2, b"keep"), (4, b""), (5, b"\x00\xff\xfe")}
    assert {
        (r["id"], bytes(r["tok"]) if r["tok"] is not None else None)
        for r in t.read().collect()
    } == want
    assert {
        (r["id"], bytes(r["tok"]) if r["tok"] is not None else None)
        for r in _read(spark, t).collect()
    } == want

    got = _cdc_stream_rows(
        spark, t, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    changes = t.changes(None, None)
    assert _canon(got.select(*changes.columns)) == _canon(changes)
    deleted = {
        (r["id"], bytes(r["tok"]) if r["tok"] is not None else None)
        for r in got.filter(F.col("_change_type") == "DELETE").collect()
    }
    assert deleted == {(1, b"\x00\xff\xfe"), (3, None)}


def test_oversized_file_splits_into_row_group_partitions(registered, cat, tmp_path):
    """Round-5 brief item 6 (mechanics, small scale via split-size):
    a registered file above the split threshold reads as multiple input
    partitions along row-group boundaries, MOR position deletes still
    land on the right rows (file-global positions vs per-split offsets),
    and the result is identical to the unsplit read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = registered
    t = cat.create_table(
        "default.bigfile",
        "id bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    src = tmp_path / "foreign"
    src.mkdir()
    # 1000 rows in 10 row groups — a miniature add_files-migrated file
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(1000), pa.int64()),
                "v": pa.array([f"v{i}" for i in range(1000)]),
            }
        ),
        str(src / "foreign.parquet"),
        row_group_size=100,
    )
    t.add_files(str(src))
    # MOR delete rows spread across row groups (positions are file-global)
    t.delete("id % 97 = 0")
    want = {(i, f"v{i}") for i in range(1000) if i % 97 != 0}
    assert {(r["id"], r["v"]) for r in t.read().collect()} == want

    df = (
        spark.read.format("lakehouse")
        .option("location", t.metadata.location)
        .option("split-size", "2048")
        .load()
    )
    assert df.rdd.getNumPartitions() >= 2, df.rdd.getNumPartitions()
    assert {(r["id"], r["v"]) for r in df.collect()} == want
    # default threshold: same small file stays one partition
    assert _read(spark, t).rdd.getNumPartitions() == 1


@pytest.mark.slow
def test_256mib_file_splits_by_default(registered, cat, tmp_path):
    """Round-5 brief item 6 (the literal done-criterion): a >256 MiB
    registered parquet file reads as ≥2 input partitions with the
    DEFAULT split threshold, rows intact."""
    import os as _os

    spark = registered
    src = str(tmp_path / "huge")
    n = 1_000_000
    spark.range(n).selectExpr(
        "id", "repeat(uuid(), 8) AS pad"
    ).coalesce(1).write.mode("overwrite").option(
        "compression", "none"
    ).parquet(src)
    files = [
        f for f in _os.listdir(src) if f.endswith(".parquet")
    ]
    size = sum(_os.path.getsize(_os.path.join(src, f)) for f in files)
    assert size > 256 * 1024 * 1024, f"precondition: file only {size}B"

    t = cat.create_table("default.huge", "id bigint, pad string")
    t.add_files(src)
    df = _read(spark, t)
    assert df.rdd.getNumPartitions() >= 2, df.rdd.getNumPartitions()
    assert df.count() == n


def test_binary_eq_key_on_column_added_after_first_files_cdc(registered, cat, tmp_path):
    """Review finding (round 5): the CDC 'eq' semi-join must derive the
    binary-key set like the batch anti-join does — a data file that
    predates a BINARY key column contributes a null-typed column, and
    without the delete-side type hint the string canonicalization joins
    string vs large_binary and crashes."""
    spark = registered
    from tests.conftest import one_part

    t = cat.create_table(
        "default.bineqadd",
        "id bigint",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(one_part(spark, [(1,), (2,)], "id bigint"))  # predates 'tok'
    t.add_column("tok", "binary")
    t.insert(
        one_part(
            spark,
            [(3, bytearray(b"\x00\xff")), (4, None)],
            "id bigint, tok binary",
        )
    )
    t.equality_delete(
        spark.createDataFrame(
            [(bytearray(b"\x00\xff"),), (None,)], "tok binary"
        )
    )
    # every row matched a key: 3 by bytes, 1/2/4 by eqNullSafe NULL
    want = {(r["id"],) for r in t.read().select("id").collect()}
    got = {(r["id"],) for r in _read(spark, t).select("id").collect()}
    assert got == want == set()

    cdc = _cdc_stream_rows(
        spark, t, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    changes = t.changes(None, None)
    assert _canon(cdc.select(*changes.columns)) == _canon(changes)
    deleted = {
        r["id"]
        for r in cdc.filter(F.col("_change_type") == "DELETE").collect()
    }
    assert deleted == {1, 2, 3, 4}


def test_stream_read_splits_oversized_file(registered, cat, tmp_path):
    """The streaming batch reader applies the same row-group split policy
    as the batch reader: an oversized add_files-migrated file streams as
    multiple tasks, rows exactly-once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = registered
    t = cat.create_table("default.dssplit", "id bigint, v string")
    src = tmp_path / "foreign"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(600), pa.int64()),
                "v": pa.array([f"v{i}" for i in range(600)]),
            }
        ),
        str(src / "big.parquet"),
        row_group_size=60,
    )
    t.add_files(str(src))

    out_dir, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("lakehouse")
        .option("location", t.metadata.location)
        .option("starting-offset", "earliest")
        .option("split-size", "2048")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sink = spark.read.parquet(out_dir)
    assert sink.count() == 600  # exactly-once: no overlap between splits
    got = {(r["id"], r["v"]) for r in sink.collect()}
    assert got == {(i, f"v{i}") for i in range(600)}


def test_cdc_stream_with_split_files_matches_batch_changes(registered, cat, tmp_path):
    """CDC partitions split oversized files like the batch reader (and
    the masked kind reads only the row groups containing tombstones);
    the split stream must stay identical to the batch changes()."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = registered
    t = cat.create_table(
        "default.cdcsplit",
        "id bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    src = tmp_path / "foreign"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "id": pa.array(range(500), pa.int64()),
                "v": pa.array([f"v{i}" for i in range(500)]),
            }
        ),
        str(src / "big.parquet"),
        row_group_size=50,
    )
    t.add_files(str(src))                     # insert kind over split file
    t.delete("id % 83 = 1")                   # masked kind (MOR tombstones)
    t.equality_delete(
        spark.createDataFrame([("v7",), ("v450",)], "v string")
    )                                         # eq kind over split file

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    stream = (
        spark.readStream.format("lakehouse")
        .option("location", t.metadata.location)
        .option("mode", "cdc")
        .option("starting-offset", "earliest")
        .option("split-size", "2048")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    changes = t.changes(None, None)
    assert _canon(got.select(*changes.columns)) == _canon(changes)


def test_append_stream_skips_replace_snapshots(registered, cat, tmp_path):
    """Review finding (round 5, fourth pass): a replace snapshot
    (compaction/rewrite) rewrites EXISTING rows into new files — the
    append stream must not re-emit them as fresh appends (Iceberg's
    incremental scan skips replace commits the same way)."""
    spark = registered
    t = cat.create_table("default.dsreplace", "id bigint")
    t.insert(spark.range(5).selectExpr("id"))
    t.insert(spark.range(5, 10).selectExpr("id"))

    out_dir, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run_batch():
        stream = (
            spark.readStream.format("lakehouse")
            .option("location", t.metadata.location)
            .option("starting-offset", "earliest")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch()
    assert spark.read.parquet(out_dir).count() == 10

    t.rewrite_data_files()  # replace snapshot: same rows, new files
    t.insert(spark.range(10, 12).selectExpr("id"))
    run_batch()
    sink = spark.read.parquet(out_dir)
    assert sink.count() == 12, "replace snapshot must not re-emit rows"
    assert {r["id"] for r in sink.collect()} == set(range(12))


def test_append_stream_rejects_cow_delete_unless_skipped(registered, cat, tmp_path):
    """Review finding (round 5, fifth pass): a COW delete commit's added
    files hold rewritten SURVIVOR rows — emitting them would
    near-duplicate the sink. The append stream raises (Iceberg's
    streaming source behavior) unless streaming-skip-delete-snapshots is
    set, in which case the snapshot is skipped without duplication. A
    MOR delete (delete files only) passes through silently."""
    spark = registered
    t = cat.create_table(
        "default.dscow",
        "id bigint",
        properties={"write.delete.mode": "copy-on-write"},
    )
    # ONE file so the delete partially matches it and rewrites survivors
    # (a wholly-matched file is dropped without rewrite — nothing to emit)
    t.insert(spark.range(10).coalesce(1).selectExpr("id"))

    out_dir, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run_batch(**opts):
        reader = (
            spark.readStream.format("lakehouse")
            .option("location", t.metadata.location)
            .option("starting-offset", "earliest")
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (
            reader.load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_batch()
    assert spark.read.parquet(out_dir).count() == 10

    t.delete("id < 3")  # COW: rewrites survivors into new files
    t.insert(spark.range(10, 12).selectExpr("id"))

    with pytest.raises(Exception, match="delete.*snapshot|snapshot.*delete"):
        run_batch()

    run_batch(**{"streaming-skip-delete-snapshots": "true"})
    sink = spark.read.parquet(out_dir)
    # 10 initial + the 2 fresh appends; rewritten survivors NOT re-emitted
    assert sink.count() == 12, sink.count()


def test_append_stream_passes_mor_delete_silently(registered, cat, tmp_path):
    """A MOR delete adds only delete files — the append stream has
    nothing to emit and must not raise."""
    spark = registered
    t = cat.create_table(
        "default.dsmor",
        "id bigint",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(spark.range(10).selectExpr("id"))
    t.delete("id < 3")
    t.insert(spark.range(10, 12).selectExpr("id"))
    out_dir, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("lakehouse")
        .option("location", t.metadata.location)
        .option("starting-offset", "earliest")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append semantics: raw added rows, deletes ignored (Iceberg default)
    assert spark.read.parquet(out_dir).count() == 12


# ----------------------------------------------- streaming admission control
def _mk_reader(t, **extra):
    from pyspark.sql.types import StructType

    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        LakeStreamReader,
    )

    opts = {"location": t.metadata.location, "starting-offset": "earliest"}
    opts.update(extra)
    return LakeStreamReader(StructType.fromDDL("id bigint, v string"), opts)


def _drain(reader, start=None, max_batches=50):
    """Drive the reader the way MicroBatchExecution does: latestOffset →
    partitions → read → commit, until the offset stops advancing. Returns
    [(end_offset, real_partition_count, ids)] per micro-batch."""
    off = start if start is not None else reader.initialOffset()
    batches = []
    for _ in range(max_batches):
        end = reader.latestOffset()
        if end == off:
            break
        parts = [
            p for p in reader.partitions(off, end) if p.file_path is not None
        ]
        ids = []
        for p in parts:
            for rb in reader.read(p):
                ids.extend(rb.column("id").to_pylist())
        reader.commit(end)
        batches.append((end, len(parts), ids))
        off = end
    else:
        raise AssertionError("stream did not drain within max_batches")
    return batches


def _seed_nine_files(spark, cat, name):
    """3 commits x 3 single-split files x 3 rows = 9 units, 27 rows."""
    t = cat.create_table(name, "id bigint, v string")
    for c in range(3):
        rows = [(c * 9 + i, f"v{c * 9 + i}") for i in range(9)]
        t.insert(
            spark.createDataFrame(rows, "id long, v string").repartition(3)
        )
    return t


def test_stream_admission_max_files(registered, cat):
    """streaming-max-files-per-micro-batch bounds every planned batch at
    the cap, offsets stop mid-snapshot, and the union is exactly-once."""
    spark = registered
    t = _seed_nine_files(spark, cat, "default.adm1")
    reader = _mk_reader(t, **{"streaming-max-files-per-micro-batch": "2"})
    batches = _drain(reader)
    assert [n for _, n, _ in batches] == [2, 2, 2, 2, 1]
    assert any("pos" in end for end, _, _ in batches)  # mid-snapshot stops
    assert "pos" not in batches[-1][0]  # final offset is the bare form
    all_ids = [i for _, _, ids in batches for i in ids]
    assert sorted(all_ids) == list(range(27))  # exactly-once
    # fully drained: one more poll plans nothing
    assert reader.latestOffset() == batches[-1][0]


def test_stream_admission_max_rows(registered, cat):
    """streaming-max-rows-per-micro-batch: batches stop before exceeding
    the row cap, but a single over-cap unit is still admitted (progress
    guarantee), so the stream always drains."""
    spark = registered
    t = _seed_nine_files(spark, cat, "default.adm2")
    # 3-row files, cap 4: one file per batch (two files = 6 > 4)
    batches = _drain(
        _mk_reader(t, **{"streaming-max-rows-per-micro-batch": "4"})
    )
    assert [n for _, n, _ in batches] == [1] * 9
    assert all(len(ids) <= 4 for _, _, ids in batches)
    assert sorted(i for _, _, ids in batches for i in ids) == list(range(27))
    # cap below any single unit: still one unit per batch, never stuck
    t2 = _seed_nine_files(spark, cat, "default.adm3")
    batches2 = _drain(
        _mk_reader(t2, **{"streaming-max-rows-per-micro-batch": "1"})
    )
    assert [n for _, n, _ in batches2] == [1] * 9


def test_stream_admission_resume_mid_commit(registered, cat):
    """Crash replay: a fresh reader asked to re-plan a logged mid-snapshot
    offset range emits exactly that range, and its admission tracker
    resumes bounded from the replayed end."""
    spark = registered
    t = _seed_nine_files(spark, cat, "default.adm4")
    opts = {"streaming-max-files-per-micro-batch": "2"}
    reader_a = _mk_reader(t, **opts)
    off0 = reader_a.initialOffset()
    end1 = reader_a.latestOffset()
    assert end1.get("pos") == 2  # stopped inside the first commit
    ids1 = []
    for p in reader_a.partitions(off0, end1):
        if p.file_path is not None:
            for rb in reader_a.read(p):
                ids1.extend(rb.column("id").to_pylist())
    # crash before commit: the engine replays [off0, end1] on a NEW reader
    # (no initialOffset call on restart) before asking for new offsets
    reader_b = _mk_reader(t, **opts)
    ids1_replay = []
    parts = [
        p for p in reader_b.partitions(off0, end1) if p.file_path is not None
    ]
    for p in parts:
        for rb in reader_b.read(p):
            ids1_replay.extend(rb.column("id").to_pylist())
    assert sorted(ids1_replay) == sorted(ids1) and len(parts) == 2
    reader_b.commit(end1)
    # the tracker was seeded by partitions(): the next batch is bounded
    rest = _drain(reader_b, start=end1)
    assert [n for _, n, _ in rest] == [2, 2, 2, 1]
    assert sorted(ids1 + [i for _, _, ids in rest for i in ids]) == list(
        range(27)
    )


def test_stream_admission_restart_after_commit_is_unbounded_once(
    registered, cat
):
    """Restart whose last batch committed, NO starting pin: the Python API
    never reveals the checkpointed start, so the first latestOffset must
    return the head (bounding it could regress behind the checkpoint);
    subsequent batches are bounded again. Documented blind spot, pinned
    here. (With an explicit starting pin the first poll is bounded from
    the pin instead — test_pinned_capped_stream_bounds_batch_zero.)"""
    from pyspark.sql.types import StructType

    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        LakeStreamReader,
    )

    spark = registered
    t = _seed_nine_files(spark, cat, "default.adm5")
    reader = LakeStreamReader(
        StructType.fromDDL("id bigint, v string"),
        {
            "location": t.metadata.location,
            "streaming-max-files-per-micro-batch": "2",
        },
    )
    head = t.metadata.current_snapshot_id
    assert reader.latestOffset() == {"snapshot_id": head}


def test_cdc_stream_admission_is_snapshot_atomic(registered, cat):
    """CDC admission stops only at commit boundaries: with a 1-file cap
    and 2-file commits, each batch is one WHOLE commit (a commit's change
    set is one atomic changelog unit) and offsets never carry pos."""
    from pyspark.sql.types import StructType

    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        LakeCdcStreamReader,
    )

    spark = registered
    t = cat.create_table("default.adm6", "id bigint, v string")
    for c in range(3):
        rows = [(c * 4 + i, f"v{c * 4 + i}") for i in range(4)]
        t.insert(
            spark.createDataFrame(rows, "id long, v string").repartition(2)
        )
    schema = StructType.fromDDL(
        "id bigint, v string, _change_type string, _change_ordinal int,"
        " _commit_snapshot_id bigint"
    )
    reader = LakeCdcStreamReader(
        schema,
        {
            "location": t.metadata.location,
            "starting-offset": "earliest",
            "mode": "cdc",
            "streaming-max-files-per-micro-batch": "1",
        },
    )
    off = reader.initialOffset()
    seen, commits_per_batch = [], []
    for _ in range(10):
        end = reader.latestOffset()
        if end == off:
            break
        assert "pos" not in end
        parts = [
            p for p in reader.partitions(off, end) if p.file_path is not None
        ]
        commit_ids = set()
        for p in parts:
            commit_ids.add(p.commit_id)
            for rb in reader.read(p):
                seen.extend(rb.column("id").to_pylist())
        commits_per_batch.append(len(commit_ids))
        reader.commit(end)
        off = end
    assert commits_per_batch == [1, 1, 1]
    assert sorted(seen) == list(range(12))


@pytest.mark.slow
def test_stream_admission_end_to_end(registered, cat, tmp_path):
    """Real engine run: a continuous-trigger stream under a row cap drains
    commits that land while it runs in >=2 bounded micro-batches,
    exactly-once. (The FIRST batch of a fresh query is unbounded by design
    — MicroBatchExecution calls latestOffset before the reader can learn
    its start; see the LakeStreamReader docstring — so the capped backlog
    here arrives after the stream starts, the steady state the caps
    protect.)"""
    import time

    spark = registered
    t = cat.create_table("default.adm7", "id bigint, v string")
    t.insert(spark.createDataFrame([(99, "pre")], "id long, v string"))
    batch_counts = []

    def sink(df, _bid):
        n = df.count()
        if n:
            batch_counts.append(n)

    q = (
        spark.readStream.format("lakehouse")
        .option("location", t.metadata.location)
        .option("starting-offset", "earliest")
        .option("streaming-max-rows-per-micro-batch", "7")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while sum(batch_counts) < 1 and time.time() < deadline:
            time.sleep(0.2)  # batch 0 (the 1-row pre-commit) done
        for c in range(3):  # 27-row backlog lands while the stream runs
            rows = [(c * 9 + i, f"v{c * 9 + i}") for i in range(9)]
            t.insert(
                spark.createDataFrame(rows, "id long, v string").repartition(3)
            )
        while sum(batch_counts) < 28 and time.time() < deadline:
            time.sleep(0.2)
    finally:
        q.stop()
    assert sum(batch_counts) == 28  # exactly-once
    assert len(batch_counts) >= 3
    # 3-row units under a 7-row cap: at most 2 files per batch after the
    # 1-row batch 0
    assert all(n <= 7 for n in batch_counts)


def test_stream_admission_pos_is_split_size_independent(
    registered, cat, tmp_path
):
    """A checkpointed mid-snapshot offset counts whole FILES, so replaying
    a logged range under a DIFFERENT split-size emits exactly the same
    rows (round-6 review finding: a split-indexed pos would silently
    mis-replay after a restart that changed the option)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark = registered
    t = cat.create_table("default.adm8", "id bigint, v string")
    src = tmp_path / "foreign"
    src.mkdir()
    for f in range(3):  # 3 oversized files, 200 rows / 4 row groups each
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(range(f * 200, f * 200 + 200), pa.int64()),
                    "v": pa.array([f"v{i}" for i in range(200)]),
                }
            ),
            str(src / f"big{f}.parquet"),
            row_group_size=50,
        )
    t.add_files(str(src))

    def rows_of(reader, parts):
        out = []
        for p in parts:
            if p.file_path is not None:
                for rb in reader.read(p):
                    out.extend(rb.column("id").to_pylist())
        return sorted(out)

    opts = {
        "streaming-max-files-per-micro-batch": "2",
        "split-size": "2048",  # forces multiple row-group splits per file
    }
    reader_a = _mk_reader(t, **opts)
    off0 = reader_a.initialOffset()
    end1 = reader_a.latestOffset()
    assert end1.get("pos") == 2  # two whole FILES, not two splits
    parts_a = reader_a.partitions(off0, end1)
    assert len(parts_a) > 2  # oversized files fanned out within the batch
    ids_a = rows_of(reader_a, parts_a)
    assert ids_a == list(range(400))
    # crash; restart WITHOUT the split-size option (default 128 MiB —
    # each file is one split now): the replayed range must be identical
    reader_b = _mk_reader(
        t, **{"streaming-max-files-per-micro-batch": "2"}
    )
    parts_b = reader_b.partitions(off0, end1)
    assert rows_of(reader_b, parts_b) == ids_a
    reader_b.commit(end1)
    rest = _drain(reader_b, start=end1)
    assert sorted(
        ids_a + [i for _, _, ids in rest for i in ids]
    ) == list(range(600))


def test_batch_reader_unpickled_copy_plans_pinned_version(registered, cat):
    """A reader copy that lost its planner cache to __getstate__ must
    reload the version it was CONSTRUCTED against, not the head — a
    later commit would otherwise leak into a query that never selected
    it, with renames out of sync (round-6 review finding)."""
    import pickle

    from pyspark.sql.types import StructType

    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        LakeBatchReader,
    )

    spark = registered
    t = cat.create_table("default.pin1", "id bigint, v string")
    t.insert(spark.createDataFrame([(1, "a")], "id long, v string"))
    reader = LakeBatchReader(
        StructType.fromDDL("id bigint, v string"),
        {"location": t.metadata.location},
    )
    assert reader.__getstate__()["_meta"] is None  # cache never ships
    clone = pickle.loads(pickle.dumps(reader))
    t.insert(spark.createDataFrame([(2, "b")], "id long, v string"))  # after pin
    parts = [p for p in clone.partitions() if p.file_path is not None]
    ids = []
    for p in parts:
        for rb in clone.read(p):
            ids.extend(rb.column("id").to_pylist())
    assert ids == [1]  # the pinned pre-commit snapshot, not the head


def test_stream_admission_composes_with_skip_and_replace(registered, cat):
    """Admission control over a history mixing appends, a skipped COW
    delete and a compaction replace: pass-through snapshots cost no
    budget, advance the offset, and the capped stream still emits each
    appended row exactly once."""
    from tests.conftest import one_part

    spark = registered
    t = cat.create_table("default.adm9", "id bigint, v string")
    t.insert(one_part(spark, [(i, "a") for i in range(4)], "id long, v string"))
    t.insert(one_part(spark, [(i, "b") for i in range(4, 8)], "id long, v string"))
    t.delete("id = 0")  # COW: rewrites batch-1 survivors in a delete snapshot
    t.insert(one_part(spark, [(8, "c")], "id long, v string"))
    t.rewrite_data_files()  # replace snapshot: must pass through silently
    t.insert(one_part(spark, [(9, "d")], "id long, v string"))

    reader = _mk_reader(
        t,
        **{
            "streaming-max-files-per-micro-batch": "1",
            "streaming-skip-delete-snapshots": "true",
        },
    )
    batches = _drain(reader)
    # one appended FILE per batch; skipped/replace snapshots ride along
    assert all(n <= 1 for _, n, _ in batches)
    ids = sorted(i for _, _, ids in batches for i in ids)
    # append semantics with the COW delete skipped: raw appended rows
    # only, each exactly once (the rewritten survivors never re-emit)
    assert ids == list(range(10))
    # final offset rests at the head, bare form
    assert batches[-1][0] == {
        "snapshot_id": t.metadata.current_snapshot_id
    }


def test_cdc_admission_capped_batches_match_batch_changes(registered, cat):
    """Capped CDC: driving the reader with a 1-file cap yields one COMMIT
    per micro-batch whose rows equal changes(parent, commit) exactly —
    ordinals restart per batch, same as per-range availableNow runs."""
    from pyspark.sql.types import StructType

    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        LakeCdcStreamReader,
    )
    from tests.conftest import one_part

    spark = registered
    t = cat.create_table(
        "default.adm10",
        "id bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(one_part(spark, [(i, "a") for i in range(6)], "id long, v string"))
    t.delete("id < 2")  # MOR: masked-rows CDC kind
    t.insert(one_part(spark, [(9, "b")], "id long, v string"))
    snaps = [s.snapshot_id for s in t.metadata.snapshots]

    schema = StructType.fromDDL(
        "id bigint, v string, _change_type string, _change_ordinal int,"
        " _commit_snapshot_id bigint"
    )
    reader = LakeCdcStreamReader(
        schema,
        {
            "location": t.metadata.location,
            "starting-offset": "earliest",
            "mode": "cdc",
            "streaming-max-files-per-micro-batch": "1",
        },
    )
    off = reader.initialOffset()
    prev = None
    batch_no = 0
    for _ in range(10):
        end = reader.latestOffset()
        if end == off:
            break
        rows = []
        for p in reader.partitions(off, end):
            if p.file_path is not None:
                for rb in reader.read(p):
                    for i in range(rb.num_rows):
                        rows.append(
                            tuple(
                                rb.column(c)[i].as_py()
                                for c in (
                                    "id",
                                    "v",
                                    "_change_type",
                                    "_change_ordinal",
                                    "_commit_snapshot_id",
                                )
                            )
                        )
        want = sorted(
            tuple(r) for r in t.changes(prev, end["snapshot_id"]).collect()
        )
        assert sorted(rows) == want, f"batch {batch_no}"
        reader.commit(end)
        prev, off = end["snapshot_id"], end
        batch_no += 1
    assert batch_no == 3 and prev == snaps[-1]


def test_stream_admission_returns_full_batch_before_cow_error(
    registered, cat
):
    """An unskipped COW delete sitting just past a full batch boundary
    must not withhold the completed batch: the capped poll returns the
    admitted files; only the NEXT poll — which must actually consume the
    COW snapshot — raises (the same point the uncapped stream errors
    at)."""
    from tests.conftest import one_part

    spark = registered
    t = cat.create_table("default.adm11", "id bigint, v string")
    rows = [(i, f"v{i}") for i in range(9)]
    t.insert(spark.createDataFrame(rows, "id long, v string").repartition(3))
    t.delete("id = 0")  # COW delete right after a 3-file append

    reader = _mk_reader(t, **{"streaming-max-files-per-micro-batch": "3"})
    off0 = reader.initialOffset()
    end1 = reader.latestOffset()  # exactly fills the cap with the append
    parts = [p for p in reader.partitions(off0, end1) if p.file_path]
    assert len(parts) == 3
    reader.commit(end1)
    with pytest.raises(ValueError, match="delete"):
        reader.latestOffset()  # now the COW snapshot must be consumed


# --------------------------------- starting pins bound a capped batch 0
# (round-7 verdict item 4: stream-from-timestamp / start-snapshot-id)
def test_pinned_capped_stream_bounds_batch_zero(registered, cat):
    """Fresh-query protocol (latestOffset BEFORE initialOffset): with an
    explicit starting pin + caps, the UNSEEDED first latestOffset is
    admission-capped from the pin instead of returning the head
    unbounded — and the drained union stays exactly-once."""
    spark = registered
    t = _seed_nine_files(spark, cat, "default.pin1")
    reader = _mk_reader(t, **{"streaming-max-files-per-micro-batch": "2"})
    end0 = reader.latestOffset()  # NO initialOffset first — unseeded
    assert end0.get("pos") == 2  # capped inside commit 1, not the head
    off0 = reader.initialOffset()
    parts = [p for p in reader.partitions(off0, end0) if p.file_path]
    assert len(parts) == 2
    ids = []
    for p in parts:
        for rb in reader.read(p):
            ids.extend(rb.column("id").to_pylist())
    reader.commit(end0)
    batches = _drain(reader, start=end0)
    all_ids = ids + [i for _, _, b in batches for i in b]
    assert sorted(all_ids) == list(range(27))
    assert all(n <= 2 for _, n, _ in batches)


def test_start_snapshot_id_pin_streams_only_after_pin(registered, cat):
    """starting-offset=<snapshot-id>: a fresh capped query streams only
    the commits AFTER the pinned snapshot, bounded from batch 0."""
    spark = registered
    t = _seed_nine_files(spark, cat, "default.pin2")
    first_commit = t.metadata.snapshots[0].snapshot_id
    reader = _mk_reader(
        t,
        **{
            "starting-offset": str(first_commit),
            "streaming-max-files-per-micro-batch": "2",
        },
    )
    end0 = reader.latestOffset()  # unseeded, pinned → capped from the pin
    assert end0 != {"snapshot_id": t.metadata.current_snapshot_id}
    parts = [
        p
        for p in reader.partitions({"snapshot_id": first_commit}, end0)
        if p.file_path
    ]
    assert len(parts) == 2
    reader.commit(end0)
    batches = _drain(reader, start=end0)
    ids = []
    for p in parts:
        for rb in reader.read(p):
            ids.extend(rb.column("id").to_pylist())
    ids += [i for _, _, b in batches for i in b]
    assert sorted(ids) == list(range(9, 27))  # commits 2+3 only


def test_starting_timestamp_pin_bounds_batch_zero(registered, cat):
    spark = registered
    t = _seed_nine_files(spark, cat, "default.pin3")
    snaps = t.metadata.snapshots
    ts_between = snaps[1].committed_at_ms  # commits 2+3 are >= this
    reader = _mk_reader(
        t,
        **{
            "starting-timestamp": str(ts_between),
            "streaming-max-files-per-micro-batch": "100",
        },
    )
    end0 = reader.latestOffset()  # unseeded, capped (loosely) from the pin
    start0 = reader.initialOffset()
    assert start0 == {"snapshot_id": snaps[0].snapshot_id}
    ids = []
    for p in reader.partitions(start0, end0):
        if p.file_path:
            for rb in reader.read(p):
                ids.extend(rb.column("id").to_pylist())
    assert sorted(ids) == list(range(9, 27))


def test_restart_with_stale_pin_fails_loudly_not_duplicates(registered, cat):
    """Restart-after-commit with a kept pin the checkpoint has passed:
    the engine hands partitions() the checkpointed start and the reader's
    stale pin-seeded end — planning that regressed range would silently
    re-emit, so it must raise naming the pin instead."""
    spark = registered
    t = _seed_nine_files(spark, cat, "default.pin4")
    checkpointed = {"snapshot_id": t.metadata.snapshots[1].snapshot_id}
    # fresh process after restart: new reader, unseeded tracker, pin kept
    reader = _mk_reader(t, **{"streaming-max-files-per-micro-batch": "2"})
    stale_end = reader.latestOffset()  # pin-seeded guess: inside commit 1
    with pytest.raises(ValueError, match="starting-offset"):
        reader.partitions(checkpointed, stale_end)


def test_restart_replay_ignores_pin(registered, cat):
    """Crash replay (partitions() called with the LOGGED range before any
    latestOffset) seeds the tracker from the truth: the pin plays no part
    and subsequent polls continue capped from the replayed end."""
    spark = registered
    t = _seed_nine_files(spark, cat, "default.pin5")
    logged_start = {"snapshot_id": t.metadata.snapshots[0].snapshot_id}
    logged_end = {"snapshot_id": t.metadata.snapshots[1].snapshot_id}
    reader = _mk_reader(t, **{"streaming-max-files-per-micro-batch": "2"})
    parts = [p for p in reader.partitions(logged_start, logged_end) if p.file_path]
    assert len(parts) == 3  # the logged range, exactly — not the pin's
    reader.commit(logged_end)
    end = reader.latestOffset()  # resumes capped from the replayed end
    assert end["snapshot_id"] == t.metadata.snapshots[2].snapshot_id
    assert end.get("pos") == 2


def test_invalid_pins_fail_loudly(registered, cat):
    spark = registered
    t = _seed_nine_files(spark, cat, "default.pin6")
    from demo_iceberg_permanent_delete_spark.lake.errors import (
        SnapshotNotFoundError,
    )

    with pytest.raises(SnapshotNotFoundError):
        _mk_reader(t, **{"starting-offset": "123456789"})
    with pytest.raises(ValueError, match="future"):
        _mk_reader(t, **{"starting-timestamp": str(2**50)})
    # the unknown-pin error must explain the restart-after-expiry case
    # (a restarted query re-constructs the reader with its original
    # options, so an EXPIRED pin fails at construction — review finding)
    with pytest.raises(SnapshotNotFoundError, match="checkpoint wins"):
        _mk_reader(t, **{"starting-offset": "123456789"})


def test_unpinned_regressed_range_fails_loudly_as_recreate(registered, cat):
    """Round-8 review catch: an UNPINNED stream whose range regresses
    (drop-and-recreate under the checkpoint) must fail naming the real
    cause — a silent empty batch would reset the committed offset and
    later re-emit the whole recreated table as fresh appends."""
    from pyspark.sql.types import StructType

    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        LakeStreamReader,
    )

    spark = registered
    t = _seed_nine_files(spark, cat, "default.pin8")
    reader = LakeStreamReader(
        StructType.fromDDL("id bigint, v string"),
        {"location": t.metadata.location},
    )
    head = {"snapshot_id": t.metadata.current_snapshot_id}
    with pytest.raises(ValueError, match="recreated or rolled back"):
        reader.partitions(head, {"snapshot_id": -1})
    first = {"snapshot_id": t.metadata.snapshots[0].snapshot_id}
    with pytest.raises(ValueError, match="recreated or rolled back"):
        reader.partitions(head, first)


def test_cdc_regressed_range_fails_loudly_too(registered, cat):
    """The CDC reader shares the regressed-range detection: both the
    pinned (stale pin) and unpinned (recreated table) messages."""
    from pyspark.sql.types import StructType

    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        LakeCdcStreamReader,
    )

    spark = registered
    t = _seed_nine_files(spark, cat, "default.pin9")
    schema = StructType.fromDDL(
        "id bigint, v string, _change_type string, _change_ordinal int,"
        " _commit_snapshot_id bigint"
    )
    head = {"snapshot_id": t.metadata.current_snapshot_id}
    first = {"snapshot_id": t.metadata.snapshots[0].snapshot_id}
    unpinned = LakeCdcStreamReader(
        schema, {"location": t.metadata.location, "mode": "cdc"}
    )
    with pytest.raises(ValueError, match="recreated or rolled back"):
        unpinned.partitions(head, first)
    pinned = LakeCdcStreamReader(
        schema,
        {
            "location": t.metadata.location,
            "mode": "cdc",
            "starting-offset": "earliest",
        },
    )
    with pytest.raises(ValueError, match="starting-offset"):
        pinned.partitions(head, first)


# ----------------------------------------------------- CDC row lineage
def _cdc_lineage_rows(spark, t, out_dir, ckpt):
    stream = (
        spark.readStream.format("lakehouse")
        .option("location", t.metadata.location)
        .option("mode", "cdc")
        .option("lineage", "true")
        .option("starting-offset", "earliest")
        .load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


@pytest.mark.slow
def test_cdc_stream_lineage_matches_batch_changes(registered, cat, tmp_path):
    """X54 boundary closed (round-8 verdict item 3): streaming CDC with
    lineage=true must equal the batch changes(lineage=True) — same rows,
    same _row_id / _last_updated_sequence_number — across the existing
    mixed-DML matrix (append, MOR delete w/ DV, MOR row-tombstone delete,
    MOR update, equality delete, COW delete, compaction)."""
    spark = registered
    from tests.conftest import one_part

    t = cat.create_table(
        "default.cdclin",
        "id bigint, grp string, v bigint",
        properties={
            "write.delete.mode": "merge-on-read",
            "write.update.mode": "merge-on-read",
        },
    )
    t.insert(
        one_part(
            spark,
            [(i, f"g{i % 4}", i * 10) for i in range(40)],
            "id bigint, grp string, v bigint",
        )
    )
    t.delete("id < 5")  # MOR + deletion vectors (default layout)
    t.set_properties({"write.delete.vector.enabled": "false"})
    t.delete("id >= 35")  # MOR row-tombstone layout
    upd_snap = t.update({"v": F.col("v") + 1}, "id = 10")  # MOR update
    t.insert(
        one_part(
            spark,
            [(100 + i, "new", i) for i in range(6)],
            "id bigint, grp string, v bigint",
        )
    )
    t.equality_delete(spark.createDataFrame([("g2",)], "grp string"))
    t.set_properties({"write.delete.mode": "copy-on-write"})
    t.delete("v = 20")  # COW: removes+rewrites files
    t.rewrite_data_files()  # replace snapshot: must emit NOTHING

    got = _cdc_lineage_rows(
        spark, t, str(tmp_path / "out"), str(tmp_path / "ck")
    )
    want = t.changes(None, None, lineage=True)
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got.select(*want.columns)) == _canon(want)
    # lineage is resolved, not null-filled: every row of an engine-written
    # table carries an id, and the MOR update's DELETE/INSERT rows pair
    # 1:1 on _row_id
    assert got.filter(F.col("_row_id").isNull()).count() == 0
    upd = got.filter(
        (F.col("id") == 10)
        & (F.col("_commit_snapshot_id") == upd_snap.snapshot_id)
    )
    pre = upd.filter(F.col("_change_type") == "DELETE").select("_row_id", "v")
    post = upd.filter(F.col("_change_type") == "INSERT").select("_row_id", "v")
    pairs = pre.alias("d").join(post.alias("i"), on="_row_id")
    assert pairs.count() == pre.count() == post.count() >= 1
    row = pairs.select(
        F.col("d.v").alias("old"), F.col("i.v").alias("new")
    ).collect()
    assert all(r["new"] == r["old"] + 1 for r in row)


@pytest.mark.slow
def test_cdc_lineage_incremental_and_default_schema_guard(
    registered, cat, tmp_path
):
    """Offsets resume with lineage on (each pass ≡ changes(range,
    lineage=True)); a user .schema() without the lineage pair fails
    loudly; a table claiming the reserved names is rejected."""
    spark = registered
    from tests.conftest import one_part

    t = cat.create_table(
        "default.cdclin2",
        "id bigint, v string",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.insert(one_part(spark, [(i, f"v{i}") for i in range(8)], "id bigint, v string"))
    s0 = t.metadata.current_snapshot_id
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    first = _cdc_lineage_rows(spark, t, out, ck)
    want0 = t.changes(None, None, lineage=True)
    assert _canon(first.select(*want0.columns)) == _canon(want0)

    t.delete("id < 3")
    t.insert(one_part(spark, [(50, "x")], "id bigint, v string"))
    _cdc_lineage_rows(spark, t, out, ck)
    all_rows = spark.read.parquet(out)
    second = t.changes(s0, None, lineage=True)
    assert all_rows.count() == want0.count() + second.count()
    got_second = all_rows.filter(F.col("_commit_snapshot_id") != s0)
    assert _canon(got_second.select(*second.columns)) == _canon(second)

    # reserved-name guard (schema derivation refuses, same as the table)
    bad = cat.create_table("default.ridclaim", "id bigint, _row_id bigint")
    with pytest.raises(Exception, match="reserved row-lineage"):
        (
            spark.readStream.format("lakehouse")
            .option("location", bad.metadata.location)
            .option("mode", "cdc")
            .option("lineage", "true")
            .load()
        )


def test_batch_reader_time_travel_options(registered, cat):
    """Iceberg's read options on the batch DataSource: as-of-timestamp,
    branch, tag (snapshot-id already covered) — mutually exclusive, each
    equal to the corresponding table-API read."""
    spark = registered
    from tests.conftest import one_part

    t = cat.create_table("default.tt_opts", "id bigint, v string")
    t.insert(one_part(spark, [(1, "a")], "id bigint, v string"))
    s1 = t.metadata.current_snapshot()
    t.create_tag("v1")
    t.create_branch("dev")
    t.insert(one_part(spark, [(2, "b")], "id bigint, v string"))

    def rd(**opts):
        r = spark.read.format("lakehouse").option("location", t.metadata.location)
        for k, v in opts.items():
            r = r.option(k.replace("_", "-"), v)
        return {x["id"] for x in r.load().collect()}

    assert rd() == {1, 2}
    assert rd(snapshot_id=s1.snapshot_id) == {1}
    assert rd(as_of_timestamp=s1.committed_at_ms) == {1}
    assert rd(tag="v1") == {1}
    assert rd(branch="dev") == {1}
    with pytest.raises(Exception, match="at most one"):
        rd(tag="v1", branch="dev")
    with pytest.raises(Exception, match="unknown tag"):
        rd(tag="dev")  # exists, but it's a branch
    with pytest.raises(Exception, match="at or before"):
        rd(as_of_timestamp=s1.committed_at_ms - 10**9)


def test_datasource_branch_write_and_publish(registered, cat):
    """df.write.format('lakehouse').option('branch', …): the commit
    parents on the branch head and advances only the ref (Iceberg's
    branch write option) — main is untouched until fast_forward
    publishes; unknown branches and overwrite+branch are rejected."""
    spark = registered
    from tests.conftest import one_part

    t = cat.create_table("default.bw", "id bigint, v string")
    t.insert(one_part(spark, [(1, "a")], "id bigint, v string"))
    t.create_branch("audit")

    def w(df, **opts):
        wr = df.write.format("lakehouse").option("location", t.metadata.location)
        for k, v in opts.items():
            wr = wr.option(k, v)
        return wr

    w(one_part(spark, [(2, "staged")], "id bigint, v string"),
      branch="audit").mode("append").save()
    t.refresh()
    assert t.read().count() == 1  # main untouched
    assert t.read(ref="audit").count() == 2
    # lineage stays sound on the branch write
    ids = [r["_row_id"] for r in t.read(ref="audit", lineage=True).collect()]
    assert len(ids) == len(set(ids))

    t.fast_forward("main", t.resolve_ref("audit"))  # the publish step
    assert t.read().count() == 2

    with pytest.raises(Exception, match="unknown branch"):
        w(one_part(spark, [(3, "x")], "id bigint, v string"),
          branch="nope").mode("append").save()
    with pytest.raises(Exception, match="cannot target a branch"):
        w(one_part(spark, [(3, "x")], "id bigint, v string"),
          branch="audit").mode("overwrite").save()


def test_stream_writer_sink_exactly_once(registered, cat, tmp_path):
    """writeStream.format('lakehouse'): one append snapshot per
    micro-batch; rerunning the same checkpoint with no new data commits
    nothing (the run:batch marker rides each commit); branch option
    stages the stream for WAP publish."""
    from tests.conftest import one_part

    spark = registered
    # file-source input: two files → two micro-batches (maxFilesPerTrigger=1)
    src = str(tmp_path / "src")
    one_part(spark, [(1, "a"), (2, "b")], "id bigint, v string").write.parquet(
        os.path.join(src, "f0")
    )
    one_part(spark, [(3, "c")], "id bigint, v string").write.parquet(
        os.path.join(src, "f1")
    )
    t = cat.create_table("default.sw", "id bigint, v string")
    ckpt = str(tmp_path / "ck")

    def run_stream():
        q = (
            spark.readStream.schema("id bigint, v string")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .writeStream.format("lakehouse")
            .option("location", t.metadata.location)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()

    run_stream()
    t2 = cat.load_table("default.sw")
    assert {(r["id"], r["v"]) for r in t2.read().collect()} == {
        (1, "a"),
        (2, "b"),
        (3, "c"),
    }
    appends = [s for s in t2.metadata.snapshots if s.operation == "append"]
    assert len(appends) == 2, "one commit per micro-batch"
    assert all(
        s.summary.get("writer") == "datasource-stream" for s in appends
    )
    n_snaps = len(t2.metadata.snapshots)

    # idempotent replay: same checkpoint, no new files → no new snapshots
    run_stream()
    t2 = cat.load_table("default.sw")
    assert len(t2.metadata.snapshots) == n_snaps
    assert t2.read().count() == 3

    # resume with a new file: exactly the delta lands
    one_part(spark, [(4, "d")], "id bigint, v string").write.parquet(
        os.path.join(src, "f2")
    )
    run_stream()
    t2 = cat.load_table("default.sw")
    assert t2.read().count() == 4


def test_stream_writer_branch_wap(registered, cat, tmp_path):
    from tests.conftest import one_part

    spark = registered
    src = str(tmp_path / "src")
    one_part(spark, [(1, "a"), (2, "b")], "id bigint, v string").write.parquet(
        os.path.join(src, "f0")
    )
    t = cat.create_table("default.swb", "id bigint, v string")
    t.truncate()  # a snapshot for the branch to reference
    t.create_branch("audit")
    q = (
        spark.readStream.schema("id bigint, v string")
        .parquet(os.path.join(src, "*"))
        .writeStream.format("lakehouse")
        .option("location", t.metadata.location)
        .option("branch", "audit")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    q.stop()
    t = cat.load_table("default.swb")
    assert t.read().count() == 0, "main untouched before publish"
    assert t.read(ref="audit").count() == 2
    t.fast_forward("main", t.resolve_ref("audit"))
    assert t.read().count() == 2


def test_stream_writer_upsert_eq_mode(registered, cat, tmp_path):
    """mode=upsert-eq: each task writes its distinct-key eq-delete file
    beside its data file (Flink's writer shape — no driver data
    movement); per-batch commits mask older keys via the strict-<
    sequence rule; the first batch on an empty table skips the delete
    files; replay is exactly-once."""
    from tests.conftest import one_part

    spark = registered
    src = str(tmp_path / "src")
    one_part(
        spark, [(1, "a"), (2, "b"), (3, "c")], "id bigint, v string"
    ).write.parquet(os.path.join(src, "f0"))
    one_part(
        spark, [(2, "B"), (4, "d")], "id bigint, v string"
    ).write.parquet(os.path.join(src, "f1"))
    t = cat.create_table("default.su", "id bigint, v string")
    t.set_identifier_fields(["id"])  # keys default from identifier fields
    ckpt = str(tmp_path / "ck")

    def run_stream():
        q = (
            spark.readStream.schema("id bigint, v string")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
            .writeStream.format("lakehouse")
            .option("location", t.metadata.location)
            .option("mode", "upsert-eq")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        q.stop()

    run_stream()
    t2 = cat.load_table("default.su")
    assert {(r["id"], r["v"]) for r in t2.read().collect()} == {
        (1, "a"),
        (2, "B"),
        (3, "c"),
        (4, "d"),
    }
    head = t2.metadata.current_snapshot()
    eq = [e for e in head.manifest if e.content == 2]
    assert eq, "second batch must carry an eq-delete file"
    assert all(e.equality_columns == ["id"] for e in eq)
    # first batch (empty base) skipped its delete file
    first_append = [
        s for s in t2.metadata.snapshots if s.summary.get("writer") == "datasource-stream"
    ][0]
    assert int(first_append.summary.get("added-equality-delete-files", 0)) == 0
    n_snaps = len(t2.metadata.snapshots)

    run_stream()  # replay: nothing new
    t2 = cat.load_table("default.su")
    assert len(t2.metadata.snapshots) == n_snaps
    assert t2.read().count() == 4

    # compaction folds the stream's eq-deletes like any other
    t2.compact()
    t2.refresh()
    assert not t2.metadata.current_snapshot().delete_files()
    assert {(r["id"], r["v"]) for r in t2.read().collect()} == {
        (1, "a"),
        (2, "B"),
        (3, "c"),
        (4, "d"),
    }

    # unknown mode / missing keys fail loudly
    import pytest as _pytest

    t3 = cat.create_table("default.su2", "id bigint, v string")
    with _pytest.raises(Exception, match="keys"):
        (
            spark.readStream.schema("id bigint, v string")
            .parquet(os.path.join(src, "*"))
            .writeStream.format("lakehouse")
            .option("location", t3.metadata.location)
            .option("mode", "upsert-eq")
            .option("checkpointLocation", str(tmp_path / "ck3"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )


def test_stream_writer_crash_replay_skip_direct(registered, cat, tmp_path):
    """Drive the sink's commit() twice with the SAME batchId — the crash
    window Spark replays (sink committed, checkpoint didn't): the second
    commit must be skipped, its re-written files deleted, and a LATER
    batchId must still commit. Also: two writers with different
    checkpoints (run ids) must not clobber each other's markers."""
    import pyarrow as pa
    from pyspark.sql.types import StructType

    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        LakeStreamWriter,
    )

    t = cat.create_table("default.rp", "id bigint, v string")
    schema = StructType.fromDDL("id bigint, v string")

    def writer_for(ck):
        return LakeStreamWriter(
            schema,
            {"location": t.metadata.location, "checkpointLocation": str(ck)},
        )

    def batch(rows):
        return pa.RecordBatch.from_pylist(
            [{"id": i, "v": v} for i, v in rows],
            schema=pa.schema([("id", pa.int64()), ("v", pa.string())]),
        )

    wa = writer_for(tmp_path / "ckA")
    m0 = wa.write(iter([batch([(1, "a"), (2, "b")])]))
    wa.commit([m0], 0)
    assert cat.load_table("default.rp").read().count() == 2

    # crash replay: same batchId, fresh files — skipped AND cleaned up
    m0r = wa.write(iter([batch([(1, "a"), (2, "b")])]))
    replay_path = m0r.file_path
    wa.commit([m0r], 0)
    t2 = cat.load_table("default.rp")
    assert t2.read().count() == 2, "replayed batch must not double-commit"
    assert not os.path.exists(replay_path), "replayed files must be deleted"

    # a SECOND writer (different checkpoint = different run) commits in
    # between without disturbing writer A's marker
    wb = writer_for(tmp_path / "ckB")
    mb = wb.write(iter([batch([(9, "z")])]))
    wb.commit([mb], 0)
    assert cat.load_table("default.rp").read().count() == 3

    # writer A's NEXT replay of batch 0 is still skipped (run-scoped key
    # survived writer B's commit), and batch 1 commits normally
    m0r2 = wa.write(iter([batch([(1, "a"), (2, "b")])]))
    wa.commit([m0r2], 0)
    assert cat.load_table("default.rp").read().count() == 3
    m1 = wa.write(iter([batch([(3, "c")])]))
    wa.commit([m1], 1)
    assert cat.load_table("default.rp").read().count() == 4
