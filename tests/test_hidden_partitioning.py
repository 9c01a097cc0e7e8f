"""Hidden partitioning (Iceberg transform parity): days/bucket/truncate
specs, write clustering, synthetic bucket stats, and planner-side file
pruning from predicates on the RAW columns."""

from __future__ import annotations

import datetime as dt
import zlib

import pytest
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.lake.pruning import candidate_files
from demo_iceberg_permanent_delete_spark.lake.transforms import (
    bucket_conjuncts,
    bucket_of,
    parse_partition_by,
)


def test_parse_specs():
    fields = parse_partition_by(
        ["days(ts)", "bucket(16, id)", "truncate(4, name)", "plain"]
    )
    assert [(f.source, f.transform, f.arg) for f in fields] == [
        ("ts", "day", None),
        ("id", "bucket", 16),
        ("name", "truncate", 4),
        ("plain", "identity", None),
    ]
    assert fields[1].part_column == "__part_id_bucket"
    assert fields[0].part_column is None  # monotonic: raw stats suffice
    with pytest.raises(ValueError, match="unsupported"):
        parse_partition_by(["md5(id)"])


def test_bucket_hash_matches_spark(spark):
    """The planner's zlib.crc32 projection must equal the write path's
    F.crc32(cast(col as string)) for every supported literal type."""
    vals = [0, 1, 5, -7, 123456789012345, "a", "name-42", "it's", ""]
    df = spark.createDataFrame([(v,) for v in vals if isinstance(v, int)], "v long")
    got = df.select(F.pmod(F.crc32(F.col("v").cast("string")), F.lit(16)).alias("b")).collect()
    for row, v in zip(got, [v for v in vals if isinstance(v, int)]):
        assert row["b"] == bucket_of(v, 16), v
    sdf = spark.createDataFrame([(v,) for v in vals if isinstance(v, str)], "v string")
    got = sdf.select(F.pmod(F.crc32(F.col("v").cast("string")), F.lit(16)).alias("b")).collect()
    for row, v in zip(got, [v for v in vals if isinstance(v, str)]):
        assert row["b"] == bucket_of(v, 16), v


@pytest.fixture
def bucketed(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.bt",
        "id bigint, v string",
        partition_by=["bucket(4, id)"],
        properties={"write.distribution.partitions": "4"},
    )
    t.insert(
        spark.createDataFrame([(i, f"v{i}") for i in range(200)], "id bigint, v string")
    )
    return t


def test_bucket_write_clusters_and_prunes(bucketed):
    entries = bucketed.metadata.current_snapshot().data_files()
    assert len(entries) >= 2
    # every file carries synthetic bucket stats, each covering few buckets
    for e in entries:
        assert "__part_id_bucket" in e.min_values
        assert e.min_values["__part_id_bucket"] <= e.max_values["__part_id_bucket"]
    # point lookup prunes to the files whose bucket range holds crc32(id)%4
    cand = candidate_files(entries, "id = 7", bucketed._partition_fields)
    assert 0 < len(cand) < len(entries)
    want = bucket_of(7, 4)
    for e in cand:
        assert e.min_values["__part_id_bucket"] <= want <= e.max_values["__part_id_bucket"]
    # and the scan result is still exactly right
    assert [r["v"] for r in bucketed.scan("id = 7").collect()] == ["v7"]
    # IN-list prunes to the union of member buckets
    cand_in = candidate_files(entries, "id IN (7, 8)", bucketed._partition_fields)
    assert len(cand_in) <= len(entries)
    assert {r["id"] for r in bucketed.scan("id IN (7, 8)").collect()} == {7, 8}


def test_bucket_read_drops_synthetic_column(bucketed):
    assert bucketed.read().columns == ["id", "v"]
    assert bucketed.scan("id = 3").columns == ["id", "v"]


def test_bucket_conjunct_projection():
    fields = parse_partition_by(["bucket(8, k)"])
    assert bucket_conjuncts(fields, "k = 5 AND x > 2") == [
        ("__part_k_bucket", [bucket_of(5, 8)])
    ]
    assert bucket_conjuncts(fields, "k IN (1, 2)") == [
        ("__part_k_bucket", sorted({bucket_of(1, 8), bucket_of(2, 8)}))
    ]
    # not projectable: range, OR at top level, non-literal
    assert bucket_conjuncts(fields, "k > 5") == []
    assert bucket_conjuncts(fields, "k = 5 OR k = 6") == []
    assert bucket_conjuncts(fields, "k = other_col") == []


def test_days_partitioning_prunes_on_raw_column(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh2"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.ev",
        "ts timestamp, v long",
        partition_by=["days(ts)"],
        properties={"write.distribution.partitions": "4"},
    )
    base = dt.datetime(2024, 6, 1)
    rows = [(base + dt.timedelta(hours=h), h) for h in range(96)]  # 4 days
    t.insert(spark.createDataFrame(rows, "ts timestamp, v long"))
    entries = t.metadata.current_snapshot().data_files()
    assert len(entries) >= 2
    # day-clustered write → tight raw ts bounds → one-day predicate prunes
    cand = candidate_files(
        entries,
        "ts BETWEEN TIMESTAMP '2024-06-02 00:00:00' AND TIMESTAMP '2024-06-02 23:59:59'",
        t._partition_fields,
    )
    assert len(cand) < len(entries)
    got = t.scan(
        "ts BETWEEN TIMESTAMP '2024-06-02 00:00:00' AND TIMESTAMP '2024-06-02 23:59:59'"
    )
    assert got.count() == 24


def test_truncate_partitioning(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh3"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.tr",
        "name string, v long",
        partition_by=["truncate(3, name)"],
        properties={"write.distribution.partitions": "3"},
    )
    rows = [(f"{p}-{i}", i) for p in ("aaa", "bbb", "ccc") for i in range(30)]
    t.insert(spark.createDataFrame(rows, "name string, v long"))
    entries = t.metadata.current_snapshot().data_files()
    cand = candidate_files(entries, "name = 'bbb-7'", t._partition_fields)
    assert len(cand) < len(entries)
    assert t.scan("name = 'bbb-7'").count() == 1


def test_partitioned_ddl_via_sql(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh4"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql(
        "CREATE TABLE demo.default.hp (id BIGINT, ts TIMESTAMP, v STRING) "
        "USING iceberg PARTITIONED BY (days(ts), bucket(4, id))"
    )
    t = eng.table("demo.default.hp")
    assert [f.transform for f in t._partition_fields] == ["day", "bucket"]
    eng.sql(
        "INSERT INTO demo.default.hp VALUES "
        "(1, TIMESTAMP '2024-01-01 00:00:00', 'a'), "
        "(2, TIMESTAMP '2024-01-02 00:00:00', 'b')"
    )
    got = eng.sql("SELECT id, v FROM demo.default.hp ORDER BY id").collect()
    assert [(r["id"], r["v"]) for r in got] == [(1, "a"), (2, "b")]


def test_bad_transform_types_rejected(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh5"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.bad", "id bigint, name string", partition_by=["days(name)"]
    )
    with pytest.raises(ValueError, match="temporal transform"):
        t.insert(spark.createDataFrame([(1, "x")], "id bigint, name string"))


def test_vectorized_transform_str_matches_python_twin():
    """The harvest's vectorized encoders must be byte-identical to the
    per-value Python twins for every supported transform x value type
    (the group-by now collapses on the VECTORIZED encoding, so any
    divergence would silently split/merge partition tuples)."""
    import datetime as dt
    import zlib

    import pyarrow as pa

    from demo_iceberg_permanent_delete_spark.lake.transforms import (
        PartitionField,
        python_transform_str,
        vectorized_transform_str,
    )

    ts_vals = [
        dt.datetime(2024, 1, 1, 0, 0, 0),
        dt.datetime(999, 2, 3, 4, 5, 6),
        dt.datetime(1969, 12, 31, 23, 59, 59),
        dt.datetime(2031, 12, 31, 13, 0, 0),
        None,
    ]
    int_vals = [0, 1, -1, 7, -12345678901234, 2**62, None]
    str_vals = ["", "a", "Straße", "x" * 40, "0", None]
    cases = [
        (PartitionField("days(ts)", "ts", "day"), pa.array(ts_vals, pa.timestamp("us"))),
        (PartitionField("days(ts)", "ts", "day"), pa.array(ts_vals, pa.timestamp("us", tz="UTC"))),
        (PartitionField("years(ts)", "ts", "year"), pa.array(ts_vals, pa.timestamp("us"))),
        (PartitionField("months(ts)", "ts", "month"), pa.array(ts_vals, pa.timestamp("us"))),
        (PartitionField("hours(ts)", "ts", "hour"), pa.array(ts_vals, pa.timestamp("us"))),
        (PartitionField("days(d)", "d", "day"), pa.array([v.date() if v else None for v in ts_vals], pa.date32())),
        (PartitionField("id", "id", "identity"), pa.array(int_vals, pa.int64())),
        (PartitionField("s", "s", "identity"), pa.array(str_vals, pa.string())),
        (PartitionField("b", "b", "identity"), pa.array([True, False, None], pa.bool_())),
        (PartitionField("truncate(100, id)", "id", "truncate", 100), pa.array([v for v in int_vals if v is not None], pa.int64())),
        (PartitionField("bucket(16, id)", "id", "bucket", 16), pa.array(int_vals, pa.int64())),
        (PartitionField("bucket(7, s)", "s", "bucket", 7), pa.array(str_vals, pa.string())),
    ]
    for field, arr in cases:
        vec = vectorized_transform_str(field, arr)
        assert vec is not None, field
        enc = python_transform_str(field)
        expect = [None if v is None else enc(v) for v in arr.to_pylist()]
        assert vec.to_pylist() == expect, (field, vec.to_pylist(), expect)

    # the numpy crc32 IS zlib's
    f = PartitionField("bucket(1000000007, s)", "s", "bucket", 1000000007)
    arr = pa.array(["", "a", "abc", "Straße", "12345678901234567890"])
    vec = vectorized_transform_str(f, arr).to_pylist()
    assert vec == [
        str(zlib.crc32(s.encode("utf-8")) % 1000000007) for s in arr.to_pylist()
    ]
