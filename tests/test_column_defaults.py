"""Initial column defaults (Iceberg v3 ADD COLUMN … DEFAULT): rows
written BEFORE the column existed read the default; rows written after
read their physical value (explicit NULL stays NULL). Sequence-gated via
X54's persisted manifest sequences — pure metadata, no rewrite."""

from __future__ import annotations

import pytest

from tests.conftest import one_part
from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.lake.maintenance import (
    rewrite_data_files,
)

DDL = "k bigint, name string"


def _table(spark, tmp_path, name="default.dflt", props=None):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    return cat.create_table(name, DDL, properties=props or {})


def _rows(spark, data, ddl=DDL):
    return one_part(spark, data, ddl)


def test_pre_add_rows_read_default_post_add_read_values(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.insert(_rows(spark, [(1, "a"), (2, "b")]))
    t.add_column("score", "bigint", default=7)
    t.insert(
        _rows(spark, [(3, "c", 30), (4, "d", None)], DDL + ", score bigint")
    )
    got = {r["k"]: r["score"] for r in t.read().collect()}
    # old rows: the default; new rows: physical values, explicit NULL kept
    assert got == {1: 7, 2: 7, 3: 30, 4: None}


def test_default_survives_reload_and_time_travel(spark, tmp_path):
    t = _table(spark, tmp_path)
    s1 = t.insert(_rows(spark, [(1, "a")]))
    t.add_column("score", "bigint", default=7)
    t.refresh()
    assert t.metadata.column_defaults["score"]["value"] == 7
    assert {r["k"]: r["score"] for r in t.read().collect()} == {1: 7}
    # schema is table-global in this engine: time travel BEFORE the add
    # still projects the column, and the default applies to the old rows
    old = t.read(snapshot_id=s1.snapshot_id)
    assert "score" in old.columns
    assert {r["k"]: r["score"] for r in old.collect()} == {1: 7}


def test_string_default_and_where_filtering(spark, tmp_path):
    t = _table(spark, tmp_path, name="default.dflt2")
    t.insert(_rows(spark, [(1, "a"), (2, "b")]))
    t.add_column("lang", "string", default="en")
    t.insert(_rows(spark, [(3, "c", "fr")], DDL + ", lang string"))
    # scan predicate over the defaulted column: pre-add files carry no
    # stats for it (unprunable — sound), the row filter sees the default
    got = sorted(r["k"] for r in t.scan("lang = 'en'").collect())
    assert got == [1, 2]
    got = sorted(r["k"] for r in t.scan("lang = 'fr'").collect())
    assert got == [3]


def test_defaults_with_mor_deletes(spark, tmp_path):
    t = _table(
        spark,
        tmp_path,
        name="default.dflt3",
        props={"write.delete.mode": "merge-on-read"},
    )
    t.insert(_rows(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.add_column("score", "bigint", default=5)
    t.delete("k = 2")
    got = {r["k"]: r["score"] for r in t.read().collect()}
    assert got == {1: 5, 3: 5}


def test_compaction_materializes_defaults(spark, tmp_path):
    t = _table(spark, tmp_path, name="default.dflt4")
    t.insert(_rows(spark, [(1, "a")]))
    t.add_column("score", "bigint", default=9)
    rewrite_data_files(t)
    # rewritten file holds the value physically; dropping the default
    # metadata afterwards must not lose it
    t.metadata.column_defaults.pop("score")
    t.metadata.commit()
    assert [r["score"] for r in t.read().collect()] == [9]


def test_sql_add_column_default(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh_sql"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql("CREATE TABLE demo.default.d (k BIGINT, v STRING) USING iceberg")
    eng.sql("INSERT INTO demo.default.d VALUES (1, 'a')")
    eng.sql("ALTER TABLE demo.default.d ADD COLUMN score BIGINT DEFAULT 42")
    eng.sql("INSERT INTO demo.default.d VALUES (2, 'b', 7)")
    got = {
        r["k"]: r["score"]
        for r in eng.sql("SELECT k, score FROM demo.default.d").collect()
    }
    assert got == {1: 42, 2: 7}
    eng.sql(
        "ALTER TABLE demo.default.d ADD COLUMN tag STRING DEFAULT 'it''s'"
    )
    got = {
        r["k"]: r["tag"]
        for r in eng.sql("SELECT k, tag FROM demo.default.d").collect()
    }
    assert got == {1: "it's", 2: "it's"}


def test_rename_moves_default_drop_removes_it(spark, tmp_path):
    t = _table(spark, tmp_path, name="default.dflt5")
    t.insert(_rows(spark, [(1, "a")]))
    t.add_column("score", "bigint", default=3)
    t.rename_column("score", "points")
    assert "points" in t.metadata.column_defaults
    assert {r["k"]: r["points"] for r in t.read().collect()} == {1: 3}
    t.drop_column("points")
    assert "points" not in t.metadata.column_defaults


def test_datasource_batch_read_applies_defaults(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        register,
    )

    register(spark)
    t = _table(spark, tmp_path, name="default.dflt6")
    t.insert(_rows(spark, [(1, "a")]))
    t.add_column("score", "bigint", default=11)
    t.insert(_rows(spark, [(2, "b", 22)], DDL + ", score bigint"))
    df = (
        spark.read.format("lakehouse")
        .option("location", t.metadata.location)
        .load()
    )
    got = {r["k"]: r["score"] for r in df.collect()}
    assert got == {1: 11, 2: 22}


def test_non_scalar_default_rejected(spark, tmp_path):
    t = _table(spark, tmp_path, name="default.dflt7")
    ddl_before = t.metadata.schema_ddl
    with pytest.raises(ValueError, match="scalar"):
        t.add_column("xs", "array<bigint>", default=[1, 2])
    # a caught rejection must not leave a phantom column behind
    # (review finding: validation used to run after the DDL mutation)
    assert t.metadata.schema_ddl == ddl_before


def test_equality_delete_sees_defaults_on_both_read_paths(spark, tmp_path):
    """Review finding: the DataSource applied equality deletes against
    physical values BEFORE defaults, so a delete keyed on the defaulted
    column missed pre-add rows that table.read() masks."""
    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        register,
    )

    register(spark)
    t = _table(spark, tmp_path, name="default.dflt8")
    t.insert(_rows(spark, [(1, "a"), (2, "b")]))
    t.add_column("score", "bigint", default=7)
    t.insert(_rows(spark, [(3, "c", 7), (4, "d", 8)], DDL + ", score bigint"))
    t.equality_delete(
        one_part(spark, [(7,)], "score bigint"), equality_columns=["score"]
    )
    want = {4}  # rows 1,2 read score=7 via the default; row 3 physically 7
    assert {r["k"] for r in t.read().collect()} == want
    ds = (
        spark.read.format("lakehouse")
        .option("location", t.metadata.location)
        .load()
    )
    assert {r["k"] for r in ds.collect()} == want


def test_post_add_writer_omitting_column_reads_default(spark, tmp_path):
    """Presence rule (review finding): a file committed AFTER the add but
    physically lacking the column (a writer racing the ADD COLUMN, or an
    API insert with the old frame shape) still reads the default —
    Iceberg's field-id-presence semantics, via the write-time column
    harvest; the sequence watermark alone would say NULL."""
    t = _table(spark, tmp_path, name="default.dflt9")
    t.insert(_rows(spark, [(1, "a")]))
    t.add_column("score", "bigint", default=7)
    t.insert(_rows(spark, [(2, "b")]))  # old shape: no score column
    got = {r["k"]: r["score"] for r in t.read().collect()}
    assert got == {1: 7, 2: 7}


def test_sql_default_null_means_no_default(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh_sqln"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql("CREATE TABLE demo.default.n (k BIGINT) USING iceberg")
    eng.sql("INSERT INTO demo.default.n VALUES (1)")
    eng.sql("ALTER TABLE demo.default.n ADD COLUMN score BIGINT DEFAULT NULL")
    t = eng.table("demo.default.n")
    assert "score" not in t.metadata.column_defaults
    assert [r["score"] for r in t.read().collect()] == [None]
    with pytest.raises(ValueError, match="DEFAULT literal"):
        eng.sql(
            "ALTER TABLE demo.default.n ADD COLUMN bad BIGINT DEFAULT junk"
        )


@pytest.mark.parametrize("seed", range(3))
def test_randomized_defaults_composition(spark, tmp_path, seed):
    """Randomized interleaving of inserts (pre-add shape, post-add shape,
    post-add shape omitting the defaulted column), a mid-sequence ADD
    COLUMN ... DEFAULT, deletes and compaction — engine read vs a plain
    dict model after every step."""
    import random

    from demo_iceberg_permanent_delete_spark.lake.maintenance import (
        rewrite_data_files,
    )

    rnd = random.Random(4200 + seed)
    cat = Catalog(spark, str(tmp_path / f"whr{seed}"))
    cat.create_namespace("default")
    t = cat.create_table("default.rdflt", DDL)

    model: dict[int, tuple[str, int | None]] = {}  # k -> (name, score)
    next_k = 0
    added = False
    add_step = rnd.randint(1, 4)

    def check(step, op):
        got = sorted(
            (r["k"], r["name"], r["score"] if added else None)
            for r in t.read().collect()
        )
        want = sorted((k, n, s if added else None) for k, (n, s) in model.items())
        assert got == want, f"seed {seed} step {step} after {op}"

    for step in range(10):
        if step == add_step:
            t.add_column("score", "bigint", default=7)
            added = True
            # every existing row now reads the default
            model = {k: (n, 7) for k, (n, _) in model.items()}
            check(step, "add_column")
            continue
        choice = rnd.random()
        if choice < 0.5 or not model:
            n = rnd.randint(1, 3)
            ks = list(range(next_k, next_k + n))
            next_k += n
            if not added or rnd.random() < 0.4:
                # old shape (pre-add, or a post-add writer omitting the
                # column — the presence rule fills the default either way:
                # pre-add rows read it once it exists, omitting post-add
                # rows read it immediately)
                t.insert(_rows(spark, [(k, f"n{k}") for k in ks]))
                for k in ks:
                    model[k] = (f"n{k}", 7)
                op = f"insert_old{n}"
            else:
                vals = [(k, f"n{k}", rnd.choice([None, k])) for k in ks]
                t.insert(_rows(spark, vals, DDL + ", score bigint"))
                for k, nm, s in vals:
                    model[k] = (nm, s)
                op = f"insert_new{n}"
        elif choice < 0.75:
            k = rnd.choice(list(model))
            t.delete(f"k = {k}")
            del model[k]
            op = f"delete {k}"
        else:
            rewrite_data_files(t)
            op = "rewrite"
        if not added:
            # the default column doesn't exist yet — compare 2-col shape
            got = sorted((r["k"], r["name"]) for r in t.read().collect())
            want = sorted((k, n) for k, (n, _) in model.items())
            assert got == want, f"seed {seed} step {step} after {op}"
        else:
            check(step, op)


def test_streaming_read_applies_defaults(spark, tmp_path):
    """The incremental-append streaming source ships per-task defaults:
    a file appended BEFORE the ADD COLUMN ... DEFAULT streams the default
    when read after it."""
    from pyspark.sql.types import StructType

    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        LakeStreamReader,
    )

    t = _table(spark, tmp_path, name="default.dflt10")
    t.insert(_rows(spark, [(1, "a")]))
    t.add_column("score", "bigint", default=13)
    t.insert(_rows(spark, [(2, "b", 20)], DDL + ", score bigint"))
    reader = LakeStreamReader(
        StructType.fromDDL("k bigint, name string, score bigint"),
        {"location": t.metadata.location, "starting-offset": "earliest"},
    )
    off, end = reader.initialOffset(), reader.latestOffset()
    got = {}
    for p in reader.partitions(off, end):
        if p.file_path is None:
            continue
        for rb in reader.read(p):
            for k, s in zip(
                rb.column("k").to_pylist(), rb.column("score").to_pylist()
            ):
                got[k] = s
    assert got == {1: 13, 2: 20}


def test_cdc_stream_applies_defaults(spark, tmp_path):
    """The CDC streaming source ships per-task defaults too: INSERT events
    replayed from pre-add commits and DELETE (masked) events over pre-add
    files both show the default, matching the batch changelog."""
    from pyspark.sql.types import StructType

    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        LakeCdcStreamReader,
    )

    t = _table(
        spark,
        tmp_path,
        name="default.dfltcdc",
        props={"write.delete.mode": "merge-on-read"},
    )
    t.insert(_rows(spark, [(1, "a"), (2, "b")]))
    t.add_column("score", "bigint", default=17)
    t.delete("k = 1")  # masked DELETE over a pre-add file
    schema = StructType.fromDDL(
        "k bigint, name string, score bigint, _change_type string,"
        " _change_ordinal int, _commit_snapshot_id bigint"
    )
    reader = LakeCdcStreamReader(
        schema,
        {
            "location": t.metadata.location,
            "starting-offset": "earliest",
            "mode": "cdc",
        },
    )
    off, end = reader.initialOffset(), reader.latestOffset()
    events = []
    for p in reader.partitions(off, end):
        if getattr(p, "file_path", None) is None:
            continue
        for rb in reader.read(p):
            for k, s, ct in zip(
                rb.column("k").to_pylist(),
                rb.column("score").to_pylist(),
                rb.column("_change_type").to_pylist(),
            ):
                events.append((k, s, ct))
    assert (1, 17, "INSERT") in events and (2, 17, "INSERT") in events
    assert (1, 17, "DELETE") in events  # the masked row shows the default


def test_add_files_import_missing_defaulted_column(spark, tmp_path):
    """add_files accepts a foreign file lacking a DEFAULTed column (that
    is exactly the case the default covers) and its rows read the default
    by physical presence, despite the post-add sequence."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = _table(spark, tmp_path, name="default.dfltadd")
    t.insert(_rows(spark, [(1, "a")]))
    t.add_column("score", "bigint", default=31)
    foreign = tmp_path / "ext"
    foreign.mkdir()
    pq.write_table(
        pa.table({"k": pa.array([9], pa.int64()), "name": pa.array(["x"])}),
        str(foreign / "f.parquet"),
    )
    stats = t.add_files(str(foreign))
    assert stats["added_files_count"] == 1
    got = {r["k"]: r["score"] for r in t.read().collect()}
    assert got == {1: 31, 9: 31}


def test_defaults_survive_sharded_fold(spark, tmp_path):
    """rewrite_manifests on a partitioned table (sharded fold) preserves
    the per-entry column harvest, so defaults keep resolving after the
    fold and through scoped scans of the folded shards."""
    from demo_iceberg_permanent_delete_spark.lake.maintenance import (
        rewrite_manifests,
    )

    cat = Catalog(spark, str(tmp_path / "whf"))
    cat.create_namespace("default")
    t = cat.create_table("default.dfltshard", DDL, partition_by=["name"])
    for grp in ("a", "b", "c"):
        t.insert(_rows(spark, [(ord(grp), grp)]))
    t.add_column("score", "bigint", default=23)
    t.insert(
        _rows(spark, [(1000, "a", 5)], DDL + ", score bigint")
    )
    before = {r["k"]: r["score"] for r in t.read().collect()}
    rewrite_manifests(t)
    t.refresh()
    assert {r["k"]: r["score"] for r in t.read().collect()} == before
    got = {r["k"]: r["score"] for r in t.scan("name = 'a'").collect()}
    assert got == {ord("a"): 23, 1000: 5}


# --------------------------------------------------- write defaults (v3)
def test_omitted_column_insert_writes_the_write_default(spark, tmp_path):
    """ADD COLUMN … DEFAULT sets the write-default alongside the initial
    default (Iceberg v3): an INSERT that omits the column gets the value
    physically written, while a batch carrying the column (explicit NULL
    included) is untouched."""
    t = _table(spark, tmp_path)
    t.add_column("score", "bigint", default=7)
    t.insert(_rows(spark, [(1, "a"), (2, "b")]))  # omits score
    t.insert(
        _rows(spark, [(3, "c", 30), (4, "d", None)], DDL + ", score bigint")
    )
    got = {r["k"]: r["score"] for r in t.read().collect()}
    assert got == {1: 7, 2: 7, 3: 30, 4: None}
    # physically written, not metadata-resolved: EVERY file (both the
    # omitted-column insert and the explicit one are post-add) carries
    # score physically — deleting _apply_write_defaults would leave the
    # first insert's files without it (and the X55 presence rule would
    # then resurrect the initial default, masking the regression at the
    # value level, which is why this checks the files themselves)
    files = t.metadata.current_snapshot().data_files()
    assert files and all("score" in (e.columns or []) for e in files)


def test_initial_and_write_defaults_diverge_after_set_default(
    spark, tmp_path
):
    """SET DEFAULT moves only the WRITE default: pre-add rows keep
    reading the immutable initial default while later omitted-column
    inserts pick up each successive write default."""
    t = _table(spark, tmp_path)
    t.insert(_rows(spark, [(1, "old")]))  # pre-add era
    t.add_column("score", "bigint", default=7)
    t.insert(_rows(spark, [(2, "b")]))  # omits → write default 7
    t.set_default("score", 99)
    t.insert(_rows(spark, [(3, "c")]))  # omits → new write default 99
    got = {r["k"]: r["score"] for r in t.read().collect()}
    assert got == {1: 7, 2: 7, 3: 99}
    # DROP DEFAULT: omitted column reverts to NULL
    t.set_default("score", None)
    t.insert(_rows(spark, [(4, "d")]))
    got = {r["k"]: r["score"] for r in t.read().collect()}
    assert got == {1: 7, 2: 7, 3: 99, 4: None}
    # initial default is untouched throughout
    assert t.metadata.column_defaults["score"]["value"] == 7


def test_write_default_without_initial_default(spark, tmp_path):
    """SET DEFAULT on a column added WITHOUT an initial default: pre-add
    rows read NULL (no initial default to resurrect), omitted-column
    inserts get the write default."""
    t = _table(spark, tmp_path)
    t.insert(_rows(spark, [(1, "old")]))
    t.add_column("score", "bigint")  # no defaults at all
    t.insert(_rows(spark, [(2, "b")]))  # omits → NULL
    t.set_default("score", 5)
    t.insert(_rows(spark, [(3, "c")]))  # omits → 5
    got = {r["k"]: r["score"] for r in t.read().collect()}
    assert got == {1: None, 2: None, 3: 5}
    assert "score" not in t.metadata.column_defaults  # no initial default
    with pytest.raises(ValueError, match="no such column"):
        t.set_default("nope", 1)
    with pytest.raises(ValueError, match="scalar literal"):
        t.set_default("score", [1, 2])


def test_write_default_survives_reload_rename_and_drop(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.add_column("score", "bigint", default=3)
    t.set_default("score", 11)
    cat = Catalog(spark, str(tmp_path / "wh"))
    t2 = cat.load_table("default.dflt")
    assert t2.metadata.write_defaults == {"score": 11}
    t2.rename_column("score", "points")
    assert t2.metadata.write_defaults == {"points": 11}
    t2.insert(_rows(spark, [(1, "a")]))
    assert [r["points"] for r in t2.read().collect()] == [11]
    t2.drop_column("points")
    assert t2.metadata.write_defaults == {}


def test_upsert_and_overwrite_apply_write_defaults(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.add_column("score", "bigint", default=2)
    t.overwrite(_rows(spark, [(1, "a")]))
    assert {r["score"] for r in t.read().collect()} == {2}
    t.upsert(_rows(spark, [(1, "A"), (5, "e")]), on=["k"])
    got = {r["k"]: (r["name"], r["score"]) for r in t.read().collect()}
    assert got == {1: ("A", 2), 5: ("e", 2)}


def test_sql_facade_set_default_and_insert_column_list(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh_sql"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql("CREATE TABLE demo.default.wd (k BIGINT, name STRING) USING iceberg")
    eng.sql("INSERT INTO demo.default.wd VALUES (1, 'a')")
    eng.sql(
        "ALTER TABLE demo.default.wd ADD COLUMN score BIGINT DEFAULT 7"
    )
    # column-list INSERT omitting the defaulted column
    eng.sql("INSERT INTO demo.default.wd (k, name) VALUES (2, 'b')")
    eng.sql("ALTER TABLE demo.default.wd ALTER COLUMN score SET DEFAULT 99")
    eng.sql("INSERT INTO demo.default.wd (k, name) VALUES (3, 'c')")
    # INSERT SELECT omitting the defaulted column also fills it
    eng.sql(
        "INSERT INTO demo.default.wd SELECT k + 10 AS k, name "
        "FROM demo.default.wd WHERE k = 3"
    )
    got = {
        r["k"]: r["score"]
        for r in eng.sql("SELECT k, score FROM demo.default.wd").collect()
    }
    assert got == {1: 7, 2: 7, 3: 99, 13: 99}
    eng.sql("ALTER TABLE demo.default.wd ALTER COLUMN score DROP DEFAULT")
    eng.sql("INSERT INTO demo.default.wd (k, name) VALUES (4, 'd')")
    got = {
        r["k"]: r["score"]
        for r in eng.sql("SELECT k, score FROM demo.default.wd").collect()
    }
    assert got[4] is None
    with pytest.raises(ValueError, match="unknown columns"):
        eng.sql("INSERT INTO demo.default.wd (k, nope) VALUES (9, 'x')")


def test_default_literal_must_cast_to_column_type(spark, tmp_path):
    """Review finding (r9): a DEFAULT literal that does not cast to the
    declared type is rejected AT DDL TIME — otherwise every later write
    would silently materialize NULL where the user expected a value."""
    t = _table(spark, tmp_path)
    t.add_column("score", "bigint")
    with pytest.raises(ValueError, match="does not cast"):
        t.set_default("score", "oops")
    with pytest.raises(ValueError, match="does not cast"):
        t.add_column("rank", "bigint", default="nope")
    # the rejected ADD COLUMN must not leave a phantom column behind
    assert "rank" not in {f.name for f in t.schema().fields}
    # numeric-into-string and int-into-double are fine
    t.set_default("score", 3)
    t.add_column("label", "string", default=42)
    t.add_column("ratio", "double", default=1)


def test_datasource_write_applies_write_defaults(spark, tmp_path):
    """Review finding (r9): df.write.format('lakehouse') must materialize
    write defaults exactly like t.insert(df) — and explicit NULL for an
    initially-defaulted column whose write default was dropped, so the
    presence rule can't resurrect the initial default."""
    from demo_iceberg_permanent_delete_spark.sources.lake_datasource import (
        register,
    )

    register(spark)
    t = _table(spark, tmp_path)
    t.add_column("score", "bigint", default=7)
    loc = t.metadata.location
    one_part(spark, [(1, "a")], DDL).write.format("lakehouse").option(
        "location", loc
    ).mode("append").save()
    t.refresh()
    assert {(r["k"], r["score"]) for r in t.read().collect()} == {(1, 7)}
    # dropped write default → explicit NULL lands physically
    t.set_default("score", None)
    one_part(spark, [(2, "b")], DDL).write.format("lakehouse").option(
        "location", loc
    ).mode("append").save()
    t.refresh()
    got = {r["k"]: r["score"] for r in t.read().collect()}
    assert got == {1: 7, 2: None}
    files = t.metadata.current_snapshot().data_files()
    assert files and all("score" in (e.columns or []) for e in files)
