"""Snapshot refs (Iceberg tags & branches): named time travel, immutability
rules, expiry protection, the .refs metadata view, and persistence."""

from __future__ import annotations

import datetime as dt

import pytest

from demo_iceberg_permanent_delete_spark.lake import Catalog, SnapshotNotFoundError

DDL = "k bigint, v string"


@pytest.fixture
def table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table("default.reft", DDL)
    t.insert(spark.createDataFrame([(1, "a"), (2, "b")], DDL))
    t.insert(spark.createDataFrame([(3, "c")], DDL))
    return t


def test_tag_read_and_immutability(table, spark):
    snaps = table.metadata.snapshots
    table.create_tag("after-first", snaps[0].snapshot_id)
    assert table.read(ref="after-first").count() == 2
    assert table.read(ref="main").count() == 3
    with pytest.raises(ValueError, match="immutable"):
        table.fast_forward("after-first")
    with pytest.raises(ValueError, match="already exists"):
        table.create_tag("after-first")
    with pytest.raises(SnapshotNotFoundError):
        table.read(ref="nope")


def test_branch_fast_forward(table, spark):
    first = table.metadata.snapshots[0].snapshot_id
    table.create_branch("audit", first)
    assert table.read(ref="audit").count() == 2
    table.fast_forward("audit")  # to current
    assert table.read(ref="audit").count() == 3
    table.drop_ref("audit")
    with pytest.raises(SnapshotNotFoundError):
        table.read(ref="audit")


def test_refs_protect_snapshots_from_expiry(table):
    first = table.metadata.snapshots[0].snapshot_id
    table.create_tag("keep", first)
    stats = table.expire_snapshots(
        older_than=dt.datetime.now(dt.timezone.utc) + dt.timedelta(days=1)
    )
    assert stats["expired_snapshots"] == 0  # tag saved the old snapshot
    assert table.read(ref="keep").count() == 2
    # dropping the tag releases it
    table.drop_ref("keep")
    stats = table.expire_snapshots(
        older_than=dt.datetime.now(dt.timezone.utc) + dt.timedelta(days=1)
    )
    assert stats["expired_snapshots"] == 1


def test_refs_view_and_persistence(table, spark, tmp_path):
    first = table.metadata.snapshots[0].snapshot_id
    table.create_tag("v1", first)
    table.create_branch("dev")
    rows = {r["name"]: (r["type"], r["snapshot_id"]) for r in table.meta("refs").collect()}
    assert rows["main"] == ("BRANCH", table.metadata.current_snapshot_id)
    assert rows["v1"] == ("TAG", first)
    assert rows["dev"][0] == "BRANCH"
    # refs survive a metadata reload
    reloaded = Catalog(spark, str(tmp_path / "wh")).load_table("default.reft")
    assert reloaded.resolve_ref("v1") == first
    assert reloaded.read(ref="v1").count() == 2


def test_refs_via_sql_facade(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql(f"CREATE TABLE demo.default.rt ({DDL}) USING iceberg")
    eng.sql("INSERT INTO demo.default.rt VALUES (1, 'a')")
    t = eng.table("demo.default.rt")
    t.create_tag("release")
    got = eng.sql("SELECT name, type FROM demo.default.rt.refs ORDER BY name").collect()
    assert [(r["name"], r["type"]) for r in got] == [
        ("main", "BRANCH"),
        ("release", "TAG"),
    ]


def test_sql_time_travel_syntax(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql(f"CREATE TABLE demo.default.tt ({DDL}) USING iceberg")
    eng.sql("INSERT INTO demo.default.tt VALUES (1, 'a'), (2, 'b')")
    t = eng.table("demo.default.tt")
    first = t.metadata.current_snapshot_id
    t.create_tag("v1")
    eng.sql("INSERT INTO demo.default.tt VALUES (3, 'c')")

    # VERSION AS OF snapshot-id (bare and FOR SYSTEM_VERSION spellings)
    assert eng.sql(f"SELECT * FROM demo.default.tt VERSION AS OF {first}").count() == 2
    assert (
        eng.sql(
            f"SELECT * FROM demo.default.tt FOR SYSTEM_VERSION AS OF {first}"
        ).count()
        == 2
    )
    # VERSION AS OF 'ref'
    assert eng.sql("SELECT * FROM demo.default.tt VERSION AS OF 'v1'").count() == 2
    # TIMESTAMP AS OF epoch-ms and ISO literal
    at_ms = t.metadata.snapshots[0].committed_at_ms
    assert eng.sql(f"SELECT * FROM demo.default.tt TIMESTAMP AS OF {at_ms}").count() == 2
    iso = dt.datetime.fromtimestamp(at_ms / 1000, dt.timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )
    assert (
        eng.sql(
            f"SELECT * FROM demo.default.tt FOR TIMESTAMP AS OF TIMESTAMP '{iso}'"
        ).count()
        == 2
    )
    # untraveled read still sees everything; joins mixing both work
    assert eng.sql("SELECT * FROM demo.default.tt").count() == 3
    both = eng.sql(
        f"SELECT cur.k FROM demo.default.tt cur "
        f"LEFT ANTI JOIN demo.default.tt VERSION AS OF {first} old ON cur.k = old.k"
    )
    assert [r["k"] for r in both.collect()] == [3]


def test_timestamp_as_of_travel(table):
    snaps = table.metadata.snapshots
    first, second = snaps[0], snaps[1]
    # exactly at the first commit -> first snapshot (inclusive)
    assert table.read(as_of=first.committed_at_ms).count() == 2
    # between the commits -> still the first
    mid = (first.committed_at_ms + second.committed_at_ms) // 2
    assert table.read(as_of=mid).count() == 2
    # far future -> current; far past -> raises
    assert table.read(as_of=second.committed_at_ms + 10**9).count() == 3
    with pytest.raises(SnapshotNotFoundError):
        table.read(as_of=first.committed_at_ms - 10**6)
    # datetime form, tz-aware
    when = dt.datetime.fromtimestamp(mid / 1000, dt.timezone.utc)
    assert table.read(as_of=when).count() == 2
    # only one selector at a time
    with pytest.raises(ValueError, match="only one of"):
        table.read(snapshot_id=first.snapshot_id, as_of=mid)


def test_max_ref_age_aged_out_ref_stops_protecting(table):
    """Iceberg's max_ref_age_ms: expire_snapshots removes a ref whose
    referenced snapshot is older than the age, and the snapshot then
    expires under the normal rules; ageless refs protect forever."""
    from demo_iceberg_permanent_delete_spark.lake.maintenance import (
        expire_snapshots,
    )

    first = table.metadata.snapshots[0].snapshot_id
    # the fixture's snapshots were committed milliseconds ago, so a 1 ms
    # age is already exceeded while a huge age is not
    table.create_tag("ephemeral", first, max_ref_age_ms=1)
    table.create_branch("forever", first)  # ageless — protects
    import time

    time.sleep(0.01)
    stats = expire_snapshots(table, dt.datetime(2100, 1, 1), retain_last=1)
    assert stats["removed_refs"] == 1
    assert "ephemeral" not in table.metadata.refs
    # the ageless ref still protects the snapshot
    assert stats["expired_snapshots"] == 0
    assert table.read(ref="forever").count() == 2
    table.refresh()
    assert "ephemeral" not in table.metadata.refs  # removal committed

    # drop the ageless ref: now the snapshot expires
    table.drop_ref("forever")
    stats = expire_snapshots(table, dt.datetime(2100, 1, 1), retain_last=1)
    assert stats["expired_snapshots"] == 1
    with pytest.raises(SnapshotNotFoundError):
        table.read(snapshot_id=first)


def test_dangling_aged_ref_is_removed_not_fatal(table):
    """A ref whose snapshot id no longer resolves (corrupt / hand-edited
    metadata) must not abort the whole expire_snapshots pass: an aged
    dangling ref protects nothing and is simply removed (ADVICE r8)."""
    from demo_iceberg_permanent_delete_spark.lake.maintenance import (
        expire_snapshots,
    )

    table.metadata.refs["ghost"] = {
        "snapshot_id": 999_999_999,
        "type": "tag",
        "max_ref_age_ms": 1,
    }
    stats = expire_snapshots(table, dt.datetime(2100, 1, 1), retain_last=1)
    assert "ghost" not in table.metadata.refs
    assert stats["removed_refs"] == 1


def test_max_ref_age_unexpired_ref_still_protects(table):
    from demo_iceberg_permanent_delete_spark.lake.maintenance import (
        expire_snapshots,
    )

    first = table.metadata.snapshots[0].snapshot_id
    table.create_tag("fresh", first, max_ref_age_ms=10**12)
    stats = expire_snapshots(table, dt.datetime(2100, 1, 1), retain_last=1)
    assert stats["removed_refs"] == 0
    assert stats["expired_snapshots"] == 0
    assert table.read(ref="fresh").count() == 2
    # the age rides the .refs view (Iceberg's max_reference_age_in_ms)
    ages = {
        r["name"]: r["max_reference_age_in_ms"]
        for r in table.meta("refs").collect()
    }
    assert ages["fresh"] == 10**12 and ages["main"] is None
    with pytest.raises(ValueError, match="positive"):
        table.create_tag("bad", first, max_ref_age_ms=0)


def test_sql_create_and_drop_tag_branch(spark, tmp_path):
    """Iceberg SQL extensions: ALTER TABLE ... CREATE TAG|BRANCH
    [AS OF VERSION n] [RETAIN n DAYS], DROP TAG|BRANCH."""
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh_refs"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql("CREATE TABLE demo.default.r (k BIGINT) USING iceberg")
    eng.sql("INSERT INTO demo.default.r VALUES (1)")
    eng.sql("INSERT INTO demo.default.r VALUES (2)")
    t = eng.table("demo.default.r")
    first = t.metadata.snapshots[0].snapshot_id

    eng.sql(
        f"ALTER TABLE demo.default.r CREATE TAG v1 AS OF VERSION {first} "
        "RETAIN 7 DAYS"
    )
    eng.sql("ALTER TABLE demo.default.r CREATE BRANCH audit")
    t.refresh()
    assert t.metadata.refs["v1"] == {
        "snapshot_id": first,
        "type": "tag",
        "max_ref_age_ms": 7 * 86_400_000,
    }
    assert t.metadata.refs["audit"]["type"] == "branch"
    # named time travel through the SQL surface still works
    got = eng.sql(
        "SELECT k FROM demo.default.r VERSION AS OF 'v1'"
    ).collect()
    assert [r["k"] for r in got] == [1]

    # kind mismatch is a user error, not a silent removal
    with pytest.raises(ValueError, match="is a branch"):
        eng.sql("ALTER TABLE demo.default.r DROP TAG audit")
    eng.sql("ALTER TABLE demo.default.r DROP BRANCH audit")
    eng.sql("ALTER TABLE demo.default.r DROP TAG v1")
    t.refresh()
    assert t.metadata.refs == {}


def test_call_rollback_to_timestamp_and_set_current_snapshot(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh_rb"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql("CREATE TABLE demo.default.rb (k BIGINT) USING iceberg")
    eng.sql("INSERT INTO demo.default.rb VALUES (1)")
    t = eng.table("demo.default.rb")
    first = t.metadata.snapshots[0]
    import datetime as dt

    cut = dt.datetime.fromtimestamp(
        (first.committed_at_ms + 1) / 1000, dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S.%f")
    eng.sql("INSERT INTO demo.default.rb VALUES (2)")
    assert eng.sql("SELECT k FROM demo.default.rb").count() == 2
    row = eng.sql(
        "CALL demo.system.rollback_to_timestamp('demo.default.rb', "
        f"TIMESTAMP '{cut}')"
    ).collect()[0]
    assert row["current_snapshot_id"] == first.snapshot_id
    assert eng.sql("SELECT k FROM demo.default.rb").count() == 1
    # set_current_snapshot moves the pointer forward again
    t.refresh()
    head = t.metadata.snapshots[-1].snapshot_id
    eng.sql(
        "CALL demo.system.set_current_snapshot("
        f"table => 'demo.default.rb', snapshot_id => {head})"
    )
    assert eng.sql("SELECT k FROM demo.default.rb").count() == 2


def test_rollback_reports_true_previous_and_strict_time_boundary(
    spark, tmp_path
):
    """ADVICE r8: (a) previous_snapshot_id is the pointer BEFORE the move,
    even when the current snapshot is not the list tail (second rollback);
    (b) rollback_to_timestamp uses Iceberg's strictly-before boundary — a
    timestamp exactly equal to a snapshot's commit time lands one earlier."""
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh_rb2"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql("CREATE TABLE demo.default.rb2 (k BIGINT) USING iceberg")
    for k in (1, 2, 3):
        eng.sql(f"INSERT INTO demo.default.rb2 VALUES ({k})")
    t = eng.table("demo.default.rb2")
    s1, s2, s3 = [s.snapshot_id for s in t.metadata.snapshots]

    row = eng.sql(
        f"CALL demo.system.rollback_to_snapshot('demo.default.rb2', {s2})"
    ).collect()[0]
    assert row["previous_snapshot_id"] == s3
    assert row["current_snapshot_id"] == s2
    # second rollback: current (s2) is NOT the snapshot-list tail
    row = eng.sql(
        f"CALL demo.system.rollback_to_snapshot('demo.default.rb2', {s1})"
    ).collect()[0]
    assert row["previous_snapshot_id"] == s2
    assert row["current_snapshot_id"] == s1

    # strict boundary: ts == s2's commit time resolves to s1, not s2
    t.refresh()
    eng.sql(
        f"CALL demo.system.set_current_snapshot('demo.default.rb2', {s3})"
    )
    import datetime as dt

    s2_ms = t.metadata.snapshot_by_id(s2).committed_at_ms
    cut = dt.datetime.fromtimestamp(
        s2_ms / 1000, dt.timezone.utc
    ).strftime("%Y-%m-%d %H:%M:%S.%f")
    row = eng.sql(
        "CALL demo.system.rollback_to_timestamp('demo.default.rb2', "
        f"TIMESTAMP '{cut}')"
    ).collect()[0]
    assert row["previous_snapshot_id"] == s3
    assert row["current_snapshot_id"] == s1


def test_branch_tag_suffix_identifiers(spark, tmp_path):
    """Iceberg's ref-suffix reads: FROM t.branch_<name> / t.tag_<name> —
    the other spelling of VERSION AS OF '<ref>'; kind mismatches fail."""
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh_sfx"))
    eng.sql("CREATE NAMESPACE IF NOT EXISTS demo.default")
    eng.sql(f"CREATE TABLE demo.default.sfx ({DDL}) USING iceberg")
    eng.sql("INSERT INTO demo.default.sfx VALUES (1, 'a')")
    t = eng.table("demo.default.sfx")
    t.create_tag("v1")
    t.create_branch("dev")
    eng.sql("INSERT INTO demo.default.sfx VALUES (2, 'b')")

    assert eng.sql("SELECT * FROM demo.default.sfx.tag_v1").count() == 1
    assert eng.sql("SELECT * FROM demo.default.sfx.branch_dev").count() == 1
    assert eng.sql("SELECT * FROM demo.default.sfx").count() == 2
    # a join mixing head and ref reads
    got = eng.sql(
        "SELECT cur.k FROM demo.default.sfx cur "
        "LEFT ANTI JOIN demo.default.sfx.tag_v1 old ON cur.k = old.k"
    ).collect()
    assert [r["k"] for r in got] == [2]
    with pytest.raises(ValueError, match="unknown tag"):
        eng.sql("SELECT * FROM demo.default.sfx.tag_dev")


def test_branch_snapshot_retention_protects_ancestry(spark, tmp_path):
    """Iceberg's WITH SNAPSHOT RETENTION: a branch's min_snapshots_to_keep
    protects the first N ancestors of ITS head from expiry (not just the
    head), and max_snapshot_age_ms protects the age window; snapshots
    past both still expire."""
    from demo_iceberg_permanent_delete_spark.lake.metadata import now_ms
    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE demo.default")
    eng.sql("CREATE TABLE demo.default.rr (k BIGINT, v STRING) USING iceberg")
    for i in range(4):
        eng.sql(f"INSERT INTO demo.default.rr VALUES ({i}, 'v{i}')")
    t = eng.table("default.rr")
    snaps = [s.snapshot_id for s in t.metadata.snapshots]
    # branch at the 3rd commit, keeping 2 ancestors (head + its parent)
    eng.sql(
        "ALTER TABLE default.rr CREATE BRANCH keeper "
        f"AS OF VERSION {snaps[2]} WITH SNAPSHOT RETENTION 2 SNAPSHOTS"
    )
    t = eng.table("default.rr")
    t.expire_snapshots(older_than=now_ms() + 1000)
    live = {s.snapshot_id for s in t.metadata.snapshots}
    assert snaps[3] in live            # current
    assert snaps[2] in live            # branch head
    assert snaps[1] in live            # protected ancestor (keep 2)
    assert snaps[0] not in live        # past the retention window
    # the protected ancestor is still readable
    assert t.read(snapshot_id=snaps[1]).count() == 2

    # age-window variant: everything younger than 1 day survives via the
    # branch even when the cutoff is in the future
    eng2 = LakeEngine(spark, str(tmp_path / "wh2"))
    eng2.sql("CREATE NAMESPACE demo.default")
    eng2.sql("CREATE TABLE demo.default.aw (k BIGINT) USING iceberg")
    for i in range(3):
        eng2.sql(f"INSERT INTO demo.default.aw VALUES ({i})")
    t2 = eng2.table("default.aw")
    ids = [s.snapshot_id for s in t2.metadata.snapshots]
    eng2.sql(
        "ALTER TABLE default.aw CREATE BRANCH win WITH SNAPSHOT RETENTION 1 DAY"
    )
    t2 = eng2.table("default.aw")
    t2.expire_snapshots(older_than=now_ms() + 1000)
    assert {s.snapshot_id for s in t2.metadata.snapshots} == set(ids)

    # tags reject the clause
    import pytest as _pytest

    with _pytest.raises(ValueError, match="branches only"):
        eng2.sql(
            "ALTER TABLE default.aw CREATE TAG t1 WITH SNAPSHOT RETENTION 2 SNAPSHOTS"
        )


def test_create_or_replace_and_if_not_exists_refs(spark, tmp_path):
    """Iceberg ref DDL: CREATE OR REPLACE re-points a same-kind ref,
    IF NOT EXISTS is a silent no-op on an existing one, kind change is
    refused, and the two modifiers are mutually exclusive."""
    import pytest as _pytest

    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE demo.default")
    eng.sql("CREATE TABLE demo.default.cr (k BIGINT) USING iceberg")
    eng.sql("INSERT INTO demo.default.cr VALUES (1)")
    t = eng.table("default.cr")
    first = t.metadata.current_snapshot_id
    eng.sql("INSERT INTO demo.default.cr VALUES (2)")

    eng.sql(f"ALTER TABLE default.cr CREATE TAG v AS OF VERSION {first}")
    t = eng.table("default.cr")
    assert t.read(ref="v").count() == 1
    # OR REPLACE re-points to the current head
    eng.sql("ALTER TABLE default.cr CREATE OR REPLACE TAG v")
    t = eng.table("default.cr")
    assert t.read(ref="v").count() == 2
    # IF NOT EXISTS: silent no-op, ref unchanged
    eng.sql(f"ALTER TABLE default.cr CREATE TAG IF NOT EXISTS v AS OF VERSION {first}")
    t = eng.table("default.cr")
    assert t.read(ref="v").count() == 2
    # plain duplicate still errors; kind change refused
    with _pytest.raises(ValueError, match="already exists"):
        eng.sql("ALTER TABLE default.cr CREATE TAG v")
    with _pytest.raises(ValueError, match="not a branch"):
        eng.sql("ALTER TABLE default.cr CREATE OR REPLACE BRANCH v")
    # retention rides a REPLACE (branch form)
    eng.sql("ALTER TABLE default.cr CREATE BRANCH b")
    eng.sql(
        "ALTER TABLE default.cr CREATE OR REPLACE BRANCH b "
        "WITH SNAPSHOT RETENTION 3 SNAPSHOTS"
    )
    t = eng.table("default.cr")
    assert t.metadata.refs["b"]["min_snapshots_to_keep"] == 3


def test_drop_ref_if_exists(spark, tmp_path):
    """DROP TAG|BRANCH IF EXISTS: silent no-op on a missing ref, real
    drop on an existing one, kind mismatch still loud."""
    import pytest as _pytest

    from demo_iceberg_permanent_delete_spark.lake.sql import LakeEngine

    eng = LakeEngine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE demo.default")
    eng.sql("CREATE TABLE demo.default.dr (k BIGINT) USING iceberg")
    eng.sql("INSERT INTO demo.default.dr VALUES (1)")
    eng.sql("ALTER TABLE default.dr DROP BRANCH IF EXISTS nope")  # no-op
    eng.sql("ALTER TABLE default.dr CREATE BRANCH b")
    with _pytest.raises(ValueError, match="not a tag"):
        eng.sql("ALTER TABLE default.dr DROP TAG IF EXISTS b")
    eng.sql("ALTER TABLE default.dr DROP BRANCH IF EXISTS b")
    assert "b" not in eng.table("default.dr").metadata.refs
    with _pytest.raises(KeyError):
        eng.sql("ALTER TABLE default.dr DROP BRANCH b")
