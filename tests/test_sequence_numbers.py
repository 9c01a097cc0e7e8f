"""Persisted data sequence numbers (Iceberg v2 parity — the ordering
behind equality-delete masking) and the table-global counters behind
them. The headline regression: before sequence numbers were persisted,
the equality-delete rule resolved order through the LIVE snapshot list,
so expiring the snapshot that committed a delete file made the still-live
delete "newer than everything" and re-masked rows inserted after it
(reference semantics: iceberg_pii_deletion_demo.py:210,215 filter rows by
key regardless of snapshot retention)."""

from __future__ import annotations

import json

from tests.conftest import one_part
from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.lake.maintenance import (
    expire_snapshots,
)
from demo_iceberg_permanent_delete_spark.lake.metadata import (
    ManifestEntry,
    TableMetadata,
    entry_sequence,
)

DDL = "k bigint, name string, v double"


def _table(spark, tmp_path, name="default.seq", props=None):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    return cat.create_table(name, DDL, properties=props or {})


def _rows(spark, data):
    return one_part(spark, data, DDL)


def test_sequences_monotonic_and_inherited_by_added_entries(spark, tmp_path):
    t = _table(spark, tmp_path)
    s1 = t.insert(_rows(spark, [(1, "a", 1.0)]))
    s2 = t.insert(_rows(spark, [(2, "b", 2.0)]))
    s3 = t.equality_delete(spark.createDataFrame([("a",)], "name string"))
    assert (s1.sequence_number, s2.sequence_number, s3.sequence_number) == (
        1,
        2,
        3,
    )
    by_seq = {
        e.sequence_number: e for e in t.metadata.current_snapshot().manifest
    }
    assert by_seq[1].added_snapshot_id == s1.snapshot_id
    assert by_seq[2].added_snapshot_id == s2.snapshot_id
    assert by_seq[3].content == 2
    assert t.metadata.last_sequence_number == 3


def test_sequences_survive_reload(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.insert(_rows(spark, [(1, "a", 1.0)]))
    t.equality_delete(spark.createDataFrame([("a",)], "name string"))
    t.refresh()
    assert t.metadata.last_sequence_number == 2
    seqs = sorted(
        e.sequence_number for e in t.metadata.current_snapshot().manifest
    )
    assert seqs == [1, 2]


def test_eq_delete_masking_survives_expiry_of_its_commit(spark, tmp_path):
    """THE regression this feature exists for: expire the snapshots that
    committed a data file and an equality delete, keep only the head —
    rows re-inserted AFTER the delete must still survive, and the
    originally-masked rows must stay masked."""
    t = _table(spark, tmp_path)
    t.insert(_rows(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
    t.equality_delete(spark.createDataFrame([("a",)], "name string"))
    t.insert(_rows(spark, [(3, "a", 3.0)]))  # re-insert after the delete
    assert sorted(r["k"] for r in t.read().collect()) == [2, 3]
    from demo_iceberg_permanent_delete_spark.lake.metadata import now_ms

    stats = expire_snapshots(t, now_ms() + 1, retain_last=1)
    assert stats["expired_snapshots"] == 2
    t.refresh()
    # only the head snapshot is left; the delete file is still live in it
    assert len(t.metadata.snapshots) == 1
    assert [e.content for e in t.metadata.current_snapshot().delete_files()] == [2]
    assert sorted(r["k"] for r in t.read().collect()) == [2, 3]


def test_entry_sequence_fallbacks():
    data = ManifestEntry("f", 0, 1, 1, added_snapshot_id=7)
    dele = ManifestEntry("d", 2, 1, 1, added_snapshot_id=9)
    # persisted wins over any fallback
    data.sequence_number = 41
    assert entry_sequence(data, {7: 0}) == 41
    data.sequence_number = None
    # live adder → list ordinal
    assert entry_sequence(data, {7: 5}) == 5
    # unknown adder → fail-closed extremes by kind
    assert entry_sequence(data, {}) == -1
    assert entry_sequence(dele, {}) == 2**31
    assert entry_sequence(data, None) == -1
    assert entry_sequence(dele, None) == 2**31


def test_pre_upgrade_document_floors_last_sequence(spark, tmp_path):
    t = _table(spark, tmp_path)
    t.insert(_rows(spark, [(1, "a", 1.0)]))
    t.insert(_rows(spark, [(2, "b", 2.0)]))
    doc = t.metadata.to_json()
    doc.pop("last_sequence_number")
    doc.pop("next_row_id")
    for s in doc["snapshots"]:
        s.pop("sequence_number")
        s.pop("first_row_id")
    meta = TableMetadata.from_json(json.loads(json.dumps(doc, default=str)))
    # floored at len(snapshots): the next assigned sequence exceeds every
    # snapshot-list ordinal a legacy entry can resolve to
    assert meta.last_sequence_number == 2
    assert meta.next_row_id == 0
    assert all(s.sequence_number is None for s in meta.snapshots)
