"""expire_snapshots retain_last (Iceberg procedure option) and truncated
string bounds in manifest stats (Iceberg's truncate(16) metrics mode —
kilobyte text values must not land verbatim in every manifest entry)."""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import one_part
from demo_iceberg_permanent_delete_spark.lake import Catalog, SnapshotNotFoundError
from demo_iceberg_permanent_delete_spark.lake.datafiles import (
    _STRING_BOUND_CHARS,
    _truncate_upper,
)
from demo_iceberg_permanent_delete_spark.lake.pruning import candidate_files

DDL = "k bigint, name string"
FUTURE = dt.datetime(2100, 1, 1)


@pytest.fixture()
def table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    return cat.create_table("default.t", DDL)


def test_retain_last_protects_recent_ancestors(spark, table):
    snaps = []
    for i in range(4):
        table.insert(one_part(spark, [(i, f"n{i}")], DDL))
        snaps.append(table.metadata.current_snapshot_id)

    stats = table.expire_snapshots(FUTURE, retain_last=3)
    assert stats["expired_snapshots"] == 1
    kept = {s.snapshot_id for s in table.metadata.snapshots}
    assert kept == set(snaps[1:])
    # travel works within the retained window, raises outside it
    assert table.read(snapshot_id=snaps[1]).count() == 2
    with pytest.raises(SnapshotNotFoundError):
        table.read(snapshot_id=snaps[0])

    # default retain_last=1 keeps only the current snapshot
    table.expire_snapshots(FUTURE)
    assert [s.snapshot_id for s in table.metadata.snapshots] == [snaps[3]]
    assert table.read().count() == 4


def test_string_bounds_truncated_and_sound(spark, table):
    long_b = "b" * 40
    rows = [(1, "a" * 50), (2, long_b)]
    table.insert(one_part(spark, rows, DDL))
    [entry] = table.metadata.current_snapshot().data_files()
    lo, hi = entry.min_values["name"], entry.max_values["name"]
    assert len(lo) <= _STRING_BOUND_CHARS
    assert len(hi) <= _STRING_BOUND_CHARS
    assert lo <= "a" * 50 and hi >= long_b  # sound bounds

    entries = [entry]
    # equality on the full long literal must keep the file...
    assert len(candidate_files(entries, f"name = '{long_b}'")) == 1
    # ...and the scan returns the row through the pruned path
    assert table.scan(f"name = '{long_b}'").count() == 1
    # a literal above the rounded-up upper bound prunes
    assert candidate_files(entries, "name = 'c'") == []


def test_truncate_upper_rounding_edges():
    assert _truncate_upper("short") == "short"
    t = _truncate_upper("x" * 20)
    assert len(t) == _STRING_BOUND_CHARS and t == "x" * 15 + "y"
    # last char at a surrogate boundary skips the surrogate range
    s = "a" * 15 + chr(0xD7FF) + "tail"
    assert _truncate_upper(s) == "a" * 15 + chr(0xE000)
    # all-max-codepoint prefix cannot round up — falls back to exact
    m = chr(0x10FFFF) * 20
    assert _truncate_upper(m) == m
