"""Streaming semantics that batch SQL cannot express: watermark-driven
state eviction and late-data dropping across micro-batches
(maxFilesPerTrigger=1 forces one file per batch, so the watermark advances
between files).

Empirical Spark semantics these tests encode (probed on 4.1):
- the late-row filter uses the watermark with a one-batch propagation lag,
  so a late row is dropped once it arrives ≥2 batches after the batch that
  advanced the watermark past it;
- aggregation state is evicted (and append-mode rows emitted) at the end
  of the batch in which the watermark passes the window end.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from tests.conftest import one_part
from demo_iceberg_permanent_delete_spark.streaming.pipelines import (
    read_event_stream,
    run_available_now,
    sliding_count_stream,
    stateful_session_stream,
    streaming_dedup,
    tumbling_count_stream,
)

BASE = dt.datetime(2024, 1, 1, 10, 0, 0)


def _ns(minute: float) -> int:
    return int((BASE + dt.timedelta(minutes=minute)).timestamp() * 1_000_000_000)


def _write_events_file(spark, path: str, rows: list[tuple], mtime: float) -> None:
    # (event_id, minutes_after_base, user_id, event_type, value)
    df = one_part(
        spark,
        [
            (eid, _ns(m), uid, etype, val, "{}")
            for (eid, m, uid, etype, val) in rows
        ],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(path)
    # The file source orders batches by modification time — pin it so batch
    # boundaries are deterministic.
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (mtime, mtime))


@pytest.fixture
def three_batch_dir(spark, tmp_path):
    """Batch 1: events up to minute 30 → watermark advances to minute 20.
    Batch 2: one on-time event (minute 31) → watermark 21, and the batch-1
    watermark becomes effective for late filtering. Batch 3: a duplicate of
    event 1 and a fresh event at minute 0 — both now behind the effective
    watermark — plus an on-time event at minute 60."""
    d = str(tmp_path / "stream_src")
    os.makedirs(d, exist_ok=True)
    now = 1_700_000_000.0
    _write_events_file(
        spark,
        os.path.join(d, "batch1.parquet"),
        [
            (1, 0, 100, "click", 1.0),
            (2, 5, 100, "click", 1.0),
            (3, 30, 200, "view", 2.0),
        ],
        mtime=now,
    )
    _write_events_file(
        spark,
        os.path.join(d, "batch2.parquet"),
        [
            (4, 31, 200, "view", 2.0),
        ],
        mtime=now + 60,
    )
    _write_events_file(
        spark,
        os.path.join(d, "batch3.parquet"),
        [
            (1, 0, 100, "click", 1.0),   # duplicate of event 1, late
            (9, 0, 300, "click", 7.0),   # fresh but behind the watermark
            (5, 60, 400, "view", 1.0),   # on time
        ],
        mtime=now + 120,
    )
    return os.path.join(d, "*", "*.parquet")


def test_streaming_dedup_drops_duplicates_and_late_rows(spark, three_batch_dir):
    stream = read_event_stream(spark, three_batch_dir, max_files_per_trigger=1)
    out = run_available_now(streaming_dedup(stream), output_mode="append")
    ids = sorted(r["event_id"] for r in out.select("event_id").collect())
    # The duplicate (1) is dropped by dedup state; the late fresh event (9)
    # is dropped by the watermark filter; everything on time survives.
    assert ids == [1, 2, 3, 4, 5]


def test_append_mode_window_finalizes_only_closed_windows(spark, three_batch_dir):
    stream = read_event_stream(spark, three_batch_dir, max_files_per_trigger=1)
    out = run_available_now(tumbling_count_stream(stream), output_mode="append")
    rows = {
        (r["window_start"].minute % 60, r["window_start"].hour, r["event_type"]): r[
            "n_events"
        ]
        for r in out.collect()
    }
    # Final watermark = 10:50 (60min - 10min delay): windows [10:00,10:10)
    # and [10:30,10:40) are closed and emitted exactly once; the late
    # arrivals (dup 1, fresh 9, both minute 0) were dropped, so the click
    # window still counts 2. Event 5's window [11:00,11:10) is NOT closed
    # (watermark 10:50) and must not appear.
    assert rows == {(0, 10, "click"): 2, (30, 10, "view"): 2}


def test_sliding_windows_emit_two_windows_per_event(spark, three_batch_dir):
    stream = read_event_stream(spark, three_batch_dir, max_files_per_trigger=1)
    out = run_available_now(sliding_count_stream(stream), output_mode="append")
    rows = {
        ((r["window_start"].hour, r["window_start"].minute), r["event_type"]): r[
            "n_events"
        ]
        for r in out.collect()
    }
    # Every on-time event belongs to duration/slide = 2 hopping windows.
    # Final watermark = 10:50, so only windows ending <= 10:50 are emitted:
    # clicks at 10:00/10:05 cover starts 9:55, 10:00 (x2), 10:05; views at
    # 10:30/10:31 cover starts 10:25 (x2), 10:30 (x2). Event 5 (11:00) has
    # no closed window, and the batch-3 late arrivals are dropped before
    # they can resurrect the already-emitted 10:00-area windows.
    assert rows == {
        ((9, 55), "click"): 1,
        ((10, 0), "click"): 2,
        ((10, 5), "click"): 1,
        ((10, 25), "view"): 2,
        ((10, 30), "view"): 2,
    }


def test_stateful_sessionizer_emits_on_event_time_timeout(spark, three_batch_dir):
    stream = read_event_stream(spark, three_batch_dir, max_files_per_trigger=1)
    out = run_available_now(stateful_session_stream(stream), output_mode="append")
    rows = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in out.collect()
    )
    # Final watermark = 10:50 (event 5 at minute 60, minus 10min delay; the
    # availableNow run ends with a no-data batch that fires pending
    # timeouts). User 100's session (minutes 0,5 → timeout 10:15) and user
    # 200's (minutes 30,31 spanning two batches → timeout 10:41) are closed
    # and emitted exactly once. User 400 (minute 60 → timeout 11:10 > wm)
    # stays open and must NOT appear; user 300's sole event arrived behind
    # the watermark and never created state.
    assert rows == [
        (100, BASE, BASE + dt.timedelta(minutes=15), 2),
        (
            200,
            BASE + dt.timedelta(minutes=30),
            BASE + dt.timedelta(minutes=41),
            2,
        ),
    ]


def test_stream_into_lake_append_and_idempotent_replay(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake import Catalog
    from demo_iceberg_permanent_delete_spark.streaming.pipelines import (
        LAST_BATCH_PROP,
        stream_into_lake,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_events_file(
        spark, os.path.join(src, "b0"), [(1, 0, 10, "view", 1.0), (2, 1, 11, "click", 2.0)], 1000
    )
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.events_ingest",
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    glob = os.path.join(src, "*", "*.parquet")
    stream = read_event_stream(spark, glob)
    ckpt = str(tmp_path / "ckpt")

    stream_into_lake(stream, t, checkpoint=ckpt)
    t = cat.load_table("default.events_ingest")
    assert t.read().count() == 2
    assert t.properties[LAST_BATCH_PROP].endswith(":0")
    n_snaps = len(t.metadata.snapshots)

    # re-run with the same checkpoint and no new data: no new snapshot
    stream_into_lake(read_event_stream(spark, glob), t, checkpoint=ckpt)
    t = cat.load_table("default.events_ingest")
    assert t.read().count() == 2
    assert len(t.metadata.snapshots) == n_snaps

    # new source file + same checkpoint: exactly the new rows land
    _write_events_file(
        spark, os.path.join(src, "b1"), [(3, 2, 12, "view", 3.0)], 2000
    )
    stream_into_lake(read_event_stream(spark, glob), t, checkpoint=ckpt)
    t = cat.load_table("default.events_ingest")
    assert t.read().count() == 3
    assert t.properties[LAST_BATCH_PROP].endswith(":1")

    # a replayed batch id is skipped even if the sink is called directly
    # (the crash-recovery path foreachBatch guarantees)
    batch = spark.createDataFrame(
        [(99, _ns(9), 99, "dup", 9.9, "{}")],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    from demo_iceberg_permanent_delete_spark.streaming import pipelines as P

    t2 = cat.load_table("default.events_ingest")
    last = int(t2.properties[P.LAST_BATCH_PROP].rpartition(":")[2])
    # simulate the foreachBatch closure replaying the last batch
    t2.metadata.properties  # touch
    before = t2.read().count()
    def replay():
        tt = t2.refresh()
        if int(tt.properties[P.LAST_BATCH_PROP].rpartition(":")[2]) >= last:
            return
        tt.insert(batch)
    replay()
    assert cat.load_table("default.events_ingest").read().count() == before


def test_stream_into_lake_upsert_mode(spark, tmp_path):
    from demo_iceberg_permanent_delete_spark.lake import Catalog
    from demo_iceberg_permanent_delete_spark.streaming.pipelines import stream_into_lake

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_events_file(
        spark, os.path.join(src, "b0"), [(1, 0, 10, "view", 1.0), (2, 1, 11, "click", 2.0)], 1000
    )
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.events_upsert",
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    glob = os.path.join(src, "*", "*.parquet")
    ckpt = str(tmp_path / "ckpt")
    stream_into_lake(read_event_stream(spark, glob), t, mode="upsert", merge_keys=["event_id"], checkpoint=ckpt)
    t = cat.load_table("default.events_upsert")
    assert t.read().count() == 2

    # second batch updates event 2 and inserts event 3
    _write_events_file(
        spark, os.path.join(src, "b1"), [(2, 5, 11, "click", 20.0), (3, 6, 12, "view", 3.0)], 2000
    )
    stream_into_lake(read_event_stream(spark, glob), t, mode="upsert", merge_keys=["event_id"], checkpoint=ckpt)
    t = cat.load_table("default.events_upsert")
    rows = {r["event_id"]: r["value"] for r in t.read().collect()}
    assert rows == {1: 1.0, 2: 20.0, 3: 3.0}


def test_stream_into_lake_upsert_dedups_batch(spark, tmp_path):
    """A micro-batch carrying several updates for one key must not
    poison-pill the stream (MERGE cardinality) — latest (by order_col)
    wins within the batch."""
    from demo_iceberg_permanent_delete_spark.lake import Catalog
    from demo_iceberg_permanent_delete_spark.streaming.pipelines import stream_into_lake

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_events_file(
        spark,
        os.path.join(src, "b0"),
        [(1, 0, 10, "v1", 1.0), (1, 5, 10, "v2", 2.0), (2, 1, 11, "x", 9.0)],
        1000,
    )
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.ded",
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    stream_into_lake(
        read_event_stream(spark, os.path.join(src, "*", "*.parquet")),
        t,
        mode="upsert",
        merge_keys=["event_id"],
        order_col="ts",
        checkpoint=str(tmp_path / "ck"),
    )
    rows = {r["event_id"]: r["event_type"] for r in cat.load_table("default.ded").read().collect()}
    assert rows == {1: "v2", 2: "x"}  # latest ts won for the duplicated key


def test_stream_into_lake_new_checkpoint_does_not_drop_data(spark, tmp_path):
    """Batch-id markers are checkpoint-scoped: a NEW checkpoint reprocesses
    the source (standard Spark semantics, duplicates possible) — a stale
    marker from a previous run must never silently swallow new data."""
    from demo_iceberg_permanent_delete_spark.lake import Catalog
    from demo_iceberg_permanent_delete_spark.streaming.pipelines import stream_into_lake

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_events_file(spark, os.path.join(src, "b0"), [(1, 0, 10, "a", 1.0)], 1000)
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.create_namespace("default")
    t = cat.create_table(
        "default.ckscope",
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    glob = os.path.join(src, "*", "*.parquet")
    stream_into_lake(read_event_stream(spark, glob), t, checkpoint=str(tmp_path / "ck1"))
    assert cat.load_table("default.ckscope").read().count() == 1

    _write_events_file(spark, os.path.join(src, "b1"), [(2, 1, 11, "b", 2.0)], 2000)
    # fresh checkpoint → batch 0 again; the run-scoped marker must let it in
    t = cat.load_table("default.ckscope")
    stream_into_lake(read_event_stream(spark, glob), t, checkpoint=str(tmp_path / "ck2"))
    got = [r["event_id"] for r in cat.load_table("default.ckscope").read().collect()]
    assert 2 in got, "new data must land under a new checkpoint"
    assert len(got) == 3  # at-least-once: row 1 reprocessed (documented)


def test_interval_join_emits_pairs_and_bounds_state(spark, three_batch_dir):
    from demo_iceberg_permanent_delete_spark.streaming.pipelines import (
        interval_join_stream,
    )

    # purchases stream: treat 'click' as the anchor side here; activity =
    # everything. Batch-1 anchors at minutes 0/5 pair with same-user
    # activity within (t, t+10min]; the batch-3 late event (user 100,
    # minute 0) is behind the watermark and must NOT create new pairs.
    stream = lambda: read_event_stream(  # noqa: E731
        spark, three_batch_dir, max_files_per_trigger=1
    )
    out = run_available_now(
        interval_join_stream(
            stream().filter("event_type = 'click'"), stream()
        ),
        output_mode="append",
    )
    pairs = sorted(
        (r["purchase_id"], r["click_id"]) for r in out.collect()
    )
    # user 100: click@0 (id 1) pairs with click@5 (id 2). Inner join emits
    # per ARRIVAL: the batch-3 duplicate of id 1 slips past the late-row
    # filter (one-batch watermark propagation lag, module docstring) while
    # the right row's state is still unevicted, so the pair re-emits once —
    # and only once; the late fresh event (9, user 300) creates nothing.
    # Exactly-once pairs on late-heavy streams need upstream dedup
    # (streaming_dedup) — the composition this test pins down.
    assert pairs == [(1, 2), (1, 2)]
    assert not any(r["user_id"] == 300 for r in out.collect())
