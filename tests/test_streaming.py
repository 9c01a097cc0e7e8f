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

from demo_iceberg_permanent_delete_spark.streaming.pipelines import (
    read_event_stream,
    run_available_now,
    stateful_session_stream,
    streaming_dedup,
    tumbling_count_stream,
)

BASE = dt.datetime(2024, 1, 1, 10, 0, 0)


def _ns(minute: float) -> int:
    return int((BASE + dt.timedelta(minutes=minute)).timestamp() * 1_000_000_000)


def _write_events_file(spark, path: str, rows: list[tuple], mtime: float) -> None:
    # (event_id, minutes_after_base, user_id, event_type, value)
    df = spark.createDataFrame(
        [
            (eid, _ns(m), uid, etype, val, "{}")
            for (eid, m, uid, etype, val) in rows
        ],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
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
