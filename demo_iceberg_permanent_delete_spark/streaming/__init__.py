"""Structured Streaming surface (SURVEY.md §7 Phase 5).

The reference is batch-only (§2.8: no streams/watermarks/state); this
package provides the streaming counterparts a production pipeline needs:
file-source ingestion, watermarked tumbling/session windows, and streaming
dedup — each runnable in bounded ``availableNow`` mode so the same code is
testable offline and deployable as a continuous job.
"""

from demo_iceberg_permanent_delete_spark.streaming.pipelines import (
    run_available_now,
    session_window_stream,
    streaming_dedup,
    tumbling_count_stream,
)

__all__ = [
    "run_available_now",
    "session_window_stream",
    "streaming_dedup",
    "tumbling_count_stream",
]
