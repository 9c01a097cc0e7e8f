"""Managed parquet file writer: DataFrame → named data files + manifest
entries with footer-derived stats.

Spark writes directories of part files; the lake layer needs *named,
individually tracked* files (the reference's model — every file is a row of
the ``.files`` metadata table, notebooks/iceberg_pii_deletion_demo.py:
204-216). So: write to a scratch dir, move the parts into the table's data
dir under UUID names, and harvest per-file record counts + min/max column
stats from the parquet footers (pyarrow, driver-side, metadata-only reads —
no data scan).

Stats feed file-level pruning (SURVEY.md §4) exactly like Iceberg's
manifest-held column bounds.
"""

from __future__ import annotations

import glob
import os
import shutil
import threading
import uuid
from math import ceil
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame

from demo_iceberg_permanent_delete_spark.lake.metadata import (
    CONTENT_DATA,
    CONTENT_POSITION_DELETES,
    ManifestEntry,
)

TARGET_FILE_SIZE_BYTES = 134_217_728  # 128 MiB — the reference's compaction
# target (notebooks/iceberg_pii_deletion_demo.py:428,443)

# Position-delete manifest entries record the DISTINCT data-file paths the
# delete file references when at most this many (Iceberg v3's
# referenced_data_file role, generalized to a small set) — the exact basis
# for delete-file scoping in partition-scoped scans. Beyond the cap the
# list stays empty (unknown): the entry is then always planned, sound. The
# harvest reads ONE string column of the file just written (for DVs that's
# one row per target file — metadata-sized).
_MAX_REFERENCED_FILES = 64
# …and the harvest itself is skipped when the delete file's physical row
# count exceeds this (plain tombstone layouts can run to millions of rows;
# DV files — one row per target file — never come close)
_REFERENCED_HARVEST_MAX_ROWS = 100_000

# Physical column-name harvest cap: above this many top-level columns the
# manifest entry records None (unknown) and initial-default resolution
# falls back to the sequence-watermark rule.
_COLUMNS_HARVEST_MAX = 64


# String bounds are truncated Iceberg-style (write.metadata.metrics default
# truncate(16)): a raw text column's min/max can be kilobytes per file, and
# at 100 TB ≈ 800k files that alone bloats every manifest read. The lower
# bound truncates to a prefix (≤ every value), the upper bound truncates
# and increments its last code point (≥ every value) — pruning stays sound.
_STRING_BOUND_CHARS = 16


class _MicrosTimestampGuard:
    """Reentrant, refcounted session-conf override: holds
    ``spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS`` while any
    writer is inside it, restoring (or unsetting — ``conf.get(key, None)``
    is None when the key was never explicitly set, and leaking the
    override would change what the USER's own ``df.write.parquet()``
    emits) only when the LAST writer leaves. The refcount is what makes
    concurrent driver-thread writes safe: the old per-write set/restore
    raced — thread B could capture thread A's override as "previous",
    or A's restore could strip the conf mid-write for B, silently
    producing INT96 files whose timestamp columns carry no usable footer
    stats. Sessions that already run with TIMESTAMP_MICROS (the tuned
    session) skip the py4j set/restore entirely."""

    def __init__(self) -> None:
        import weakref

        self._lock = threading.Lock()
        # Depth and saved prev are PER SESSION (round-11 advisor finding:
        # process-global state meant a second concurrent SparkSession saw
        # depth>0 and never set the conf on ITS OWN session — silently
        # emitting INT96 statless files, the exact failure the guard
        # exists to prevent). Weak keys: a stopped session's entry GCs.
        self._state: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()

    _KEY = "spark.sql.parquet.outputTimestampType"

    def __call__(self, spark):
        return _MicrosTimestampScope(self, spark)

    def enter(self, spark) -> None:
        with self._lock:
            st = self._state.get(spark)
            if st is None:
                prev = spark.conf.get(self._KEY, None)
                if prev != "TIMESTAMP_MICROS":
                    spark.conf.set(self._KEY, "TIMESTAMP_MICROS")
                st = self._state[spark] = [0, prev]
            st[0] += 1

    def leave(self, spark) -> None:
        with self._lock:
            st = self._state[spark]
            st[0] -= 1
            if st[0] == 0:
                del self._state[spark]
                if st[1] != "TIMESTAMP_MICROS":
                    if st[1] is not None:
                        spark.conf.set(self._KEY, st[1])
                    else:
                        spark.conf.unset(self._KEY)


class _MicrosTimestampScope:
    def __init__(self, guard: _MicrosTimestampGuard, spark) -> None:
        self._guard = guard
        self._spark = spark

    def __enter__(self):
        self._guard.enter(self._spark)
        return self

    def __exit__(self, *exc):
        self._guard.leave(self._spark)
        return False


_micros_timestamps = _MicrosTimestampGuard()


def _truncate_lower(s: str) -> str:
    return s[:_STRING_BOUND_CHARS]


def _truncate_upper(s: str) -> str:
    if len(s) <= _STRING_BOUND_CHARS:
        return s
    p = s[:_STRING_BOUND_CHARS]
    for i in range(len(p) - 1, -1, -1):
        c = ord(p[i])
        if c < 0x10FFFF:
            nxt = c + 1
            if 0xD800 <= nxt <= 0xDFFF:  # never emit lone surrogates
                nxt = 0xE000
            return p[:i] + chr(nxt)
    return s  # every char is U+10FFFF — cannot round up, keep exact


def _raw_decimal_bounds(stats):
    """Decode INT32/INT64-backed DECIMAL column statistics from the raw
    unscaled values: ``Decimal(raw).scaleb(-scale)``. FLBA decimals don't
    land here (pyarrow decodes those natively); returns None for anything
    that isn't an int-backed decimal."""
    import json as _json
    from decimal import Decimal

    try:
        lt = stats.logical_type
        if lt is None or lt.type != "DECIMAL":
            return None
        scale = int(_json.loads(lt.to_json())["scale"])
        lo_raw, hi_raw = stats.min_raw, stats.max_raw
        if not isinstance(lo_raw, int) or not isinstance(hi_raw, int):
            return None
        return Decimal(lo_raw).scaleb(-scale), Decimal(hi_raw).scaleb(-scale)
    except Exception:
        return None


def _footer_stats(
    path: str,
) -> tuple[int, dict[str, Any], dict[str, Any], dict[str, int]]:
    """Record count, column min/max, and per-column null counts from the
    parquet footer (no data read). A column whose null count is missing in
    ANY row group is omitted from the null-count map (pruning must stay
    conservative on partial stats). String bounds are truncated (sound:
    lower prefix / upper rounded up — see _truncate_upper)."""
    f = pq.ParquetFile(path)
    meta = f.metadata
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    null_gaps: set[str] = set()
    for rg in range(meta.num_row_groups):
        group = meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            stats = col.statistics
            if stats is None:
                null_gaps.add(name)
                continue
            if stats.null_count is None:
                null_gaps.add(name)
            else:
                nulls[name] = nulls.get(name, 0) + stats.null_count
            if not stats.has_min_max:
                continue
            try:
                lo, hi = stats.min, stats.max
            except Exception:
                # pyarrow can't decode INT32/INT64-backed DECIMAL
                # statistics (ArrowNotImplementedError) though the raw
                # unscaled ints are right there — decode them; anything
                # else undecodable is statless rather than failing the
                # whole write
                bounds = _raw_decimal_bounds(stats)
                if bounds is None:
                    continue
                lo, hi = bounds
            if isinstance(lo, bytes) or isinstance(hi, bytes):
                continue  # undecoded byte stats are not comparable
            if name not in mins or lo < mins[name]:
                mins[name] = lo
            if name not in maxs or hi > maxs[name]:
                maxs[name] = hi
    for name in null_gaps:
        nulls.pop(name, None)
    # materialized row-lineage columns are metadata, never predicate
    # targets — keeping their bounds out of the manifest stops them
    # crowding the delta_bounds 32-column summary cap
    for name in ("_row_id", "_last_updated_sequence_number"):
        mins.pop(name, None)
        maxs.pop(name, None)
        nulls.pop(name, None)
    for name, v in list(mins.items()):
        if isinstance(v, str):
            mins[name] = _truncate_lower(v)
    for name, v in list(maxs.items()):
        if isinstance(v, str):
            maxs[name] = _truncate_upper(v)
    return meta.num_rows, mins, maxs, nulls


def write_data_files(
    df: DataFrame,
    target_dir: str,
    *,
    content: int = CONTENT_DATA,
    target_file_size_bytes: int | None = None,
    prefix: str = "data",
    write_options: dict[str, str] | None = None,
    record_count_from: str | None = None,
) -> list[ManifestEntry]:
    """Write ``df`` as managed parquet files under ``target_dir``.

    If ``target_file_size_bytes`` is given, repartition so output files land
    near that size (estimated from the first write — good enough for the
    compaction contract; Iceberg's own binpacking is similarly estimate-based).
    ``write_options`` are parquet writer options (e.g. per-column bloom
    filters: ``parquet.bloom.filter.enabled#<col>``). Returns one
    ManifestEntry per file.

    ``record_count_from`` names a bigint column whose per-file SUM becomes
    the manifest ``record_count`` instead of the parquet row count — the
    deletion-vector layout uses it so a DV file's record_count is the
    number of deleted positions it encodes (Iceberg v3 semantics: a DV's
    cardinality, not its physical row count). The sum is read back from
    the written file's single column — DV files are O(affected data
    files) rows, so this is a tiny metadata-sized read.
    """
    os.makedirs(target_dir, exist_ok=True)
    scratch = os.path.join(target_dir, f"_tmp-{uuid.uuid4().hex}")

    def _write(frame: DataFrame) -> None:
        # Spark's default parquet timestamp is INT96 (Hive-era compat),
        # which carries NO usable footer statistics — every timestamp
        # column was invisible to min/max pruning, manifest bounds and
        # aggregate pushdown. Write TIMESTAMP_MICROS (INT64) instead,
        # Iceberg's own physical type; readers handle both, so tables
        # with pre-switch INT96 files just keep their statless entries.
        with _micros_timestamps(frame.sparkSession):
            w = frame.write.mode("overwrite")
            for k, v in (write_options or {}).items():
                w = w.option(k, v)
            w.parquet(scratch)

    _write(df)
    parts = sorted(glob.glob(os.path.join(scratch, "part-*.parquet")))

    if target_file_size_bytes and parts:
        total = sum(os.path.getsize(p) for p in parts)
        want = max(1, ceil(total / target_file_size_bytes))
        if want != len(parts):
            # Resize by repacking the files just WRITTEN — never by
            # re-running the input plan: ``df`` may be an arbitrary DAG
            # (a delete-merged scan, a join) whose recomputation doubles
            # the dominant cost of a rewrite. Reading back local columnar
            # parquet is a fraction of that, and at cluster scale the
            # first write's task outputs already sit near the target
            # (maxPartitionBytes-sized scan splits), so this pass rarely
            # fires at all.
            repack = os.path.join(target_dir, f"_tmp-{uuid.uuid4().hex}")
            w = (
                # explicit schema: skips the footer-inference job a bare
                # read.parquet would run per resize (one per small commit)
                df.sparkSession.read.schema(df.schema)
                .parquet(scratch)
                .repartition(want)
                .write.mode("overwrite")
            )
            for k, v in (write_options or {}).items():
                w = w.option(k, v)
            with _micros_timestamps(df.sparkSession):
                w.parquet(repack)
            shutil.rmtree(scratch, ignore_errors=True)
            scratch = repack
            parts = sorted(glob.glob(os.path.join(scratch, "part-*.parquet")))

    entries: list[ManifestEntry] = []
    for part in parts:
        final = os.path.join(target_dir, f"{prefix}-{uuid.uuid4().hex}.parquet")
        shutil.move(part, final)
        n_rows, mins, maxs, nulls = _footer_stats(final)
        if n_rows == 0:
            os.remove(final)
            continue
        # referenced-path harvest (content=1 only): the DV record count is
        # SEMANTIC and read unprotected (a failure must fail the write),
        # while the harvest is advisory and degrades to [] on any error
        # (review catch: one shared try made a harvest-only failure abort
        # a DV write that used to succeed). Skipped for row-heavy plain
        # tombstone files — reading a multi-million-row string column back
        # on the write path costs real time; DV files (one row per TARGET
        # file) are the layout that matters, and a skipped harvest just
        # leaves the entry always planned (sound).
        referenced: list[str] = []
        want_refs = (
            content == CONTENT_POSITION_DELETES
            and n_rows <= _REFERENCED_HARVEST_MAX_ROWS
        )
        if record_count_from is not None:
            col = pq.read_table(final, columns=[record_count_from])
            n_rows = sum(v.as_py() or 0 for v in col.column(0))
        if want_refs:
            try:
                import pyarrow.compute as pc

                uniq = pc.unique(
                    pq.read_table(final, columns=["file_path"]).column(0)
                )
                if len(uniq) <= _MAX_REFERENCED_FILES:
                    referenced = sorted(
                        v for v in uniq.to_pylist() if v is not None
                    )
            except Exception:
                referenced = []  # unknown → the entry is always planned
        # physical column-name harvest (initial-default resolution uses
        # presence, like Iceberg's field ids): footer-only, capped so a
        # very wide schema doesn't bloat every manifest row — None falls
        # back to the sequence-watermark rule
        try:
            names = [f.name for f in pq.read_schema(final)]
            phys_cols = names if len(names) <= _COLUMNS_HARVEST_MAX else None
        except Exception:
            phys_cols = None
        entries.append(
            ManifestEntry(
                file_path=final,
                content=content,
                record_count=n_rows,
                file_size_in_bytes=os.path.getsize(final),
                min_values={k: _jsonable(v) for k, v in mins.items()},
                max_values={k: _jsonable(v) for k, v in maxs.items()},
                null_counts=dict(nulls),
                referenced_files=referenced,
                columns=phys_cols,
            )
        )
    shutil.rmtree(scratch, ignore_errors=True)
    return entries


def write_arrow_file(
    table, target_dir: str, *, content: int = CONTENT_DATA, prefix: str = "data"
) -> list[ManifestEntry]:
    """Write one pyarrow Table as ONE managed parquet file, driver-side —
    no Spark job. For metadata-sized sidecar files (the streaming
    upsert's equality-delete key file: O(batch-keys) rows) where a Spark
    write costs a job launch per micro-batch. Footer stats are harvested
    exactly like write_data_files'. Returns [] for empty input (parity
    with the zero-row file drop there)."""
    if table.num_rows == 0:
        return []
    os.makedirs(target_dir, exist_ok=True)
    final = os.path.join(target_dir, f"{prefix}-{uuid.uuid4().hex}.parquet")
    pq.write_table(table, final)
    n_rows, mins, maxs, nulls = _footer_stats(final)
    names = table.schema.names
    return [
        ManifestEntry(
            file_path=final,
            content=content,
            record_count=n_rows,
            file_size_in_bytes=os.path.getsize(final),
            min_values={k: _jsonable(v) for k, v in mins.items()},
            max_values={k: _jsonable(v) for k, v in maxs.items()},
            null_counts=dict(nulls),
            referenced_files=[],
            columns=list(names) if len(names) <= _COLUMNS_HARVEST_MAX else None,
        )
    ]


def _jsonable(v: Any) -> Any:
    """Stats values must round-trip through JSON (datetime → isoformat).

    Decimals are TAGGED (``{"dec": "9.75"}``), never bare strings: the
    schema-blind pruner compares str-vs-str bounds lexicographically
    (correct for string columns, whose bounds it truncates char-wise),
    and a bare "9.75" would make a quoted decimal predicate mis-prune
    ("10.50" < "9.75" lexicographically — review finding). Every
    bounds consumer treats an uncomparable dict as unknown (pruning
    keeps the file, delta folds skip the column); the type-aware
    aggregate fast path decodes the tag exactly."""
    try:
        import datetime as dt

        if isinstance(v, (dt.datetime, dt.date)):
            return v.isoformat()
        import decimal

        if isinstance(v, decimal.Decimal):
            return {"dec": str(v)}
    except Exception:
        pass
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    return str(v)
