"""Stats-driven join planning over lake tables (SURVEY.md §4; the loop
Iceberg closes by feeding Puffin/manifest stats to Catalyst's CBO —
reference delegates this wholesale, iceberg_pii_deletion_demo.py relies on
`spark.sql.autoBroadcastJoinThreshold` against Iceberg-reported sizes).

Catalyst sizes a parquet relation by its raw file bytes. For a lake scan
that estimate is wrong in both directions: it can't see manifest pruning
(a `WHERE day = X` scan reads one file of ten thousand) and it can't see
MOR tombstones (a table 90% deleted still "weighs" its full byte size).
Both facts live in THIS layer's metadata — so the broadcast decision is
made here, from:

- **manifest byte/row totals** (always available, exact): live rows =
  data record_count − position-delete record_count (DV cardinality
  semantics), avg row width = bytes / records, optionally scoped to the
  predicate's candidate files via the same sound pruning the scan uses;
- **ANALYZE NDV** (`.statistics`, when tied to the current snapshot):
  join-output cardinality via the System-R containment estimate
  |L ⋈ R| ≈ rows_L · rows_R / max(ndv_L(k), ndv_R(k)), and per-side key
  multiplicity rows/ndv as a skew signal (operators/skew.py holds the
  mitigations).

`plan_join` wraps the chosen side in `F.broadcast(...)` — an explicit,
tested hint instead of hoping Catalyst's byte heuristic lands right.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.lake.metadata import (
    CONTENT_EQUALITY_DELETES,
    CONTENT_POSITION_DELETES,
)

# Catalyst's default autoBroadcastJoinThreshold (10 MiB) — used when the
# session conf is disabled (-1) or unparseable. A deliberate floor, not a
# mirror: the whole point is deciding from better information than the
# session default.
DEFAULT_BROADCAST_THRESHOLD = 10 * 1024 * 1024

# rows/ndv above this flags the key as skew-prone (one key value maps to
# >64 rows on average ⇒ hottest keys are far worse; at 100 TB that's a
# straggler task unless salted or broadcast).
SKEW_MULTIPLICITY = 64

# salt count for the automatic skew fallback — each hot key scatters over
# this many reducers; the build side's shuffle volume multiplies by it.
SALT_FACTOR = 8


def eq_masked_rows_estimate(table, snap) -> int | None:
    """Data rows masked by the snapshot's equality-delete files, derived
    from fresh ANALYZE statistics (round-5 brief item 2); None when the
    statistics are stale (callers keep the conservative upper-bound
    behavior — never under-estimate a scan).

    An eq-delete file's ``record_count`` is its KEY-row count, not the
    affected-row count — from manifests alone the masked rows are
    unknowable. The round-4 verdict proposed the System-R containment
    estimate ``eq_rows × rows/NDV(key)``; in THIS engine that formula is
    dominated by an exact derivation and can badly under-estimate, so we
    use the exact one. Reason: statistics stay fresh only across appends
    (the in-commit sketch union, lake/table.py) — any delete commit
    stales them — so fresh stats always POST-date every live eq-delete
    file, meaning ``statistics.row_count`` already counted the live rows
    with those eq-deletes applied (plus exact append increments since).
    The masked total is then exactly ``manifest_live − row_count``, while
    NDV computed over post-delete rows no longer contains the deleted
    keys at their true multiplicity (delete 50 single-row keys from a
    table with 5 fat keys and the containment estimate masks the whole
    table). Iceberg's real Puffin stats can pre-date the delete, where
    the containment formula is the right tool; ours cannot.
    """
    stats = table.metadata.statistics or {}
    if (
        stats.get("snapshot_id") != snap.snapshot_id
        or "row_count" not in stats
    ):
        return None
    all_live = _snapshot_live_rows(snap)
    return min(all_live, max(0, all_live - int(stats["row_count"])))


def _snapshot_live_rows(snap) -> int:
    """Table-wide manifest live rows: data records minus position-delete
    cardinality (eq deletes excluded — their affected rows are not in
    manifests)."""
    return max(
        0,
        sum(e.record_count for e in snap.data_files())
        - sum(
            e.record_count
            for e in snap.delete_files()
            if e.content == CONTENT_POSITION_DELETES
        ),
    )


def scan_estimate(table, predicate: str | None = None) -> dict[str, Any]:
    """Size/row estimate for a (possibly predicate-scoped) scan of the
    current snapshot, from manifests alone — no data read.

    Returns ``{"rows", "bytes", "ndv", "stats_fresh", "eq_delete_files",
    "rows_exact_upper_bound"}`` where ``rows`` is
    the live-row estimate (data records minus position-delete
    cardinality, floored at 0; predicate-scoped estimates prorate the
    table-wide tombstone count by the candidates' row share, since
    bin-packed delete files with truncated UUID path stats can't be
    attributed per-file from manifests), ``bytes`` scales the live
    fraction by the candidate files' byte total, and ``ndv`` is the
    ANALYZE column→NDV map when the recorded statistics are tied to the
    current snapshot (stale stats are ignored, matching the
    `.statistics` staleness flag).
    """
    snap = table.metadata.current_snapshot()
    if snap is None:
        return {
            "rows": 0,
            "bytes": 0,
            "ndv": {},
            "stats_fresh": False,
            "eq_delete_files": 0,
            "eq_masked_rows_est": 0,
            "rows_exact_upper_bound": False,
        }
    data = snap.data_files()
    if predicate is not None:
        from demo_iceberg_permanent_delete_spark.lake.pruning import (
            candidate_files,
        )

        data = candidate_files(
            data,
            predicate,
            table._partition_fields,
            aliases=table.metadata.renames,
        )
    total_rows = sum(e.record_count for e in data)
    total_bytes = sum(e.file_size_in_bytes for e in data)
    deleted = sum(
        e.record_count
        for e in snap.delete_files()
        if e.content == CONTENT_POSITION_DELETES
    )
    if predicate is not None:
        # Manifests can't attribute tombstones to candidate files (delete
        # files are bin-packed across targets and path stats are
        # truncated UUIDs — no usable range), so prorate the table-wide
        # tombstone count by the candidates' row share (uniform-deletes
        # assumption, the standard selectivity estimate). Without this, a
        # narrow predicate minus ALL table deletes collapses to 0 rows
        # and flips plan_join to a catastrophic broadcast.
        all_rows = sum(
            e.record_count for e in snap.data_files()
        )
        deleted = round(deleted * total_rows / all_rows) if all_rows else 0
    live_rows = max(0, total_rows - deleted)
    stats = table.metadata.statistics or {}
    fresh = stats.get("snapshot_id") == snap.snapshot_id
    ndv_map = (
        {c: s["ndv"] for c, s in stats.get("columns", {}).items()}
        if fresh
        else {}
    )
    # Equality deletes (content=2) mask a number of data rows unknowable
    # from manifests alone (the delete file's record_count is its KEY-row
    # count). With FRESH statistics the table-wide masked total is exact
    # (eq_masked_rows_estimate — row_count counted live rows post-delete)
    # and is subtracted, prorated by the candidates' live-row share when
    # predicate-scoped (the same uniform assumption as the tombstone
    # proration above); otherwise their presence is surfaced so callers
    # know `rows`/`bytes` are upper bounds — over-estimating is the safe
    # direction (it under-broadcasts, never over-broadcasts).
    eq_delete_files = sum(
        1
        for e in snap.delete_files()
        if e.content == CONTENT_EQUALITY_DELETES
    )
    eq_masked = None
    if eq_delete_files:
        table_masked = eq_masked_rows_estimate(table, snap)
        if table_masked is not None:
            all_live = _snapshot_live_rows(snap)
            frac = (table_masked / all_live) if all_live else 0.0
            eq_masked = int(round(live_rows * frac))
            live_rows = max(0, live_rows - eq_masked)
    else:
        eq_masked = 0
    live_frac = (live_rows / total_rows) if total_rows else 0.0
    return {
        "rows": live_rows,
        "bytes": int(total_bytes * live_frac),
        "ndv": ndv_map,
        "stats_fresh": fresh,
        "eq_delete_files": eq_delete_files,
        "eq_masked_rows_est": eq_masked,
        "rows_exact_upper_bound": eq_delete_files > 0 and eq_masked is None,
    }


def _broadcast_threshold(spark, override: int | None) -> int:
    if override is not None:
        return override
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    mult = 1
    low = raw.strip().lower()
    # Spark's byteString conf parser accepts both spellings: 1k/1kb,
    # 1m/1mb, 1g/1gb, 1t/1tb, plain bytes, or a trailing 'b'. Longest
    # suffix first so '10mb' doesn't strip only the 'b'.
    for suffix, m in (
        ("tb", 1024**4), ("gb", 1024**3), ("mb", 1024**2), ("kb", 1024),
        ("t", 1024**4), ("g", 1024**3), ("m", 1024**2), ("k", 1024),
        ("b", 1),
    ):
        if low.endswith(suffix):
            low = low[: -len(suffix)]
            mult = m
            break
    try:
        val = int(low) * mult
    except ValueError:
        return DEFAULT_BROADCAST_THRESHOLD
    # -1 disables Catalyst's own heuristic; this planner still decides
    # from manifest truth, at the default floor.
    return val if val > 0 else DEFAULT_BROADCAST_THRESHOLD


def plan_join(
    left,
    right,
    on: str | list[str],
    how: str = "inner",
    *,
    left_predicate: str | None = None,
    right_predicate: str | None = None,
    broadcast_threshold: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Join two lake tables with a stats-chosen strategy.

    Consults :func:`scan_estimate` for both sides and broadcasts the
    smaller side when its post-prune post-delete byte estimate fits under
    the threshold (explicit ``F.broadcast`` — deterministic, not left to
    Catalyst's raw-file-size guess). When fresh ANALYZE stats cover the
    join key, the decision dict also carries the System-R output-row
    estimate and a ``skew_hint`` naming any side whose key multiplicity
    exceeds :data:`SKEW_MULTIPLICITY` — and when no broadcast fits, a
    left-side hint escalates to the deterministic salted join
    (operators/skew.py) provided the ``SALT_FACTOR``-amplified build-side
    shuffle stays moderate.

    Returns ``(joined_df, decision)``; ``decision["strategy"]`` is one of
    ``broadcast_left`` / ``broadcast_right`` / ``salted`` / ``shuffle``.
    """
    keys = [on] if isinstance(on, str) else list(on)
    l_est = scan_estimate(left, left_predicate)
    r_est = scan_estimate(right, right_predicate)
    threshold = _broadcast_threshold(left.spark, broadcast_threshold)

    l_df = left.scan(left_predicate) if left_predicate else left.read()
    r_df = right.scan(right_predicate) if right_predicate else right.read()

    # NDV-derived signals (fresh ANALYZE only): System-R output estimate
    # and per-side key multiplicity as the skew signal. Composite keys
    # take the classic independence estimate — NDV(tuple) ≈ Π ndv_i,
    # capped at the side's row count (a tuple can't have more distinct
    # values than rows).
    def _tuple_ndv(est) -> int | None:
        ndvs = [est["ndv"].get(k) for k in keys]
        if not all(ndvs):
            return None
        prod = 1
        for n in ndvs:
            prod *= n
        return min(prod, est["rows"]) if est["rows"] else prod

    est_rows = None
    skew_hint: list[str] = []
    l_ndv = _tuple_ndv(l_est)
    r_ndv = _tuple_ndv(r_est)
    if l_ndv and r_ndv:
        est_rows = int(l_est["rows"] * r_est["rows"] / max(l_ndv, r_ndv))
    for side, est, ndv in (("left", l_est, l_ndv), ("right", r_est, r_ndv)):
        if ndv and est["rows"] / ndv > SKEW_MULTIPLICITY:
            skew_hint.append(side)

    # Only the streamed (non-broadcast) side may be outer-preserved: a
    # broadcast side can't be the row-preserving side of an outer join.
    can_bcast_left = how in ("inner", "cross", "right", "right_outer")
    can_bcast_right = how in (
        "inner",
        "cross",
        "left",
        "left_outer",
        "left_semi",
        "left_anti",
        "semi",
        "anti",
    )

    strategy = "shuffle"
    candidates = []
    if can_bcast_left and l_est["bytes"] <= threshold:
        candidates.append(("broadcast_left", l_est["bytes"]))
    if can_bcast_right and r_est["bytes"] <= threshold:
        candidates.append(("broadcast_right", r_est["bytes"]))
    if candidates:
        strategy = min(candidates, key=lambda c: c[1])[0]
    elif (
        "left" in skew_hint
        and how in ("inner", "left", "left_outer")
        # salting explodes the build (right) side SALT_FACTOR×: worth it
        # only while the replicated build still shuffles less than the
        # skewed probe side it is protecting
        and r_est["bytes"] * SALT_FACTOR <= l_est["bytes"]
    ):
        # neither side fits a broadcast and the big probe side hammers few
        # keys — scatter its hot keys over SALT_FACTOR reducers
        # (operators/skew.py; result-identical, deterministic salt)
        strategy = "salted"

    if strategy == "broadcast_left":
        joined = F.broadcast(l_df).join(r_df, on=keys, how=how)
    elif strategy == "broadcast_right":
        joined = l_df.join(F.broadcast(r_df), on=keys, how=how)
    elif strategy == "salted":
        from demo_iceberg_permanent_delete_spark.operators.skew import (
            salted_join,
        )

        joined = salted_join(l_df, r_df, keys, how, salts=SALT_FACTOR)
    else:
        joined = l_df.join(r_df, on=keys, how=how)

    return joined, {
        "strategy": strategy,
        "left_bytes": l_est["bytes"],
        "right_bytes": r_est["bytes"],
        "left_rows": l_est["rows"],
        "right_rows": r_est["rows"],
        "threshold": threshold,
        "est_output_rows": est_rows,
        "stats_fresh": (l_est["stats_fresh"], r_est["stats_fresh"]),
        "skew_hint": skew_hint,
    }
