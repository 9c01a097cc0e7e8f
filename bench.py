#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints the
compact contract line as the LAST line of stdout::

    {"metric": "total_query_wall", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

A separate earlier ``{"detail": "spread_machine", ...}`` line carries the
per-entry {min,med,max} spread and host fingerprint; it is deliberately NOT
part of the contract line so diagnostic growth can never truncate the
headline out of the driver's tail capture again (BENCH_r05 parsed:null).

Each query is timed end-to-end (plan + execute) against the ``noop``
sink, which fully materializes the result on executors without any
write cost or a driver-side collect — the closest analog to what a
downstream stage would observe.

Per-query value = min of 3 back-to-back runs (steady-state; round 2 used
min-of-2 — see BASELINE.md for the methodology note). A query's first
execution carries 1-6 s of one-time JVM JIT + whole-stage-codegen class
compilation for its unique generated code; with 50 queries that fixed
cost would be double-counted 50x into a throughput number, and repeated
idle-machine runs still show occasional single-entry JIT/GC spikes of
2-3x (e.g. similarity_topk 2.4 s vs a one-off 7.5 s in back-to-back
round-3 runs — almost certainly what flagged pricing_summary as a
round-2 "regression"). At the 100 TB design point each query runs for
minutes-to-hours, so the steady-state cost is the honest per-query
metric; the cold total is still observable as this script's wall-clock
minus ~15 s of fixture setup.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return float("nan")


def main() -> None:
    from demo_iceberg_permanent_delete_spark import registry
    from demo_iceberg_permanent_delete_spark.session import get_spark

    spark = get_spark(app_name="bench")
    queries = registry.all_queries()

    timings: dict[str, float] = {}
    # Warm the JVM + parquet footer cache + Python UDF workers once so
    # per-query numbers measure the query, not first-touch session costs
    # (spawning 32 Arrow workers otherwise lands on the first Pandas-UDF
    # query in alphabetical order).
    next(iter(queries.values()))(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.range(1000).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    _warm_streaming(spark)

    spread: dict[str, dict[str, float]] = {}
    for name in sorted(queries):
        runs: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[0], 4)
        # min/med/max of the 3 runs: a wide med/min or max/min ratio on
        # an entry whose code did not change is machine noise (JIT/GC
        # spikes, ambient load), not a regression — see BASELINE.md
        # "Reading the spread fields".
        spread[name] = {
            "min": round(runs[0], 4),
            "med": round(runs[len(runs) // 2], 4),
            "max": round(runs[-1], 4),
        }

    # Two lines, compact value line LAST: the driver tail-captures stdout
    # and parses the final JSON line, and round 5 proved the spread/machine
    # fields grow past that window when folded into one line (BENCH_r05
    # recorded parsed:null with total_query_wall truncated away — round-5
    # verdict item 1). The diagnostic {spread, machine} object goes on its
    # own EARLIER line so it stays recoverable from the raw log without
    # ever displacing the headline number. The spread is SLIMMED to the
    # noisy entries (med/min > 1.3 — the only ones a regression analysis
    # needs to exonerate) so the driver's tail capture retains the whole
    # line (round-11 verdict item 2: the full 50-entry spread overflowed
    # the capture window and the per-query spreads were unrecoverable).
    noisy = {
        name: s for name, s in spread.items() if s["med"] > 1.3 * max(s["min"], 1e-9)
    }
    print(
        json.dumps(
            {
                "detail": "spread_machine",
                "spread_noisy": noisy,
                "machine": _machine_state(spark),
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "total_query_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


def _machine_state(spark) -> dict:
    """Host-condition fingerprint recorded alongside the numbers, so a
    recorded 'regression' whose spread and loadavg both scream ambient
    drift doesn't need a same-machine A/B to exonerate (round-4 verdict
    item 4). tmp_ckpt_dirs counts leftover streaming state-store
    checkpoints in /tmp — ~790 of them degraded round-3's streaming
    entries 3×, so a nonzero count flags debris from OTHER processes
    (this repo cleans its own since c350260).

    master / default_parallelism / shuffle_partitions are the EFFECTIVE
    session values (round-11 verdict item 2: printing os.cpu_count()
    alone could not prove $SPARK_GRAFT_CPUS was honored — it is, via
    session.py, and now the record shows it)."""
    import glob

    try:
        load1, load5, load15 = (round(v, 2) for v in os.getloadavg())
    except OSError:
        # None → JSON null; float('nan') would print the invalid token
        # NaN and break strict parsers of the one-line contract
        load1 = load5 = load15 = None
    return {
        "loadavg_1m": load1,
        "loadavg_5m": load5,
        "loadavg_15m": load15,
        "cpus": os.cpu_count(),
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "tmp_ckpt_dirs": len(glob.glob("/tmp/ckpt_*")),
    }


def _warm_streaming(spark) -> None:
    """One tiny stateful availableNow stream: pays the one-time streaming
    engine + state-store class init (~10-30s of JIT) so it doesn't land on
    whichever streaming query sorts first."""
    import tempfile

    from pyspark.sql import functions as F

    from demo_iceberg_permanent_delete_spark.streaming.pipelines import (
        run_available_now,
    )

    src_dir = tempfile.mkdtemp(prefix="bench_warm_")
    spark.range(100).withColumn(
        "ts", F.timestamp_micros(F.col("id") * 1_000_000)
    ).write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .parquet(src_dir)
        .withWatermark("ts", "10 seconds")
        .groupBy("id")
        .count()
    )
    run_available_now(stream, output_mode="complete", state_partitions=2).count()


if __name__ == "__main__":
    main()
