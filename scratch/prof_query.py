"""Phase profiler for one registered query: wraps the eager lake/DataFrame
entry points with timers and prints the call sequence with durations.

Usage: python scratch/prof_query.py NAME [N_RUNS]

Run 1 pays JIT; the LAST run's trace is printed (steady state, same as the
bench's min-of-3).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame

import __spark_entry__ as em
from demo_iceberg_permanent_delete_spark.session import get_spark

name = sys.argv[1]
n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

spark = get_spark(app_name="prof")
spark.sparkContext.setLogLevel("ERROR")

TRACE: list[tuple[int, str, float]] = []
DEPTH = [0]


def wrap(obj, attr, label=None):
    fn = getattr(obj, attr)
    lab = label or f"{obj.__name__}.{attr}"

    def inner(*a, **k):
        DEPTH[0] += 1
        d = DEPTH[0]
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            DEPTH[0] -= 1
            TRACE.append((d, lab, time.perf_counter() - t0))

    setattr(obj, attr, inner)


from demo_iceberg_permanent_delete_spark.lake import table as _t
from demo_iceberg_permanent_delete_spark.lake import datafiles as _df
from demo_iceberg_permanent_delete_spark.lake import maintenance as _m
from demo_iceberg_permanent_delete_spark.lake import metadata as _meta

for meth in (
    "insert",
    "delete",
    "update",
    "upsert",
    "equality_delete",
    "read",
    "scan",
    "meta",
    "changes",
    "incremental_read",
    "deleted_rows",
    "rewrite_data_files",
    "rewrite_position_delete_files",
    "rewrite_manifests",
    "expire_snapshots",
    "remove_orphan_files",
    "compact",
    "cherrypick_snapshot",
    "pair_update_images",
    "_write_data",
    "_harvest_partition_counts",
    "_write_position_deletes",
    "_affected_files",
    "truncate",
):
    if hasattr(_t.LakeTable, meth):
        wrap(_t.LakeTable, meth, f"Table.{meth}")

wrap(_df, "write_data_files")
if hasattr(_m, "prepare_append_stats"):
    wrap(_m, "prepare_append_stats")
if hasattr(_m, "plan_compaction"):
    wrap(_m, "plan_compaction")
if hasattr(_meta.TableMetadata, "commit"):
    wrap(_meta.TableMetadata, "commit", "Metadata.commit")

from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

for meth in ("localCheckpoint", "collect", "count", "inputFiles", "head"):
    wrap(ClassicDF, meth, f"DF.{meth}")

from demo_iceberg_permanent_delete_spark.lake import catalog as _cat

for meth in ("create_table", "create_namespace"):
    wrap(_cat.Catalog, meth, f"Catalog.{meth}")

from demo_iceberg_permanent_delete_spark.sources import tables as _tab

wrap(_tab, "load_table")

try:
    from demo_iceberg_permanent_delete_spark.streaming import pipelines as _p

    wrap(_p, "run_available_now")
except ImportError:
    pass

try:
    from demo_iceberg_permanent_delete_spark.lake import sql as _sql

    wrap(_sql.LakeEngine, "sql", "Engine.sql")
except ImportError:
    pass

qs = em.queries()
SF = "/root/testdata/sf0.1"

for i in range(n_runs):
    TRACE.clear()
    t0 = time.perf_counter()
    df = qs[name](spark, SF)
    t_build = time.perf_counter() - t0
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t_noop = time.perf_counter() - t1
    total = time.perf_counter() - t0
    print(f"\n=== run {i + 1}: total {total:.3f}s (build {t_build:.3f} + noop {t_noop:.3f}) ===")

# print last run's trace, in call-completion order
print(f"{'dur_s':>8}  call")
shown = 0.0
for d, lab, dur in TRACE:
    if dur >= 0.005:
        print(f"{dur:8.3f}  {'  ' * (d - 1)}{lab}")
    if d == 1:
        shown += dur
print(f"top-level traced sum: {shown:.3f}s")
