"""Measure MOR delete write + read-merge cost: deletion-vector layout vs
plain (file_path, pos) row layout, at sf0.1 lineitem (~600k rows).
Informs the write.delete.vector.enabled default (VERDICT r2 item 7)."""

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

from demo_iceberg_permanent_delete_spark.lake import Catalog

SF = "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .appName("dv-bench")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

src = spark.read.parquet(f"{SF}/lineitem.parquet")
n = src.count()
print(f"lineitem rows: {n}")


def run(mode: str, dv: str):
    tmp = tempfile.mkdtemp(prefix=f"dvbench_{dv}_")
    try:
        cat = Catalog(spark, tmp)
        cat.create_namespace("d")
        t = cat.create_table(
            "d.li",
            ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields),
            properties={
                "write.delete.mode": "merge-on-read",
                "write.delete.vector.enabled": dv,
            },
        )
        t.insert(src.repartition(8))
        # spread deletes across many files/positions: ~8% of rows
        t0 = time.perf_counter()
        t.delete("l_orderkey % 13 = 0")
        w = time.perf_counter() - t0
        # steady-state read-merge: run twice, report min
        reads = []
        for _ in range(3):
            t0 = time.perf_counter()
            cnt = t.read().count()
            reads.append(time.perf_counter() - t0)
        # second delete stacks another delete file generation
        t0 = time.perf_counter()
        t.delete("l_partkey % 17 = 0")
        w2 = time.perf_counter() - t0
        reads2 = []
        for _ in range(3):
            t0 = time.perf_counter()
            cnt2 = t.read().count()
            reads2.append(time.perf_counter() - t0)
        import os

        dsize = sum(
            e.file_size_in_bytes
            for s in [t.metadata.current_snapshot()]
            for e in s.delete_files()
        )
        print(
            f"{mode}: del1={w:.2f}s read1={min(reads):.2f}s "
            f"del2={w2:.2f}s read2={min(reads2):.2f}s "
            f"rows {cnt}->{cnt2} delete-bytes={dsize}"
        )
        return cnt2
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


a = run("rows", "false")
b = run("dv  ", "true")
assert a == b, (a, b)
print("row-counts agree")
spark.stop()
