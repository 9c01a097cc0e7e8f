"""Per-batch cost: MERGE-upsert vs equality-delete upsert at sf0.1.

Seeds a lake table with the full events table (100k rows at sf0.1), then
applies N upsert batches (~5k rows each, half updates / half inserts)
through both paths and prints per-batch wall times plus a final-state
differential check. The eq path should be ~flat per batch (O(batch));
the MERGE path pays a table-scan + COW rewrite per batch (O(table))."""
import sys, time, tempfile

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.session import get_spark
from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

spark = get_spark(app_name="upsert_eq_bench")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
ev = load_table(spark, sf, "events").select(
    "event_id", "ts", "user_id", "event_type", "value"
)
DDL = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
N_BATCHES = 4


def batch(i: int):
    # ~2.5k updates of existing keys + ~2.5k fresh inserts per batch
    upd = ev.filter(F.col("event_id") % 40 == i).withColumn(
        "value", F.col("value") + 1000.0 * (i + 1)
    )
    ins = upd.withColumn("event_id", F.col("event_id") + 10_000_000 * (i + 1))
    return upd.unionByName(ins)


def run(mode: str):
    wh = tempfile.mkdtemp(prefix=f"wh_{mode}_")
    cat = Catalog(spark, wh)
    cat.create_namespace("default")
    t = cat.create_table(f"default.ev_{mode}", DDL)
    t.insert(ev)
    times = []
    for i in range(N_BATCHES):
        b = batch(i)
        t0 = time.time()
        if mode == "eq":
            t.upsert(b, on=["event_id"])
        else:
            t.merge(b.dropDuplicates(["event_id"]), on=["event_id"])
        times.append(time.time() - t0)
    return t, times


# warm the JVM/session on a throwaway copy first
_, _ = run("eq")
t_eq, eq_times = run("eq")
t_m, m_times = run("merge")

print("per-batch seconds:")
print(f"  upsert-eq: {[round(x, 2) for x in eq_times]}  total {sum(eq_times):.2f}")
print(f"  merge    : {[round(x, 2) for x in m_times]}  total {sum(m_times):.2f}")

a = t_eq.read().groupBy().agg(
    F.count("*").alias("n"),
    F.sum(F.col("value").cast("decimal(30,6)")).alias("sv"),
    F.sum("event_id").alias("sk"),
).collect()[0]
b = t_m.read().groupBy().agg(
    F.count("*").alias("n"),
    F.sum(F.col("value").cast("decimal(30,6)")).alias("sv"),
    F.sum("event_id").alias("sk"),
).collect()[0]
print(f"final state eq={tuple(a)} merge={tuple(b)} match={tuple(a) == tuple(b)}")

t0 = time.time()
stats = t_eq.compact()
print(f"compact() after {N_BATCHES} eq batches: {time.time()-t0:.2f}s {stats}")
post = t_eq.read().groupBy().agg(
    F.count("*").alias("n"),
    F.sum(F.col("value").cast("decimal(30,6)")).alias("sv"),
    F.sum("event_id").alias("sk"),
).collect()[0]
print(f"post-compact match={tuple(post) == tuple(b)}")
