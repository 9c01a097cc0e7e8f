import sys, time, json
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]").appName("timing")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as em
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for n in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {n} AS SELECT * FROM '{SF}/{n}.parquet'")

qs, oracles = em.queries(), em.oracle_sql()
t_total = time.time()
cum = 0.0
for i, name in enumerate(qs):
    t0 = time.time()
    sdf = qs[name](spark, SF)
    rows = sdf.collect()
    t_spark = time.time() - t0
    t0 = time.time()
    if name in oracles:
        con.execute(oracles[name]).fetchall()
    t_duck = time.time() - t0
    cum += t_spark + t_duck
    print(f"{i:3d} {name:35s} spark={t_spark:6.2f}s duck={t_duck:5.2f}s cum={cum:7.1f}s")
print(f"TOTAL {time.time()-t_total:.1f}s")
