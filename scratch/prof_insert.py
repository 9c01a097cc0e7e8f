import sys, time, cProfile, pstats, tempfile
sys.path.insert(0, "/root/repo")
from demo_iceberg_permanent_delete_spark.session import get_spark
from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

spark = get_spark(app_name="prof")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
li = load_table(spark, sf, "lineitem").filter("l_orderkey % 10 = 0")
DDL = ("l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp")

# warm
wh = tempfile.mkdtemp(); cat = Catalog(spark, wh); cat.create_namespace("default")
t = cat.create_table("default.w", DDL); t.insert(li)

wh = tempfile.mkdtemp(); cat = Catalog(spark, wh); cat.create_namespace("default")
t = cat.create_table("default.x", DDL)
pr = cProfile.Profile()
pr.enable()
t0 = time.time()
t.insert(li)
el = time.time() - t0
pr.disable()
print(f"insert: {el:.3f}s")
st = pstats.Stats(pr)
st.sort_stats("cumulative").print_stats(22)
