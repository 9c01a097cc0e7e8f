import sys, time, tempfile, shutil
sys.path.insert(0, "/root/repo")
from demo_iceberg_permanent_delete_spark.session import get_spark
from demo_iceberg_permanent_delete_spark.lake import Catalog
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

spark = get_spark(app_name="prof")
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
DDL = ("l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp")

for it in range(3):
    marks = [time.time()]
    names = []
    warehouse = tempfile.mkdtemp(prefix="prof-")
    cat = Catalog(spark, warehouse)
    cat.create_namespace("default")
    t = cat.create_table("default.li", DDL)
    t.insert(load_table(spark, sf, "lineitem").filter("l_orderkey % 10 = 0"))
    marks.append(time.time()); names.append("insert1")
    t.equality_delete(spark.createDataFrame([("R",)], "l_returnflag string"))
    marks.append(time.time()); names.append("eqdel")
    li = load_table(spark, sf, "lineitem")
    t.insert(li.filter("l_orderkey % 10 = 5"))
    marks.append(time.time()); names.append("insert2")
    result = t.read().localCheckpoint(eager=True)
    marks.append(time.time()); names.append("read_ckpt")
    t.rewrite_data_files()
    marks.append(time.time()); names.append("rewrite")
    raw = t.read(apply_deletes=False)
    assert raw.filter("l_orderkey % 10 = 0 AND l_returnflag = 'R'").count() == 0
    assert raw.filter("l_orderkey % 10 = 5 AND l_returnflag = 'R'").count() > 0
    marks.append(time.time()); names.append("raw_asserts")
    result.count()
    marks.append(time.time()); names.append("final_count")
    shutil.rmtree(warehouse, ignore_errors=True)
    print("  ".join(f"{n}={b-a:.2f}s" for n, a, b in zip(names, marks, marks[1:])))
