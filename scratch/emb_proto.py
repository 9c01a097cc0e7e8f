import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
SFB = "/root/testdata/sf0.1"
TOP_PAIRS = 100

def variant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    qvec = F.transform(F.col("embedding"), lambda x: F.round(x.cast("double") * 1000000.0).cast("long"))
    q = emb.select("vec_id", "label", qvec.alias("v"))
    def dot(u, v):
        terms = [F.element_at(u, i + 1) * F.element_at(v, i + 1) for i in range(dim)]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out
    n = q.select("vec_id", "label", "v", F.sqrt(dot(F.col("v"), F.col("v")).cast("double")).alias("nrm"))
    a, b = n.alias("a"), n.alias("b")
    return (a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            (dot(F.col("a.v"), F.col("b.v")).cast("double") / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_a"), F.asc("vec_b")).limit(TOP_PAIRS))

for i in range(6):
    t0 = time.time()
    r = variant(spark, SFB).collect()
    print(f"run {i}: {time.time()-t0:.3f}s rows={len(r)}")
spark.stop()
