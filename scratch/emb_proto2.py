import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
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
    qvec = F.transform(F.col("embedding"), lambda x: F.round(x.cast("double") * 1000000.0).cast("long"))
    q = emb.select("vec_id", "label", qvec.alias("v"))

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        vids = pdf["vec_id"].to_numpy()
        lab = pdf["label"].iloc[0]
        M = np.stack(pdf["v"].to_numpy()).astype(np.int64)   # (n, dim) exact ints
        G = M @ M.T                                          # exact int64 gram
        nrm = np.sqrt(np.diag(G).astype(np.float64))
        iu, ju = np.triu_indices(len(vids), k=1)
        # enforce vec_id ordering (a < b) regardless of row order in block
        va, vb = vids[iu], vids[ju]
        swap = va > vb
        va2 = np.where(swap, vb, va); vb2 = np.where(swap, va, vb)
        cos = G[iu, ju].astype(np.float64) / (nrm[iu] * nrm[ju])
        return pd.DataFrame({"vec_a": va2, "vec_b": vb2, "label": lab, "cosine": cos})

    pairs = q.groupBy("label").applyInPandas(
        block_pairs, "vec_a long, vec_b long, label long, cosine double")
    return pairs.orderBy(F.desc("cosine"), F.asc("vec_a"), F.asc("vec_b")).limit(TOP_PAIRS)

for i in range(6):
    t0 = time.time()
    r = variant(spark, SFB).collect()
    print(f"run {i}: {time.time()-t0:.3f}s rows={len(r)}")
spark.stop()
