"""simhash_fingerprints' Arrow/numpy vote pass must be bit-identical to
the 60-column JVM aggregate it replaced (round-11 optimization) — the
entry is hash-checked against DuckDB, so any drift in the vote counts or
the fingerprint packing breaks the driver row."""

from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.dedup import (
    SIMHASH_BITS,
    simhash_fingerprints,
    spark_hash60,
    tokens_col,
)
from demo_iceberg_permanent_delete_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def _jvm_reference(spark, sf_dir):
    """The pre-optimization formulation: 60 conditional SUMs + chained
    bit packing, kept verbatim as the differential reference."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("t")
    ).distinct()
    hashed = tok.select("doc_id", spark_hash60(F.col("t")).alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    fingerprint = None
    for j in range(SIMHASH_BITS):
        bit = F.when(
            F.col(f"v{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return votes.select("doc_id", fingerprint.alias("simhash"))


def test_simhash_pandas_votes_match_jvm_aggregate(spark):
    got = sorted(map(tuple, simhash_fingerprints(spark, SF_ORACLE).collect()))
    want = sorted(map(tuple, _jvm_reference(spark, SF_ORACLE).collect()))
    assert got == want and got


def test_simhash_schema_and_doc_coverage(spark):
    out = simhash_fingerprints(spark, SF_ORACLE)
    assert [f.name for f in out.schema.fields] == ["doc_id", "simhash"]
    docs = load_table(spark, SF_ORACLE, "documents").count()
    assert out.count() == docs
