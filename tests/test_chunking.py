"""Chunking / packing / sampling operator semantics (training-data prep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
    stratified_sample,
    training_data_prep,
)
from demo_iceberg_permanent_delete_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def _doc(spark, n_tokens: int):
    text = " ".join(f"w{i}" for i in range(n_tokens))
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_chunk_counts_and_windows(spark):
    # chunk=32, overlap=8, stride=24
    for n_tokens, want_chunks in [(1, 1), (32, 1), (33, 2), (56, 2), (57, 3)]:
        chunks = chunk_documents(_doc(spark, n_tokens)).collect()
        assert len(chunks) == want_chunks, (n_tokens, len(chunks))

    rows = sorted(
        chunk_documents(_doc(spark, 40)).collect(), key=lambda r: r["chunk_id"]
    )
    # chunk 0 = tokens [0,32); chunk 1 = tokens [24,40) — 8-token overlap
    assert rows[0]["chunk_text"].split() == [f"w{i}" for i in range(32)]
    assert rows[1]["chunk_text"].split() == [f"w{i}" for i in range(24, 40)]
    assert [r["n_chunk_tokens"] for r in rows] == [32, 16]


def test_chunks_cover_every_token(spark):
    docs = load_table(spark, SF_ORACLE, "documents").limit(50)
    joined = (
        chunk_documents(docs)
        .groupBy("doc_id")
        .agg(F.max(F.col("chunk_id") * 24 + F.col("n_chunk_tokens")).alias("covered"))
        .join(
            docs.select(
                "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
            ),
            "doc_id",
        )
    )
    assert joined.filter(F.col("covered") != F.col("n_tokens")).count() == 0


def test_pack_sequences_contiguous_fill(spark):
    seqs = spark.createDataFrame(
        [("a", i, 40) for i in range(10)], "shard string, seq long, n_tokens long"
    )
    packs = {
        r["seq"]: r["pack_id"]
        for r in pack_sequences(
            seqs, shard_col="shard", order_cols=("seq",), token_col="n_tokens",
            budget_tokens=100,
        ).collect()
    }
    # cumsum-before: 0,40,80 -> pack 0; 120,160,200-> pack 1&2...: floor(b/100)
    assert packs == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}


def test_pack_overflow_bounded_by_one_sequence(spark):
    seqs = spark.createDataFrame(
        [("a", i, 7 + (i * 13) % 90) for i in range(200)],
        "shard string, seq long, n_tokens long",
    )
    budget = 128
    packed = pack_sequences(
        seqs, shard_col="shard", order_cols=("seq",), token_col="n_tokens",
        budget_tokens=budget,
    )
    per_pack = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("biggest")
    )
    # a pack holds < budget + its last (overflowing) sequence
    assert per_pack.filter(F.col("tok") >= budget + F.col("biggest")).count() == 0
    # packs are contiguous 0..max with none skipped
    ids = sorted(r["pack_id"] for r in packed.select("pack_id").distinct().collect())
    assert ids == list(range(len(ids)))


def test_stratified_sample_deterministic_subset(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "lang")
    kwargs = dict(stratum_col="lang", id_col="doc_id", percents={"en": 30})
    s1 = stratified_sample(docs, **kwargs)
    s2 = stratified_sample(docs, **kwargs)
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    counts = {r["lang"]: r["n"] for r in
              s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] < full["en"] * 0.5  # en visibly downsampled
    for lang in full:
        if lang != "en":
            assert counts[lang] == full[lang]  # other strata untouched
    # a different salt draws a different sample
    s3 = stratified_sample(docs, salt="other", **kwargs)
    assert s3.exceptAll(s1).count() > 0


def test_chunking_is_shuffle_free(spark):
    from demo_iceberg_permanent_delete_spark.plans import explain_str

    plan = explain_str(chunk_documents(load_table(spark, SF_ORACLE, "documents")))
    assert "Exchange" not in plan, plan


def test_driver_query_matches_oracle(spark, duck):
    from demo_iceberg_permanent_delete_spark.registry import all_oracles

    sp = training_data_prep(spark, SF_ORACLE).toPandas()
    oc = duck.execute(all_oracles()["training_data_prep"]).df()
    cols = sorted(sp.columns)
    sp = sp[cols].sort_values(cols).reset_index(drop=True)
    oc = oc[cols].sort_values(cols).reset_index(drop=True)
    assert sp.equals(oc)
