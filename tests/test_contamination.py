"""Benchmark n-gram contamination detection + deterministic dataset split
(operators/contamination.py, chunking.train_val_test_split)."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.chunking import (
    train_val_test_split,
)
from demo_iceberg_permanent_delete_spark.operators.contamination import (
    benchmark_ngram_contamination,
)

WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()


def _doc(i: int, words) -> tuple[int, str]:
    return (i, " ".join(words))


def test_exact_benchmark_copy_is_flagged(spark):
    # doc 0 is the benchmark (0 % 97 == 0); doc 1 is a verbatim copy of it,
    # doc 2 is disjoint text, doc 3 shares exactly half its 5-grams
    bench_words = WORDS
    half_overlap = WORDS[:7] + ["kilo", "lima", "mike"]  # 3 of 6 5-grams shared
    docs = spark.createDataFrame(
        [
            _doc(0, bench_words),
            _doc(1, bench_words),
            _doc(2, ["zulu"] * 10),
            _doc(3, half_overlap),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in benchmark_ngram_contamination(docs).collect()
    }
    assert 0 not in out  # benchmark docs are not corpus rows
    assert out[1]["contamination_frac"] == 1.0 and out[1]["contaminated"]
    # 'zulu'*10 collapses to one distinct 5-gram, none of them in the benchmark
    assert out[2]["n_ngrams"] == 1
    assert out[2]["n_matched"] == 0
    assert not out[2]["contaminated"]
    assert out[3]["n_ngrams"] == 6
    assert out[3]["n_matched"] == 3
    assert out[3]["contamination_frac"] == 0.5 and out[3]["contaminated"]


def test_disjoint_doc_not_contaminated(spark):
    docs = spark.createDataFrame(
        [_doc(0, WORDS), _doc(5, ["kilo", "lima", "mike", "november", "oscar"])],
        "doc_id bigint, text string",
    )
    row = benchmark_ngram_contamination(docs).filter("doc_id = 5").first()
    assert row["n_matched"] == 0
    assert row["contamination_frac"] == 0.0
    assert not row["contaminated"]


def test_short_docs_yield_no_row(spark):
    docs = spark.createDataFrame(
        [_doc(0, WORDS), _doc(7, ["too", "short"])], "doc_id bigint, text string"
    )
    assert benchmark_ngram_contamination(docs).filter("doc_id = 7").count() == 0


def test_split_deterministic_and_partitioned(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    out = train_val_test_split(df, id_col="doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    total = sum(counts.values())
    assert total == 2000
    # hash-mod split tracks the 80/10/10 target within a loose tolerance
    assert 0.7 < counts["train"] / total < 0.9
    assert 0.05 < counts["val"] / total < 0.15
    assert 0.05 < counts["test"] / total < 0.15
    # determinism: same assignment on re-evaluation and subsets
    again = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(df.filter("doc_id < 100"), id_col="doc_id").collect()
    }
    first = {r["doc_id"]: r["split"] for r in out.filter("doc_id < 100").collect()}
    assert first == again


def test_contamination_plan_broadcasts_benchmark(spark):
    docs = spark.createDataFrame(
        [_doc(i, WORDS[j : j + 6]) for i in range(0, 300) for j in (i % 4,)],
        "doc_id bigint, text string",
    )
    plan = benchmark_ngram_contamination(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
