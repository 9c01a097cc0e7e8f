"""Benchmark contamination detection for training corpora (north-star
extension surface; the reference has no text pipeline — SURVEY.md §2.8).

The standard decontamination shape used by large-scale LM data pipelines
(the n-gram collision check popularized by the GPT-3 / PaLM data cards):
hash every token n-gram of the *evaluation benchmark* into a set, then flag
any training document whose n-grams collide with it. Re-expressed
Spark-first:

- benchmark n-gram set: distinct 60-bit hashes of token ``n``-grams —
  *small by construction* (eval suites are KBs-to-MBs against a 100 TB
  corpus), so it is ``F.broadcast`` to every executor: the corpus side is
  scanned once, map-side, with no shuffle of corpus text;
- per-document verdict: distinct-n-gram counts + matched counts via a
  broadcast left join, one ``groupBy(doc_id)`` of (id, hash) pairs — the
  only shuffle, proportional to distinct n-grams, not text bytes;
- everything stays in whole-stage codegen (token/n-gram/hash expressions
  shared with operators/quality.py and operators/text.py — identical
  constructions exist in the DuckDB oracle).

Determinism: tokenization, n-gram building, and the md5-derived 60-bit
hash follow the cross-engine conventions in operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.quality import ngrams_col
from demo_iceberg_permanent_delete_spark.operators.text import spark_hash60, tokens_col

NGRAM_N = 5
CONTAMINATION_FRAC_THRESHOLD = 0.5
BENCH_MOD = 97  # synthetic "benchmark" membership: doc_id % 97 == 0


def ngram_hashes(text: Column, n: int = NGRAM_N) -> Column:
    """Distinct 60-bit hashes of the token ``n``-grams of ``text`` as an
    array column. NOTE: do not ``F.explode`` this — Spark's Generate
    re-evaluates a non-trivial generator expression per *output* row,
    turning the per-document cost quadratic (measured 13 s vs 1.5 s at
    sf0.1). For flattened n-grams use the position-explode shape in
    ``benchmark_ngram_contamination`` instead."""
    return F.array_distinct(
        F.transform(ngrams_col(tokens_col(text), n), spark_hash60)
    )


def _flat_ngram_hashes(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc_id, h) pairs, one row per distinct token n-gram hash: explode
    token *positions* (a cheap integer sequence), then hash one slice per
    row — linear work per gram (the same construction as
    dedup.ngram_jaccard_pairs), followed by a distinct."""
    toks = tokens_col(F.col(text_col))
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("t"))
        .filter(F.size("t") >= n)
        .select(
            "doc_id",
            "t",
            F.explode(F.sequence(F.lit(1), F.size("t") - (n - 1))).alias("i"),
        )
        .select(
            "doc_id",
            spark_hash60(F.concat_ws(" ", F.slice(F.col("t"), F.col("i"), n))).alias(
                "h"
            ),
        )
        .distinct()
    )


def benchmark_ngram_contamination(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = NGRAM_N,
    bench_mod: int = BENCH_MOD,
    threshold: float = CONTAMINATION_FRAC_THRESHOLD,
) -> DataFrame:
    """Per-corpus-document contamination verdict against the benchmark
    slice (``id % bench_mod == 0`` stands in for a real eval suite; swap
    the predicate for a benchmark table join in production).

    Returns one row per corpus document that has at least ``n`` tokens:
    ``(doc_id, n_ngrams, n_matched, contamination_frac, contaminated)``.
    """
    grams = _flat_ngram_hashes(docs, id_col, text_col, n)
    bench = (
        grams.filter(F.col("doc_id") % bench_mod == 0).select("h").distinct()
    )
    corpus = grams.filter(F.col("doc_id") % bench_mod != 0)
    joined = corpus.join(
        F.broadcast(bench.withColumn("__hit", F.lit(1))), "h", "left"
    )
    out = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.count("__hit").alias("n_matched"),
    )
    frac = F.col("n_matched") / F.col("n_ngrams")
    return out.select(
        "doc_id",
        "n_ngrams",
        "n_matched",
        frac.alias("contamination_frac"),
        (frac >= threshold).alias("contaminated"),
    )
