"""Gopher-style repetition / quality gates and PII scrubbing for
training-data pipelines (north-star extension beyond the reference's
operator set, alongside operators/text.py).

Implements the standard document-level repetition signals used by
large-scale corpus filters (the "repetition removal" family popularized by
the Gopher/MassiveText and RefinedWeb filtering recipes, re-expressed as
pure Spark column expressions):

- ``top_token_frac``    — occurrences of the most frequent token / n_tokens
- ``top_bigram_frac``   — occurrences of the most frequent 2-gram / n_bigrams
- ``dup_trigram_frac``  — fraction of 3-grams that are repeats (1 − distinct/total)
- PII scrubbing          — e-mail / phone redaction + URL stripping via
  ``regexp_replace``, with redaction counts for audit

Cross-engine determinism: tokenization and hashes follow the conventions in
operators/text.py; n-grams are built with 1-based index sequences
(``F.transform(F.sequence(...))`` ≡ DuckDB ``list_transform(generate_series(...))``)
so both engines materialize identical n-gram lists.

Scale notes (100 TB story): every signal is a per-row projection inside
whole-stage codegen — no joins, no shuffles, no Python. The most-frequent-
token scan is O(distinct · tokens) per document, bounded by document length;
pathological megabyte documents should be length-capped upstream (the
chunking operator in operators/chunking.py is the production path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.text import (
    DUCK_TOKENS,
    tokens_col,
)
from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

# Shared (Java ∩ RE2) regexes — only common syntax: no lookaround, no \b.
EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
URL_RE = "https?://[^ ]+"

# Gopher-style acceptance thresholds (repetition gates).
MAX_TOP_TOKEN_FRAC = 0.10
MAX_DUP_TRIGRAM_FRAC = 0.50


def ngrams_col(toks: Column, n: int) -> Column:
    """n-gram list via 1-based index sequence — identical construction in
    DuckDB (`list_transform(generate_series(1, len-n+1), i -> ...)`).

    Guarded for short docs: Spark's ``sequence(1, 0)`` yields a DESCENDING
    [1, 0] (unlike DuckDB's empty ``generate_series``), so emit an empty
    list outright when the doc has fewer than ``n`` tokens.
    """
    joined = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + k) for k in range(n)]
    )
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), joined),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def _duck_ngrams(n: int) -> str:
    parts = " || ' ' || ".join(f"toks[i+{k}]" for k in range(n))
    return (
        f"list_transform(generate_series(1, greatest(len(toks) - {n - 1}, 0)), "
        f"i -> {parts})"
    )


def top_count(arr: Column) -> Column:
    """Occurrences of the most frequent element (0 for empty lists).

    Longest run in the sorted array — O(n log n) per row instead of the
    naive O(distinct × n) count-per-distinct scan (measured 5× on the
    sf0.1 bench: documents average hundreds of tokens with ~70% distinct,
    so the quadratic form did ~100× the work per row). Single
    ``F.aggregate`` fold, stays in whole-stage codegen."""
    run = F.aggregate(
        F.array_sort(arr),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return run.cast("long")


def _duck_top_count(arr: str) -> str:
    return (
        f"CAST(coalesce(list_max(list_transform(list_distinct({arr}), "
        f"d -> len(list_filter({arr}, t -> t = d)))), 0) AS BIGINT)"
    )


@query(
    "quality_filters",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, lang,
             text || ' contact: user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-0100 via https://example.com/'
                  || CAST(doc_id AS VARCHAR) AS text
      FROM documents
    ),
    tok AS (
      SELECT doc_id, lang, text, {DUCK_TOKENS} AS toks FROM aug
    ),
    grams AS (
      SELECT doc_id, lang, text, toks,
             {_duck_ngrams(2)} AS bigrams,
             {_duck_ngrams(3)} AS trigrams
      FROM tok
    ),
    tokx AS (
      SELECT doc_id, unnest(toks) AS t FROM tok
    ),
    freq AS (
      SELECT t, CAST(count(*) AS BIGINT) AS cnt FROM tokx GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq),
    docnll AS (
      SELECT doc_id,
             CAST(sum(CAST(round(-ln(CAST(cnt AS DOUBLE) / total)
                  * 1000000000.0) AS BIGINT)) AS BIGINT) AS nll_sum
      FROM tokx JOIN freq USING (t) CROSS JOIN tot
      GROUP BY 1
    ),
    feat AS (
      SELECT
        doc_id, lang,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        {_duck_top_count("toks")} AS top_token_count,
        {_duck_top_count("bigrams")} AS top_bigram_count,
        CAST(len(trigrams) AS BIGINT) AS n_trigrams,
        CAST(len(list_distinct(trigrams)) AS BIGINT) AS n_distinct_trigrams,
        CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
        CAST(len(regexp_extract_all(text, '{URL_RE}')) AS BIGINT) AS n_urls,
        CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
          '{EMAIL_RE}', '<EMAIL>', 'g'), '{PHONE_RE}', '<PHONE>', 'g'),
          '{URL_RE}', '', 'g')) AS BIGINT) AS clean_len,
        d.nll_sum AS nll_sum
      FROM grams LEFT JOIN docnll d USING (doc_id)
    )
    SELECT
      doc_id, lang, n_tokens,
      top_token_count / n_tokens AS top_token_frac,
      top_bigram_count / greatest(n_tokens - 1, 1) AS top_bigram_frac,
      (n_trigrams - n_distinct_trigrams) / greatest(n_trigrams, 1)
        AS dup_trigram_frac,
      CAST(nll_sum AS DOUBLE) / 1000000000.0 / n_tokens AS mean_nll,
      n_emails, n_phones, n_urls, clean_len,
      (top_token_count / n_tokens <= {MAX_TOP_TOKEN_FRAC}
        AND (n_trigrams - n_distinct_trigrams) / greatest(n_trigrams, 1)
            <= {MAX_DUP_TRIGRAM_FRAC}) AS passes_repetition
    FROM feat
    """,
)
def quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition gates + PII scrub in one pass. The synthetic corpus
    carries no PII, so each document is augmented with a deterministic
    e-mail / phone / URL tail — the redaction expressions then have real
    work to do and the counts are hash-checked (1 each per doc)."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-0100 via https://example.com/"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    # Tokenize ONCE and force a projection barrier (exchange) before the
    # n-gram/top-count features: Catalyst's subexpression elimination does
    # not reach inside higher-order-function lambdas, so without the
    # barrier every element_at in every gram re-evaluates the full
    # split(trim(lower(text))) — measured 6-8 s per gram column at sf0.1.
    # The repartition also restores parallelism over a single-split local
    # file (at cluster scale the scan has natural splits and the exchange
    # cost is one materialized token column).
    tokenized = aug.select(
        "doc_id", "lang", "text", tokens_col(F.col("text")).alias("toks")
    ).repartition(aug.sparkSession.sparkContext.defaultParallelism, "doc_id")
    toks = F.col("toks")
    grams = tokenized.select(
        "doc_id",
        "lang",
        "text",
        "toks",
        ngrams_col(toks, 2).alias("bigrams"),
        ngrams_col(toks, 3).alias("trigrams"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        URL_RE,
        "",
    )
    # Unigram-LM quality signal (the CCNet-style "perplexity" gate with the
    # LM trained on this corpus itself): mean negative log-likelihood of
    # the document's tokens under the corpus unigram distribution. Rare-
    # token gibberish scores high, common prose low.
    #
    # Determinism: ln is the one non-correctly-rounded op, and quantizing
    # AFTER a JVM Math.log still flips on .5e-9 rounding boundaries when
    # JVM and libm disagree in the last ulp. So the JVM never computes a
    # log here: the quantized nll depends only on (cnt, total), and the
    # distinct cnt values are collected (≤ √(2·total) of them — the
    # distinct values of a partition of `total`; ~3k at sf0.1, ~4.5M even
    # at 10^13 tokens) and mapped driver-side with CPython's math.log —
    # the same system libm DuckDB's ln links — plus an exact emulation of
    # DuckDB round() (y - floor(y) is an exact subtraction for y < 2^52,
    # so the half-away-from-zero comparison is boundary-precise, unlike
    # floor(y + 0.5) whose inexact addition can cross an integer). Each
    # per-token bigint is then identical in both engines by construction
    # and the sum is order-free. Scale shape: one explode + (token)-keyed
    # count, one distinct-cnt collect, one broadcast join back, one
    # (doc_id)-keyed sum.
    tok_rows = tokenized.select("doc_id", F.explode("toks").alias("t"))
    # freq is vocabulary-sized (sub-linear in corpus size), and it feeds
    # BOTH the driver-side nll table and the final per-token join — persist
    # it so the scan→tokenize→explode→count pipeline runs exactly once
    # instead of once per downstream action (was 3 full corpus passes).
    # Deliberately NOT unpersisted: the returned (lazy) DataFrame reads
    # the cache at collect time, and Spark LRU-evicts the vocabulary-
    # sized entry under memory pressure — an explicit unpersist here
    # would re-trigger the full corpus pass it exists to prevent.
    freq = (
        tok_rows.groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .persist()
    )
    # One action covers both `total` and the distinct-cnt list: the
    # count-of-counts histogram has ≤ √(2·total) rows (distinct values of
    # a partition of `total`), so collecting it is driver-safe at any SF.
    cnt_hist = freq.groupBy("cnt").agg(F.count(F.lit(1)).alias("n")).collect()
    total = sum(r["cnt"] * r["n"] for r in cnt_hist)

    def _nll_q(cnt: int) -> int:
        import math

        y = -math.log(cnt / total) * 1000000000.0
        fl = math.floor(y)
        return int(fl) + (1 if y - fl >= 0.5 else 0)

    from demo_iceberg_permanent_delete_spark.lake.table import _local_frame

    # one Arrow batch, not a 32-slice Python parallelize
    nll_table = _local_frame(
        spark,
        [(r["cnt"], _nll_q(r["cnt"])) for r in cnt_hist],
        "cnt long, nll_q long",
    )
    doc_nll = (
        tok_rows.join(freq, "t")
        .join(F.broadcast(nll_table), "cnt")
        .groupBy("doc_id")
        .agg(F.sum("nll_q").cast("long").alias("nll_sum"))
    )

    feat = grams.join(doc_nll, "doc_id", "left").select(
        "doc_id",
        "lang",
        "toks",
        "bigrams",
        "trigrams",
        "text",
        "nll_sum",
    ).select(
        "doc_id",
        "lang",
        "nll_sum",
        F.size("toks").cast("long").alias("n_tokens"),
        top_count(F.col("toks")).alias("top_token_count"),
        top_count(F.col("bigrams")).alias("top_bigram_count"),
        F.size("trigrams").cast("long").alias("n_trigrams"),
        F.size(F.array_distinct("trigrams")).cast("long").alias("n_distinct_trigrams"),
        F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PHONE_RE), 0))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all("text", F.lit(URL_RE), 0))
        .cast("long")
        .alias("n_urls"),
        F.length(clean).cast("long").alias("clean_len"),
    )
    top_token_frac = F.col("top_token_count") / F.col("n_tokens")
    top_bigram_frac = F.col("top_bigram_count") / F.greatest(
        F.col("n_tokens") - 1, F.lit(1)
    )
    dup_trigram_frac = (
        F.col("n_trigrams") - F.col("n_distinct_trigrams")
    ) / F.greatest(F.col("n_trigrams"), F.lit(1))
    return feat.select(
        "doc_id",
        "lang",
        "n_tokens",
        top_token_frac.alias("top_token_frac"),
        top_bigram_frac.alias("top_bigram_frac"),
        dup_trigram_frac.alias("dup_trigram_frac"),
        (F.col("nll_sum").cast("double") / 1000000000.0 / F.col("n_tokens")).alias(
            "mean_nll"
        ),
        "n_emails",
        "n_phones",
        "n_urls",
        "clean_len",
        (
            (top_token_frac <= MAX_TOP_TOKEN_FRAC)
            & (dup_trigram_frac <= MAX_DUP_TRIGRAM_FRAC)
        ).alias("passes_repetition"),
    )
