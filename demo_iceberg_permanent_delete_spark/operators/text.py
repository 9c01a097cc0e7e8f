"""Text-analysis operators for training-data pipelines (SURVEY.md §2.8 X4):
token counting, quality scoring, language identification, and rolling-hash
document fingerprinting over the ``documents`` table.

Cross-engine determinism conventions (everything here is DuckDB
hash-checked):
- Tokenization: regex split on ``\\s+`` after trim — identical token arrays
  in Spark (Java regex) and DuckDB (RE2) for this pattern.
- Hashes: 60-bit integers from the leading 15 hex chars of md5 —
  ``conv(substr(md5(s),1,15),16,10)`` in Spark ≡
  ``CAST('0x'||substr(md5(s),1,15) AS BIGINT)`` in DuckDB (probed
  bit-identical this session).
- Ratios: BIGINT counts divided in double — one IEEE division, identical.

Scale notes (100 TB story):
- Every query is an embarrassingly parallel per-row projection + one final
  aggregation; no joins, no data-dependent shuffles. Token arrays live
  inside whole-stage codegen (higher-order functions, not Python UDFs).
- The fingerprint query bounds its explode with a stride so cost is
  O(chars/stride) not O(chars); a per-doc cap would bound worst-case skew
  from pathological megabyte documents at production scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

# BPE-ish word/number/symbol segmentation (shared char classes only — Java
# and RE2 dialects agree on these).
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

# Tiny per-language stopword lexicons for the n-gram/lexicon language-ID
# heuristic. Deliberately small and hardcoded: language ID at pipeline scale
# is a heuristic gate, not a model.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "en", "que"),
}

STOPWORDS = LANG_LEXICONS["en"]


def spark_hash60(col: Column) -> Column:
    """60-bit deterministic hash, bit-identical to the DuckDB twin."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def duck_hash60(expr: str) -> str:
    return f"CAST('0x'||substr(md5({expr}),1,15) AS BIGINT)"


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), "\\s+")


DUCK_TOKENS = "string_split_regex(trim(lower(text)), '\\s+')"


# ---------------------------------------------------------------------------
# Token counting: whitespace tokens, distinct tokens, BPE-ish regex tokens.
# ---------------------------------------------------------------------------
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_measured"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# Quality scoring: length/punctuation/stopword/digit ratios + a composite
# score and bucket — the standard cheap pre-filter for web-scale corpora.
# ---------------------------------------------------------------------------
_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)

def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    feat = docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
        .cast("long")
        .alias("n_stopwords"),
        F.size(F.regexp_extract_all("text", F.lit("[^a-zA-Z0-9\\s]"), 0))
        .cast("long")
        .alias("n_punct"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]"), 0))
        .cast("long")
        .alias("n_digits"),
    )
    stop_ratio = F.col("n_stopwords") / F.col("n_tokens")
    punct_ratio = F.col("n_punct") / F.col("n_chars")
    score = (
        stop_ratio * 0.5
        + F.when(F.col("n_tokens") >= 20, 0.3).otherwise(0.0)
        + F.when(punct_ratio < 0.1, 0.2).otherwise(0.0)
    )
    return feat.select(
        "doc_id",
        "lang",
        "n_chars",
        "n_tokens",
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        (F.col("n_digits") / F.col("n_chars")).alias("digit_ratio"),
        (F.col("n_chars") / F.col("n_tokens")).alias("mean_token_len"),
        score.alias("quality_score"),
        F.when(score >= 0.5, "high")
        .when(score >= 0.3, "medium")
        .otherwise("low")
        .alias("quality_bucket"),
    )


# ---------------------------------------------------------------------------
# Language identification: lexicon-hit argmax across four stopword lexicons
# ('und' ties broken by fixed language priority). Pure higher-order-function
# projection — no explode, no shuffle.
# ---------------------------------------------------------------------------
def _duck_hits(lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in LANG_LEXICONS[lang])
    return f"len(list_filter({DUCK_TOKENS}, t -> t IN ({inlist})))"


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))

    def hits(lang: str) -> Column:
        arr = F.array(*[F.lit(w) for w in LANG_LEXICONS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    hit_cols = {lang: hits(lang) for lang in LANG_LEXICONS}
    df = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[c.alias(f"hits_{lang}") for lang, c in hit_cols.items()],
    )
    en, de, fr, es = (F.col(f"hits_{lang}") for lang in ("en", "de", "fr", "es"))
    detected = (
        F.when(en + de + fr + es == 0, "unknown")
        .when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )
    return df.withColumn("detected_lang", detected)


# ---------------------------------------------------------------------------
# Document fingerprinting: rolling char-8-gram hashes at stride 4
# (winnowing-lite): min-hash + shingle cardinality per doc. The min of a
# rolling hash set is a cheap near-dup signal robust to local edits.
# ---------------------------------------------------------------------------
SHINGLE_LEN = 8
SHINGLE_STRIDE = 4


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Exchange BEFORE the hash work, on the aggregate's own key: the
    # groupBy(doc_id) below needs a hash distribution anyway, so
    # pre-partitioning on doc_id moves that one shuffle ahead of the
    # ~length/stride md5s per document. Shuffled bytes are the raw text
    # (smaller than the shingle rows), every md5 runs with full
    # parallelism even when the source is a single parquet split, and the
    # aggregate becomes partition-local (no second exchange — asserted
    # shape in tests/test_plans.py).
    docs = docs.select("doc_id", F.lower("text").alias("t")).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    positions = docs.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.length("t") - (SHINGLE_LEN - 1), F.lit(1)),
                F.lit(SHINGLE_STRIDE),
            )
        ).alias("i"),
    )
    shingles = positions.select(
        "doc_id",
        spark_hash60(F.expr(f"substr(t, i, {SHINGLE_LEN})")).alias("h"),
    )
    return shingles.groupBy("doc_id").agg(
        F.min("h").alias("min_shingle_hash"),
        F.count_distinct("h").alias("n_distinct_shingles"),
        F.count(F.lit(1)).alias("n_shingles"),
    )


# ---------------------------------------------------------------------------
# Composite driver entry: the full X4 text-analysis battery in one
# hash-checked query — token stats, quality scoring, language ID, and the
# rolling-hash fingerprint, joined per doc. (The driver records at most 50
# correctness rows; packing the four per-doc projections into one entry
# keeps each operator oracle-checked without spending four slots. The
# individual builders above remain importable.)
# One scan computes every projection column; only the fingerprint needs the
# strided explode + per-doc aggregate, joined back on doc_id.
# ---------------------------------------------------------------------------
def _duck_hits_expr(lang: str) -> str:
    inlist = ", ".join(f"'{w}'" for w in LANG_LEXICONS[lang])
    return f"len(list_filter({DUCK_TOKENS}, t -> t IN ({inlist})))"


_QUALITY_EXPR = (
    "(n_stopwords / n_tokens) * 0.5"
    " + CASE WHEN n_tokens >= 20 THEN 0.3 ELSE 0.0 END"
    " + CASE WHEN n_punct / n_chars < 0.1 THEN 0.2 ELSE 0.0 END"
)


@query(
    "text_analysis",
    oracle=f"""
    WITH feat AS (
      SELECT
        doc_id,
        lang,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(len({DUCK_TOKENS}) AS BIGINT) AS n_tokens,
        len(list_distinct({DUCK_TOKENS})) AS n_distinct_tokens,
        len(regexp_extract_all(lower(text), '{BPE_RE}')) AS n_bpe_tokens,
        CAST(len(list_filter({DUCK_TOKENS}, t -> t IN ({_STOP_IN}))) AS BIGINT)
          AS n_stopwords,
        CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_punct,
        CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
        {_duck_hits_expr("en")} AS hits_en,
        {_duck_hits_expr("de")} AS hits_de,
        {_duck_hits_expr("fr")} AS hits_fr,
        {_duck_hits_expr("es")} AS hits_es
      FROM documents
    ),
    positions AS (
      SELECT
        doc_id,
        lower(text) AS t,
        unnest(generate_series(1, greatest(length(text) - {SHINGLE_LEN - 1}, 1),
                               {SHINGLE_STRIDE})) AS i
      FROM documents
    ),
    shingles AS (
      SELECT doc_id, {duck_hash60(f"substr(t, i, {SHINGLE_LEN})")} AS h
      FROM positions
    ),
    fp AS (
      SELECT
        doc_id,
        min(h) AS min_shingle_hash,
        count(DISTINCT h) AS n_distinct_shingles,
        count(*) AS n_shingles
      FROM shingles
      GROUP BY doc_id
    )
    SELECT
      f.doc_id,
      f.lang,
      n_chars,
      n_tokens,
      n_distinct_tokens,
      n_bpe_tokens,
      n_stopwords / n_tokens AS stopword_ratio,
      n_punct / n_chars AS punct_ratio,
      n_digits / n_chars AS digit_ratio,
      n_chars / n_tokens AS mean_token_len,
      {_QUALITY_EXPR} AS quality_score,
      CASE
        WHEN {_QUALITY_EXPR} >= 0.5 THEN 'high'
        WHEN {_QUALITY_EXPR} >= 0.3 THEN 'medium'
        ELSE 'low'
      END AS quality_bucket,
      hits_en, hits_de, hits_fr, hits_es,
      CASE
        WHEN hits_en + hits_de + hits_fr + hits_es = 0 THEN 'unknown'
        WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es THEN 'en'
        WHEN hits_de >= hits_fr AND hits_de >= hits_es THEN 'de'
        WHEN hits_fr >= hits_es THEN 'fr'
        ELSE 'es'
      END AS detected_lang,
      fp.min_shingle_hash,
      fp.n_distinct_shingles,
      fp.n_shingles
    FROM feat f
    JOIN fp ON f.doc_id = fp.doc_id
    """,
)
def text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col(F.col("text"))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])

    def hits(lang: str) -> Column:
        arr = F.array(*[F.lit(w) for w in LANG_LEXICONS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    feat = docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
        .cast("long")
        .alias("n_stopwords"),
        F.size(F.regexp_extract_all("text", F.lit("[^a-zA-Z0-9\\s]"), 0))
        .cast("long")
        .alias("n_punct"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]"), 0))
        .cast("long")
        .alias("n_digits"),
        *[hits(lang).alias(f"hits_{lang}") for lang in LANG_LEXICONS],
    )
    fp = doc_fingerprint(spark, sf_dir)

    stop_ratio = F.col("n_stopwords") / F.col("n_tokens")
    punct_ratio = F.col("n_punct") / F.col("n_chars")
    score = (
        stop_ratio * 0.5
        + F.when(F.col("n_tokens") >= 20, 0.3).otherwise(0.0)
        + F.when(punct_ratio < 0.1, 0.2).otherwise(0.0)
    )
    en, de, fr, es = (F.col(f"hits_{lang}") for lang in ("en", "de", "fr", "es"))
    detected = (
        F.when(en + de + fr + es == 0, "unknown")
        .when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )
    return feat.join(fp, "doc_id").select(
        "doc_id",
        "lang",
        "n_chars",
        "n_tokens",
        "n_distinct_tokens",
        "n_bpe_tokens",
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        (F.col("n_digits") / F.col("n_chars")).alias("digit_ratio"),
        (F.col("n_chars") / F.col("n_tokens")).alias("mean_token_len"),
        score.alias("quality_score"),
        F.when(score >= 0.5, "high")
        .when(score >= 0.3, "medium")
        .otherwise("low")
        .alias("quality_bucket"),
        "hits_en",
        "hits_de",
        "hits_fr",
        "hits_es",
        detected.alias("detected_lang"),
        "min_shingle_hash",
        "n_distinct_shingles",
        "n_shingles",
    )
