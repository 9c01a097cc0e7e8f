"""Training-data preparation operators: document chunking, token-budget
sequence packing, and stratified deterministic sampling (north-star
extension surface — the reference has no text pipeline; SURVEY.md §2.8).

All three are codegen-only column expressions (zero Python UDFs, zero
collects):

- **Chunking** is a pure projection + explode: token-window chunks with
  overlap, chunk count and slices computed with integer arithmetic so the
  DuckDB oracle is bit-identical. Shuffle-free — at 100 TB it streams.
- **Packing** assigns each sequence to a fixed-token-budget shard ("pack")
  by a running token cumsum per shard key: a sequence belongs to the pack
  where its first token lands, so packs are contiguous in the declared
  order and may overflow by at most one sequence — the standard
  contiguous-fill sharding used to cut training batches. One window over
  one keyed Exchange; deterministic given the (unique) order columns.
- **Sampling** keeps a row iff a 60-bit md5 hash of its id, mod 100, falls
  under the stratum's percentage — deterministic across engines and runs,
  no RNG state, trivially reproducible on a cluster (classic
  hash-mod curation, e.g. language rebalancing).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.contamination import (
    BENCH_MOD,
    benchmark_ngram_contamination,
)
from demo_iceberg_permanent_delete_spark.operators.text import (
    DUCK_TOKENS,
    duck_hash60,
    spark_hash60,
)
from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

CHUNK_TOKENS = 32
OVERLAP_TOKENS = 8
STRIDE = CHUNK_TOKENS - OVERLAP_TOKENS
PACK_BUDGET_TOKENS = 256
SAMPLE_PERCENTS = {"en": 30}  # curation: downsample the dominant language
SAMPLE_DEFAULT_PERCENT = 100


def chunk_documents(
    docs: DataFrame,
    *,
    text_col: str = "text",
    chunk_tokens: int = CHUNK_TOKENS,
    overlap_tokens: int = OVERLAP_TOKENS,
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_tokens`` with ``overlap_tokens`` overlap (stride =
    chunk - overlap). Adds ``chunk_id`` (0-based), ``n_chunk_tokens``,
    ``chunk_text``; short documents yield exactly one chunk.

    Pure narrow transformation (split → sequence → explode → slice):
    no shuffle, stays in whole-stage codegen.
    """
    stride = chunk_tokens - overlap_tokens
    if stride <= 0:
        raise ValueError("overlap must be smaller than the chunk size")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # ceil((n - chunk) / stride) + 1 in integer arithmetic; 1 when n <= chunk
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / stride) + 1
    )
    start = F.col("chunk_id") * stride  # 0-based token offset
    return (
        docs.withColumn("__toks", toks)
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn(
            "n_chunk_tokens",
            F.least(F.lit(chunk_tokens), F.size(F.col("__toks")) - start).cast("long"),
        )
        .withColumn(
            "chunk_text",
            F.array_join(F.slice(F.col("__toks"), start + 1, chunk_tokens), " "),
        )
        .withColumn("chunk_id", F.col("chunk_id").cast("long"))
        .drop("__toks")
    )


def pack_sequences(
    seqs: DataFrame,
    *,
    shard_col: str,
    order_cols: Sequence[str],
    token_col: str,
    budget_tokens: int = PACK_BUDGET_TOKENS,
) -> DataFrame:
    """Assign each sequence a ``pack_id`` within its shard: contiguous fill
    in ``order_cols`` order, a new pack every ``budget_tokens`` tokens. The
    pack a sequence starts in owns it, so a pack can overflow by at most
    one sequence — bounded, deterministic, and computable with one window
    cumsum (an exact first-fit would be an inherently sequential loop).

    ``order_cols`` must be unique per shard for a deterministic result.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tokens_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return seqs.withColumn(
        "pack_id", F.floor(tokens_before / budget_tokens).cast("long")
    )


SPLIT_BOUNDS = (("train", 80), ("val", 90), ("test", 100))


def train_val_test_split(
    df: DataFrame,
    *,
    id_col: str,
    salt: str = "split",
    bounds: Sequence[tuple[str, int]] = SPLIT_BOUNDS,
) -> DataFrame:
    """Deterministic dataset split: ``hash60(salt:id) % 100`` bucketed by
    the cumulative ``bounds`` percentages (default 80/10/10). Hash-based,
    so membership is stable under corpus growth and reshuffling — a
    document never migrates between train and eval when new data lands,
    which random splits cannot guarantee. Adds a ``split`` column."""
    h = spark_hash60(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))
    ) % 100
    label = None
    for name, upper in reversed(bounds):
        label = (
            F.lit(name)
            if label is None
            else F.when(h < upper, F.lit(name)).otherwise(label)
        )
    return df.withColumn("split", label)


def stratified_sample(
    df: DataFrame,
    *,
    stratum_col: str,
    id_col: str,
    percents: Mapping[str, int],
    default_percent: int = 100,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff
    ``hash60(salt:id) % 100 < percent(stratum)``. Same input → same sample,
    on any cluster, with no RNG or seed plumbing; changing ``salt`` draws
    an independent sample.
    """
    pct = F.lit(default_percent)
    for value, p in sorted(percents.items()):
        pct = F.when(F.col(stratum_col) == value, F.lit(p)).otherwise(pct)
    h = spark_hash60(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return df.filter((h % 100) < pct)


# ---------------------------------------------------------------------------
# Driver query: the preparation stages label-packed over ``documents`` and
# combined with unionByName with shuffled column orders (R5 coverage — this
# entry supersedes the standalone union_by_name query).
# Parts: 'chunk' = every chunk (text verified verbatim), 'pack' = per
# (lang, pack) sequence/token totals, 'sample' = the surviving doc ids of a
# 30%-en / 100%-other curation pass, 'contam' = per-corpus-doc benchmark
# 5-gram collision counts (operators/contamination.py), 'split' = the
# deterministic 80/10/10 train/val/test assignment.
# ---------------------------------------------------------------------------
_DUCK_TOKS = "string_split_regex(trim(text), '\\s+')"


@query(
    "training_data_prep",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {_DUCK_TOKS} AS t, len({_DUCK_TOKS}) AS n
      FROM documents
    ),
    chunked AS (
      SELECT doc_id, lang, t, n,
             unnest(range(0, CASE WHEN n <= {CHUNK_TOKENS} THEN 1
                   ELSE (n - {CHUNK_TOKENS} + {STRIDE} - 1) // {STRIDE} + 1 END)) AS chunk_id
      FROM toks
    ),
    chunks AS (
      SELECT doc_id, lang, CAST(chunk_id AS BIGINT) AS chunk_id,
             CAST(least({CHUNK_TOKENS}, n - chunk_id * {STRIDE}) AS BIGINT) AS n_chunk_tokens,
             array_to_string(t[chunk_id * {STRIDE} + 1 : chunk_id * {STRIDE} + {CHUNK_TOKENS}], ' ') AS chunk_text
      FROM chunked
    ),
    packed AS (
      SELECT lang, chunk_id, n_chunk_tokens,
             CAST(coalesce(sum(n_chunk_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               // {PACK_BUDGET_TOKENS} AS pack_id
      FROM chunks
    )
    SELECT 'chunk' AS part, doc_id AS k1, chunk_id AS k2, n_chunk_tokens AS n, chunk_text AS s
    FROM chunks
    UNION ALL BY NAME
    SELECT 'pack' AS part, lang AS s, CAST(pack_id AS BIGINT) AS k1,
           CAST(count(*) AS BIGINT) AS k2, CAST(sum(n_chunk_tokens) AS BIGINT) AS n
    FROM packed GROUP BY lang, pack_id
    UNION ALL BY NAME
    SELECT 'sample' AS part, doc_id AS k1, CAST(NULL AS BIGINT) AS k2,
           CAST(NULL AS BIGINT) AS n, lang AS s
    FROM documents
    WHERE CAST('0x'||substr(md5('sample:'||CAST(doc_id AS VARCHAR)),1,15) AS BIGINT) % 100
          < CASE WHEN lang = 'en' THEN {SAMPLE_PERCENTS["en"]} ELSE {SAMPLE_DEFAULT_PERCENT} END
    UNION ALL BY NAME
    SELECT 'contam' AS part, doc_id AS k1, n_matched AS k2, n_ngrams AS n,
           CAST(NULL AS VARCHAR) AS s
    FROM (
      WITH lt AS (
        SELECT doc_id, {DUCK_TOKENS} AS t FROM documents
      ),
      gr AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
          generate_series(1, greatest(len(t) - 4, 0)),
          i -> {duck_hash60("t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4]")}
        ))) AS h
        FROM lt
      ),
      bench AS (SELECT DISTINCT h FROM gr WHERE doc_id % {BENCH_MOD} = 0)
      SELECT c.doc_id,
             CAST(count(*) AS BIGINT) AS n_ngrams,
             CAST(count(b.h) AS BIGINT) AS n_matched
      FROM gr c LEFT JOIN bench b USING (h)
      WHERE c.doc_id % {BENCH_MOD} <> 0
      GROUP BY c.doc_id
    )
    UNION ALL BY NAME
    SELECT 'split' AS part, doc_id AS k1, CAST(NULL AS BIGINT) AS k2,
           CAST(NULL AS BIGINT) AS n,
           CASE
             WHEN CAST('0x'||substr(md5('split:'||CAST(doc_id AS VARCHAR)),1,15) AS BIGINT) % 100 < 80 THEN 'train'
             WHEN CAST('0x'||substr(md5('split:'||CAST(doc_id AS VARCHAR)),1,15) AS BIGINT) % 100 < 90 THEN 'val'
             ELSE 'test'
           END AS s
    FROM documents
    """,
)
def training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    chunks = chunk_documents(docs.select("doc_id", "lang", "text"))
    chunk_part = chunks.select(
        F.lit("chunk").alias("part"),
        F.col("doc_id").alias("k1"),
        F.col("chunk_id").alias("k2"),
        F.col("n_chunk_tokens").alias("n"),
        F.col("chunk_text").alias("s"),
    )

    packed = pack_sequences(
        chunks,
        shard_col="lang",
        order_cols=("doc_id", "chunk_id"),
        token_col="n_chunk_tokens",
    )
    pack_part = packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("k2"),
        F.sum("n_chunk_tokens").alias("n"),
    ).select(
        F.lit("pack").alias("part"),
        F.col("lang").alias("s"),
        F.col("pack_id").alias("k1"),
        "k2",
        "n",
    )

    sample_part = stratified_sample(
        docs.select("doc_id", "lang"),
        stratum_col="lang",
        id_col="doc_id",
        percents=SAMPLE_PERCENTS,
        default_percent=SAMPLE_DEFAULT_PERCENT,
    ).select(
        F.lit("sample").alias("part"),
        F.col("doc_id").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.lit(None).cast("long").alias("n"),
        F.col("lang").alias("s"),
    )

    contam_part = benchmark_ngram_contamination(docs).select(
        F.lit("contam").alias("part"),
        F.col("doc_id").alias("k1"),
        F.col("n_matched").alias("k2"),
        F.col("n_ngrams").alias("n"),
        F.lit(None).cast("string").alias("s"),
    )

    split_part = train_val_test_split(
        docs.select("doc_id"), id_col="doc_id"
    ).select(
        F.lit("split").alias("part"),
        F.col("doc_id").alias("k1"),
        F.lit(None).cast("long").alias("k2"),
        F.lit(None).cast("long").alias("n"),
        F.col("split").alias("s"),
    )

    return (
        chunk_part.unionByName(pack_part)
        .unionByName(sample_part)
        .unionByName(contam_part)
        .unionByName(split_part)
    )
