"""BM25 full-text retrieval over the ``documents`` corpus (round 2, X27).

A training-data engine needs lexical retrieval next to embedding ANN
(similarity.py): targeted corpus audits ("find the docs that talk about X"),
eval-set mining, and hybrid RAG-style retrieval all start with an inverted
index + BM25. This module builds the index declaratively and scores a fixed
multi-query batch with the classic Okapi BM25 weighting.

Cross-engine determinism:
- tf/df/dl/N are exact BIGINT aggregates; avgdl is one cast-then-divide.
- The per-(query,doc) score is a sum of ≤3 per-term doubles added in a
  *fixed order* (conditional pivot on the term's position in the query,
  then coalesce(s0)+coalesce(s1)+coalesce(s2)) — float addition is not
  associative, so an unordered SUM() would not be hash-stable across
  engines; the pivoted form is. The scoring formula itself is written as
  the identical expression tree on both sides.

Scale notes (100 TB story):
- The inverted index (term → postings with tf) is one explode + hash
  aggregate: map-side combine, shuffle carries one row per (doc, matched
  term). The WHERE term IN (...) filter sits *before* the aggregate, so
  only query-vocabulary tokens are ever shuffled — cost is proportional to
  query-term postings, not corpus tokens.
- df and the query-term table are tiny → broadcast; N/avgdl is a 1-row
  aggregate cross-joined (broadcast) onto postings.
- Top-k per query is a windowed rank partitioned by query_id: |queries|·k
  rows survive to the final exchange. No all-pairs, no corpus re-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.text import DUCK_TOKENS, tokens_col
from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10

# Fixed query batch: query_id -> ordered terms (≤3; order fixes the float
# summation order). Terms drawn from the synthetic corpus vocabulary.
BM25_QUERIES: dict[int, tuple[str, ...]] = {
    0: ("spark", "join"),
    1: ("table", "scan", "fast"),
    2: ("vector", "stream"),
    3: ("customer", "merge", "window"),
}
_MAX_TERMS = max(len(t) for t in BM25_QUERIES.values())
_ALL_TERMS = sorted({t for terms in BM25_QUERIES.values() for t in terms})


def _score_expr_sql(tf: str, dl: str, df: str, n: str) -> str:
    """The shared BM25 term-score expression (identical text both engines).

    ``ln`` is the one non-correctly-rounded operation here (JVM Math.log and
    DuckDB's libm log may differ in the last ulp — observed in practice), so
    the idf is quantized to 1e-9 immediately; every other operation is IEEE
    correctly-rounded and therefore bit-identical given identical inputs.
    """
    raw_idf = f"ln(((CAST({n} AS DOUBLE) - {df} + 0.5) / ({df} + 0.5)) + 1.0)"
    idf = f"(round({raw_idf} * 1000000000.0) / 1000000000.0)"
    return (
        f"{idf} * ({tf} * ({BM25_K1} + 1.0)) / "
        f"({tf} + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * {dl} / avgdl))"
    )


_DUCK_QTERMS = " UNION ALL ".join(
    f"SELECT {qid} AS query_id, {ord_} AS ord, '{term}' AS term"
    for qid, terms in BM25_QUERIES.items()
    for ord_, term in enumerate(terms)
)


@query(
    "bm25_retrieval",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({DUCK_TOKENS}) AS t FROM documents
    ),
    dl AS (
      SELECT doc_id, CAST(len({DUCK_TOKENS}) AS BIGINT) AS dl FROM documents
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE t IN ({", ".join(f"'{t}'" for t in _ALL_TERMS)})
      GROUP BY 1, 2
    ),
    df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ),
    qterms AS (
      {_DUCK_QTERMS}
    ),
    scored AS (
      SELECT
        q.query_id,
        tf.doc_id,
        q.ord,
        {_score_expr_sql("tf.tf", "dl.dl", "df.df", "stats.n")} AS s
      FROM qterms q
      JOIN tf ON q.term = tf.term
      JOIN df ON q.term = df.term
      JOIN dl ON tf.doc_id = dl.doc_id
      CROSS JOIN stats
    ),
    pivoted AS (
      SELECT query_id, doc_id,
        {", ".join(f"max(CASE WHEN ord = {o} THEN s END) AS s{o}" for o in range(_MAX_TERMS))},
        CAST({" + ".join(f"count(CASE WHEN ord = {o} THEN 1 END)" for o in range(_MAX_TERMS))} AS BIGINT)
          AS n_terms_matched
      FROM scored GROUP BY 1, 2
    ),
    totals AS (
      SELECT query_id, doc_id, n_terms_matched,
        {" + ".join(f"coalesce(s{o}, 0.0)" for o in range(_MAX_TERMS))} AS score
      FROM pivoted
    ),
    ranked AS (
      SELECT *,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, doc_id ASC) AS rnk
      FROM totals
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_terms_matched,
           score, rnk
    FROM ranked WHERE rnk <= {BM25_TOP_K}
    """,
)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens_col(F.col("text")).alias("t"))

    # ONE corpus pass: doc length + exploded *pre-filtered* matched terms
    # (the filter runs inside the array before the explode, so the Generate
    # only fans out query-vocabulary hits; explode_outer keeps zero-match
    # docs so corpus statistics can come from this same relation). The
    # aggregate is |docs|·|matched terms| rows — corpus-independent-ly tiny
    # relative to text bytes — and is pinned with localCheckpoint so the
    # text is tokenized exactly once for stats, df, and scoring.
    matched = F.filter(F.col("t"), lambda tk: tk.isin(_ALL_TERMS))
    base = (
        toks.select(
            "doc_id",
            F.size("t").cast("long").alias("dl"),
            F.explode_outer(matched).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint(eager=True)
    )

    # Corpus statistics are two scalars — collect and inline as literals
    # (a 1-row aggregate stays metadata-sized at any corpus scale; inlining
    # keeps the scoring plan free of a cross join + extra stage).
    n, sum_dl = (
        base.select("doc_id", "dl")
        .distinct()
        .select(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("dl").cast("long").alias("sum_dl"),
        )
        .first()
    )
    avgdl = float(sum_dl) / n  # same one IEEE division as the oracle

    tf = base.filter(F.col("term").isNotNull())
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))

    from demo_iceberg_permanent_delete_spark.lake.table import _local_frame

    # one Arrow batch, not a 32-slice Python parallelize (the broadcast
    # build otherwise launches a full-width Python-worker job)
    qterms = _local_frame(
        spark,
        [
            (qid, ord_, term)
            for qid, terms in BM25_QUERIES.items()
            for ord_, term in enumerate(terms)
        ],
        "query_id long, ord int, term string",
    )

    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .select(
            "query_id",
            "doc_id",
            "ord",
            F.expr(
                # Spark parses bare decimal literals as DECIMAL — pin DOUBLE
                _score_expr_sql("tf", "dl", "df", str(n)).replace(
                    "avgdl", f"CAST({avgdl!r} AS DOUBLE)"
                )
            ).alias("s"),
        )
    )
    pivoted = scored.groupBy("query_id", "doc_id").agg(
        *[F.max(F.when(F.col("ord") == o, F.col("s"))).alias(f"s{o}") for o in range(_MAX_TERMS)],
        sum(
            [F.count(F.when(F.col("ord") == o, F.lit(1))) for o in range(_MAX_TERMS)],
            F.lit(0),
        )
        .cast("long")
        .alias("n_terms_matched"),
    )
    score = None
    for o in range(_MAX_TERMS):
        part = F.coalesce(F.col(f"s{o}"), F.lit(0.0))
        score = part if score is None else score + part
    totals = pivoted.select("query_id", "doc_id", "n_terms_matched", score.alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        totals.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= BM25_TOP_K)
        .select("query_id", "doc_id", "n_terms_matched", "score", "rnk")
    )
