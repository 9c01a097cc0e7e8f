"""PII detection and redaction over unstructured text (round 2).

The reference's entire storyline is *structured* PII removal — an
``email_address`` column deleted row-wise or nulled column-wise
(``notebooks/iceberg_pii_deletion_demo.py:75-80`` schema, ``:178-183``
DELETE, ``:229-236`` UPDATE … SET email_address = NULL).  A training-data
pipeline needs the unstructured twin of that capability: find PII *inside
free text* (emails, SSNs, phone numbers, IP addresses) and redact it before
the text reaches a model.  This module provides that as a pure projection —
scan + count + redact in one codegen pass.

Cross-engine determinism:
- Patterns use only character classes, bounded repetition and ``\\b`` — the
  subset on which Java's regex (Spark) and RE2 (DuckDB) agree exactly.
- The synthetic ``documents`` table carries no real PII, so the query plants
  deterministic PII spans derived from ``doc_id`` *identically* in the Spark
  expression and the oracle SQL — the machinery (match, count, replace,
  hash) is then hash-checked end-to-end on non-trivial values.
- Redaction applies the four patterns in a fixed order (email → ssn → phone
  → ip); replacement tokens contain no digits or ``@`` so later patterns
  cannot match earlier replacements.

Scale notes (100 TB story):
- Shuffle-free: per-row regexp projections inside whole-stage codegen; no
  joins, no aggregates on the data path.  Cost is O(bytes scanned) per
  executor, embarrassingly parallel across parquet splits.
- At production scale the same projection runs as a COW ``UPDATE`` through
  the lake layer (lake/table.py) to *permanently* rewrite offending files —
  the detection columns double as the audit trail the reference's
  delete-file audit provides for structured deletes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.registry import query
from demo_iceberg_permanent_delete_spark.sources.tables import load_table

# Java (Spark) and RE2 (DuckDB) agree on these constructs exactly.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    "ssn": ("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "[SSN]"),
    "phone": ("\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "[PHONE]"),
    "ip": ("\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]"),
}


def _spark_injected(text: Column, doc_id: Column) -> Column:
    """Plant deterministic PII spans (same construction as the oracle)."""
    did = doc_id.cast("string")
    pad4 = F.lpad((doc_id % 10000).cast("string"), 4, "0")
    return F.concat(
        text,
        F.when(doc_id % 3 == 0, F.concat(F.lit(" contact user"), did, F.lit("@example.com now"))).otherwise(F.lit("")),
        F.when(doc_id % 5 == 0, F.concat(F.lit(" ssn 987-65-"), pad4)).otherwise(F.lit("")),
        F.when(doc_id % 7 == 0, F.concat(F.lit(" call 415-555-"), pad4)).otherwise(F.lit("")),
        F.when(
            doc_id % 11 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (doc_id % 256).cast("string"),
                F.lit("."),
                ((doc_id * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )


_DUCK_INJECTED = """
      concat(
        text,
        CASE WHEN doc_id % 3 = 0
             THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
             ELSE '' END,
        CASE WHEN doc_id % 5 = 0
             THEN ' ssn 987-65-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             ELSE '' END,
        CASE WHEN doc_id % 7 = 0
             THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             ELSE '' END,
        CASE WHEN doc_id % 11 = 0
             THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' ||
                  CAST((doc_id * 7) % 256 AS VARCHAR)
             ELSE '' END
      )
"""


def redact_pii(text: Column) -> Column:
    """Fixed-order redaction; tokens are inert to the later patterns."""
    out = text
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def scan_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-kind match counts + a redacted column (pure projection)."""
    t = F.col(text_col)
    counted = df.select(
        "*",
        *[
            F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{kind}")
            for kind, (pat, _) in PII_PATTERNS.items()
        ],
        redact_pii(t).alias("redacted"),
    )
    flags = [F.col(f"n_{kind}") > 0 for kind in PII_PATTERNS]
    has = flags[0]
    for f in flags[1:]:
        has = has | f
    return counted.withColumn("has_pii", has)


def _duck_redact(expr: str) -> str:
    out = expr
    for pat, token in PII_PATTERNS.values():
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


@query(
    "pii_redaction",
    oracle=f"""
    WITH injected AS (
      SELECT doc_id, lang, {_DUCK_INJECTED} AS text FROM documents
    )
    SELECT
      doc_id,
      lang,
      {", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{kind}"
        for kind, (pat, _) in PII_PATTERNS.items()
      )},
      (len(regexp_extract_all(text, '{PII_PATTERNS["email"][0]}')) > 0
       OR len(regexp_extract_all(text, '{PII_PATTERNS["ssn"][0]}')) > 0
       OR len(regexp_extract_all(text, '{PII_PATTERNS["phone"][0]}')) > 0
       OR len(regexp_extract_all(text, '{PII_PATTERNS["ip"][0]}')) > 0) AS has_pii,
      md5({_duck_redact("text")}) AS redacted_hash
    FROM injected
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + redact the planted-PII documents corpus, hash the redacted text."""
    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id", "lang", _spark_injected(F.col("text"), F.col("doc_id")).alias("text")
    )
    scanned = scan_pii(injected)
    return scanned.select(
        "doc_id",
        "lang",
        *[f"n_{kind}" for kind in PII_PATTERNS],
        "has_pii",
        F.md5(F.col("redacted")).alias("redacted_hash"),
    )
