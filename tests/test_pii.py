"""PII detection/redaction semantics (operators/pii.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.pii import (
    PII_PATTERNS,
    pii_redaction,
    scan_pii,
)
from tests.conftest import SF_ORACLE


def test_scan_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_d@sub.example.org and 12.34.56.78 today"),
            (2, "ssn 123-45-6789 phone 415-555-0042"),
            (3, "clean text with no identifiers"),
            (4, "two mails x@y.io z@w.co and ip 1.2.3.4"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r for r in scan_pii(df).collect()}

    assert (out[1]["n_email"], out[1]["n_ip"]) == (1, 1)
    assert (out[2]["n_ssn"], out[2]["n_phone"]) == (1, 1)
    assert not out[3]["has_pii"]
    assert (out[4]["n_email"], out[4]["n_ip"]) == (2, 1)

    assert out[1]["redacted"] == "mail [EMAIL] and [IP] today"
    assert out[2]["redacted"] == "ssn [SSN] phone [PHONE]"
    assert out[3]["redacted"] == out[3]["text"]
    assert out[4]["redacted"] == "two mails [EMAIL] [EMAIL] and ip [IP]"


def test_redacted_text_is_pii_free(spark):
    """Re-scanning redacted output finds nothing — redaction is idempotent."""
    df = _redacted_docs(spark)
    rescan = scan_pii(df.select(F.col("redacted").alias("text")))
    assert rescan.filter(F.col("has_pii")).count() == 0


def _redacted_docs(spark):
    from demo_iceberg_permanent_delete_spark.operators.pii import (
        _spark_injected,
        redact_pii,
    )
    from demo_iceberg_permanent_delete_spark.sources.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    return docs.select(
        "doc_id",
        redact_pii(_spark_injected(F.col("text"), F.col("doc_id"))).alias("redacted"),
    )


def test_planted_pii_is_found(spark):
    """Every doc_id divisible by 3/5/7/11 gets its planted span detected."""
    rows = {r["doc_id"]: r for r in pii_redaction(spark, SF_ORACLE).collect()}
    for doc_id, r in rows.items():
        assert r["n_email"] >= (1 if doc_id % 3 == 0 else 0)
        assert r["n_ssn"] >= (1 if doc_id % 5 == 0 else 0)
        assert r["n_phone"] >= (1 if doc_id % 7 == 0 else 0)
        assert r["n_ip"] >= (1 if doc_id % 11 == 0 else 0)
    assert any(r["has_pii"] for r in rows.values())
