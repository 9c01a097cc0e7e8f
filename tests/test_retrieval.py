"""BM25 retrieval invariants (operators/retrieval.py X27)."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.retrieval import (
    BM25_QUERIES,
    BM25_TOP_K,
    bm25_retrieval,
)
from demo_iceberg_permanent_delete_spark.sources.tables import load_table
from tests.conftest import SF_ORACLE


def test_bm25_basic_invariants(spark):
    out = bm25_retrieval(spark, SF_ORACLE).collect()
    assert out, "corpus vocabulary should match the fixed queries"

    by_query: dict[int, list] = {}
    for r in out:
        by_query.setdefault(r["query_id"], []).append(r)

    for qid, rows in by_query.items():
        assert len(rows) <= BM25_TOP_K
        ranks = sorted(r["rnk"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        ordered = sorted(rows, key=lambda r: r["rnk"])
        for a, b in zip(ordered, ordered[1:]):
            assert (a["score"], -a["doc_id"]) >= (b["score"], -b["doc_id"])
        assert all(r["score"] > 0 for r in rows)
        assert all(1 <= r["n_terms_matched"] <= len(BM25_QUERIES[qid]) for r in rows)


def test_bm25_hits_actually_contain_terms(spark):
    docs = {
        r["doc_id"]: set(r["text"].lower().split())
        for r in load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for r in bm25_retrieval(spark, SF_ORACLE).collect():
        terms = set(BM25_QUERIES[r["query_id"]])
        matched = terms & docs[r["doc_id"]]
        assert len(matched) == r["n_terms_matched"]


def test_bm25_plan_broadcasts_small_sides(spark):
    plan = bm25_retrieval(spark, SF_ORACLE)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
