"""Connected-components duplicate clustering (operators/dedup.py X2e)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_iceberg_permanent_delete_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
    lsh_candidate_edges,
    minhash_signatures,
)
from tests.conftest import SF_ORACLE


def test_connected_components_chain_and_islands(spark):
    # Components: {1,2,3,4} (a chain), {10,11}, singletons {20}, {21}.
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 20, 21)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 21}


def test_connected_components_distributed_path_matches(spark, monkeypatch):
    """Force the ≥gate distributed loop (hash-min + pointer jumping) and
    assert it matches the driver union-find fast path on the same graph."""
    import demo_iceberg_permanent_delete_spark.operators.dedup as dd

    nodes = spark.createDataFrame(
        [(i,) for i in range(30)], "doc_id long"
    )
    # chain 0..9 (deep path exercises pointer jumping), star 10..14,
    # pair {20,21}, singletons elsewhere
    e = [(i, i + 1) for i in range(9)] + [(10, j) for j in (11, 12, 13, 14)] + [(21, 20)]
    edges = spark.createDataFrame(e, "src long, dst long")
    fast = {r["doc_id"]: r["cluster_id"] for r in connected_components(nodes, edges).collect()}
    monkeypatch.setattr(dd, "_CC_LOCAL_MAX_EDGES", -1)
    dist = {r["doc_id"]: r["cluster_id"] for r in connected_components(nodes, edges).collect()}
    assert fast == dist
    assert dist[9] == 0 and dist[14] == 10 and dist[20] == 20 and dist[25] == 25


def test_connected_components_direction_independent(spark):
    # Label must flow against edge direction too (edges are undirected).
    nodes = spark.createDataFrame([(i,) for i in (5, 6, 7)], "doc_id long")
    edges = spark.createDataFrame([(7, 6), (6, 5)], "src long, dst long")
    got = {r["doc_id"]: r["cluster_id"] for r in connected_components(nodes, edges).collect()}
    assert got == {5: 5, 6: 5, 7: 5}


def test_cluster_invariants_on_corpus(spark):
    out = dedup_clusters(spark, SF_ORACLE)
    rows = out.collect()
    assert len(rows) == out.select("doc_id").distinct().count()  # one row per doc

    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        ids = sorted(m["doc_id"] for m in members)
        assert cid == ids[0]  # canonical = min doc_id
        assert sum(m["is_canonical"] for m in members) == 1
        assert all(m["cluster_size"] == len(members) for m in members)

    # The corpus has planted near-dups: at least one non-trivial cluster.
    assert any(len(m) > 1 for m in by_cluster.values())


def test_cluster_membership_covers_lsh_edges(spark):
    """Every LSH candidate edge must land inside one cluster."""
    sig = minhash_signatures(spark, SF_ORACLE)
    edges = lsh_candidate_edges(sig).collect()
    assert edges, "corpus should produce candidate edges"
    cl = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(spark, SF_ORACLE).collect()}
    for e in edges:
        assert cl[e["src"]] == cl[e["dst"]]


def test_connected_components_string_ids_fast_path(spark):
    """The id_col contract is any orderable type: string doc ids must work
    through the driver union-find fast path (regression: an int() coercion
    broke non-integer ids under the edge gate)."""
    from demo_iceberg_permanent_delete_spark.operators.dedup import (
        connected_components,
    )

    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",)], "doc_id string"
    )
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("e", "d")], "src string, dst string"
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(nodes, edges).collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}
