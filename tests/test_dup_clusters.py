"""Cluster-resolution tests: connected components must be transitive,
bounded-iteration, and produce exactly one canonical doc per cluster."""

from __future__ import annotations

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark import registry
from tigerbeetle_cdc_nats_spark.operators.dedup import connected_components


def test_cc_merges_transitive_chain(spark):
    """1-2, 2-3 and 5-6: {1,2,3} collapse to cluster 1 even though (1,3)
    was never an edge; {5,6} stay separate."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["src", "dst"])
    got = {r["node"]: r["cluster_id"]
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_cc_converges_on_long_chain(spark):
    """A length-12 chain is the diameter worst case for hash-to-min; the
    fixpoint (everything labeled with the chain min) must still land
    within the iteration bound."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["src", "dst"])
    labels = connected_components(edges).collect()
    assert {r["cluster_id"] for r in labels} == {0}
    assert len(labels) == 13


def test_dup_clusters_one_canonical_per_cluster(spark, sf_dir):
    df = registry.all_queries()["dup_clusters"].fn(spark, sf_dir)
    rows = df.collect()
    assert rows, "testdata contains near-dup pairs; clusters expected"
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        # every member of an edge-induced cluster has >= 2 docs
        assert len(members) >= 2
        assert all(m["cluster_size"] == len(members) for m in members)
        canon = [m for m in members if m["is_canonical"] == 1]
        assert len(canon) == 1
        assert canon[0]["doc_id"] == cid == min(m["doc_id"] for m in members)


def test_canonical_selection_quality_decides(spark, sf_dir):
    """Exactly one kept doc per cluster, and in at least one cluster the
    quality ranking must pick a doc OTHER than the min-id default —
    proving the score, not the id, decides survival."""
    df = registry.all_queries()["canonical_selection"].fn(spark, sf_dir)
    rows = df.collect()
    kept_per_cluster = {}
    for r in rows:
        kept_per_cluster.setdefault(r["cluster_id"], 0)
        kept_per_cluster[r["cluster_id"]] += r["is_kept"]
    assert all(v == 1 for v in kept_per_cluster.values())
    assert any(r["is_kept"] == 1 and r["doc_id"] != r["cluster_id"]
               for r in rows)
