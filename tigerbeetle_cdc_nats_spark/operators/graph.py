"""Iterative graph operators over the near-dup pair graph.

``dedup.connected_components`` resolves WHICH docs form a cluster; PageRank
ranks nodes WITHIN the graph (e.g. pick the most-connected member as the
cluster's canonical doc, or surface hub documents whose content spread
across a corpus). Implemented as unrolled Lloyd-style iterations of the
standard distributed PR step — each iteration is one join (ranks ⋈ edges on
src) plus one aggregation (sum contributions per dst), both shuffles keyed
on the node id, so successive iterations reuse the same hash partitioning.

Integer-exact cross-engine: ranks live in 1e-6 units (BIGINT). Each
contribution is ``rank // degree`` (integer division), the damped update is
``150000 + FLOOR(0.85 * sum)`` — double multiplication of an integer <
2^53 is exactly rounded, so both engines floor the identical value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DAMP_E6 = 850000
BASE_E6 = 150000


def undirect(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """(a,b) pair set -> both-direction edge list (src, dst)."""
    fwd = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    rev = pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    return fwd.unionByName(rev)


def pagerank_e6(edges: DataFrame, iterations: int = 2) -> DataFrame:
    """PageRank over (src, dst) edges, ``iterations`` unrolled steps from a
    uniform 1.0 (= 1e6) start. Output: (doc_id, degree, pr_e6).

    The edge list with degrees is materialized once (it is read by every
    iteration); ranks stay (node, BIGINT) rows — the only per-iteration
    state, linear in node count.
    """
    from pyspark import StorageLevel

    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)

    ranks = deg.select(F.col("src").alias("node"),
                       F.lit(1000000).cast("long").alias("pr_e6"))
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", F.expr("pr_e6 div deg").alias("c"))
        )
        ranks = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
            .select(
                "node",
                (F.lit(BASE_E6)
                 + F.floor(0.85 * F.col("s").cast("double")).cast("long"))
                .alias("pr_e6"),
            )
        )
    return (
        ranks.join(deg, ranks["node"] == deg["src"])
        .select(F.col("node").alias("doc_id"),
                F.col("deg").cast("bigint").alias("degree"), "pr_e6")
    )
