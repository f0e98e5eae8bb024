"""PageRank operator: hand-checked values on a tiny graph + rank-mass
sanity on a hub."""

from __future__ import annotations

from tigerbeetle_cdc_nats_spark.operators.graph import pagerank_e6, undirect


def test_pagerank_matches_hand_computation(spark):
    # path graph 1 - 2 - 3: deg = {1:1, 2:2, 3:1}
    # iter1: pr(1)=pr(3)=150000+floor(.85*(1000000//2))=575000
    #        pr(2)=150000+floor(.85*(1000000+1000000))=1850000
    # iter2: pr(1)=pr(3)=150000+floor(.85*(1850000//2))=936250
    #        pr(2)=150000+floor(.85*(575000+575000))=1127500
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    got = {r["doc_id"]: r for r in pagerank_e6(undirect(pairs)).collect()}
    assert got[1]["pr_e6"] == 936250 and got[1]["degree"] == 1
    assert got[3]["pr_e6"] == 936250
    assert got[2]["pr_e6"] == 1127500 and got[2]["degree"] == 2


def test_pagerank_ranks_hub_highest(spark):
    # star: center 0 linked to 1..6 — the hub must out-rank every leaf
    pairs = spark.createDataFrame([(0, i) for i in range(1, 7)],
                                  "doc_a long, doc_b long")
    got = {r["doc_id"]: r["pr_e6"] for r in
           pagerank_e6(undirect(pairs)).collect()}
    assert all(got[0] > got[i] for i in range(1, 7))
