"""Semantic invariants of the round-4 operators: PII redaction is a
fixpoint, containment is asymmetric where Jaccard is not, MMR picks are
distinct and relevance-led, BPE's positional rewrite equals a Python
greedy reference, and the lift statistic matches a hand count."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.operators import pii
from tigerbeetle_cdc_nats_spark.operators import similarity as sim
from tigerbeetle_cdc_nats_spark.registry import all_queries
from tigerbeetle_cdc_nats_spark.session import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_redaction_is_a_fixpoint(spark):
    rows = [
        (1, "mail me at jo.doe+x@test.org or 10.1.2.3 now"),
        (2, "call +49 555 1234 twice +49 555 9999"),
        (3, "id 123456789 and ip 255.255.255.255"),
        (4, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    red = df.select(pii.redact("text").alias("text"))
    leftover = red.select(*pii.pii_counts("text")).agg(
        *[F.sum(f"n_{n}").alias(n) for n, _p, _t in pii.PATTERNS]
    ).collect()[0]
    assert all(v == 0 for v in leftover), leftover.asDict()
    # and the unredacted input really did contain matches
    found = df.select(*pii.pii_counts("text")).agg(
        *[F.sum(f"n_{n}").alias(n) for n, _p, _t in pii.PATTERNS]
    ).collect()[0]
    assert found["email"] == 1 and found["ipv4"] >= 2
    assert found["phone"] == 2 and found["id_number"] == 1


def test_containment_detects_doc_in_doc(spark, sf_dir=SF_DIR):
    """A short doc fully embedded in a long one: containment(short)=1.0
    while Jaccard is far below the usual dup threshold."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    long_doc = base + (" phi chi psi omega one two three four five six "
                       "seven eight nine ten eleven twelve")
    rows = [(1, base), (2, long_doc)]
    docs = spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("source", F.lit("s")).withColumn("lang", F.lit("en")) \
        .withColumn("n_chars", F.length("text"))
    from tigerbeetle_cdc_nats_spark.operators import dedup as dd

    sets = (dd.gram_hash_rows(docs).groupBy("doc_id")
            .agg(F.collect_set("h").alias("sh")))
    a, b = [r for r in sets.collect()]
    sa, sb = set(a["sh"]), set(b["sh"])
    if a["doc_id"] != 1:
        sa, sb = sb, sa
    inter = len(sa & sb)
    assert inter == len(sa)                       # containment(A in B) = 1
    assert inter / len(sa | sb) < 0.7             # Jaccard well below 1


def test_mmr_first_pick_is_max_relevance_and_picks_distinct(spark):
    q = all_queries()["mmr_rerank"]
    out = q.fn(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["q_id"], []).append(r)
    emb = load_table(spark, SF_DIR, "embeddings")
    top1 = {r["q_id"]: r["c_id"]
            for r in sim.knn_bruteforce(
                emb, sorted(by_q), k=1,
                dim=sim.embedding_dim(SF_DIR)).collect()}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["mmr_rank"])
        ids = [r["c_id"] for r in rows]
        assert len(set(ids)) == len(ids) == 5
        assert ids[0] == top1[qid]                # rank 1 = argmax relevance
        assert rows[0]["rel_e6"] == max(r["rel_e6"] for r in rows)


def _greedy_merge(tokens, a, b):
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + "_" + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


@pytest.mark.parametrize("text,a,b", [
    ("x a b a b y", "a", "b"),
    ("a b b a b", "a", "b"),
    ("a a b c a b", "a", "b"),
    ("c c c", "c", "d"),
    ("p q", "p", "q"),
])
def test_bpe_positional_rewrite_equals_greedy(spark, text, a, b):
    from tigerbeetle_cdc_nats_spark.queries_corpus import _BPE_SPARK_MERGE

    df = spark.createDataFrame([(text,)], "text string").select(
        F.split("text", " ").alias("toks"),
        F.lit(a).alias("ta"), F.lit(b).alias("tb"))
    got = df.select(F.expr(_BPE_SPARK_MERGE).alias("mt")).collect()[0]["mt"]
    assert list(got) == _greedy_merge(text.split(" "), a, b)


def test_token_lift_matches_hand_count(spark, tmp_path):
    # 15 tokens -> 14 adjacent pairs; (u,v) x6, u-first x6, v-second x6:
    # lift = (6 * 14) / (6 * 6), e6-floored.
    text = " ".join(["u v"] * 6) + " w z w"
    docs = spark.createDataFrame(
        [(1, text, "s", "en", len(text))],
        "doc_id long, text string, source string, lang string, n_chars long")
    d = str(tmp_path / "documents.parquet")
    docs.write.parquet(d)
    q = all_queries()["token_lift_pairs"]
    out = {(r["tok_a"], r["tok_b"]): r for r in
           q.fn(spark, str(tmp_path)).collect()}
    uv = out[("u", "v")]
    assert (uv["n_ab"], uv["n_a"], uv["n_b"]) == (6, 6, 6)
    assert uv["lift_e6"] == (1000000 * 6 * 14) // (6 * 6)
