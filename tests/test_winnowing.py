"""Property tests for the winnowing fingerprint and C4-style normalization
(queries_corpus.winnow_fingerprints / normalize_text).

The winnowing guarantee (Schleimer et al., SIGMOD'03 §3): for gram width k
and window w, any two documents sharing a contiguous token run of at least
w + k - 1 tokens share at least one fingerprint.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.queries_corpus import (
    WINNOW_K, WINNOW_W, normalize_text, winnow_fingerprints)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_winnowing_shared_run_shares_fingerprint(spark):
    # Shared run of exactly w + k - 1 = 6 tokens ("one two three four five
    # six") embedded in otherwise-disjoint documents.
    shared = "one two three four five six"
    a = f"alpha beta {shared} gamma delta"
    b = f"epsilon zeta eta {shared} theta"
    fp = winnow_fingerprints(_docs(spark, [a, b]))
    both = (fp.groupBy("wm").agg(F.countDistinct("doc_id").alias("n"))
            .where(F.col("n") == 2).count())
    assert both >= 1, "documents sharing a w+k-1 token run must share a fp"


def test_winnowing_disjoint_docs_share_nothing(spark):
    a = "aa bb cc dd ee ff gg hh"
    b = "ii jj kk ll mm nn oo pp"
    fp = winnow_fingerprints(_docs(spark, [a, b]))
    both = (fp.groupBy("wm").agg(F.countDistinct("doc_id").alias("n"))
            .where(F.col("n") == 2).count())
    assert both == 0


def test_winnowing_fingerprints_subset_of_gram_hashes(spark):
    # Every fingerprint is the hash of some k-gram of the document, and the
    # set is no larger than the number of windows (n_grams - w + 1).
    text = "the quick brown fox jumps over the lazy dog again and again"
    n_tokens = len(text.split())
    n_grams = n_tokens - WINNOW_K + 1
    rows = winnow_fingerprints(_docs(spark, [text])).collect()
    assert 1 <= len(rows) <= n_grams - WINNOW_W + 1


def test_winnowing_short_doc_drops_out(spark):
    # Fewer than k tokens -> no grams -> no fingerprints (matches the
    # oracle's WHERE len(toks) >= k guard).
    fp = winnow_fingerprints(_docs(spark, ["only two"]))
    assert fp.count() == 0


def test_normalize_text_merges_formatting_variants(spark):
    df = _docs(spark, ["Hello,  World!", "hello world", "HELLO WORLD."])
    out = df.select(normalize_text(F.col("text")).alias("n")).collect()
    assert {r.n for r in out} == {"hello world"}


def test_normalized_dedup_group_semantics(spark, sf_dir):
    # On the dup-free synthetic corpus every group has size 1 and each doc
    # is its own keeper.
    from tigerbeetle_cdc_nats_spark.registry import all_queries
    df = all_queries()["normalized_dedup"].fn(spark, sf_dir)
    bad = df.where((F.col("group_size") != 1)
                   | (F.col("keeper_doc") != F.col("doc_id"))).count()
    assert bad == 0
