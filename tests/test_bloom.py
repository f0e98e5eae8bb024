"""Bloom-prefilter operator: no false negatives, real pruning, and a probe
plan that never shuffles the fact side before the filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.operators import bloom
from tigerbeetle_cdc_nats_spark.plans import physical_plan


def test_no_false_negatives_and_prunes(spark):
    build = spark.range(0, 1000, 7).select(F.col("id").alias("k"))  # 143 keys
    probe = spark.range(0, 5000).select(F.col("id").alias("k"))
    words = bloom.bloom_build(build, "k")
    kept = set(r.k for r in bloom.bloom_probe(probe, "k", words).collect())
    members = set(range(0, 1000, 7))
    # every true member survives (bloom filters cannot drop members)
    assert members <= kept
    # the filter actually prunes: false-positive rate well under 5%
    fp = len(kept - members)
    assert fp < 0.05 * 5000, fp


def test_word_index_is_bounded(spark):
    """The packed word table is <= m/64 rows regardless of build size —
    that bound is what keeps the probe joins broadcast-able at 100 TB."""
    build = spark.range(0, 20000).select(F.col("id").alias("k"))
    n_words = bloom.bloom_build(build, "k", m_bits=1 << 12, k=3).count()
    assert n_words <= (1 << 12) // 64


def test_probe_side_joins_are_broadcast(spark):
    """All k membership tests must be BroadcastHashJoins: a shuffle join on
    the word index would re-partition the 100 TB fact table k times."""
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    plan = physical_plan(
        bloom.bloom_probe(probe, "k", bloom.bloom_build(build, "k")))
    # formatted plans repeat each node in the detail section — assert the
    # floor, and that no join fell back to a fact-side shuffle
    assert plan.count("BroadcastHashJoin") >= bloom.DEFAULT_K
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
