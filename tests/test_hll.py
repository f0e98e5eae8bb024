"""Portable HLL sketch: mergeability and accuracy properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.operators import sketches as sk


def _items(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("k"))


def test_hll_estimate_within_rsd(spark):
    """m=512 gives ~4.6% relative standard deviation; assert 3 sigma on a
    5k-item set (well past the linear-counting switchover)."""
    n = 5000
    est = (
        sk.hll_sketch(_items(spark, 0, n), F.col("k"), ["g"])
        .select("est_e6").first()[0] / 1e6
    )
    assert abs(est - n) / n < 3 * 1.04 / (sk.HLL_M ** 0.5)


def test_hll_registers_merge_by_max(spark):
    """The sketch of A∪B must equal per-bucket MAX of sketch(A), sketch(B)
    — the property that lets per-partition sketches reduce at any scale.
    Overlapping halves double as an idempotency check."""
    b, r = sk.hll_register_cols(F.col("k"))

    def regs(df):
        return (df.select(b, r).groupBy("bucket").agg(F.max("rho").alias("r")))

    a = regs(_items(spark, 0, 3000))
    bb = regs(_items(spark, 2000, 5000))          # overlaps [2000, 3000)
    merged = (
        a.unionByName(bb).groupBy("bucket").agg(F.max("r").alias("r"))
    )
    whole = regs(_items(spark, 0, 5000))
    diff = (
        merged.alias("m").join(whole.alias("w"), "bucket", "full_outer")
        .where((F.col("m.r").isNull()) | (F.col("w.r").isNull())
               | (F.col("m.r") != F.col("w.r")))
    )
    assert diff.count() == 0


def test_hll_register_state_is_bounded(spark):
    """Register table never exceeds m rows per group no matter the input."""
    b, r = sk.hll_register_cols(F.col("k"))
    n_regs = (
        _items(spark, 0, 50_000).select(b, r)
        .groupBy("bucket").agg(F.max("rho")).count()
    )
    assert n_regs <= sk.HLL_M
