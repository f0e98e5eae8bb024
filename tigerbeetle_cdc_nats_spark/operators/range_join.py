"""Range (interval) join: match facts to the intervals containing them.

Naive formulation — ``a JOIN b ON a.ts BETWEEN b.lo AND b.hi`` — has no
equality key, so Spark plans a BroadcastNestedLoopJoin (or worse, a
cartesian product): O(n*m) compares. The scalable formulation buckets both
sides by a coarse grain g: a fact joins only buckets its ts falls in, an
interval is replicated into ceil((hi-lo)/g)+1 buckets, and the exact
BETWEEN predicate filters within the equality-joined bucket. Compare count
drops to O(n * avg_intervals_per_bucket) and the join is a plain shuffled
equality join that scales like any other.

Grain choice: ~= typical interval length; longer intervals replicate more,
shorter grains make more buckets — both linear, never quadratic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def bucketize_facts(facts: DataFrame, ts_col: str, grain: int) -> DataFrame:
    return facts.withColumn("_bucket", (F.col(ts_col) - F.col(ts_col) % grain))


def bucketize_intervals(intervals: DataFrame, lo_col: str, hi_col: str,
                        grain: int) -> DataFrame:
    """Replicate each interval into every grain bucket it overlaps."""
    lo_b = F.col(lo_col) - F.col(lo_col) % grain
    hi_b = F.col(hi_col) - F.col(hi_col) % grain
    return intervals.withColumn(
        "_bucket", F.explode(F.sequence(lo_b, hi_b, F.lit(grain)))
    )


def range_join(facts: DataFrame, intervals: DataFrame, *, ts_col: str,
               lo_col: str, hi_col: str, grain: int,
               how: str = "inner") -> DataFrame:
    """Equality-join on the grain bucket, then the exact containment filter.
    Output columns: all fact columns + all interval columns."""
    f = bucketize_facts(facts, ts_col, grain)
    iv = bucketize_intervals(intervals, lo_col, hi_col, grain)
    joined = f.join(iv, on="_bucket", how=how).where(
        (F.col(ts_col) >= F.col(lo_col)) & (F.col(ts_col) <= F.col(hi_col))
    )
    return joined.drop("_bucket")
