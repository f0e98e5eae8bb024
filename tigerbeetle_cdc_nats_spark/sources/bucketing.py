"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the events⋈accounts enrichment join (SURVEY.md §2.3) re-shuffles
the fact table on every run if the layout doesn't already agree with the
join key. Writing both sides bucketed by the key (hash-partitioned into a
fixed bucket count, sorted within buckets) lets SortMergeJoin read both
sides pre-partitioned: no Exchange on either side — the single biggest
recurring-cost win for repeated keyed joins.

Bucketing requires the session catalog (``saveAsTable``); bucket counts
must match on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, *,
                   buckets: int = 32, mode: str = "overwrite",
                   path: str | None = None) -> None:
    """``path`` makes it an external table (data at the given location
    instead of the session warehouse dir)."""
    writer = df.write.mode(mode).bucketBy(buckets, key).sortBy(key)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a SortMergeJoin with ZERO Exchange nodes."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=key, how=how)
