"""Changelog-materialization operators: the batch forms of what a CDC
consumer builds downstream of the reference's event stream.

The reference ships raw change events (runner.go:425-466) and leaves state
reconstruction to consumers; TigerBeetle itself maintains the running
balances the events carry (message.go:56-68). These operators close that
loop in Spark:

- ``changelog_compaction``: collapse an event log to the latest row per key
  (a compacted-topic / materialized-upsert view).
- ``incremental_rollup_merge``: merge a persisted base aggregate with a
  delta window — the continuous-aggregate maintenance step, valid because
  every metric is associative and integer-exact.
- ``snapshot_diff``: full-outer reconciliation of two per-key states,
  classifying each key as added / removed / changed / unchanged.

Scale notes (100 TB): compaction is ONE shuffle with map-side partial
aggregation (max-of-struct, no per-partition sort — a window row_number
would sort every partition); the rollup merge touches only the delta's
key-space plus the base partials; the diff joins two pre-aggregated sides,
so the join input is |keys|, not |events|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tigerbeetle_cdc_nats_spark.operators.aggregates import cents


def changelog_compaction(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Latest state per ``key``: max over struct(ts, event_id, payload...).

    (ts, event_id) is a unique, totally ordered version vector (the
    reference's timestamps are globally unique, SURVEY §1.1), so the struct
    max is deterministic and the payload fields along for the ride are the
    winning row's. One hash aggregation, partial-combined map-side —
    deliberately NOT ``row_number() == 1``, which would shuffle + full-sort
    every partition.
    """
    last = F.max(
        F.struct(
            F.col("ts"), F.col("event_id"),
            F.col("event_type"), cents().alias("cents"),
        )
    ).alias("_last")
    out = events.groupBy(key).agg(last, F.count("*").alias("n_versions"))
    return out.select(
        key,
        F.col("_last.ts").alias("last_ts"),
        F.col("_last.event_id").alias("last_event_id"),
        F.col("_last.event_type").alias("last_type"),
        F.col("_last.cents").alias("last_cents"),
        "n_versions",
    )


def incremental_rollup_merge(events: DataFrame, cutoff_ns: int,
                             key: str = "user_id") -> DataFrame:
    """Continuous-aggregate maintenance: base partials (ts < cutoff, the
    "persisted" side) merged with the delta window (ts >= cutoff) by
    re-aggregating the union of partials. Identical to one full groupBy
    because count/sum/max are associative and the money math is integer
    cents; the point is the *shape* — at scale the base is a stored table
    and only the delta is scanned per refresh.
    """
    amt = cents()

    def partial(df: DataFrame, is_delta: bool) -> DataFrame:
        return df.groupBy(key).agg(
            F.count("*").alias("_n"),
            F.sum(amt).alias("_c"),
            F.max("ts").alias("_t"),
            (F.count("*") if is_delta else F.lit(0).cast("long")).alias("_d"),
        )

    base = partial(events.where(F.col("ts") < cutoff_ns), False)
    delta = partial(events.where(F.col("ts") >= cutoff_ns), True)
    return (
        base.unionByName(delta)
        .groupBy(key)
        .agg(
            F.sum("_n").alias("n_events"),
            F.sum("_c").alias("sum_cents"),
            F.max("_t").alias("last_ts"),
            F.sum("_d").alias("n_delta"),
        )
    )


def snapshot_diff(events: DataFrame, lo_ns: int, mid_ns: int,
                  hi_ns: int, key: str = "user_id") -> DataFrame:
    """Reconcile per-key activity between window A = [lo, mid) and window
    B = [mid, hi): full-outer join of the two aggregated states, each key
    classified added (B only) / removed (A only) / changed / unchanged.

    The join runs on the *aggregated* sides — |keys| rows each, not
    |events| — so the full-outer shuffle is bounded by key cardinality
    regardless of event volume.
    """
    amt = cents()

    def state(lo: int, hi: int) -> DataFrame:
        return (
            events.where((F.col("ts") >= lo) & (F.col("ts") < hi))
            .groupBy(key)
            .agg(F.sum(amt).alias("c"))
        )

    a = state(lo_ns, mid_ns).withColumnsRenamed({key: "ka", "c": "ca"})
    b = state(mid_ns, hi_ns).withColumnsRenamed({key: "kb", "c": "cb"})
    j = a.join(b, a["ka"] == b["kb"], "full_outer")
    cls = (
        F.when(F.col("ca").isNull(), "added")
        .when(F.col("cb").isNull(), "removed")
        .when(F.col("ca") == F.col("cb"), "unchanged")
        .otherwise("changed")
    )
    return (
        j.select(
            cls.alias("change_class"),
            (F.coalesce("cb", F.lit(0)) - F.coalesce("ca", F.lit(0)))
            .alias("_delta"),
        )
        .groupBy("change_class")
        .agg(F.count("*").alias("n_keys"),
             F.sum("_delta").alias("cents_delta"))
    )
