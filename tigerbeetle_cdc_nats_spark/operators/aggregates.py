"""Aggregation operators (SURVEY.md §2.4).

The reference's account snapshots carry running balances maintained by
TigerBeetle (debits_pending/posted, credits_pending/posted —
message.go:56-68); ``balance_rollup`` recomputes those rollups from the raw
event stream. All money math is integer cents (``FLOOR(value*100)``) so
partial aggregation is exact and associative — no float-summation order
sensitivity at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Exact integer cents from the double `value` column. FLOOR of a double is
#: deterministic for identical IEEE inputs on any engine.
CENTS = "CAST(FLOOR(value * 100) AS BIGINT)"


def cents(col: str = "value") -> Column:
    return F.floor(F.col(col) * 100).cast("bigint")


def _sum_if(cond: Column, amount: Column) -> Column:
    return F.sum(F.when(cond, amount).otherwise(F.lit(0)))


def balance_rollup(events: DataFrame, account_col: str = "user_id") -> DataFrame:
    """Per-account running balances re-derived from events (the aggregates
    TigerBeetle maintains upstream, message.go:56-68).

    Event-type mapping onto the two-phase lifecycle: 'purchase' posts a
    debit, 'view' posts a credit, 'signup' leaves a pending debit — enough
    to exercise posted/pending on both sides.
    """
    amt = cents()
    et = F.col("event_type")
    return events.groupBy(account_col).agg(
        _sum_if(et == "purchase", amt).alias("debits_posted_cents"),
        _sum_if(et == "signup", amt).alias("debits_pending_cents"),
        _sum_if(et == "view", amt).alias("credits_posted_cents"),
        _sum_if(et == "click", amt).alias("credits_pending_cents"),
        F.count("*").alias("n_events"),
    )


def ledger_event_type_counts(events: DataFrame) -> DataFrame:
    """Counts per (ledger, event_type) — the subject taxonomy
    ``<prefix>.<ledger>.<event_type>`` (config.go:157-162)."""
    return (
        events.withColumn("ledger", F.col("user_id") % 10)
        .groupBy("ledger", "event_type")
        .agg(F.count("*").alias("n_events"), F.sum(cents()).alias("sum_cents"))
    )


def ledger_rollup(events: DataFrame) -> DataFrame:
    """Hierarchical grouping-sets rollup over (ledger, event_type):
    per-pair, per-ledger subtotal, grand total."""
    return (
        events.withColumn("ledger", F.col("user_id") % 10)
        .rollup("ledger", "event_type")
        .agg(F.count("*").alias("n_events"))
    )


def distinct_counts(events: DataFrame) -> DataFrame:
    """Exact distinct aggregates (SURVEY.md §2.4 A5). The approximate
    (HLL-sketch) variant lives in its own query because DuckDB's approx
    differs — exact is the oracle-checkable one."""
    return events.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
    )


def duplicate_counts(events: DataFrame, every: int = 97) -> DataFrame:
    """Duplicate-ack accounting per ledger (runner.go:542-555): a
    deterministic 1/N of events is flagged duplicate and counted."""
    dup = (F.col("event_id") % every) == 0
    return (
        events.withColumn("ledger", F.col("user_id") % 10)
        .groupBy("ledger")
        .agg(
            F.count("*").alias("n_acks"),
            F.sum(F.when(dup, 1).otherwise(0)).alias("n_duplicates"),
        )
    )


def skew_salted_agg(events: DataFrame, key: str, *, salt: int = 16) -> DataFrame:
    """Two-stage aggregation for skewed keys: stage 1 aggregates on
    (key, salt) — spreading a hot key over ``salt`` reducers — stage 2
    combines the partials on the bare key.

    Result is identical to a plain groupBy (all metrics here are
    associative + integer-exact); the plan trades one extra small shuffle
    for immunity to single-reducer hot spots. AQE's skew handling covers
    joins; this is the aggregation-side equivalent for known-skewed keys.
    """
    amt = cents()
    partial = (
        events.withColumn("_salt", (F.col("event_id") % salt).cast("int"))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_n"), F.sum(amt).alias("_c"))
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n_events"),
        F.sum("_c").alias("sum_cents"),
    )
