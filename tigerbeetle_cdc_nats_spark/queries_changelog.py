"""Downstream-of-CDC materialization queries: what a consumer of the
reference's event stream builds from it (compacted state, maintained
rollups, reconciliation) plus the known-skew join pattern.

The reference publishes raw ordered change events and leaves state
reconstruction to subscribers (runner.go:425-466, README.md:55-61); these
queries are that subscriber, Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tigerbeetle_cdc_nats_spark.operators import aggregates as agg
from tigerbeetle_cdc_nats_spark.operators.cdc_view import EVENTS_CTE as _EV
from tigerbeetle_cdc_nats_spark.operators.changelog import (
    changelog_compaction,
    incremental_rollup_merge,
    snapshot_diff,
)
from tigerbeetle_cdc_nats_spark.operators.joins import salted_skew_join
from tigerbeetle_cdc_nats_spark.registry import events_table, register

_CENTS = agg.CENTS

#: Continuous-aggregate refresh cutoff (2024-01-11T...Z, mid-stream).
CUTOFF_NS = 1705000000000000000
#: Reconciliation windows A = [LO, MID), B = [MID, HI) — ~6 days each.
DIFF_LO_NS = 1704500000000000000
DIFF_MID_NS = 1705000000000000000
DIFF_HI_NS = 1705500000000000000

#: Replicable event-type dimension for the salted join (weights arbitrary
#: but fixed; mirrors a routing/cost table keyed by the 5-value hot key).
_TYPE_WEIGHTS = [("click", 1), ("error", 7), ("purchase", 3),
                 ("signup", 11), ("view", 2)]


@register(
    "changelog_compaction",
    f"""WITH ev AS ({_EV})
SELECT user_id, last_ts, last_event_id, last_type, last_cents, n_versions
FROM (
  SELECT user_id, ts AS last_ts, event_id AS last_event_id,
         event_type AS last_type, {_CENTS} AS last_cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_versions
  FROM ev
) WHERE rn = 1""",
    doc="compacted-topic view: latest event per account via ONE max-of-"
        "struct aggregation (map-side combinable; no per-partition sort). "
        "(ts, event_id) is the unique version vector — SURVEY §1.1",
)
def q_changelog_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog_compaction(events_table(spark, sf_dir))


@register(
    "incremental_rollup_merge",
    f"""WITH ev AS ({_EV})
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM({_CENTS}) AS BIGINT) AS sum_cents,
       MAX(ts) AS last_ts,
       COUNT(*) FILTER (WHERE ts >= {CUTOFF_NS}) AS n_delta
FROM ev GROUP BY user_id""",
    doc="continuous-aggregate refresh: persisted base partials (ts < "
        "cutoff) merged with the delta window by re-aggregating the union "
        "of partials — exact because count/sum/max are associative and "
        "money is integer cents; per refresh only the delta is scanned",
)
def q_incremental_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    return incremental_rollup_merge(events_table(spark, sf_dir), CUTOFF_NS)


@register(
    "snapshot_reconcile",
    f"""WITH ev AS ({_EV}),
a AS (
  SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS state_key,
         SUM({_CENTS}) AS ca
  FROM ev WHERE ts >= {DIFF_LO_NS} AND ts < {DIFF_MID_NS} GROUP BY 1
),
b AS (
  SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS state_key,
         SUM({_CENTS}) AS cb
  FROM ev WHERE ts >= {DIFF_MID_NS} AND ts < {DIFF_HI_NS} GROUP BY 1
)
SELECT CASE WHEN ca IS NULL THEN 'added'
            WHEN cb IS NULL THEN 'removed'
            WHEN ca = cb THEN 'unchanged'
            ELSE 'changed' END AS change_class,
       COUNT(*) AS n_keys,
       CAST(SUM(COALESCE(cb, 0) - COALESCE(ca, 0)) AS BIGINT) AS cents_delta
FROM a FULL OUTER JOIN b USING (state_key)
GROUP BY 1""",
    doc="CDC reconciliation: per-(account, event_type) activity in two "
        "adjacent windows, full-outer joined and classified added/removed/"
        "changed/unchanged. The join sees |keys| aggregated rows per side, "
        "not |events| — bounded by key cardinality at any data scale",
)
def q_snapshot_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir).withColumn(
        "state_key", F.concat_ws(":", "user_id", "event_type"))
    return snapshot_diff(ev, DIFF_LO_NS, DIFF_MID_NS, DIFF_HI_NS,
                         key="state_key")


@register(
    "skew_salted_join",
    f"""WITH ev AS ({_EV})
SELECT ev.event_type, COUNT(*) AS n_events,
       CAST(SUM({_CENTS} * weight) AS BIGINT) AS weighted_cents
FROM ev
JOIN (VALUES {', '.join(f"('{t}', {w})" for t, w in _TYPE_WEIGHTS)})
  AS dim(event_type, weight)
  ON ev.event_type = dim.event_type
GROUP BY ev.event_type""",
    doc="hot-key replicate join: event_type has 5 values over the whole "
        "stream, so a plain shuffle join lands on 5 reducer tasks at any "
        "cluster size; salting the fact side and exploding the dim 16x "
        "spreads each hot key over 16 tasks. Manual form of AQE skew-split "
        "for skew that is known ahead of time",
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    dim = spark.createDataFrame(_TYPE_WEIGHTS,
                                schema="event_type string, weight bigint")
    joined = salted_skew_join(ev, dim, "event_type", salt=16)
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(agg.cents() * F.col("weight")).alias("weighted_cents"),
    )
