"""Downstream-of-CDC materialization queries: what a consumer of the
reference's event stream builds from it (compacted state, maintained
rollups, reconciliation) plus the known-skew join pattern.

The reference publishes raw ordered change events and leaves state
reconstruction to subscribers (runner.go:425-466, README.md:55-61); these
queries are that subscriber, Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

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


@register(
    "running_balance",
    f"""WITH ev AS ({_EV})
SELECT event_id, user_id, ts,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS seq,
       CAST(SUM({_CENTS}) OVER w AS BIGINT) AS balance_cents
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    doc="account balance reconstruction: cumulative cents per account in "
        "event order — the running aggregate TigerBeetle itself maintains "
        "in the *_posted fields (message.go:56-68), recomputed from the "
        "changelog. Partitioned by account: each window sort is one "
        "account's history, never a global sort",
)
def q_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", "ts",
        F.row_number().over(w).cast("bigint").alias("seq"),
        F.sum(agg.cents()).over(w).alias("balance_cents"),
    )


@register(
    "stream_order_audit",
    f"""WITH ev AS ({_EV}),
lagged AS (
  SELECT user_id % 10 AS ledger, ts,
         ts - LAG(ts) OVER (PARTITION BY user_id % 10
                            ORDER BY ts, event_id) AS gap_ns
  FROM ev
)
SELECT ledger, COUNT(*) AS n_events,
       CAST(COALESCE(SUM(CASE WHEN gap_ns <= 0 THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS order_violations,
       MAX(gap_ns) AS max_gap_ns,
       MAX(ts) - MIN(ts) AS span_ns
FROM lagged GROUP BY ledger""",
    doc="per-ledger stream integrity audit: strict-monotonicity violations "
        "and the largest inter-event gap — the batch form of the "
        "reference's 'expected increasing timestamps' assertion "
        "(integration_test.go:227-229). Partitioned by ledger so no global "
        "sort; gap stats double as idle-window telemetry (runner.go:156-164)",
)
def q_stream_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir).withColumn(
        "ledger", F.col("user_id") % 10)
    w = Window.partitionBy("ledger").orderBy("ts", "event_id")
    lagged = ev.select(
        "ledger", "ts", (F.col("ts") - F.lag("ts").over(w)).alias("gap_ns"))
    return lagged.groupBy("ledger").agg(
        F.count("*").alias("n_events"),
        F.coalesce(
            F.sum(F.when(F.col("gap_ns") <= 0, 1).otherwise(0)), F.lit(0)
        ).alias("order_violations"),
        F.max("gap_ns").alias("max_gap_ns"),
        (F.max("ts") - F.min("ts")).alias("span_ns"),
    )


@register(
    "integrity_audit",
    f"""WITH ev AS ({_EV})
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM ev
   WHERE user_id NOT IN (SELECT s_suppkey FROM supplier)) AS n_orphans,
  (SELECT CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) FROM ev)
    AS n_dup_ids,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM ev
   WHERE event_id IS NULL OR ts IS NULL OR user_id IS NULL
      OR event_type IS NULL OR value IS NULL) AS n_nulls,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM ev WHERE value <= 0) AS n_bad_values,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM ev
   WHERE ts < 1704067200000000000 OR ts >= 1706745600000000000)
    AS n_ts_out_of_range""",
    doc="data-quality audit of the event stream: referential orphans "
        "(accounts missing from the registry dim — a broadcast anti "
        "join), duplicate identity keys, null violations, value-range "
        "violations, timestamp-bound violations — the checks a CDC "
        "consumer runs before trusting a batch; one pass per check, "
        "every check a plain aggregate",
)
def q_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tigerbeetle_cdc_nats_spark.operators.joins import anti_join
    from tigerbeetle_cdc_nats_spark.session import load_table

    ev = events_table(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("user_id"))
    orphans = anti_join(ev.select("user_id"), supp, "user_id").agg(
        F.count("*").cast("bigint").alias("n_orphans"))
    base = ev.agg(
        (F.count("*") - F.countDistinct("event_id")).cast("bigint")
        .alias("n_dup_ids"),
        F.sum(
            F.when(F.col("event_id").isNull() | F.col("ts").isNull()
                   | F.col("user_id").isNull() | F.col("event_type").isNull()
                   | F.col("value").isNull(), 1).otherwise(0))
        .cast("bigint").alias("n_nulls"),
        F.sum(F.when(F.col("value") <= 0, 1).otherwise(0)).cast("bigint")
        .alias("n_bad_values"),
        F.sum(F.when((F.col("ts") < 1704067200000000000)
                     | (F.col("ts") >= 1706745600000000000), 1).otherwise(0))
        .cast("bigint").alias("n_ts_out_of_range"),
    )
    return orphans.crossJoin(base).select(
        "n_orphans", "n_dup_ids", "n_nulls", "n_bad_values",
        "n_ts_out_of_range")


@register(
    "column_stats",
    f"""WITH ev AS ({_EV}),
g AS (
  SELECT COUNT(*) AS n,
    COUNT(DISTINCT event_id) AS d_id, CAST(MIN(event_id) AS VARCHAR) AS mn_id,
    CAST(MAX(event_id) AS VARCHAR) AS mx_id,
    COUNT(DISTINCT ts) AS d_ts, CAST(MIN(ts) AS VARCHAR) AS mn_ts,
    CAST(MAX(ts) AS VARCHAR) AS mx_ts,
    COUNT(DISTINCT user_id) AS d_u, CAST(MIN(user_id) AS VARCHAR) AS mn_u,
    CAST(MAX(user_id) AS VARCHAR) AS mx_u,
    COUNT(DISTINCT event_type) AS d_t, MIN(event_type) AS mn_t,
    MAX(event_type) AS mx_t,
    COUNT(DISTINCT {_CENTS}) AS d_c, CAST(MIN({_CENTS}) AS VARCHAR) AS mn_c,
    CAST(MAX({_CENTS}) AS VARCHAR) AS mx_c
  FROM ev
)
SELECT col_name, n AS n_rows, n_distinct, min_v, max_v FROM (
  SELECT n, 'event_id' AS col_name, d_id AS n_distinct,
         mn_id AS min_v, mx_id AS max_v FROM g
  UNION ALL SELECT n, 'ts', d_ts, mn_ts, mx_ts FROM g
  UNION ALL SELECT n, 'user_id', d_u, mn_u, mx_u FROM g
  UNION ALL SELECT n, 'event_type', d_t, mn_t, mx_t FROM g
  UNION ALL SELECT n, 'cents', d_c, mn_c, mx_c FROM g
)""",
    doc="one-pass column statistics (the ANALYZE TABLE shape): row count "
        "plus per-column distinct count and min/max collected in a SINGLE "
        "aggregation over the table, then reshaped to one row per column "
        "— the stats a cost-based optimizer and a zone-map layout "
        "decision both feed on. Money stats run on exact integer cents "
        "(double min/max string formatting is engine-specific)",
)
def q_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the 5-way distinct expand multiplies every row BEFORE the partial
    # aggregate — on a single-row-group local file that whole stage runs
    # on one core; ensure_parallelism spreads it (no-op at scale where
    # the scan already has >= cores splits)
    from tigerbeetle_cdc_nats_spark.session import ensure_parallelism

    ev = ensure_parallelism(events_table(spark, sf_dir))
    cents = agg.cents()
    # min/max over a STRING column makes the aggregation buffer
    # variable-width, which disqualifies HashAggregate — with them inline
    # the whole Expand-multiplied aggregate (rows x 6) planned as a
    # 3-SortAggregate chain with two full sorts (round-12 guide §2.3:
    # measured 1.33 s). The string min/max is instead taken over the
    # DISTINCT event_type values (identical result; the distinct set is
    # the enum domain, a handful of rows), so the big aggregate keeps a
    # fixed-width buffer and plans hash-based end to end.
    g = ev.agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("d_id"),
        F.min("event_id").cast("string").alias("mn_id"),
        F.max("event_id").cast("string").alias("mx_id"),
        F.countDistinct("ts").alias("d_ts"),
        F.min("ts").cast("string").alias("mn_ts"),
        F.max("ts").cast("string").alias("mx_ts"),
        F.countDistinct("user_id").alias("d_u"),
        F.min("user_id").cast("string").alias("mn_u"),
        F.max("user_id").cast("string").alias("mx_u"),
        F.countDistinct("event_type").alias("d_t"),
        F.countDistinct(cents).alias("d_c"),
        F.min(cents).cast("string").alias("mn_c"),
        F.max(cents).cast("string").alias("mx_c"),
    )
    tg = (ev.select("event_type").distinct()
          .agg(F.min("event_type").alias("mn_t"),
               F.max("event_type").alias("mx_t")))
    g = g.join(F.broadcast(tg))
    stack = F.expr(
        "stack(5,"
        " 'event_id', d_id, mn_id, mx_id,"
        " 'ts', d_ts, mn_ts, mx_ts,"
        " 'user_id', d_u, mn_u, mx_u,"
        " 'event_type', d_t, mn_t, mx_t,"
        " 'cents', d_c, mn_c, mx_c)"
        " AS (col_name, n_distinct, min_v, max_v)")
    return g.select(F.col("n").alias("n_rows"), stack).select(
        "col_name", "n_rows", "n_distinct", "min_v", "max_v")


@register(
    "scd2_intervals",
    f"""WITH ev AS ({_EV}),
ch AS (
  SELECT user_id, event_type, ts,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM ev
),
chg AS (
  SELECT user_id, event_type AS state, ts AS valid_from
  FROM ch WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, state, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id
                              ORDER BY valid_from) AS valid_to,
       CAST(CASE WHEN LEAD(valid_from) OVER (PARTITION BY user_id
                                             ORDER BY valid_from) IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM chg""",
    doc="SCD type-2 build: collapse each user's event stream into "
        "validity intervals — a new row only when the state actually "
        "changes, valid_to chained from the next change, open interval "
        "flagged current. The standard warehouse history-table "
        "materialization of a CDC stream",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) intervals from the event stream.

    Scale shape: two window passes over the same (user_id; ts) ordering —
    Catalyst evaluates both in a single sort within one shuffle because
    the second window's partition/order is a prefix of the first's.
    Change-point compression happens before the interval chaining, so the
    second pass sees only state transitions (a small fraction of events).
    user_id is high-cardinality, so the one shuffle spreads evenly.
    """
    from pyspark.sql import Window as W

    ev = events_table(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ch = ev.select(
        "user_id", "event_type", "ts",
        F.lag("event_type").over(w).alias("prev_type"))
    chg = (ch.where(F.col("prev_type").isNull()
                    | (F.col("prev_type") != F.col("event_type")))
           .select("user_id", F.col("event_type").alias("state"),
                   F.col("ts").alias("valid_from")))
    w2 = W.partitionBy("user_id").orderBy("valid_from")
    valid_to = F.lead("valid_from").over(w2)
    return chg.select(
        "user_id", "state", "valid_from",
        valid_to.alias("valid_to"),
        valid_to.isNull().cast("bigint").alias("is_current"))


@register(
    "time_weighted_value",
    f"""WITH ev AS ({_EV}),
iv AS (
  SELECT user_id, {_CENTS} AS cents, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) - ts
           AS dt_ns
  FROM ev
)
SELECT user_id,
       COUNT(dt_ns) AS n_intervals,
       CAST(SUM(dt_ns) AS BIGINT) AS total_ns,
       CAST(CAST(SUM(CAST(cents AS DECIMAL(38,0)) * dt_ns) AS DOUBLE)
            / CAST(SUM(dt_ns) AS DOUBLE) AS DOUBLE) AS twap_cents
FROM iv
WHERE dt_ns IS NOT NULL
GROUP BY user_id""",
    doc="time-weighted average value (TWAP) per account: each observation "
        "weighted by how long it was the latest state (lead-ts interval), "
        "the financial-series mean that ignores sampling cadence; sums are "
        "exact integer cents x ns in DECIMAL(38,0), the division is one "
        "deterministic double op at the end",
)
def q_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWAP of event value per user over the stream's holding intervals.

    Scale shape: one window pass (user_id; ts ordering) to get interval
    lengths, then one groupBy on the same key — the aggregation reuses the
    window's shuffle partitioning, so the whole query is a single
    Exchange. Weighted sums stay in DECIMAL(38,0): cents x ns products
    overflow BIGINT at ~month-long intervals, and 100 TB streams span
    years.
    """
    from pyspark.sql import Window as W

    ev = events_table(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    iv = ev.select(
        "user_id", agg.cents().alias("cents"), "ts",
        (F.lead("ts").over(w) - F.col("ts")).alias("dt_ns"))
    return (
        iv.where(F.col("dt_ns").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("dt_ns").alias("n_intervals"),
            F.sum("dt_ns").cast("bigint").alias("total_ns"),
            (F.sum(F.col("cents").cast("decimal(38,0)") * F.col("dt_ns"))
             .cast("double")
             / F.sum("dt_ns").cast("double")).cast("double")
            .alias("twap_cents"))
    )


@register(
    "revenue_trend",
    f"""WITH ev AS ({_EV}),
c AS (
  SELECT event_type,
         CAST(ts // 86400000000000 AS BIGINT) AS day,
         {_CENTS} AS cents
  FROM ev
),
d AS (
  SELECT event_type, day, CAST(SUM(cents) AS BIGINT) AS day_cents
  FROM c GROUP BY event_type, day
),
s AS (
  SELECT event_type, COUNT(*) AS n_days,
    CAST(SUM(day) AS DOUBLE) AS sx,
    CAST(SUM(day_cents) AS DOUBLE) AS sy,
    CAST(SUM(day * day) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(day AS DECIMAL(38,0)) * day_cents) AS DOUBLE) AS sxy
  FROM d GROUP BY event_type
)
SELECT event_type, n_days,
       CASE WHEN n_days * sxx - sx * sx = 0 THEN 0.0
            ELSE (n_days * sxy - sx * sy) / (n_days * sxx - sx * sx)
       END AS slope_cents_per_day
FROM s""",
    doc="per-type revenue trend: OLS slope of daily cents over the day "
        "index, from exact integer sums (two-level: day rollup then "
        "moment sums) with one deterministic double expression at the "
        "end — the grouped-regression shape of a metrics pipeline",
)
def q_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares daily revenue slope per event type.

    Scale shape: the day rollup collapses events to |types| x |days| rows
    before any regression math, so the moment sums aggregate a tiny
    table; both aggregations are map-side combinable and keyed on the
    same leading column. Sums stay integer-exact (DECIMAL for day x
    cents products), making the slope bit-identical across engines and
    partitionings.
    """
    ev = events_table(spark, sf_dir)
    c = ev.select(
        "event_type",
        F.expr("ts div 86400000000000").cast("bigint").alias("day"),
        agg.cents().alias("cents"))
    d = (c.groupBy("event_type", "day")
         .agg(F.sum("cents").cast("bigint").alias("day_cents")))
    s = d.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("day").cast("double").alias("sx"),
        F.sum("day_cents").cast("double").alias("sy"),
        F.sum(F.expr("day * day")).cast("double").alias("sxx"),
        F.sum(F.col("day").cast("decimal(38,0)") * F.col("day_cents"))
        .cast("double").alias("sxy"))
    n = F.col("n_days").cast("double")
    denom = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(denom == 0, F.lit(0.0)).otherwise(
        (n * F.col("sxy") - F.col("sx") * F.col("sy")) / denom)
    return s.select("event_type", "n_days",
                    slope.alias("slope_cents_per_day"))


@register(
    "rate_anomaly",
    f"""WITH ev AS ({_EV}),
h AS (
  SELECT user_id, CAST(ts // 3600000000000 AS BIGINT) AS hour,
         COUNT(*) AS n
  FROM ev GROUP BY 1, 2
),
s AS (
  SELECT user_id, COUNT(*) AS n_hours,
         CAST(SUM(n) AS DOUBLE) AS sn, CAST(SUM(n * n) AS DOUBLE) AS snn
  FROM h GROUP BY user_id
)
SELECT h.user_id, h.hour, h.n,
       CASE WHEN s.n_hours * snn - sn * sn <= 0 THEN 0.0
            ELSE (h.n * s.n_hours - sn)
                 / SQRT(s.n_hours * snn - sn * sn) END AS z_score
FROM h JOIN s ON s.user_id = h.user_id
WHERE s.n_hours >= 3
  AND CASE WHEN s.n_hours * snn - sn * sn <= 0 THEN 0.0
           ELSE (h.n * s.n_hours - sn)
                / SQRT(s.n_hours * snn - sn * sn) END > 2.0""",
    doc="event-rate anomaly detection: per-user hourly counts z-scored "
        "against that user's own rate distribution (exact integer moment "
        "sums, one deterministic double expression), surfacing hours more "
        "than 2 sigma above the user's norm — the rate-based complement "
        "to mad_outliers' value-based outliers",
)
def q_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours where a user's event rate spikes beyond 2 sigma of their own
    distribution.

    Scale shape: the hourly rollup collapses events to |users| x |hours|
    before any statistics; the per-user moment sums aggregate that small
    table, and the join back is keyed on user_id — same key as both
    aggregations, so the whole query reuses one partitioning. The z
    expression uses the n*Sxx - Sx^2 form over exact integer sums, so
    no variance accumulation order can differ between engines.
    """
    ev = events_table(spark, sf_dir)
    h = (ev.groupBy("user_id",
                    F.expr("ts div 3600000000000").cast("bigint")
                    .alias("hour"))
         .agg(F.count("*").alias("n")))
    s = h.groupBy("user_id").agg(
        F.count("*").alias("n_hours"),
        F.sum("n").cast("double").alias("sn"),
        F.sum(F.expr("n * n")).cast("double").alias("snn"))
    j = h.join(s, "user_id").where(F.col("n_hours") >= 3)
    denom = F.col("n_hours") * F.col("snn") - F.col("sn") * F.col("sn")
    z = F.when(denom <= 0, F.lit(0.0)).otherwise(
        (F.col("n") * F.col("n_hours") - F.col("sn")) / F.sqrt(denom))
    return (j.withColumn("z_score", z)
            .where(F.col("z_score") > 2.0)
            .select("user_id", "hour", "n", "z_score"))


@register(
    "event_transition_matrix",
    f"""WITH ev AS ({_EV}),
seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM ev
),
t AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
r AS (SELECT prev_type, CAST(SUM(n_transitions) AS BIGINT) AS row_total
      FROM t GROUP BY prev_type)
SELECT t.prev_type, t.next_type, t.n_transitions,
       CAST(t.n_transitions AS DOUBLE) / r.row_total AS p_transition
FROM t JOIN r ON r.prev_type = t.prev_type""",
    doc="first-order Markov transition matrix over per-user event-type "
        "sequences: lag-window bigrams, global transition counts, and "
        "row-normalized probabilities — the sequence-model summary that "
        "feeds funnel design and next-event prediction baselines",
)
def q_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(next event type | previous event type) across all user streams.

    Scale shape: one window pass keyed on user_id (high cardinality)
    produces bigrams in-stream; the transition count table is |types|^2
    rows, so the normalization join is a trivial broadcast. At 100 TB the
    only full-data cost is the single user-keyed sort the lag window
    needs — the same shuffle every sequence feature in this engine rides.
    """
    from pyspark.sql import Window as W

    ev = events_table(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type",
        F.lag("event_type").over(w).alias("prev_type"))
    t = (seq.where(F.col("prev_type").isNotNull())
         .groupBy("prev_type", F.col("event_type").alias("next_type"))
         .agg(F.count("*").alias("n_transitions")))
    r = t.groupBy("prev_type").agg(
        F.sum("n_transitions").cast("bigint").alias("row_total"))
    return (t.join(F.broadcast(r), "prev_type")
            .select("prev_type", "next_type", "n_transitions",
                    (F.col("n_transitions").cast("double")
                     / F.col("row_total")).alias("p_transition")))


#: Equi-depth bucket count for the value distribution.
EQUIDEPTH_B = 8


@register(
    "equidepth_histogram",
    f"""WITH ev AS ({_EV}),
c AS (SELECT {_CENTS} AS cents, ts FROM ev),
r AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, ts) AS rn,
         COUNT(*) OVER () AS n
  FROM c
),
b AS (
  SELECT cents, CAST(((rn - 1) * {EQUIDEPTH_B}) // n AS BIGINT) AS bucket
  FROM r
)
SELECT bucket, COUNT(*) AS n_rows,
       CAST(MIN(cents) AS BIGINT) AS lo_cents,
       CAST(MAX(cents) AS BIGINT) AS hi_cents
FROM b GROUP BY bucket""",
    doc=f"equi-depth histogram: rank-partition the value distribution into "
        f"{EQUIDEPTH_B} equal-population buckets with exact integer "
        "boundaries — the quantile-sketch ground truth and the "
        "equi-width complement (value_histogram) for CBO-style stats",
)
def q_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-population value buckets with exact boundaries.

    Scale shape: the rank window is a global sort — the one operation
    here that is honestly expensive at 100 TB; the production form
    samples or sketches the CDF first (percentile_approx in
    approx_distinct_sketch) and this exact operator is its audit. The
    deterministic (cents, ts) order makes bucket assignment — and thus
    the min/max boundaries — engine-identical, unlike ntile over a
    nondeterministic order.

    Scale shape: the global rank is computed with the distributed
    row-number pattern (operators.windows.global_row_number — coarse cents
    range bucket, per-bucket counts, tiny offset window, per-bucket sort),
    and the total count joins in as a broadcast scalar, so NO window here
    sees the full table in one partition. Range-bucket width is a knob:
    any width is correct; pick ~domain/1000 so bucket sorts stay
    memory-sized at the target scale.
    """
    from tigerbeetle_cdc_nats_spark.operators import windows as win

    ev = events_table(spark, sf_dir)
    c = ev.select(agg.cents().alias("cents"), "ts")
    numbered = win.global_row_number(
        c, ["cents", "ts"],
        F.floor(F.col("cents") / 10_000).cast("long"), out_col="rn")
    tot = c.agg(F.count("*").alias("n"))
    b = numbered.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.expr(f"((rn - 1) * {EQUIDEPTH_B}) div n").cast("bigint")
        .alias("bucket"))
    return (b.groupBy("bucket")
            .agg(F.count("*").alias("n_rows"),
                 F.min("cents").cast("bigint").alias("lo_cents"),
                 F.max("cents").cast("bigint").alias("hi_cents")))


_SCD2_CTES = f"""ev AS ({_EV}),
ch AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM ev
),
chg AS (
  SELECT user_id, event_type AS state, ts AS valid_from
  FROM ch WHERE prev_type IS NULL OR prev_type <> event_type
),
scd AS (
  SELECT user_id, state, valid_from,
         LEAD(valid_from) OVER (PARTITION BY user_id
                                ORDER BY valid_from) AS valid_to
  FROM chg
)"""


@register(
    "scd2_point_in_time_join",
    f"""WITH {_SCD2_CTES},
p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.ts,
       s.state AS prev_state, s.valid_from AS state_entered_at
FROM p JOIN scd s
  ON s.user_id = p.user_id
 AND s.valid_from <= p.ts - 1
 AND (s.valid_to IS NULL OR s.valid_to > p.ts - 1)""",
    doc="point-in-time-correct dimension lookup: each purchase event "
        "joined to the SCD2 state interval that was valid the instant "
        "BEFORE it (ts-1) — 'what state was the account in when it "
        "purchased'. The warehouse temporal-join every history table "
        "exists for. Scale shape: equi-join on user_id (high "
        "cardinality) with the interval containment as a residual — "
        "per-user interval lists are change-compressed and small, so "
        "no interval-join machinery is needed when a key column "
        "co-partitions both sides.",
)
def q_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ch = ev.select("user_id", "event_type", "ts",
                   F.lag("event_type").over(w).alias("prev_type"))
    chg = (ch.where(F.col("prev_type").isNull()
                    | (F.col("prev_type") != F.col("event_type")))
           .select("user_id", F.col("event_type").alias("state"),
                   F.col("ts").alias("valid_from")))
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    scd = chg.select("user_id", "state", "valid_from",
                     F.lead("valid_from").over(w2).alias("valid_to"))
    p = (ev.where(F.col("event_type") == "purchase")
         .select("event_id", "user_id", "ts"))
    at = F.col("p.ts") - 1
    return (p.alias("p").join(
        scd.alias("s"),
        (F.col("s.user_id") == F.col("p.user_id"))
        & (F.col("s.valid_from") <= at)
        & (F.col("s.valid_to").isNull() | (F.col("s.valid_to") > at)))
        .select(F.col("p.event_id").alias("event_id"),
                F.col("p.user_id").alias("user_id"),
                F.col("p.ts").alias("ts"),
                F.col("s.state").alias("prev_state"),
                F.col("s.valid_from").alias("state_entered_at")))
