"""Remaining scalar-function and sketch coverage (SURVEY.md §2.8 F3/F6,
§2.4 A5 approximate variants, grouping-set cube)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tigerbeetle_cdc_nats_spark.operators.cdc_view import EVENTS_CTE as _EV
from tigerbeetle_cdc_nats_spark.registry import events_table, register


@register(
    "resource_naming",
    f"""WITH ev AS ({_EV})
SELECT DISTINCT user_id % 10 AS ledger,
  'TB_CDC_EVENTS' || '_' || CAST(user_id % 10 AS VARCHAR) AS stream_name,
  'TB_CDC_PROGRESS' || '_' || CAST(user_id % 10 AS VARCHAR) AS progress_name
FROM ev""",
    doc="F3: cluster-scoped resource naming <base>_<cluster> "
        "(config.go:431-433)",
)
def q_resource_naming(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    ledger = (F.col("user_id") % 10).alias("ledger")
    return ev.select(
        ledger,
        F.concat_ws("_", F.lit("TB_CDC_EVENTS"),
                    (F.col("user_id") % 10).cast("string")).alias("stream_name"),
        F.concat_ws("_", F.lit("TB_CDC_PROGRESS"),
                    (F.col("user_id") % 10).cast("string")).alias("progress_name"),
    ).distinct()


@register(
    "time_format",
    f"""WITH ev AS ({_EV})
SELECT event_id,
  strftime(make_timestamp(ts // 1000),
           '%Y-%m-%dT%H:%M:%S') AS iso_second,
  ts // 1000 AS epoch_us
FROM ev""",
    doc="F6: RFC3339-style time formatting of the event timestamp "
        "(lock updated_at format, runner.go:707)",
)
def q_time_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    # integer division — double division loses ULPs at 1.7e18 ns scale
    us = F.expr("ts div 1000")
    return ev.select(
        "event_id",
        F.date_format(F.timestamp_micros(us),
                      "yyyy-MM-dd'T'HH:mm:ss").alias("iso_second"),
        us.alias("epoch_us"),
    )


@register(
    "ledger_cube",
    f"""WITH ev AS ({_EV})
SELECT user_id % 10 AS ledger, event_type, COUNT(*) AS n_events
FROM ev GROUP BY CUBE(1, 2)""",
    doc="grouping sets: full cube over (ledger, event_type) — pair, each "
        "one-dimension margin, grand total",
)
def q_ledger_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir).withColumn("ledger", F.col("user_id") % 10)
    return ev.cube("ledger", "event_type").agg(F.count("*").alias("n_events"))


@register(
    "approx_distinct_sketch",
    None,  # HLL/KLL sketch internals differ per engine -> rows-only check
    doc="A5 approximate variants: HyperLogLog distinct + KLL-style quantile "
        "sketches — the 100 TB forms of COUNT(DISTINCT)/percentile (exact "
        "twins are oracle-checked in distinct_event_count/value_percentiles). "
        "Percentiles are emitted as scalar columns (not an array) so the "
        "driver's pandas row canonicalizer can hash the result.",
)
def q_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    # round 12 (guide §1.2 per-task work): ONE quantile sketch queried at
    # three points instead of three identical sketches over the same
    # column — same accuracy parameter, same per-partition update order,
    # so all three outputs are bit-identical (verified row-equal); the
    # per-row sketch-update work drops 3x.
    return (ev.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.approx_count_distinct("event_id", rsd=0.01).alias("approx_events"),
        F.percentile_approx(
            "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
            F.lit(10000)).alias("_pp"),
        F.count("*").alias("n_events"))
        .select("approx_users", "approx_events",
                F.col("_pp")[0].alias("approx_p50"),
                F.col("_pp")[1].alias("approx_p90"),
                F.col("_pp")[2].alias("approx_p99"),
                "n_events"))
