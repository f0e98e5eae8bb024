"""Range-join and count-min-sketch queries (instructions' named custom
operators: "range join", "a novel sketch")."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tigerbeetle_cdc_nats_spark.operators import sketches as sk
from tigerbeetle_cdc_nats_spark.operators.cdc_view import EVENTS_CTE as _EV
from tigerbeetle_cdc_nats_spark.operators.range_join import range_join
from tigerbeetle_cdc_nats_spark.registry import events_table, register

HOUR_NS = 3_600_000_000_000


@register(
    "range_join_windows",
    f"""WITH ev AS ({_EV}),
purchases AS (
  SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'
),
windows AS (
  SELECT event_id AS window_id, user_id AS window_user,
         ts AS lo, ts + {HOUR_NS} AS hi
  FROM ev WHERE event_type = 'signup'
)
SELECT event_id, user_id, ts, window_id, window_user, lo, hi
FROM purchases JOIN windows ON ts >= lo AND ts <= hi""",
    doc="range (interval) join: purchases matched to every 1h signup "
        "window containing them. Spark side uses the bucketized "
        "formulation (equality join on a coarse grain + exact filter) — "
        "never a nested-loop join; oracle uses the naive BETWEEN form",
)
def q_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts")
    windows = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("window_id"),
        F.col("user_id").alias("window_user"),
        F.col("ts").alias("lo"),
        (F.col("ts") + HOUR_NS).alias("hi"),
    )
    return range_join(
        purchases, windows, ts_col="ts", lo_col="lo", hi_col="hi",
        grain=HOUR_NS,
    ).select("event_id", "user_id", "ts", "window_id", "window_user",
             "lo", "hi")


def _cms_col_sql(expr: str) -> str:
    whens = " ".join(
        f"WHEN cms_row = {i} THEN {sk.sql_cms_cell(expr, i)}"
        for i in range(sk.CMS_DEPTH)
    )
    return f"CASE {whens} END"


@register(
    "cms_user_counts",
    f"""WITH ev AS ({_EV}),
keyed AS (
  SELECT CAST(user_id AS VARCHAR) AS _k,
         unnest(range(0, {sk.CMS_DEPTH})) AS cms_row
  FROM ev
),
cells AS (
  SELECT cms_row, {_cms_col_sql('_k')} AS cms_col, COUNT(*) AS n
  FROM keyed GROUP BY 1, 2
),
probes AS (
  SELECT CAST(k AS VARCHAR) AS _k, k AS key,
         unnest(range(0, {sk.CMS_DEPTH})) AS cms_row
  FROM range(0, 10) t(k)
),
pc AS (
  SELECT key, cms_row, {_cms_col_sql('_k')} AS cms_col FROM probes
),
est AS (
  SELECT pc.key, MIN(COALESCE(cells.n, 0)) AS est_count
  FROM pc LEFT JOIN cells
    ON pc.cms_row = cells.cms_row AND pc.cms_col = cells.cms_col
  GROUP BY pc.key
)
SELECT est.key, est.est_count,
       (SELECT COUNT(*) FROM ev WHERE ev.user_id = est.key) AS true_count
FROM est""",
    doc="count-min sketch (4x64, md5-derived universal hashes): mergeable "
        "frequency sketch, bit-identical across engines so even the sketch "
        "CELLS are oracle-checked; estimates never undercount (novel-sketch "
        "north star)",
)
def q_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    key = F.col("user_id").cast("string")
    sketch = sk.count_min_sketch(ev, key)
    probes = spark.range(0, 10).select(F.col("id").alias("key"))
    est = sk.cms_estimate(sketch, probes, F.col("key").cast("string"))
    true_counts = ev.groupBy(F.col("user_id").cast("long").alias("key")).agg(
        F.count("*").alias("true_count"))
    return (
        est.withColumn("key", F.col("key").cast("long"))
        .join(true_counts, "key", "left")
        .select("key", "est_count",
                F.coalesce("true_count", F.lit(0)).alias("true_count"))
    )


@register(
    "hll_user_sketch",
    f"""WITH ev AS ({_EV}),
rho AS (
  SELECT event_type, {sk.sql_hll_register('CAST(user_id AS VARCHAR)')}
  FROM ev
),
reg AS (
  SELECT event_type, bucket, MAX(rho) AS r FROM rho GROUP BY 1, 2
),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS nonzero_registers,
         CAST(SUM(r) AS BIGINT) AS sum_rho,
         CAST(SUM(CAST(1 AS BIGINT) << (52 - r)) AS BIGINT) AS zp
  FROM reg GROUP BY 1
),
z AS (
  SELECT event_type, nonzero_registers, sum_rho,
         {sk.HLL_M} - nonzero_registers AS zeros,
         zp + ({sk.HLL_M} - nonzero_registers) * {sk._Z_ONE} AS z_int
  FROM g
)
SELECT event_type, nonzero_registers, sum_rho, zeros,
       CAST(FLOOR(({sk.HLL_EST_SQL}) * 1000000.0) AS BIGINT) AS est_e6
FROM z""",
    doc="portable HyperLogLog: per-event-type distinct-user sketch whose "
        "registers derive from the shared md5 hash, so the SKETCH (not "
        "just its answer) is cross-engine bit-identical and oracle-checked "
        "— unlike engine-native HLLs (approx_distinct_sketch stays the "
        "built-in form). Registers merge by per-bucket MAX: 100 TB of "
        "per-partition sketches reduce to one 512-row state per group",
)
def q_hll_user_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_table(spark, sf_dir)
    return sk.hll_sketch(ev, F.col("user_id").cast("string"), ["event_type"])


@register(
    "interval_overlap_join",
    f"""WITH ev AS ({_EV}),
a AS (
  SELECT event_id AS signup_id, ts AS a_lo, ts + {2 * HOUR_NS} AS a_hi
  FROM ev WHERE event_type = 'signup'
),
b AS (
  SELECT event_id AS purchase_id, ts AS b_lo, ts + {HOUR_NS} AS b_hi
  FROM ev WHERE event_type = 'purchase'
)
SELECT signup_id, purchase_id,
       LEAST(a_hi, b_hi) - GREATEST(a_lo, b_lo) AS overlap_ns
FROM a JOIN b ON a_lo < b_hi AND b_lo < a_hi""",
    doc="interval x interval overlap join (signup 2h windows x purchase "
        "1h windows) via grain bucketing with an emit-once guard — no "
        "equality key exists, yet the plan is a plain shuffled equality "
        "join on the bucket, never a nested-loop; the guard emits each "
        "pair from exactly one shared bucket so no dedup shuffle follows",
)
def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tigerbeetle_cdc_nats_spark.operators.range_join import (
        interval_overlap_join,
    )

    ev = events_table(spark, sf_dir)
    a = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("a_lo"),
        (F.col("ts") + 2 * HOUR_NS).alias("a_hi"))
    b = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("b_lo"),
        (F.col("ts") + HOUR_NS).alias("b_hi"))
    j = interval_overlap_join(a, b, a_lo="a_lo", a_hi="a_hi",
                              b_lo="b_lo", b_hi="b_hi", grain=HOUR_NS)
    return j.select(
        "signup_id", "purchase_id",
        (F.least("a_hi", "b_hi") - F.greatest("a_lo", "b_lo"))
        .alias("overlap_ns"))
