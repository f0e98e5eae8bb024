"""Incremental view maintenance queries: delete/correction-aware view
refresh downstream of the reference's change stream.

The reference's consumers rebuild state from ordered events
(runner.go:425-466); ``queries_changelog.py`` covers the append-only forms.
These two queries exercise the full weighted multiset algebra — retractions
(weight −1 corrections) on the fact side AND re-mapped keys on the
dimension side — via ``operators/ivm.py``. The Spark side computes the
refreshed view FROM THE DELTAS ONLY (two-level maintenance: key partials,
then a |keys|-sized join); the oracle recomputes the view naively from the
post-change state. Hash equality is therefore a proof that the incremental
algebra equals the full recompute.

Scenario encoded deterministically over the driver testdata:
- fact = events; the delta window is ts >= CUT_NS (inserts, w=+1) plus
  corrections retracting every old event with event_id % 17 == 0 (w=−1);
- dim = customer (user_id -> c_mktsegment); customers with
  c_custkey % 13 == 0 are re-segmented (rotate to the next TPC-H segment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tigerbeetle_cdc_nats_spark.operators import ivm
from tigerbeetle_cdc_nats_spark.operators.aggregates import CENTS
from tigerbeetle_cdc_nats_spark.operators.cdc_view import EVENTS_CTE as _EV
from tigerbeetle_cdc_nats_spark.registry import events_table, register
from tigerbeetle_cdc_nats_spark.session import load_table

#: Delta-window cutoff: ~69% through the events ts range (2024-01-21).
CUT_NS = 1705800000000000000
#: Corrections: retract old events whose id hits this residue class.
_DEL_MOD = 17
#: Dimension churn: re-segment customers in this residue class.
_DIM_MOD = 13

#: Deterministic segment rotation (identical SQL in both engines).
_NEXT_SEG = (
    "CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 'BUILDING' "
    "WHEN 'BUILDING' THEN 'FURNITURE' WHEN 'FURNITURE' THEN 'HOUSEHOLD' "
    "WHEN 'HOUSEHOLD' THEN 'MACHINERY' ELSE 'AUTOMOBILE' END"
)

_DIM_OLD_SQL = "SELECT c_custkey AS user_id, c_mktsegment AS segment FROM customer"
_DIM_NEW_SQL = (
    "SELECT c_custkey AS user_id, "
    f"CASE WHEN c_custkey % {_DIM_MOD} = 0 THEN {_NEXT_SEG} "
    "ELSE c_mktsegment END AS segment FROM customer"
)
_FACT_NEW_SQL = (
    f"SELECT * FROM ev WHERE ts >= {CUT_NS} OR event_id % {_DEL_MOD} <> 0"
)
_V_NEW_SQL = f"""
SELECT d.segment AS segment,
       COUNT(*) AS n_events,
       CAST(SUM({CENTS}) AS BIGINT) AS sum_cents,
       COUNT(DISTINCT f.user_id) AS n_users
FROM ({_FACT_NEW_SQL}) f JOIN ({_DIM_NEW_SQL}) d ON f.user_id = d.user_id
GROUP BY d.segment"""


def _split_deltas(spark: SparkSession, sf_dir: str):
    """(U_old partials, ΔU partials, dim_old, dim_new) for the scenario."""
    ev = events_table(spark, sf_dir)
    old = ev.where(F.col("ts") < CUT_NS)
    ins = ev.where(F.col("ts") >= CUT_NS).withColumn("w", F.lit(1))
    dels = (old.where(F.col("event_id") % _DEL_MOD == 0)
            .withColumn("w", F.lit(-1)))

    u_old = ivm.weighted_fact_partials(
        old.withColumn("w", F.lit(1)), "user_id", CENTS)
    du = ivm.weighted_fact_partials(
        ins.unionByName(dels), "user_id", CENTS)

    cust = load_table(spark, sf_dir, "customer")
    dim_old = cust.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"))
    dim_new = cust.select(
        F.col("c_custkey").alias("user_id"),
        F.when(F.col("c_custkey") % _DIM_MOD == 0, F.expr(_NEXT_SEG))
        .otherwise(F.col("c_mktsegment")).alias("segment"))
    return u_old, du, dim_old, dim_new


@register(
    "ivm_join_view",
    f"WITH ev AS ({_EV}) {_V_NEW_SQL}",
    doc="delete/correction-aware materialized join view, refreshed via "
        "two-level IVM: key-partial merge (touches only |Δfact|) then a "
        "|keys|-sized dim join + rollup. Oracle recomputes naively from "
        "post-change state — hash match proves the incremental algebra. "
        "Downstream of runner.go:425-466's change stream.",
)
def q_ivm_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    u_old, du, _dim_old, dim_new = _split_deltas(spark, sf_dir)
    u_new = ivm.merge_partials(u_old, du, "user_id")
    return ivm.rollup_to_groups(u_new, dim_new, "user_id", "segment")


@register(
    "ivm_delta_rows",
    f"""WITH ev AS ({_EV}),
v_new AS ({_V_NEW_SQL}),
v_old AS (
  SELECT d.segment AS segment, COUNT(*) AS n_events,
         CAST(SUM({CENTS}) AS BIGINT) AS sum_cents
  FROM (SELECT * FROM ev WHERE ts < {CUT_NS}) f
  JOIN ({_DIM_OLD_SQL}) d ON f.user_id = d.user_id
  GROUP BY d.segment)
SELECT COALESCE(n.segment, o.segment) AS segment,
       COALESCE(n.n_events, 0) - COALESCE(o.n_events, 0) AS d_events,
       COALESCE(n.sum_cents, 0) - COALESCE(o.sum_cents, 0) AS d_cents
FROM v_new n FULL OUTER JOIN v_old o ON n.segment = o.segment
WHERE COALESCE(n.n_events, 0) - COALESCE(o.n_events, 0) <> 0
   OR COALESCE(n.sum_cents, 0) - COALESCE(o.sum_cents, 0) <> 0""",
    doc="the signed group-level change stream ΔV = V_new − V_old, computed "
        "from deltas only (operators/ivm.group_delta): fact deltas under "
        "the old mapping plus whole-total moves for re-mapped keys. The "
        "oracle materializes both views and diffs them full-outer.",
)
def q_ivm_delta_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    u_old, du, dim_old, dim_new = _split_deltas(spark, sf_dir)
    out = ivm.group_delta(u_old, du, dim_old, dim_new, "user_id", "segment")
    return out.select("segment", "d_events", "d_cents")


@register(
    "ivm_topk_view",
    f"""WITH ev AS ({_EV}),
f AS ({_FACT_NEW_SQL}),
d AS ({_DIM_NEW_SQL}),
u AS (
  SELECT f.user_id, d.segment, COUNT(*) AS n_events,
         CAST(SUM({CENTS}) AS BIGINT) AS sum_cents
  FROM f JOIN d ON f.user_id = d.user_id
  GROUP BY f.user_id, d.segment
),
r AS (
  SELECT segment, user_id, n_events, sum_cents,
         ROW_NUMBER() OVER (PARTITION BY segment
                            ORDER BY sum_cents DESC, user_id) AS topk_rank
  FROM u
)
SELECT segment, user_id, n_events, sum_cents, topk_rank
FROM r WHERE topk_rank <= 3""",
    doc="maintained top-k view under deletes: the top-3 accounts by "
        "maintained balance per segment AFTER the weighted deltas apply. "
        "Deletion-safe because the rank runs over the maintained "
        "key-level partials (|keys| rows), not a stored top-k list — a "
        "retraction that demotes a leader automatically promotes the "
        "next key, the failure mode naive materialized top-k caches "
        "cannot handle. Refresh cost: the partial merge (|Δ|) plus a "
        "|keys|-input WindowGroupLimit rank.",
)
def q_ivm_topk_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    u_old, du, _dim_old, dim_new = _split_deltas(spark, sf_dir)
    u_new = ivm.merge_partials(u_old, du, "user_id")
    per_user = (u_new.join(dim_new, "user_id")
                .select("segment", "user_id",
                        F.col("n").alias("n_events"),
                        F.col("m").alias("sum_cents")))
    w = Window.partitionBy("segment").orderBy(
        F.col("sum_cents").desc(), "user_id")
    return (per_user.withColumn("topk_rank",
                                F.row_number().over(w).cast("bigint"))
            .where(F.col("topk_rank") <= 3)
            .select("segment", "user_id", "n_events",
                    "sum_cents", "topk_rank"))


@register(
    "segment_migration_matrix",
    f"""WITH ev AS ({_EV}),
f AS ({_FACT_NEW_SQL}),
o AS ({_DIM_OLD_SQL}),
n AS ({_DIM_NEW_SQL}),
u AS (SELECT f.user_id, COUNT(*) AS n_events,
             CAST(SUM({CENTS}) AS BIGINT) AS sum_cents
      FROM f GROUP BY f.user_id)
SELECT o.segment AS segment_old, n.segment AS segment_new,
       COUNT(*) AS n_users,
       CAST(SUM(COALESCE(u.n_events, 0)) AS BIGINT) AS n_events,
       CAST(SUM(COALESCE(u.sum_cents, 0)) AS BIGINT) AS sum_cents
FROM o JOIN n ON o.user_id = n.user_id
LEFT JOIN u ON u.user_id = o.user_id
GROUP BY o.segment, n.segment""",
    doc="dimension-churn observability: the (old segment x new segment) "
        "migration matrix with per-cell user counts and maintained fact "
        "totals — the audit that explains WHY a maintained view's groups "
        "moved after a dim change (diagonal = stayed; off-diagonal = the "
        "re-mapped mass ivm_delta_rows charged between groups). Join "
        "input is |keys| rows on every side.",
)
def q_segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    u_old, du, dim_old, dim_new = _split_deltas(spark, sf_dir)
    u_new = ivm.merge_partials(u_old, du, "user_id")
    o = dim_old.withColumnRenamed("segment", "segment_old")
    n = dim_new.withColumnRenamed("segment", "segment_new")
    return (o.join(n, "user_id")
            .join(u_new, "user_id", "left")
            .groupBy("segment_old", "segment_new")
            .agg(F.count("*").alias("n_users"),
                 F.sum(F.coalesce(F.col("n"), F.lit(0))).cast("bigint")
                 .alias("n_events"),
                 F.sum(F.coalesce(F.col("m"), F.lit(0))).cast("bigint")
                 .alias("sum_cents")))
