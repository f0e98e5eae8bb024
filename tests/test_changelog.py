"""Changelog-materialization operators: semantics + the plan properties
that keep them linear at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark import registry
from tigerbeetle_cdc_nats_spark.operators.changelog import (
    changelog_compaction,
    incremental_rollup_merge,
    snapshot_diff,
)
from tigerbeetle_cdc_nats_spark.operators.joins import salted_skew_join
from tigerbeetle_cdc_nats_spark.plans import physical_plan

QUERIES = registry.all_queries()


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts bigint, user_id bigint, "
              "event_type string, value double")


def test_compaction_picks_latest_version(spark):
    ev = _events(spark, [
        (1, 100, 7, "click", 1.0),
        (2, 300, 7, "purchase", 2.0),   # winner: latest ts
        (3, 200, 7, "view", 3.0),
        (4, 300, 8, "view", 4.0),
        (5, 300, 8, "error", 5.0),      # winner: ts tie -> higher event_id
    ])
    got = {r["user_id"]: r for r in changelog_compaction(ev).collect()}
    assert got[7]["last_event_id"] == 2
    assert got[7]["last_type"] == "purchase"
    assert got[7]["n_versions"] == 3
    assert got[8]["last_event_id"] == 5  # deterministic tie-break
    assert got[8]["last_cents"] == 500


def test_compaction_is_aggregation_not_window_sort(spark, sf_dir):
    """The compaction must compile to hash aggregation (map-side partial +
    final), NOT a window row_number — a window sorts every partition of the
    100 TB log; the struct-max needs no sort at all."""
    plan = physical_plan(QUERIES["changelog_compaction"].fn(spark, sf_dir))
    assert "HashAggregate" in plan or "SortAggregate" in plan
    assert "Window" not in plan
    assert "RunningWindowFunction" not in plan


def test_incremental_merge_equals_full_aggregate(spark):
    rows = [(i, i * 10, i % 3, "click", float(i)) for i in range(30)]
    ev = _events(spark, rows)
    merged = incremental_rollup_merge(ev, cutoff_ns=150).orderBy("user_id")
    full = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.floor(F.col("value") * 100).cast("bigint"))
             .alias("sum_cents"),
             F.max("ts").alias("last_ts"))
        .orderBy("user_id")
    )
    got = merged.collect()
    want = full.collect()
    for g, w in zip(got, want):
        assert (g["user_id"], g["n_events"], g["sum_cents"], g["last_ts"]) == \
               (w["user_id"], w["n_events"], w["sum_cents"], w["last_ts"])
    # delta counts only the rows at/after the cutoff (ts >= 150 -> ids 15..29)
    assert sum(r["n_delta"] for r in got) == 15


def test_snapshot_diff_classifies_all_four_ways(spark):
    ev = _events(spark, [
        # window A = [0, 100): users 1 (removed), 2, 3, 4
        (1, 10, 1, "click", 1.0),
        (2, 20, 2, "click", 2.0),
        (3, 30, 3, "click", 3.0),
        (4, 40, 4, "click", 4.0),
        # window B = [100, 200): 2 unchanged, 3 changed, 4 changed, 5 added
        (5, 110, 2, "click", 2.0),
        (6, 120, 3, "click", 9.0),
        (7, 130, 4, "click", 4.5),
        (8, 140, 5, "click", 5.0),
    ])
    got = {r["change_class"]: r for r in
           snapshot_diff(ev, 0, 100, 200).collect()}
    assert set(got) == {"added", "removed", "changed", "unchanged"}
    assert got["added"]["n_keys"] == 1 and got["added"]["cents_delta"] == 500
    assert got["removed"]["cents_delta"] == -100
    assert got["changed"]["n_keys"] == 2
    assert got["changed"]["cents_delta"] == (900 - 300) + (450 - 400)


def test_salted_join_matches_plain_join(spark):
    ev = _events(spark, [(i, i, i % 5, ["a", "b"][i % 2], 1.0)
                         for i in range(40)])
    dim = spark.createDataFrame([("a", 2), ("b", 3)],
                                "event_type string, weight bigint")
    salted = salted_skew_join(ev, dim, "event_type", salt=4)
    plain = ev.join(dim, "event_type")
    assert salted.count() == plain.count() == 40
    s = salted.agg(F.sum(F.col("weight") * F.col("event_id"))).first()[0]
    p = plain.agg(F.sum(F.col("weight") * F.col("event_id"))).first()[0]
    assert s == p


def test_window_queries_never_single_partition(spark, sf_dir):
    """running_balance / stream_order_audit must window over partitioned
    keys — an unpartitioned window is an Exchange SinglePartition, i.e. the
    whole 100 TB log through one task."""
    for name in ("running_balance", "stream_order_audit"):
        plan = physical_plan(QUERIES[name].fn(spark, sf_dir))
        assert "Window" in plan
        assert "SinglePartition" not in plan


def test_salted_join_spreads_hot_key_and_avoids_broadcast(spark, sf_dir):
    """The registered query's join must run on (key, salt) via shuffled hash
    join — the whole point is spreading each of the 5 hot key values over
    16 reducers instead of broadcasting (the operator targets dims past the
    broadcast threshold)."""
    plan = physical_plan(QUERIES["skew_salted_join"].fn(spark, sf_dir))
    assert "ShuffledHashJoin" in plan
    assert "_salt" in plan
    assert "BroadcastHashJoin" not in plan
