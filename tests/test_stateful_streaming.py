"""Stateful streaming operators: state must carry across micro-batches.

Drives ``applyInPandasWithState`` through a real two-phase streaming run
(write batch 1 -> process -> write batch 2 -> process) and asserts the
second output reflects accumulated state, not a fresh start.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.schemas import EVENTS_SCHEMA
from tigerbeetle_cdc_nats_spark.streaming.stateful import (
    rate_limited_counts,
    running_balances,
)

BASE_TS = 1_704_067_200_000_000_000


@pytest.fixture()
def dirs(tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    os.makedirs(src)
    return src, out, chk


def _write(spark, src, rows):
    (spark.createDataFrame(rows, EVENTS_SCHEMA)
     .coalesce(1).write.mode("append").parquet(src))


def _run_stream(spark, src, out, chk, transform):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        transform(stream)
        .writeStream
        .foreachBatch(lambda df, bid: df.write.mode("append").parquet(out))
        .option("checkpointLocation", chk)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive and q.exception() is None


def test_running_balances_accumulate_across_restarts(spark, dirs):
    src, out, chk = dirs
    # batch 1: user 1 purchases 10.00 twice -> 2000 cents.
    _write(spark, src, [
        (1, BASE_TS + 1, 1, "purchase", 10.0, "{}"),
        (2, BASE_TS + 2, 1, "purchase", 10.0, "{}"),
        (3, BASE_TS + 3, 2, "view", 5.0, "{}"),
    ])
    _run_stream(spark, src, out, chk, running_balances)

    # batch 2 (separate run, state restored from checkpoint): +30.00.
    _write(spark, src, [(4, BASE_TS + 4, 1, "purchase", 30.0, "{}")])
    _run_stream(spark, src, out, chk, running_balances)

    final = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n"),
             F.max("debits_posted_cents").alias("debits"),
             F.max("credits_posted_cents").alias("credits"))
    )
    rows = {r["user_id"]: r for r in final.collect()}
    assert rows[1]["debits"] == 5000  # 1000+1000+3000, carried across runs
    assert rows[1]["n"] == 3
    assert rows[2]["credits"] == 500


def test_rate_limited_counts_throttle_over_limit(spark, dirs):
    src, out, chk = dirs
    # 7 events for user 1 inside ONE 1 s window, limit 5 -> 2 throttled.
    _write(spark, src, [
        (i, BASE_TS + i * 1000, 1, "click", 1.0, "{}") for i in range(7)
    ])
    _run_stream(spark, src, out, chk,
                lambda s: rate_limited_counts(s, limit=5))
    final = spark.read.parquet(out)
    row = final.orderBy(F.col("n_admitted").desc()).first()
    assert row["n_admitted"] == 5
    assert row["n_throttled"] == 2


def test_streaming_heavy_hitters_tracks_planted_hitter(spark, dirs):
    """A planted heavy user must survive across micro-batches with the
    SpaceSaving bound (true <= est <= true + err), and state must be
    BOUNDED: far more distinct users than capacity, summary size capped."""
    from tigerbeetle_cdc_nats_spark.streaming.stateful import (
        HH_CAPACITY,
        streaming_heavy_hitters,
    )

    src, out, chk = dirs
    hot = 7  # lands in shard 7 % 32
    # batch 1: hot user 60x + 100 distinct light users (> capacity churn)
    rows1 = [(i, BASE_TS + i, hot, "view", 1.0, "{}") for i in range(60)]
    rows1 += [(1000 + u, BASE_TS + 1000 + u, 7 + 32 * (u + 1), "view",
               1.0, "{}") for u in range(100)]  # same shard as hot
    _write(spark, src, rows1)
    _run_stream(spark, src, out, chk,
                lambda s: streaming_heavy_hitters(s, n_shards=32))
    # batch 2: 40 more hot events — state must carry the prior 60
    rows2 = [(5000 + i, BASE_TS + 5000 + i, hot, "view", 1.0, "{}")
             for i in range(40)]
    _write(spark, src, rows2)
    _run_stream(spark, src, out, chk,
                lambda s: streaming_heavy_hitters(s, n_shards=32))

    got = spark.read.parquet(out)
    latest = (got.where(F.col("item") == hot)
              .orderBy(F.col("est_count").desc()).first())
    assert latest is not None, "planted hitter evicted"
    true = 100
    assert true <= latest["est_count"] <= true + latest["max_err"]
    # bounded state: no output batch ever reports more tracked items for
    # the shard than the summary capacity (2 batches appended here)
    n_rows = got.where(F.col("shard") == hot % 32).count()
    assert n_rows <= 2 * HH_CAPACITY


def test_streaming_heavy_hitters_state_is_capacity_bounded(spark):
    """Unit-level: merging far more distinct items than capacity keeps the
    summary at exactly `capacity` entries with valid SpaceSaving bounds."""
    from tigerbeetle_cdc_nats_spark.streaming.stateful import _hh_merge

    summary, errs = {}, {}
    cap = 8
    for item in range(100):
        _hh_merge(summary, errs, item, 1, cap)
    assert len(summary) == cap
    # one mega-item merged late must displace and dominate
    _hh_merge(summary, errs, 999, 1000, cap)
    assert 999 in summary
    assert summary[999] >= 1000
    assert summary[999] - errs[999] <= 1000  # est - err <= true
