"""Streaming latest-state view: online must equal a batch rebuild, survive
restart, and be invariant under at-least-once replay."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from tigerbeetle_cdc_nats_spark.operators.changelog import changelog_compaction
from tigerbeetle_cdc_nats_spark.streaming.materialize import latest_state_stream

EV_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def _write(spark, d, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "append").parquet(d)


def _drain(spark, src, chk):
    view = latest_state_stream(
        spark.readStream.schema(EV_SCHEMA).parquet(src))
    q = (view.writeStream.format("memory").queryName("latest_state")
         .outputMode("complete")
         .option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table("latest_state")


def _snap(df):
    return {r["user_id"]: (r["last_ts"], r["last_event_id"], r["last_type"],
                           r["last_cents"], r["n_versions"])
            for r in df.collect()}


def test_streaming_view_matches_batch_and_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    os.makedirs(src)

    batch1 = [(1, 100, 7, "click", 1.0), (2, 200, 7, "view", 2.0),
              (3, 150, 8, "click", 3.0)]
    _write(spark, src, batch1)
    _drain(spark, src, chk)

    # new query on the same checkpoint = restart; user 7 advances, 9 appears
    batch2 = [(4, 300, 7, "purchase", 4.0), (5, 50, 8, "error", 5.0),
              (6, 120, 9, "signup", 6.0)]
    _write(spark, src, batch2)
    live = _snap(_drain(spark, src, chk))

    full = spark.createDataFrame(batch1 + batch2, EV_SCHEMA)
    assert live == _snap(changelog_compaction(full))
    assert live[7][2] == "purchase"      # advanced to the newest version
    assert live[8][0] == 150             # stale event_id 5 (ts=50) ignored

    # at-least-once replay of an old slice: latest state must not move,
    # but n_versions counts the replayed rows (count is not idempotent —
    # the version-vector columns are the contract, the count is telemetry)
    _write(spark, src, [(1, 100, 7, "click", 1.0)])
    replayed = _snap(_drain(spark, src, chk))
    assert {k: v[:4] for k, v in replayed.items()} == \
           {k: v[:4] for k, v in live.items()}
