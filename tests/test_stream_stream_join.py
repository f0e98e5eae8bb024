"""Stream-stream join: two live streams joined on key + event-time range,
state bounded by watermarks. Compared against the equivalent batch join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.schemas import EVENTS_SCHEMA
from tigerbeetle_cdc_nats_spark.streaming.joins import (
    NS_PER_HOUR,
    purchases_with_recent_signup,
)

BASE_TS = 1_704_067_200_000_000_000
MIN_NS = 60_000_000_000


def test_stream_stream_join_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    rows = []
    eid = 0
    # user 1: signup at t0, purchases at +10min (join) and +2h (no join).
    rows.append((eid := eid + 1, BASE_TS, 1, "signup", 1.0, "{}"))
    rows.append((eid := eid + 1, BASE_TS + 10 * MIN_NS, 1, "purchase", 5.0, "{}"))
    rows.append((eid := eid + 1, BASE_TS + 120 * MIN_NS, 1, "purchase", 5.0, "{}"))
    # user 2: two signups then one purchase inside both windows -> 2 matches.
    rows.append((eid := eid + 1, BASE_TS, 2, "signup", 1.0, "{}"))
    rows.append((eid := eid + 1, BASE_TS + 5 * MIN_NS, 2, "signup", 1.0, "{}"))
    rows.append((eid := eid + 1, BASE_TS + 30 * MIN_NS, 2, "purchase", 5.0, "{}"))
    # user 3: purchase with no signup -> no output.
    rows.append((eid := eid + 1, BASE_TS, 3, "purchase", 5.0, "{}"))

    df = spark.createDataFrame(rows, EVENTS_SCHEMA)
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        purchases_with_recent_signup(stream)
        .writeStream
        .foreachBatch(lambda d, b: d.write.mode("append").parquet(out))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None

    got = {(r["purchase_id"], r["signup_id"])
           for r in spark.read.parquet(out).collect()}

    # batch reference: same join semantics on the static frame
    p = df.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"), F.col("ts").alias("p_ts"))
    s = df.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("su"), F.col("ts").alias("s_ts"))
    expect = {
        (r["purchase_id"], r["signup_id"])
        for r in p.join(
            s, (F.col("pu") == F.col("su"))
            & (F.col("p_ts") >= F.col("s_ts"))
            & (F.col("p_ts") <= F.col("s_ts") + NS_PER_HOUR)).collect()
    }
    assert got == expect and len(got) == 3
