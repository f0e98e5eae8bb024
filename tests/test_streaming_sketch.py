"""Streaming HLL maintenance: online registers must equal a batch rebuild,
survive restart, and be invariant under at-least-once replay."""

from __future__ import annotations

import os

from pyspark.sql import functions as F, types as T

from tigerbeetle_cdc_nats_spark.operators import sketches as sk
from tigerbeetle_cdc_nats_spark.streaming import sketch as ss

EV_SCHEMA = T.StructType([
    T.StructField("event_type", T.StringType()),
    T.StructField("user_id", T.LongType()),
])


def _write(spark, d, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "append").parquet(d)


def _drain(spark, src, out, chk):
    reg = ss.hll_register_stream(
        spark.readStream.schema(EV_SCHEMA).parquet(src),
        F.col("user_id").cast("string"), ["event_type"])
    q = (reg.writeStream.format("memory").queryName("hll_regs")
         .outputMode("complete")
         .option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table("hll_regs")


def _rows(n, t="click", off=0):
    return [(t, off + i) for i in range(n)]


def test_streaming_registers_match_batch_and_survive_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    os.makedirs(src)

    _write(spark, src, _rows(300))
    _drain(spark, src, None, chk)

    # second batch through a NEW query on the same checkpoint (restart)
    _write(spark, src, _rows(300, off=200))  # overlaps [200, 300)
    live = _drain(spark, src, None, chk).collect()

    batch = sk.hll_registers(
        spark.createDataFrame(_rows(500), EV_SCHEMA),
        F.col("user_id").cast("string"), ["event_type"]).collect()
    key = lambda r: (r["event_type"], r["bucket"])  # noqa: E731
    assert {key(r): r["r"] for r in live} == {key(r): r["r"] for r in batch}

    # estimate from the online registers tracks the true distinct count
    est = ss.estimate_snapshot(
        spark.table("hll_regs"), ["event_type"]).first()["est_e6"] / 1e6
    assert abs(est - 500) / 500 < 0.15

    # at-least-once replay: re-appending an already-counted slice must
    # leave every register unchanged (MAX is idempotent)
    _write(spark, src, _rows(100, off=200))
    replayed = _drain(spark, src, None, chk).collect()
    assert {key(r): r["r"] for r in replayed} == \
           {key(r): r["r"] for r in batch}


def test_streaming_state_is_bounded_per_group(spark, tmp_path):
    src = str(tmp_path / "src2")
    chk = str(tmp_path / "chk2")
    os.makedirs(src)
    _write(spark, src, _rows(2000, "a") + _rows(2000, "b"))
    regs = _drain(spark, src, None, chk)
    counts = regs.groupBy("event_type").count().collect()
    assert all(r["count"] <= sk.HLL_M for r in counts)
