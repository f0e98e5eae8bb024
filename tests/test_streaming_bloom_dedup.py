"""Streaming Bloom dedup window: duplicates dropped across micro-batches
and across restarts, with the filter state restored from the checkpoint."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from tigerbeetle_cdc_nats_spark.streaming.bloom_dedup import bloom_dedup

SCHEMA = T.StructType([T.StructField("msg_id", T.StringType())])


@pytest.fixture()
def dirs(tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    os.makedirs(src)
    return src, out, chk


def _write(spark, src, ids):
    (spark.createDataFrame([(i,) for i in ids], SCHEMA)
     .coalesce(1).write.mode("append").parquet(src))


def _run(spark, src, out, chk):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        bloom_dedup(stream)
        .writeStream
        .foreachBatch(lambda df, bid: df.write.mode("append").parquet(out))
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive and q.exception() is None


def test_dedups_within_and_across_batches(spark, dirs):
    src, out, chk = dirs
    _write(spark, src, ["c0/1", "c0/2", "c0/2", "c0/3"])
    _run(spark, src, out, chk)
    # replayed ids + one new id in a later micro-batch (fresh run, state
    # restored from checkpoint — the at-least-once redelivery case)
    _write(spark, src, ["c0/1", "c0/3", "c0/4"])
    _run(spark, src, out, chk)

    got = sorted(r.msg_id for r in spark.read.parquet(out).collect())
    assert got == ["c0/1", "c0/2", "c0/3", "c0/4"]


def test_batch_counter_reflects_restored_state(spark, dirs):
    src, out, chk = dirs
    _write(spark, src, ["a"])
    _run(spark, src, out, chk)
    _write(spark, src, ["b"])  # same shard only if hashes collide; counter
    _run(spark, src, out, chk)  # check just asserts monotonicity per shard
    rows = spark.read.parquet(out).collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.first_seen_batch)
    for batches in by_shard.values():
        assert batches == sorted(batches)
