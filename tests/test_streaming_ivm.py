"""Streaming weighted IVM (streaming/ivm.py): deletes drop keys, state
survives restart, replay cannot double-count, online equals batch."""

from __future__ import annotations

import os

from pyspark.sql import functions as F, types as T

from tigerbeetle_cdc_nats_spark.operators import ivm
from tigerbeetle_cdc_nats_spark.streaming.ivm import (
    ivm_sink,
    read_state,
    run_ivm_stream,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("m", T.LongType()),
    T.StructField("w", T.IntegerType()),
])


def _write(spark, d, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append").parquet(d)


def _drain(spark, src, state, chk):
    q = run_ivm_stream(
        spark.readStream.schema(SCHEMA).parquet(src), state, chk)
    q.awaitTermination(120)


def _snap(spark, state):
    return {r["k"]: (r["n"], r["m"])
            for r in read_state(spark, state).collect()}


def test_stream_merges_deletes_and_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    chk = str(tmp_path / "chk")
    os.makedirs(src)

    _write(spark, src, [(1, 10, 1), (1, 20, 1), (2, 5, 1)])
    _drain(spark, src, state, chk)
    assert _snap(spark, state) == {1: (2, 30), 2: (1, 5)}

    # Restart (new query, same checkpoint): key 2 fully retracted,
    # key 3 appears, key 1 gets a correction.
    _write(spark, src, [(2, 5, -1), (3, 7, 1), (1, 10, -1)])
    _drain(spark, src, state, chk)
    got = _snap(spark, state)
    assert got == {1: (1, 20), 3: (1, 7)}

    # Online == batch: naive recompute over the full delta log.
    full = spark.read.parquet(src)
    naive = {r["k"]: (r["n"], r["m"]) for r in
             ivm.weighted_fact_partials(full, "k", "m")
             .where(F.col("n") != 0).collect()}
    assert got == naive


def test_replayed_batch_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    sink = ivm_sink(state)
    b0 = spark.createDataFrame([(1, 10, 1), (2, 4, 1)], SCHEMA)
    sink(b0, 0)
    before = _snap(spark, state)
    sink(b0, 0)  # crash-replay of the same micro-batch
    assert _snap(spark, state) == before == {1: (1, 10), 2: (1, 4)}

    b1 = spark.createDataFrame([(1, 10, -1)], SCHEMA)
    sink(b1, 1)
    sink(b1, 1)
    assert _snap(spark, state) == {2: (1, 4)}


def test_state_time_travel(spark, tmp_path):
    import pytest

    from tigerbeetle_cdc_nats_spark.streaming.ivm import list_versions

    state = str(tmp_path / "state")
    sink = ivm_sink(state)
    sink(spark.createDataFrame([(1, 10, 1)], SCHEMA), 0)
    sink(spark.createDataFrame([(2, 5, 1)], SCHEMA), 1)
    sink(spark.createDataFrame([(1, 10, -1)], SCHEMA), 2)

    assert list_versions(state) == [0, 1, 2]
    v0 = {r["k"]: (r["n"], r["m"])
          for r in read_state(spark, state, version=0).collect()}
    v1 = {r["k"]: (r["n"], r["m"])
          for r in read_state(spark, state, version=1).collect()}
    latest = _snap(spark, state)
    assert v0 == {1: (1, 10)}
    assert v1 == {1: (1, 10), 2: (1, 5)}
    assert latest == {2: (1, 5)}   # key 1 retracted at v2
    with pytest.raises(ValueError):
        read_state(spark, state, version=7)


def test_version_retention_prunes_disk(spark, tmp_path):
    from tigerbeetle_cdc_nats_spark.streaming.ivm import (
        list_versions, prune_versions)

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    chk = str(tmp_path / "chk")
    for i in range(4):
        _write(spark, src, [(i, 10 * i, 1)])
        q = run_ivm_stream(
            spark.readStream.schema(SCHEMA).parquet(src), state, chk,
            retain_versions=2)
        q.awaitTermination(120)
    vs = list_versions(state)
    assert len(vs) == 2  # retention bounded the version history
    # the live state still has every key
    assert len(_snap(spark, state)) == 4
    pruned = prune_versions(state, 1)
    assert len(pruned) == 1 and len(list_versions(state)) == 1


def test_reset_checkpoint_with_stale_state_fails_fast(spark, tmp_path):
    """batch ids restart at 0 after a checkpoint reset; with kept state the
    old v0/_SUCCESS would silently swallow genuinely new data as a
    'replay' — the sink must refuse instead (round-4 advisory)."""
    import shutil

    import pytest

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    chk = str(tmp_path / "chk")
    _write(spark, src, [(1, 10, 1)])
    _drain(spark, src, state, chk)
    assert _snap(spark, state) == {1: (1, 10)}

    shutil.rmtree(chk)  # reset the checkpoint, KEEP the state
    src2 = str(tmp_path / "src2")
    _write(spark, src2, [(2, 99, 1)])
    q = run_ivm_stream(
        spark.readStream.schema(SCHEMA).parquet(src2), state, chk)
    with pytest.raises(Exception, match="checkpoint was reset"):
        q.awaitTermination(120)
        raise RuntimeError(
            "stream finished without refusing the stale state")
    # and the stale-state skip did NOT drop data silently
    assert _snap(spark, state) == {1: (1, 10)}


def test_cdc_source_to_ivm_end_to_end(spark, tmp_path):
    """Round-5 composition: the first-class CDC source feeds the weighted
    IVM sink — maintained per-user totals through REAL source offsets
    equal a batch groupBy of the same events."""
    from pyspark.sql import functions as F

    from tigerbeetle_cdc_nats_spark.sources.cdc_source import (
        read_cdc_stream,
    )

    src = str(tmp_path / "events")
    state = str(tmp_path / "state")
    chk = str(tmp_path / "chk")
    base_ns = 1_700_000_000_000_000_000
    ev = spark.range(0, 200).select(
        F.col("id").alias("event_id"),
        (F.lit(base_ns) + F.col("id") * 1_000_000_000).alias("ts"),
        (F.col("id") % 7).alias("user_id"),
        F.lit("transfer").alias("event_type"),
        (F.col("id") % 13).cast("double").alias("value"),
        F.lit('{"k":1}').alias("props"))
    ev.coalesce(1).write.parquet(src)

    deltas = read_cdc_stream(spark, src, event_count_max=1000).select(
        F.col("user_id").alias("k"),
        F.floor(F.col("value") * 100).cast("long").alias("m"),
        F.lit(1).alias("w"))
    q = run_ivm_stream(deltas, state, chk)
    q.awaitTermination(120)

    expect = {r["k"]: (r["n"], r["m"]) for r in
              ev.groupBy(F.col("user_id").alias("k"))
              .agg(F.count("*").alias("n"),
                   F.sum(F.floor(F.col("value") * 100).cast("long"))
                   .alias("m")).collect()}
    assert _snap(spark, state) == expect
