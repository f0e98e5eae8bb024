"""Streaming windowed aggregations: tumbling rate windows and session
windows over event time, driven through real micro-batch runs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.schemas import EVENTS_SCHEMA
from tigerbeetle_cdc_nats_spark.streaming.windows import (
    streaming_rate_windows,
    streaming_sessions,
)

BASE_TS = 1_704_067_200_000_000_000
NS = 1_000_000_000


@pytest.fixture()
def dirs(tmp_path):
    src, out, chk = (str(tmp_path / d) for d in ("src", "out", "chk"))
    os.makedirs(src)
    return src, out, chk


def _write(spark, src, rows):
    (spark.createDataFrame(rows, EVENTS_SCHEMA)
     .coalesce(1).write.mode("append").parquet(src))


def _run(spark, src, out, chk, transform, mode="append"):
    q = (
        transform(spark.readStream.schema(EVENTS_SCHEMA).parquet(src))
        .writeStream
        .foreachBatch(lambda df, b: df.write.mode("append").parquet(out))
        .option("checkpointLocation", chk)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive and q.exception() is None


def test_tumbling_rate_windows(spark, dirs):
    src, out, chk = dirs
    # 3 events in second 0, 2 in second 1.
    _write(spark, src, [
        (i, BASE_TS + off, 1, "click", 1.0, "{}")
        for i, off in enumerate([0, 10_000, 20_000, NS, NS + 5_000])
    ])
    # Close the watermark so windows finalize: a late marker 10 min ahead.
    _write(spark, src, [(99, BASE_TS + 600 * NS, 1, "click", 1.0, "{}")])
    _run(spark, src, out, chk, streaming_rate_windows, mode="append")
    rows = {r["window_start_us"]: r["n_events"]
            for r in spark.read.parquet(out).collect()}
    assert rows[BASE_TS // 1000] == 3
    assert rows[(BASE_TS + NS) // 1000] == 2


def test_session_windows_split_on_gap(spark, dirs):
    src, out, chk = dirs
    gap_ns = 30 * 60 * NS
    # user 1: 2 events close together, then one after > gap -> 2 sessions.
    _write(spark, src, [
        (1, BASE_TS, 1, "click", 1.0, "{}"),
        (2, BASE_TS + NS, 1, "click", 1.0, "{}"),
        (3, BASE_TS + gap_ns + 2 * NS, 1, "click", 1.0, "{}"),
        # watermark closer far in the future
        (9, BASE_TS + 4 * gap_ns, 2, "click", 1.0, "{}"),
    ])
    _run(spark, src, out, chk, streaming_sessions, mode="append")
    sessions = [r for r in spark.read.parquet(out).collect()
                if r["user_id"] == 1]
    assert len(sessions) == 2
    assert sorted(s["n_events"] for s in sessions) == [1, 2]
