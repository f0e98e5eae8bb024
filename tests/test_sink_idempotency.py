"""Crash-replay semantics of the batch sink: re-running the same micro-batch
(the at-least-once replay after a crash between publish and checkpoint,
runner.go:442-462) must not duplicate sink rows, and an empty source is a
clean no-op."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.config import CdcConfig, validate
from tigerbeetle_cdc_nats_spark.schemas import EVENTS_SCHEMA
from tigerbeetle_cdc_nats_spark.streaming import pipeline as pl

BASE_TS = 1_704_067_200_000_000_000


@pytest.fixture()
def paths(tmp_path):
    p = pl.StreamPaths(
        source_dir=str(tmp_path / "source"),
        sink_dir=str(tmp_path / "sink"),
        checkpoint_dir=str(tmp_path / "chk"),
        cursor_dir=str(tmp_path / "cursor"),
        lock_dir=str(tmp_path / "lock"),
    )
    os.makedirs(p.source_dir)
    return p


def test_replayed_batch_overwrites_not_duplicates(spark, paths):
    cfg = validate(CdcConfig(cluster_id="1"))
    rows = [(i, BASE_TS + i * 1_000, 1, "purchase", 1.0, "{}")
            for i in range(10)]
    batch = pl.transform_events(
        spark.createDataFrame(rows, EVENTS_SCHEMA), cfg
    )
    sink = pl.make_batch_sink(spark, paths)
    sink(batch, 7)
    sink(batch, 7)  # crash-replay of the SAME micro-batch id
    out = spark.read.parquet(paths.sink_dir)
    assert out.count() == 10  # overwrite-by-batch-id, not append
    # cursor re-commit is idempotent too: reads take max(timestamp)
    assert pl.read_progress(spark, paths.cursor_dir) == BASE_TS + 9_000


def test_empty_source_is_clean_noop(spark, paths):
    cfg = validate(CdcConfig(cluster_id="1"))
    # no files in source at all
    pl.run_until_caught_up(spark, cfg, paths)
    assert pl.read_progress(spark, paths.cursor_dir) is None
    assert not os.path.exists(paths.sink_dir) or not os.listdir(paths.sink_dir)


def test_empty_batch_skips_write_and_commit(spark, paths):
    cfg = validate(CdcConfig(cluster_id="1"))
    empty = pl.transform_events(
        spark.createDataFrame([], EVENTS_SCHEMA), cfg
    )
    pl.make_batch_sink(spark, paths)(empty, 0)
    assert pl.read_progress(spark, paths.cursor_dir) is None
