"""Stop/restart resume test — the Spark analogue of the reference's
integration test (/root/reference/integration_test.go:41-243): process batch
1, stop the pipeline, add events while down, restart, and assert the new
events arrive exactly once (total count exact, cursor monotone, no
duplicates or loss — integration_test.go:233-240)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.config import CdcConfig, validate
from tigerbeetle_cdc_nats_spark.schemas import EVENTS_SCHEMA
from tigerbeetle_cdc_nats_spark.streaming import pipeline as pl


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


def _write_events(spark, source_dir: str, start_id: int, n: int,
                  base_ts: int) -> None:
    rows = [
        (start_id + i, base_ts + i * 1_000_000, (start_id + i) % 7,
         "purchase", 10.0 + i, '{"k": 1}')
        for i in range(n)
    ]
    (spark.createDataFrame(rows, EVENTS_SCHEMA)
     .coalesce(1).write.mode("append").parquet(source_dir))


BASE_TS = 1_704_067_200_000_000_000


def test_resume_without_duplication_or_loss(spark, paths):
    cfg = validate(CdcConfig(cluster_id="1"))

    # Phase 1: transfer #1 arrives, pipeline runs, stream has exactly n1
    # messages (integration_test.go:181-201).
    _write_events(spark, paths.source_dir, 0, 50, BASE_TS)
    pl.run_until_caught_up(spark, cfg, paths)

    sink1 = spark.read.parquet(paths.sink_dir)
    assert sink1.count() == 50
    cursor1 = pl.read_progress(spark, paths.cursor_dir)
    assert cursor1 == BASE_TS + 49 * 1_000_000

    # Pipeline is STOPPED (integration_test.go:204); transfer #2 created
    # while down (integration_test.go:206-215).
    _write_events(spark, paths.source_dir, 50, 30, BASE_TS + 10**9)

    # Restart from the same checkpoint (integration_test.go:217).
    pl.run_until_caught_up(spark, cfg, paths)

    # Exactly n1+n2 — resume without duplication or loss
    # (integration_test.go:233-240).
    sink2 = spark.read.parquet(paths.sink_dir)
    assert sink2.count() == 80
    assert sink2.select("msg_id").distinct().count() == 80

    # Timestamps strictly increasing across the resume
    # (integration_test.go:227-229).
    cursor2 = pl.read_progress(spark, paths.cursor_dir)
    assert cursor2 == BASE_TS + 10**9 + 29 * 1_000_000
    assert cursor2 > cursor1

    # Message shape: subject + headers (integration_test.go:559-582).
    row = sink2.orderBy("ts").first()
    assert row["subject"].startswith("tigerbeetle.cdc.")
    assert row["msg_id"] == f"1/{row['ts']}"
    assert row["payload"].startswith('{"timestamp":')
    for h in ("event_type", "ledger", "transfer_code",
              "debit_account_code", "credit_account_code"):
        assert row[h] is not None


def test_replayed_input_is_deduplicated(spark, paths):
    """At-least-once upstream delivery: the same source file content
    appearing twice within the dedupe window collapses by msg_id (ST3,
    runner.go:602 + stream dedupe config runner.go:180)."""
    cfg = validate(CdcConfig(cluster_id="1"))
    _write_events(spark, paths.source_dir, 0, 20, BASE_TS)
    _write_events(spark, paths.source_dir, 0, 20, BASE_TS)  # replay
    pl.run_until_caught_up(spark, cfg, paths)
    sink = spark.read.parquet(paths.sink_dir)
    assert sink.select("msg_id").distinct().count() == 20
    assert sink.count() == 20


def test_timestamp_override_skips_old_events(spark, paths):
    """--timestamp-last override wins over stored progress
    (runner.go:392-398)."""
    cfg = validate(CdcConfig(
        cluster_id="1",
        timestamp_last_override=BASE_TS + 24 * 1_000_000,
    ))
    _write_events(spark, paths.source_dir, 0, 50, BASE_TS)
    pl.run_until_caught_up(spark, cfg, paths)
    sink = spark.read.parquet(paths.sink_dir)
    assert sink.count() == 25  # only ts > override
    assert sink.agg(F.min("ts")).first()[0] == BASE_TS + 25 * 1_000_000


def test_single_writer_lock(paths):
    """Second acquire fails while the lease is live; succeeds after release
    (runner.go:607-643)."""
    lock = pl.acquire_lock(paths, owner="runner-a")
    with pytest.raises(RuntimeError, match="lock held by runner-a"):
        pl.acquire_lock(paths, owner="runner-b")
    pl.release_lock(lock)
    lock2 = pl.acquire_lock(paths, owner="runner-b")
    pl.release_lock(lock2)
