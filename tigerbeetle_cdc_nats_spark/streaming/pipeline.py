"""The CDC pipeline as Structured Streaming (SURVEY.md §2.9, §3).

Reference mapping (runner.go:49-170, 425-466):

| reference                                   | here                            |
|---------------------------------------------|---------------------------------|
| poll loop + idle backoff (runner.go:126-169)| micro-batch trigger             |
| cursor recovery (runner.go:388-410)         | checkpointLocation (+ override) |
| chunked publish+checkpoint (425-466)        | foreachBatch, ack-before-commit |
| dedupe window (runner.go:180,602)           | withWatermark + dropDuplicates  |
| single-writer lock (runner.go:607-724)      | one active query per checkpoint |
|                                             | dir (Spark-enforced) + lease    |
|                                             | marker for operator visibility  |
| JetStream publish (484-584)                 | pluggable sink (parquet default;|
|                                             | a NATS writer drops in here)    |

At-least-once becomes effectively-once: the sink write is idempotent per
micro-batch (overwrite-by-batch-id), and the cursor record is committed only
AFTER the sink write succeeds — the reference's ack-before-checkpoint
invariant (runner.go:442-462). A crash between write and commit replays the
batch into the same batch directory.

Scale notes: no global ordering is imposed — the stream is processed
partition-parallel and the cursor is the batch max timestamp (chunk-max
aggregate, runner.go:453-461), which is order-insensitive. State for
dedup is bounded by the watermark (the reference's 2-minute dedupe window).
"""

from __future__ import annotations

import json
import os
import socket
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from tigerbeetle_cdc_nats_spark.config import CdcConfig
from tigerbeetle_cdc_nats_spark.functions.events import msg_id_column, subject_column
from tigerbeetle_cdc_nats_spark.operators.cdc_view import with_cdc_event
from tigerbeetle_cdc_nats_spark.functions.json_codec import encode_cdc_json
from tigerbeetle_cdc_nats_spark.schemas import EVENTS_SCHEMA


@dataclass
class StreamPaths:
    source_dir: str
    sink_dir: str
    checkpoint_dir: str
    cursor_dir: str
    lock_dir: str


def transform_events(stream: DataFrame, cfg: CdcConfig) -> DataFrame:
    """events -> publishable messages: envelope JSON payload, subject,
    deterministic msg id, routing headers (runner.go:586-605) — all Column
    expressions, streaming-safe."""
    enveloped = with_cdc_event(stream)
    e = F.col("event")
    out = enveloped.select(
        "event_id",
        "ts",
        msg_id_column(cfg.cluster_id, "ts").alias("msg_id"),
        subject_column(
            cfg.subject_prefix, e["ledger"], e["type"],
            single_subject=(cfg.single_subject
                            if cfg.subject_mode == "single" else None),
        ).alias("subject"),
        encode_cdc_json("event").alias("payload"),
        e["type"].cast("string").alias("event_type"),
        e["ledger"].cast("string").alias("ledger"),
        e["transfer"]["code"].cast("string").alias("transfer_code"),
        e["debit_account"]["code"].cast("string").alias("debit_account_code"),
        e["credit_account"]["code"].cast("string").alias("credit_account_code"),
    )
    # ST3: bounded-state dedup within the dedupe window. Event time is the
    # ns timestamp; watermark = the reference's 2-minute window.
    out = out.withColumn("event_time", F.timestamp_micros(
        (F.col("ts") / 1000).cast("long")))
    return (
        out.withWatermark("event_time", f"{int(cfg.dedupe_window_s)} seconds")
        .dropDuplicates(["msg_id"])
    )


def read_progress(spark: SparkSession, cursor_dir: str) -> int | None:
    """Stored cursor, or None when no progress record exists
    (runner.go:388-410)."""
    try:
        rows = spark.read.parquet(cursor_dir).agg(
            F.max("timestamp").alias("m")).first()
        return rows["m"]
    except Exception:
        return None


def _write_progress(spark: SparkSession, cursor_dir: str, ts: int,
                    batch_id: int, version: str = "dev") -> None:
    """Progress record {timestamp, version} (runner.go:20-23, 412-423),
    appended per batch; reads take max(timestamp)."""
    spark.createDataFrame(
        [(int(ts), version, int(batch_id))],
        "timestamp long, version string, batch_id long",
    ).coalesce(1).write.mode("append").parquet(cursor_dir)


def acquire_lock(paths: StreamPaths, owner: str, ttl_s: float = 30.0) -> str:
    """Single-writer lease marker (runner.go:607-643). Spark already
    enforces one active query per checkpoint dir; this lease file carries
    the holder metadata the reference exposes in errors (runner.go:25-31)
    and fails fast when a live lock exists."""
    os.makedirs(paths.lock_dir, exist_ok=True)
    lock_path = os.path.join(paths.lock_dir, "lock.json")
    now = time.time()
    if os.path.exists(lock_path):
        with open(lock_path) as f:
            held = json.load(f)
        if now - held["acquired_at"] < ttl_s:
            raise RuntimeError(
                f"lock held by {held['owner']} on {held['hostname']} "
                f"(pid {held['pid']})"
            )
    record = {
        "owner": owner,
        "hostname": socket.gethostname(),
        "pid": os.getpid(),
        "version": "dev",
        "acquired_at": now,
    }
    with open(lock_path, "w") as f:
        json.dump(record, f)
    return lock_path


def release_lock(lock_path: str) -> None:
    try:
        os.remove(lock_path)
    except FileNotFoundError:
        pass


def make_batch_sink(spark: SparkSession, paths: StreamPaths):
    """foreachBatch body: idempotent publish (overwrite-by-batch-id) THEN
    cursor commit — the at-least-once ordering of runner.go:442-462."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            n = batch_df.count()
            if n == 0:
                return
            # "publish": idempotent parquet write (a NATS JetStream writer
            # is a drop-in replacement — same at-least-once contract).
            (batch_df.drop("event_time")
             .write.mode("overwrite")
             .parquet(os.path.join(paths.sink_dir, f"batch_id={batch_id}")))
            # chunk-max checkpoint AFTER successful publish
            # (runner.go:453-461).
            max_ts = batch_df.agg(F.max("ts").alias("m")).first()["m"]
            _write_progress(spark, paths.cursor_dir, max_ts, batch_id)
        finally:
            batch_df.unpersist()

    return sink


def build_query(spark: SparkSession, cfg: CdcConfig, paths: StreamPaths,
                *, trigger_available_now: bool = False,
                trigger_seconds: float | None = None):
    """Assemble the streaming query: file source -> transform -> foreachBatch.

    ``cfg.timestamp_last_override`` mirrors --timestamp-last: when set, rows
    at or below the override are filtered at the source (runner.go:392-398);
    otherwise the checkpoint resumes exactly where it stopped.
    """
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "16")  # batching ~ event-count-max
        .parquet(paths.source_dir)
    )
    if cfg.timestamp_last_override is not None:
        stream = stream.where(F.col("ts") > F.lit(cfg.timestamp_last_override))

    transformed = transform_events(stream, cfg)
    writer = (
        transformed.writeStream
        .foreachBatch(make_batch_sink(spark, paths))
        .option("checkpointLocation", paths.checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        # idle backoff analogue (runner.go:156-164).
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer


def run_until_caught_up(spark: SparkSession, cfg: CdcConfig,
                        paths: StreamPaths, timeout_s: float = 120.0) -> None:
    """One catch-up cycle (Trigger.AvailableNow): process everything
    currently in the source, then stop — the batch-mode analogue of the
    reference's poll-until-empty loop."""
    q = build_query(spark, cfg, paths, trigger_available_now=True).start()
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError("stream did not catch up within timeout")
    if q.exception() is not None:
        raise q.exception()
