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
import threading
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
    # ns timestamp (integer division — `/` on ~1.7e18 longs goes through a
    # double and loses ULPs); watermark = the reference's 2-minute window.
    # dropDuplicatesWithinWatermark is the state-BOUNDED form: plain
    # dropDuplicates(['msg_id']) never evicts keys that lack the event-time
    # column in the subset, so its state grows for the stream's lifetime.
    out = out.withColumn("event_time",
                         F.timestamp_micros(F.expr("ts div 1000")))
    out = out.withWatermark("event_time", f"{int(cfg.dedupe_window_s)} seconds")
    if out.isStreaming:
        return out.dropDuplicatesWithinWatermark(["msg_id"])
    # batch replay of the same transform (tests, backfills): plain
    # dropDuplicates is equivalent — a batch job's "state" ends with the job.
    return out.dropDuplicates(["msg_id"])


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


class LockLease:
    """A held single-writer lease with an optional background refresh loop.

    Mirrors the reference's JetStream-KV lease (runner.go:607-724): acquire
    is atomic create-if-absent, refresh is CAS on the stored revision every
    ``refresh_s`` from a background thread, and a failed refresh (revision
    stolen, file gone, I/O error) surfaces through :meth:`check` and the
    ``on_failure`` callback so the owning query can be killed rather than
    silently running unlocked.
    """

    def __init__(self, path: str, owner: str, ttl_s: float):
        self.path = path
        self.owner = owner
        self.ttl_s = ttl_s
        self.revision = 0
        self.nonce = f"{os.getpid()}-{id(self)}-{time.monotonic_ns()}"
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.failure: str | None = None

    def record(self, now: float) -> dict:
        return {
            "owner": self.owner,
            "hostname": socket.gethostname(),
            "pid": os.getpid(),
            "version": "dev",
            "nonce": self.nonce,
            "revision": self.revision,
            "acquired_at": getattr(self, "acquired_at", now),
            "refreshed_at": now,
        }

    def refresh(self) -> None:
        """One CAS refresh: verify the stored record is still OUR revision,
        then bump it (runner.go:666-693's Update(revision) semantics)."""
        try:
            with open(self.path) as f:
                held = json.load(f)
        except (FileNotFoundError, ValueError) as e:
            raise RuntimeError(f"lease record lost: {e}") from e
        if held.get("nonce") != self.nonce or held.get("revision") != self.revision:
            raise RuntimeError(
                f"lease stolen by {held.get('owner')} on "
                f"{held.get('hostname')} (pid {held.get('pid')})"
            )
        self.revision += 1
        _atomic_write_json(self.path, self.record(time.time()))

    def start_refresh(self, refresh_s: float,
                      on_failure=None) -> None:
        """Background refresher (the reference's refresh goroutine,
        runner.go:666-724). A refresh failure records the reason and calls
        ``on_failure(reason)`` — wire that to ``query.stop()``."""

        def loop() -> None:
            while not self._stop.wait(refresh_s):
                try:
                    self.refresh()
                except Exception as e:  # surfaces via check()/on_failure
                    self.failure = str(e)
                    if on_failure is not None:
                        try:
                            on_failure(self.failure)
                        except Exception:
                            pass
                    return

        self._thread = threading.Thread(target=loop, daemon=True,
                                        name="lock-lease-refresh")
        self._thread.start()

    def check(self) -> None:
        """Raise if the background refresher has failed — the main loop's
        view of the reference's refresh-error channel (runner.go:147-151)."""
        if self.failure is not None:
            raise RuntimeError(f"lock lease lost: {self.failure}")

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)


def _atomic_write_json(path: str, record: dict) -> None:
    tmp = f"{path}.tmp.{os.getpid()}.{time.monotonic_ns()}"
    with open(tmp, "w") as f:
        json.dump(record, f)
    os.replace(tmp, path)


def acquire_lock(paths: StreamPaths, owner: str,
                 ttl_s: float = 30.0) -> LockLease:
    """Single-writer lease (runner.go:607-643). Spark already enforces one
    active query per checkpoint dir; this lease carries the holder metadata
    the reference exposes in errors (runner.go:25-31) and fails fast when a
    live lock exists.

    Acquisition is ATOMIC: create-if-absent via O_CREAT|O_EXCL (the
    JetStream ``Create`` analogue) — never read-check-write. Takeover of an
    EXPIRED lease re-verifies after the atomic replace that our nonce won,
    so two racing takeovers cannot both believe they hold it.
    """
    os.makedirs(paths.lock_dir, exist_ok=True)
    lock_path = os.path.join(paths.lock_dir, "lock.json")
    lease = LockLease(lock_path, owner, ttl_s)
    now = time.time()
    lease.acquired_at = now
    try:
        fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            json.dump(lease.record(now), f)
        return lease
    except FileExistsError:
        pass
    try:
        with open(lock_path) as f:
            held = json.load(f)
    except (FileNotFoundError, ValueError):
        held = None  # released or torn mid-race; retry the atomic create
    if held is not None and now - held.get("refreshed_at",
                                           held.get("acquired_at", 0)) < ttl_s:
        # live lease — the reference's "already held" error with holder
        # metadata (runner.go:636-641).
        raise RuntimeError(
            f"lock held by {held['owner']} on {held['hostname']} "
            f"(pid {held['pid']})"
        )
    # expired (or vanished): atomic replace, then verify we won the race.
    _atomic_write_json(lock_path, lease.record(now))
    with open(lock_path) as f:
        winner = json.load(f)
    if winner.get("nonce") != lease.nonce:
        raise RuntimeError(
            f"lock held by {winner.get('owner')} on {winner.get('hostname')} "
            f"(pid {winner.get('pid')})"
        )
    return lease


def release_lock(lease: LockLease | str) -> None:
    if isinstance(lease, str):  # legacy path-only callers
        path = lease
    else:
        lease.stop()
        path = lease.path
    try:
        os.remove(path)
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
                trigger_seconds: float | None = None,
                use_cdc_source: bool = False):
    """Assemble the streaming query: source -> transform -> foreachBatch.

    ``use_cdc_source=True`` reads through the first-class timestamp-cursor
    DataSource (sources/cdc_source.py) — progress recovery then flows
    through real source offsets in the checkpoint log and the per-batch
    event limit is the reference's Limit (runner.go:149). The default file
    source remains for deployments whose event store is append-by-files.

    ``cfg.timestamp_last_override`` mirrors --timestamp-last: when set, rows
    at or below the override are filtered at the source (runner.go:392-398);
    otherwise the checkpoint resumes exactly where it stopped.
    """
    if use_cdc_source:
        from tigerbeetle_cdc_nats_spark.sources.cdc_source import (
            read_cdc_stream,
        )

        stream = read_cdc_stream(
            spark, paths.source_dir,
            start_ts=cfg.timestamp_last_override,
            event_count_max=cfg.event_count_max)
    else:
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "16")  # batching ~ event-count-max
            .parquet(paths.source_dir)
        )
        if cfg.timestamp_last_override is not None:
            stream = stream.where(
                F.col("ts") > F.lit(cfg.timestamp_last_override))

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
                        paths: StreamPaths, timeout_s: float = 120.0,
                        use_cdc_source: bool = False) -> None:
    """One catch-up cycle (Trigger.AvailableNow): process everything
    currently in the source, then stop — the batch-mode analogue of the
    reference's poll-until-empty loop. (With ``use_cdc_source`` the Python
    DataSource runs one rate-limited poll per cycle — Spark's
    AvailableNow falls back to single-batch for v2 Python sources — so a
    full drain is cycles-until-quiescent, exactly the reference loop.)"""
    q = build_query(spark, cfg, paths, trigger_available_now=True,
                    use_cdc_source=use_cdc_source).start()
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError("stream did not catch up within timeout")
    if q.exception() is not None:
        raise q.exception()
