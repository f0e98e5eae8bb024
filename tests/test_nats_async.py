"""Async-publish pipelining semantics of the NATS sink adapter
(runner.go:510-584): bounded in-flight window, ORDERED ack awaits, and
duplicate-ack counting (runner.go:542-555; the integration test asserts
header + duplicate behavior at integration_test.go:195-201).

``drain_partition`` is pure Python, so the fake broker lives in-process —
no executor round-trip needed to observe window/order invariants.
"""

from __future__ import annotations

import pytest

from tigerbeetle_cdc_nats_spark.sources.nats_sink import (
    NatsSinkConfig,
    drain_partition,
    make_nats_sink,
)


class FakeBroker:
    """Future-returning fake JetStream: tracks the in-flight window and the
    order acks are awaited; repeated msg ids ack as duplicates."""

    def __init__(self):
        self.seen_ids: set[str] = set()
        self.publish_order: list[str] = []
        self.settle_order: list[str] = []
        self.outstanding = 0
        self.max_outstanding = 0

    def publish(self, subject, msg_id, headers, payload):
        assert headers["Nats-Msg-Id"] == msg_id
        self.publish_order.append(msg_id)
        self.outstanding += 1
        self.max_outstanding = max(self.max_outstanding, self.outstanding)
        dup = msg_id in self.seen_ids
        self.seen_ids.add(msg_id)
        return FakeFuture(self, msg_id, dup)


class FakeFuture:
    def __init__(self, broker: FakeBroker, msg_id: str, dup: bool):
        self.broker = broker
        self.msg_id = msg_id
        self.dup = dup

    def result(self, timeout=None):
        self.broker.outstanding -= 1
        self.broker.settle_order.append(self.msg_id)
        return {"duplicate": self.dup}


def _rows(ids):
    return [
        {
            "subject": f"s.{i}", "msg_id": i, "payload": "x" * 8,
            "event_type": "t", "ledger": "1", "transfer_code": "0",
            "debit_account_code": "0", "credit_account_code": "0",
        }
        for i in ids
    ]


def test_bounded_in_flight_window():
    """At most max_pending publishes are outstanding at any moment."""
    broker = FakeBroker()
    n, d = drain_partition(iter(_rows([f"m{i}" for i in range(100)])),
                           broker.publish, NatsSinkConfig(max_pending=8))
    assert n == 100 and d == 0
    assert broker.max_outstanding <= 8
    assert broker.outstanding == 0  # every ack awaited by the end


def test_acks_awaited_in_publish_order():
    """Acks are processed in publish order (the reference iterates its
    pending slice head-first, runner.go:531-556) — never out of order."""
    broker = FakeBroker()
    ids = [f"m{i}" for i in range(50)]
    drain_partition(iter(_rows(ids)), broker.publish,
                    NatsSinkConfig(max_pending=4))
    assert broker.settle_order == ids == broker.publish_order


def test_duplicate_acks_counted():
    """Replayed msg ids come back as duplicate acks and are counted, not
    republished as new messages (runner.go:542-555)."""
    broker = FakeBroker()
    ids = ["a", "b", "c", "a", "b", "d", "a"]
    n, d = drain_partition(iter(_rows(ids)), broker.publish,
                           NatsSinkConfig(max_pending=2))
    assert n == 7
    assert d == 3  # a(x2 extra) + b(x1 extra)


def test_sync_publish_still_works():
    """A sync PublishFn (returns the ack directly, no future) is valid —
    the window then degrades to sequential publish+ack."""
    acked = []

    def publish(subject, msg_id, headers, payload):
        acked.append(msg_id)
        return None

    n, d = drain_partition(iter(_rows(["x", "y"])), publish,
                           NatsSinkConfig(max_pending=8))
    assert (n, d) == (2, 0) and acked == ["x", "y"]


def test_ack_timeout_propagates():
    """A future that times out must raise (the reference fails the batch on
    ack timeout, runner.go:559-565) — not be silently dropped."""

    class NeverAcks:
        def result(self, timeout=None):
            raise TimeoutError("no ack")

    def publish(subject, msg_id, headers, payload):
        return NeverAcks()

    with pytest.raises(TimeoutError):
        drain_partition(iter(_rows(["x"])), publish,
                        NatsSinkConfig(max_pending=8, ack_timeout_s=0.01))


def test_spark_sink_accumulates_counts(spark):
    """End-to-end through foreachPartition: per-partition counts aggregate
    into the sink's Spark accumulators."""
    import os

    from tigerbeetle_cdc_nats_spark.config import CdcConfig, validate
    from tigerbeetle_cdc_nats_spark.schemas import EVENTS_SCHEMA
    from tigerbeetle_cdc_nats_spark.streaming.pipeline import transform_events

    cfg = validate(CdcConfig(cluster_id="7"))
    batch = transform_events(
        spark.read.schema(EVENTS_SCHEMA)
        .parquet("/root/testdata/sf0.001/events.parquet"), cfg
    ).drop("event_time").limit(20)

    # executor-side sync publisher; all acks fresh (msg ids are unique)
    def publish(subject, msg_id, headers, payload):
        return {"duplicate": False}

    sink = make_nats_sink(NatsSinkConfig(max_pending=8), publish=publish)
    sink(batch, batch_id=0)
    assert sink.published.value == 20
    assert sink.duplicates.value == 0


def test_native_publish_writer_end_to_end(spark, tmp_path):
    """The tb_cdc_publish DataSourceStreamWriter drains a transformed
    event stream through the bounded pipelining core and records
    per-batch publish/duplicate counts via the driver-side commit."""
    import json
    import os

    from pyspark.sql import functions as F

    from tigerbeetle_cdc_nats_spark.sources.nats_sink import (
        make_publish_datasource,
    )

    src = str(tmp_path / "src")
    metrics = str(tmp_path / "metrics")
    chk = str(tmp_path / "chk")
    n = 120
    (spark.range(n).select(
        F.concat(F.lit("tigerbeetle.cdc.t"), F.col("id")).alias("subject"),
        F.concat(F.lit("m"), (F.col("id") % 100)).alias("msg_id"),
        F.lit('{"p":1}').alias("payload"),
        F.lit("transfer").alias("event_type"),
        F.lit("1").alias("ledger"),
        F.lit("1").alias("transfer_code"),
        F.lit("10").alias("debit_account_code"),
        F.lit("20").alias("credit_account_code"))
     .coalesce(1).write.parquet(src))

    spark.dataSource.register(make_publish_datasource())
    q = (spark.readStream.schema(
            "subject string, msg_id string, payload string, "
            "event_type string, ledger string, transfer_code string, "
            "debit_account_code string, credit_account_code string")
         .parquet(src).coalesce(1)
         .writeStream.format("tb_cdc_publish")
         .option("publisherFactory",
                 "tigerbeetle_cdc_nats_spark.sources.nats_sink:"
                 "fake_publisher_factory")
         .option("metricsDir", metrics)
         .option("maxPending", "8")
         .option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    recs = [json.load(open(os.path.join(metrics, f)))
            for f in sorted(os.listdir(metrics)) if f.endswith(".json")]
    assert sum(r["published"] for r in recs) == n
    # 120 rows share 100 msg_ids within one partition -> 20 duplicates
    # flagged by the fake JetStream msg-id dedup
    assert sum(r["duplicates"] for r in recs) == 20


def test_publish_writer_requires_factory():
    import pytest

    from tigerbeetle_cdc_nats_spark.sources.nats_sink import (
        NatsPublishWriter,
    )

    with pytest.raises(ValueError, match="publisherFactory"):
        NatsPublishWriter({})
