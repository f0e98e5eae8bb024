"""Executor-side JetStream publisher factory for real-broker deployments.

The ``tb_cdc_publish`` stream writer (sources/nats_sink.py) takes a
``publisherFactory`` option naming a ``module:callable`` that builds the
publish function ON THE EXECUTOR (a broker connection is not picklable).
This module is that factory for a real NATS JetStream broker via
``nats-py`` — the thinnest possible adapter over the transport the
reference wires in runner.go:58-82 (connect + JetStream context) and
publishes through in runner.go:484-584.

Import-guarded: the sandbox has no ``nats-py``; the env-gated integration
test (tests/test_nats_integration.py, ``TB_CDC_INTEGRATION=1`` — the
reference's integration gate, integration_test.go:42-44) exercises it
against a local ``nats-server -js`` when one is present.
"""

from __future__ import annotations

import os


def jetstream_publisher_factory():
    """Build a synchronous PublishFn over one JetStream connection.

    Each Spark python worker gets its own connection + event loop (the
    factory runs once per write task). The returned ack is nats-py's
    ``PubAck`` whose ``duplicate`` attribute feeds the duplicate counting
    of drain_partition (runner.go:542-555). ``Nats-Msg-Id`` rides in the
    headers, so JetStream's dedupe window suppresses replays exactly like
    the reference (runner.go:596-605).

    Connection URL from ``NATS_URL`` (default ``nats://127.0.0.1:4222``);
    publish timeout from ``NATS_PUBLISH_TIMEOUT_S`` (default 30 — the
    reference's --publish-ack-timeout, config.go:46).
    """
    import asyncio

    import nats  # raises ImportError without nats-py — documented gate

    url = os.environ.get("NATS_URL", "nats://127.0.0.1:4222")
    timeout_s = float(os.environ.get("NATS_PUBLISH_TIMEOUT_S", "30"))
    loop = asyncio.new_event_loop()
    nc = loop.run_until_complete(nats.connect(url))
    js = nc.jetstream()

    def publish(subject: str, msg_id: str, headers: dict, payload: bytes):
        hdrs = {k: str(v) for k, v in headers.items()}
        hdrs["Nats-Msg-Id"] = msg_id
        return loop.run_until_complete(
            js.publish(subject, payload, timeout=timeout_s, headers=hdrs))

    return publish
