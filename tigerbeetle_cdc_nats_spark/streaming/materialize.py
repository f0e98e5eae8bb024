"""Streaming changelog materialization: the compacted latest-state view
maintained continuously.

The batch form (operators/changelog.changelog_compaction) collapses an
event log to the newest row per key via ONE max-of-struct aggregation; the
same expression tree runs unchanged as a Structured Streaming aggregation,
giving the consumer-side materialized view of the reference's event stream
(README.md:55-61 leaves state reconstruction to subscribers):

- **State = one struct per live key** — the floor for any upsert view (the
  answer itself is that big). No watermark: keys never expire, matching a
  compacted topic's semantics.
- **At-least-once safe**: max over the (ts, event_id) version vector is
  idempotent, so micro-batch replay after a crash (the reference's
  at-least-once contract, runner.go:442-462) cannot move any key backward
  — the same argument as the HLL registers (streaming/sketch.py), and the
  streaming mirror of the idempotent batch sink (streaming/pipeline.py).
- **Online == offline**: identical Column expressions mean a batch rebuild
  over the full log bit-matches the live view — the dual-write audit every
  CDC materialization needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from tigerbeetle_cdc_nats_spark.operators.changelog import changelog_compaction


def latest_state_stream(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Continuously maintained latest-row-per-key view. Run with
    outputMode('update') (per-trigger changed keys — the upsert feed) or
    'complete' (full snapshot) depending on the sink."""
    return changelog_compaction(events, key=key)
