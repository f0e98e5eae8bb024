"""Streaming sketch maintenance: the portable HLL as a continuously
maintained streaming aggregation.

The CDC pipeline's telemetry question — "how many distinct accounts did we
publish events for, per type, so far?" — is the streaming form of
``hll_user_sketch``. The register table (operators/sketches.hll_registers)
IS a Structured Streaming aggregation:

- **Bounded state by construction**: the group key is (group, bucket) with
  bucket < m=512, so the state store holds at most m rows per group
  forever — no watermark or TTL is needed, unlike value-keyed dedup state
  (streaming/pipeline.py ST3) which must be watermark-bounded.
- **At-least-once safe**: the aggregate is MAX, which is idempotent —
  replaying a micro-batch after a crash (the reference's at-least-once
  contract, runner.go:442-462) cannot change any register, so the sketch
  is exactly correct under at-least-once delivery with no dedup at all.
- **Mergeable across streams**: two register tables (e.g. per-cluster
  pipelines) merge by per-bucket MAX into the global sketch.

Read side: ``sketches.hll_estimate_from_registers`` over any snapshot of
the register state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from tigerbeetle_cdc_nats_spark.operators.sketches import (
    hll_estimate_from_registers,
    hll_registers,
)


def hll_register_stream(events: DataFrame, key: Column,
                        group_cols: list[str]) -> DataFrame:
    """Streaming register maintenance — same expression tree as the batch
    sketch, so online registers are bit-identical to a batch rebuild over
    the same rows. Run with outputMode('update') (or 'complete' for small
    group counts) — registers only ever increase."""
    return hll_registers(events, key, group_cols)


def estimate_snapshot(registers: DataFrame,
                      group_cols: list[str]) -> DataFrame:
    """Distinct-count estimates from a register-state snapshot (batch read
    of wherever the update stream lands)."""
    return hll_estimate_from_registers(registers, group_cols)
