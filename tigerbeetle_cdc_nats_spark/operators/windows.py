"""Windowed / ordered computations (SURVEY.md §2.5).

- Chunk assignment mirrors the reference's fixed-size publish chunks
  (``progress-every-events``, runner.go:437-448): rows -> chunks of N in
  timestamp order.
- Rate windows mirror the fixed 1-second limiter window (runner.go:750-793)
  as a tumbling count — pure integer arithmetic on the ns timestamp, which
  groups/aggregates map-side before the shuffle.
- Sequence rank mirrors the strict publish ordering (runner.go:484-558).

Scale note: ``chunk_assignment``/``chunk_max`` use a GLOBAL row_number (the
reference is a single totally-ordered stream, SURVEY.md §1.1), which is a
single-partition sort at the window stage. That is correct for the semantics
(one global cursor) but intentionally NOT how the streaming path checkpoints
at scale — there, micro-batch = chunk and no global sort exists
(streaming/pipeline.py). Keep global chunking for batch replay/audit only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_CHUNK_SIZE = 4096  # reference fetch size, config.go:40

NS_PER_SECOND = 1_000_000_000


def with_chunk_id(events: DataFrame, chunk_size: int = DEFAULT_CHUNK_SIZE,
                  ts_col: str = "ts") -> DataFrame:
    """Assign each row to a fixed-size chunk in global ts order
    (runner.go:437-448): chunk = floor((row_number-1)/N)."""
    w = Window.orderBy(ts_col)
    return events.withColumn(
        "chunk",
        F.floor((F.row_number().over(w) - 1) / F.lit(chunk_size)).cast("bigint"),
    )


def chunk_max_checkpoint(events: DataFrame,
                         chunk_size: int = DEFAULT_CHUNK_SIZE,
                         ts_col: str = "ts") -> DataFrame:
    """Per-chunk progress record: the max (== last, stream is ordered)
    timestamp plus the chunk's row count (runner.go:453-461)."""
    return (
        with_chunk_id(events, chunk_size, ts_col)
        .groupBy("chunk")
        .agg(
            F.max(ts_col).alias("progress_ts"),
            F.count("*").alias("n_events"),
        )
    )


def rate_window_counts(events: DataFrame, ts_col: str = "ts",
                       window_ns: int = NS_PER_SECOND) -> DataFrame:
    """Tumbling fixed-window event counts (the 1 s limiter window,
    runner.go:750-793). Integer bucket arithmetic -> partial aggregation
    happens map-side; no timestamp-type conversions."""
    bucket = (F.col(ts_col) - F.col(ts_col) % F.lit(window_ns)).alias("window_start")
    return events.groupBy(bucket).agg(F.count("*").alias("n_events"))


def event_sequence_rank(events: DataFrame, part_col: str = "user_id",
                        ts_col: str = "ts") -> DataFrame:
    """Per-partition ordering metadata: sequence number and inter-event gap
    (the strict per-stream ordering the reference preserves,
    runner.go:484-558, integration_test.go:227-229)."""
    w = Window.partitionBy(part_col).orderBy(ts_col)
    return events.select(
        "event_id",
        part_col,
        ts_col,
        F.row_number().over(w).cast("bigint").alias("seq"),
        (F.col(ts_col) - F.lag(ts_col).over(w)).alias("gap_ns"),
    )
