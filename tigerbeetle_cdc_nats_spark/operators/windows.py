"""Windowed / ordered computations (SURVEY.md §2.5).

- Chunk assignment mirrors the reference's fixed-size publish chunks
  (``progress-every-events``, runner.go:437-448): rows -> chunks of N in
  timestamp order.
- Rate windows mirror the fixed 1-second limiter window (runner.go:750-793)
  as a tumbling count — pure integer arithmetic on the ns timestamp, which
  groups/aggregates map-side before the shuffle.
- Sequence rank mirrors the strict publish ordering (runner.go:484-558).

Scale note: the reference's chunking is a GLOBAL row numbering (one totally
ordered stream, SURVEY.md §1.1). A naive ``Window.orderBy(ts)`` computes it
with a single-partition sort of the whole table — correct, and fine on one
node, but the one plan shape that cannot scale out. ``global_row_number``
computes the identical numbering distributed: coarse range bucket on the
leading order key -> per-bucket counts -> prefix-sum of offsets over the
(tiny) bucket-id table -> within-bucket row_number + offset. The only
unpartitioned window left runs over bucket COUNTS, not rows. The streaming
path still checkpoints per micro-batch with no global sort at all
(streaming/pipeline.py); global chunking is for batch replay/audit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

DEFAULT_CHUNK_SIZE = 4096  # reference fetch size, config.go:40

NS_PER_SECOND = 1_000_000_000

#: Range-bucket width for the distributed ts-ordered row numbering: 1000 s
#: of ns-timestamps per bucket. Any width is CORRECT (the numbering is
#: width-independent); width only tunes bucket count vs rows per bucket.
TS_BUCKET_NS = 1_000_000_000_000


def global_row_number(df: DataFrame, order_by: list[str],
                      bucket: Column, out_col: str = "rn") -> DataFrame:
    """Global ``row_number() over (order by order_by)`` without a global
    single-task sort.

    ``bucket`` must be monotone non-decreasing in the order-by key (a range
    bucket of its leading column — ties of the full key must never straddle
    buckets). Pattern: per-bucket counts; exclusive prefix sum over the
    bucket-id table (a window over #buckets rows, not #rows — the only
    remaining single-partition step); broadcast the offsets back;
    row_number within each bucket plus its bucket's offset. Output is
    identical to the naive global window at any bucket width; at scale the
    sort becomes per-bucket and fully parallel.
    """
    b = df.withColumn("_b", bucket)
    offs = (
        b.groupBy("_b").agg(F.count("*").alias("_c"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_c").over(
                    Window.orderBy("_b")
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0)))
        .select("_b", "_off")
    )
    w_in = Window.partitionBy("_b").orderBy(*order_by)
    return (
        b.join(F.broadcast(offs), "_b")
        .withColumn(out_col,
                    (F.row_number().over(w_in) + F.col("_off")).cast("long"))
        .drop("_b", "_off")
    )


def with_chunk_id(events: DataFrame, chunk_size: int = DEFAULT_CHUNK_SIZE,
                  ts_col: str = "ts") -> DataFrame:
    """Assign each row to a fixed-size chunk in global ts order
    (runner.go:437-448): chunk = floor((row_number-1)/N), with the global
    numbering computed distributed (see module docstring)."""
    numbered = global_row_number(
        events, [ts_col],
        F.floor(F.col(ts_col) / TS_BUCKET_NS).cast("long"), out_col="_grn")
    return (
        numbered.withColumn(
            "chunk",
            F.floor((F.col("_grn") - 1) / F.lit(chunk_size)).cast("bigint"))
        .drop("_grn")
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
