"""Streaming windowed aggregations (SURVEY.md §2.9 ST7/ST8 capabilities).

The reference needs no late-data handling (TigerBeetle timestamps are
globally ordered at the source, integration_test.go:227-229); these
operators provide the capability anyway for out-of-order upstreams:

- ``streaming_rate_windows``: tumbling 1 s counts with a watermark — the
  streaming form of the batch ``rate_window_counts`` (runner.go:750-793).
- ``streaming_sessions``: ``F.session_window`` sessionization — the
  streaming twin of the batch gaps-and-islands query.

State is bounded by the watermark: windows older than (max event time -
delay) are finalized and evicted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _with_event_time(events: DataFrame) -> DataFrame:
    return events.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000"))
    )


def streaming_rate_windows(events: DataFrame, *, window: str = "1 second",
                           watermark: str = "2 minutes") -> DataFrame:
    """Tumbling event-time windows with late-data tolerance."""
    return (
        _with_event_time(events)
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            F.col("n_events"),
        )
    )


def streaming_sessions(events: DataFrame, *, gap: str = "30 minutes",
                       watermark: str = "2 minutes") -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity (the streaming twin of the batch sessionization query)."""
    return (
        _with_event_time(events)
        .withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
            "n_events",
        )
    )
