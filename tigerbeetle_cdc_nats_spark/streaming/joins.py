"""Stream-stream joins with watermark-bounded state (SURVEY.md §2.9
capability extension — the reference never joins two live streams, but a
CDC engine feeding enrichment from a second stream needs it).

Both sides carry watermarks and the join has an explicit event-time range
condition, so Spark can evict buffered rows once the watermark passes —
state is bounded by (watermark delay + join window), not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

NS_PER_HOUR = 3_600_000_000_000


def purchases_with_recent_signup(events: DataFrame, *,
                                 window_ns: int = NS_PER_HOUR,
                                 watermark: str = "10 minutes") -> DataFrame:
    """Inner stream-stream join: each purchase paired with signups of the
    same user within the preceding ``window_ns``.

    The range condition (purchase within [signup_time, signup_time+window])
    plus both watermarks lets the state store drop signups older than the
    watermark minus the window.
    """
    with_time = events.withColumn(
        "event_time", F.timestamp_micros(F.expr("ts div 1000")))

    purchases = (
        with_time.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_time").alias("p_time"),
        )
        .withWatermark("p_time", watermark)
    )
    signups = (
        with_time.where(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("s_ts"),
            F.col("event_time").alias("s_time"),
        )
        .withWatermark("s_time", watermark)
    )
    # The range condition MUST be on the watermarked event-time columns:
    # Spark derives state-eviction bounds only from event-time predicates —
    # a condition on the raw long ts alone would leave both state stores
    # unbounded. The exact ns-precision predicate is kept as an extra
    # conjunct (event time is µs-truncated), so results are ns-exact while
    # state stays bounded by watermark + window.
    window_s = window_ns // 1_000_000_000
    joined = purchases.join(
        signups,
        (F.col("p_user") == F.col("s_user"))
        & (F.col("p_time") >= F.col("s_time"))
        & (F.col("p_time") <= F.col("s_time")
           + F.expr(f"INTERVAL {window_s} SECONDS"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.lit(window_ns)),
        "inner",
    )
    return joined.select("purchase_id", "signup_id",
                         F.col("p_user").alias("user_id"),
                         "p_ts", "s_ts")
