"""Physical data layout for the 100 TB event store.

The reference streams into one JetStream subject space; a Spark-native event
store lays the same data out as date-partitioned (and optionally bucketed)
parquet so that:

- cursor scans prune whole partitions (the poll's ``ts > cursor`` predicate
  hits partition values before any file is opened);
- per-ledger analytics prune on the ledger partition column;
- repeated account-keyed joins can use bucketing to co-locate both sides
  and skip the shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

NS_PER_DAY = 86_400_000_000_000


def with_partition_columns(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive the layout columns: event_date (days since epoch — integer
    arithmetic on the ns timestamp, no tz conversions) and ledger."""
    return (
        events.withColumn("event_date",
                          F.floor(F.col(ts_col) / NS_PER_DAY).cast("long"))
        .withColumn("ledger", F.col("user_id") % 10)
    )


def write_event_store(events: DataFrame, path: str, *,
                      mode: str = "overwrite") -> None:
    """Date+ledger partitioned layout. At 100 TB this is the difference
    between scanning ~1/30th of a month and scanning all of it."""
    (with_partition_columns(events)
     .write.mode(mode)
     .partitionBy("event_date", "ledger")
     .parquet(path))


def read_event_store(spark: SparkSession, path: str) -> DataFrame:
    from tigerbeetle_cdc_nats_spark.session import configure

    configure(spark)
    return spark.read.parquet(path)


#: Bits per dimension in the z-order key (20-bit key total).
ZORDER_BITS = 10


def zorder_key(a, b, bits: int = ZORDER_BITS):
    """Morton/z-order interleave of two integer columns (low ``bits`` bits
    each): bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1.

    Sorting a file layout by this key clusters rows so that BOTH dimensions
    have narrow min/max ranges inside every row group — parquet zone-map
    pruning then works for predicates on either column, where a plain sort
    only serves its leading column. Pure integer arithmetic (shift, mask,
    scale, sum), identical on any engine.
    """
    from pyspark.sql import functions as F

    terms = []
    for i in range(bits):
        terms.append((F.shiftright(a, i) % 2) * F.lit(1 << (2 * i)))
        terms.append((F.shiftright(b, i) % 2) * F.lit(1 << (2 * i + 1)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def sql_zorder_key(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    """DuckDB mirror of ``zorder_key`` (same shift/mask/scale arithmetic)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a}) // {1 << i} % 2) * {1 << (2 * i)}")
        terms.append(f"(({b}) // {1 << i} % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
