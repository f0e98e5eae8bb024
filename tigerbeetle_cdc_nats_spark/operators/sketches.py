"""Count-min sketch: a mergeable frequency sketch as a first-class
DataFrame operator.

The CMS is a d x w counter matrix; item x increments cell (i, h_i(x) mod w)
for each of d hash rows; the frequency estimate is the min over rows. All
integer arithmetic over the shared md5-derived hash (operators/dedup.hash60),
so the sketch is bit-identical on any engine and ORACLE-CHECKABLE — unlike
HLL/KLL whose internals differ per implementation.

Scale: building is one groupBy over (row, col) — map-side combinable; two
sketches merge by cell-wise addition (the property that makes CMS work for
distributed/streaming counting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from tigerbeetle_cdc_nats_spark.operators.dedup import MINHASH_P, hash60, sql_hash60

CMS_DEPTH = 4
CMS_WIDTH = 64

#: Per-row universal-hash params (same family as MinHash permutations).
CMS_A = tuple((3 * i + 7) * 2654435761 % MINHASH_P for i in range(CMS_DEPTH))
CMS_B = tuple((i * 1013904223 + 5) % MINHASH_P for i in range(CMS_DEPTH))


def cms_cell(key: Column, row: int, width: int = CMS_WIDTH) -> Column:
    h = hash60(key) % MINHASH_P
    return ((F.lit(CMS_A[row]) * h + F.lit(CMS_B[row])) % MINHASH_P) % width


def sql_cms_cell(expr: str, row: int, width: int = CMS_WIDTH) -> str:
    h = f"({sql_hash60(expr)} % {MINHASH_P})"
    return f"((({CMS_A[row]} * {h} + {CMS_B[row]}) % {MINHASH_P}) % {width})"


def _cell_from_base(h: Column, row: int, width: int) -> Column:
    """Cell column for hash row ``row`` given the depth-invariant base hash
    (hash60 % P) — lets callers hash each key ONCE and vary only the
    integer (a, b) mix per depth row."""
    return ((F.lit(CMS_A[row]) * h + F.lit(CMS_B[row])) % MINHASH_P) % width


def count_min_sketch(df: DataFrame, key: Column, *, depth: int = CMS_DEPTH,
                     width: int = CMS_WIDTH) -> DataFrame:
    """Build the sketch: one output row per non-empty (row, col) cell with
    its count. Exploding d rows per input row keeps it one groupBy; the
    md5-derived base hash is computed BEFORE the explode (it does not vary
    by depth row), so hash work is 1x, not depth-x, per input row."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("cms_row")
    keyed = (df.select(key.alias("_k"))
             .select((hash60(F.col("_k")) % MINHASH_P).alias("_h"))
             .select("_h", rows))
    # CASE over cms_row (hash params differ per row)
    expr = F.when(F.col("cms_row") == 0, _cell_from_base(F.col("_h"), 0, width))
    for i in range(1, depth):
        expr = expr.when(F.col("cms_row") == i,
                         _cell_from_base(F.col("_h"), i, width))
    return (
        keyed.withColumn("cms_col", expr.cast("long"))
        .groupBy("cms_row", "cms_col")
        .agg(F.count("*").alias("n"))
    )


def cms_estimate(sketch: DataFrame, keys: DataFrame, key: Column,
                 *, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Point-query the sketch for each key: min over rows of the cell count
    (missing cell -> 0, though CMS never underestimates present keys)."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("cms_row")
    expr = F.when(F.col("cms_row") == 0, _cell_from_base(F.col("_h"), 0, width))
    for i in range(1, depth):
        expr = expr.when(F.col("cms_row") == i,
                         _cell_from_base(F.col("_h"), i, width))
    probes = (keys.select(key.alias("_k"))
              .select("_k", (hash60(F.col("_k")) % MINHASH_P).alias("_h"))
              .select("_k", "_h", rows)
              .withColumn("cms_col", expr.cast("long")))
    joined = probes.join(sketch, on=["cms_row", "cms_col"], how="left")
    return (
        joined.groupBy("_k")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_count"))
        .withColumnRenamed("_k", "key")
    )
