"""Distributed global row numbering (operators.windows.global_row_number):
must equal the naive single-partition Window.orderBy numbering at any
bucket width, and the row-level window in the produced plan must be
partitioned (the unpartitioned prefix-sum window sees only bucket counts).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from tigerbeetle_cdc_nats_spark.operators.windows import (
    global_row_number, with_chunk_id)


def _df(spark, n=5000):
    return (spark.range(n).select(
        (F.hash("id") % 100000).alias("ts"), F.col("id"))
        .dropDuplicates(["ts"]))


def test_matches_naive_global_window(spark):
    df = _df(spark)
    naive = sorted(
        tuple(r) for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("ts")))
        .select("ts", "id", "rn").collect())
    for width in (1, 1000, 10**9):
        got = sorted(
            tuple(r) for r in global_row_number(
                df, ["ts"], F.floor(F.col("ts") / width).cast("long"))
            .select("ts", "id", "rn").collect())
        assert got == naive


def test_rn_is_dense_permutation(spark):
    df = _df(spark, 2000)
    n = df.count()
    rn = global_row_number(df, ["ts"], F.floor(F.col("ts") / 512).cast("long"))
    stats = rn.agg(F.min("rn"), F.max("rn"), F.countDistinct("rn")).first()
    assert tuple(stats) == (1, n, n)


def test_row_level_window_is_partitioned(spark):
    df = _df(spark)
    plan = global_row_number(
        df, ["ts"], F.floor(F.col("ts") / 1000).cast("long"))._jdf \
        .queryExecution().executedPlan().toString()
    # the per-bucket row_number must carry a partition spec on _b
    assert "row_number()" in plan
    assert "partitionBy" not in plan  # physical plans spell it in the spec:
    # row-level Window node lists _b as its partition expression
    assert any("_b" in line and "Window" in line
               for line in plan.splitlines()), plan


def test_chunk_ids_are_contiguous_fixed_size(spark):
    df = _df(spark, 3000)
    out = with_chunk_id(df, chunk_size=256)
    sizes = {r.chunk: r.n for r in
             out.groupBy("chunk").agg(F.count("*").alias("n")).collect()}
    n = df.count()
    full, last = divmod(n, 256)
    for c in range(full):
        assert sizes[c] == 256
    if last:
        assert sizes[full] == last
