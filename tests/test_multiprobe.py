"""Multi-probe LSH ANN properties: probing a superset of buckets can only
improve on single-bucket ANN — more (or equal) results per query, and a
best-hit at least as similar."""

from __future__ import annotations

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.registry import all_queries


def _per_query(df):
    return {
        r.q_id: (r.n, r.best) for r in
        df.groupBy("q_id").agg(F.count("*").alias("n"),
                               F.max("sim_e6").alias("best")).collect()
    }


def test_multiprobe_dominates_single_bucket(spark, sf_dir):
    q = all_queries()
    single = _per_query(q["ann_lsh_cosine"].fn(spark, sf_dir))
    multi = _per_query(q["ann_multiprobe_cosine"].fn(spark, sf_dir))
    assert set(single) <= set(multi)
    for q_id, (n, best) in single.items():
        mn, mbest = multi[q_id]
        assert mn >= n
        assert mbest >= best


def test_indexed_multiprobe_equals_in_session(spark):
    """ann_multiprobe_indexed must return row-identical results to
    ann_multiprobe_cosine — same probe set, candidates served from the
    stored bucket partitions via DPP."""
    from tigerbeetle_cdc_nats_spark.registry import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    fresh = sorted(map(tuple,
                       qs["ann_multiprobe_cosine"].fn(spark, sf).collect()))
    stored = sorted(map(tuple,
                        qs["ann_multiprobe_indexed"].fn(spark, sf).collect()))
    assert stored == fresh
