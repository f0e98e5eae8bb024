"""semdedup_scaled (corpus-scaled sub-bucketed SemDeDup) properties.

Sub-bucketing can only REMOVE candidate pairs relative to the registered
whole-cell semdedup, so its drop set must be a subset; and every reported
pair must genuinely clear the cosine threshold (soundness is exact — only
recall is approximate).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.operators import similarity as sim
from tigerbeetle_cdc_nats_spark.queries_similarity import (
    centroid_vectors, ivf_assign)
from tigerbeetle_cdc_nats_spark.registry import all_queries
from tigerbeetle_cdc_nats_spark.session import load_table


def _scaled(spark, sf_dir, **kw):
    emb = load_table(spark, sf_dir, "embeddings")
    dim = sim.embedding_dim(sf_dir)
    n = emb.count()
    assigned = ivf_assign(emb, centroid_vectors(emb), dim=dim)
    return sim.semdedup_scaled(assigned, n, dim=dim, **kw)


def test_scaled_drops_subset_of_registered(spark, sf_dir):
    registered = all_queries()["semdedup"].fn(spark, sf_dir)
    scaled = _scaled(spark, sf_dir)
    extra = (scaled.select("drop_id")
             .exceptAll(registered.select("drop_id")).count())
    assert extra == 0, "sub-bucketing must never invent drops"


def test_scaled_pairs_clear_threshold(spark, sf_dir):
    bad = _scaled(spark, sf_dir).where(F.col("max_sim_e6") < 400000).count()
    assert bad == 0


def test_zero_planes_recovers_registered(spark, sf_dir):
    # With zero sub-bucket planes the composite cell equals the IVF cell,
    # so the operator must EQUAL the registered whole-cell query.
    registered = all_queries()["semdedup"].fn(spark, sf_dir)
    scaled = _scaled(spark, sf_dir, n_planes=0)
    sym_diff = (scaled.exceptAll(registered).count()
                + registered.exceptAll(scaled).count())
    assert sym_diff == 0


def test_registered_semdedup_widens_past_bound(spark, tmp_path):
    """Past SEMDEDUP_WIDEN_N vectors the REGISTERED query must switch to
    composite (cell, sub_bucket) cells (round-8 reroute): results stay
    SOUND (every reported pair clears the threshold), a SUBSET of the
    whole-cell form (sub-bucketing never invents drops), and planted
    near-identical pairs are still caught (recall)."""
    import os

    from tigerbeetle_cdc_nats_spark.queries_similarity import (
        SEMDEDUP_WIDEN_N)

    n = SEMDEDUP_WIDEN_N + 2048
    out = str(tmp_path / "corpus")
    os.makedirs(out, exist_ok=True)
    # soak-style corpus: every 50th vector is a near-identical copy of
    # its predecessor (first component nudged; cosine ~0.9998)
    emb = (
        spark.range(n).withColumnRenamed("id", "vec_id")
        .withColumn("src_id", F.when(
            (F.col("vec_id") % 50 == 0) & (F.col("vec_id") > 0),
            F.col("vec_id") - 1).otherwise(F.col("vec_id")))
        .select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda d: ((F.pmod(F.hash(F.col("src_id") * 67 + d),
                                   F.lit(2001)) - 1000) / 1000.0
                           + F.when((d == 1)
                                    & (F.col("src_id") != F.col("vec_id")),
                                    F.lit(0.01)).otherwise(F.lit(0.0)))
                .cast("float"))
            .alias("embedding"),
            F.pmod(F.hash("src_id"), F.lit(10)).cast("bigint")
            .alias("label")))
    emb.repartition(8).write.parquet(os.path.join(out, "embeddings.parquet"))

    # the widen branch must actually engage at this size
    assert sim.planes_for_corpus(n // 10, target_bucket=64) > 0

    registered = all_queries()["semdedup"].fn(spark, out)
    rows = registered.collect()
    assert rows, "widened semdedup returned nothing"
    assert all(r["max_sim_e6"] >= 400000 for r in rows)  # soundness

    whole_cell = _scaled(spark, out, n_planes=0)
    extra = (registered.select("drop_id")
             .exceptAll(whole_cell.select("drop_id")).count())
    assert extra == 0, "widening must never invent drops"

    # planted recall: copies are vec_id % 50 == 0; near-identical to
    # their predecessor, same label -> same cell
    planted = {r["drop_id"] for r in rows if r["drop_id"] % 50 == 0}
    n_planted = (n - 1) // 50
    assert len(planted) >= 0.9 * n_planted
