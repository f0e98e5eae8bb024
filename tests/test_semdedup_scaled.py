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
