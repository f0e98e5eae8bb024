#!/usr/bin/env python
"""Scale soak: do the quadratic-risk operators actually scale linearly?

Generates deterministic synthetic corpora (documents + embeddings, same
schema as the driver's testdata) at several multiples of the sf0.1 size,
runs the dedup / similarity / corpus operators at each size, and prints a
JSON report with per-op times and the fitted scaling exponent
``alpha = log(t_big / t_small) / log(n_big / n_small)`` between the largest
two sizes. alpha ~ 1 is linear; alpha >= ~1.6 flags a quadratic term.

Corpus construction (all Spark-side expressions — no driver loops, so the
generator itself scales):
- ~50 hash-derived words per doc from a 40-word vocab (mimics the testdata
  text statistics that drive shingle/LSH collision rates);
- every 50th doc is a planted near-dup of its predecessor (one-word edit),
  keeping the duplicate RATE constant as the corpus grows — replicating the
  corpus verbatim would instead grow duplicate CLUSTERS with size, which
  makes candidate volume quadratic by construction and would say nothing
  about the operators;
- embeddings: dim-64 hash-derived uniforms, 10 labels, like the testdata.

Usage: python scripts/scale_soak.py [mult ...]   (default: 1 4 16)
Writes corpora under /tmp/scale/x<mult>/ and reuses them when present.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark import registry
from tigerbeetle_cdc_nats_spark.session import get_spark

BASE_DOCS = 5_000     # sf0.1 documents rows
BASE_EMB = 2_000      # sf0.1 embeddings rows
VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "line", "sort", "window", "query",
    "big", "small", "stream", "group", "column", "join", "filter", "order",
    "data", "customer", "vector", "the", "a", "cache", "stage", "plan",
    "shard", "probe", "build", "spill", "codec", "page", "block",
]

#: Doc/embedding-only registered queries exercised per size, cheapest first.
DOC_OPS = [
    "exact_dedup", "normalized_dedup", "doc_fingerprint", "token_count",
    "winnowing_fingerprint", "chunk_dedup", "simhash_dedup",
    "decontamination", "minhash_dedup", "ngram_jaccard_dedup",
    "prefix_jaccard_join", "tfidf_top_terms", "winnow_candidates",
    # round 4: containment over LSH candidates, regex hygiene scans,
    # the BPE iteration and association stats (pair-explode family),
    # per-stratum bottom-k sampling.
    "minhash_containment", "pii_scan", "blocklist_filter",
    "bpe_apply_merge", "token_lift_pairs", "bottomk_sample",
    # round 5: stored-index serving + probes, split hygiene.
    "minhash_dedup_indexed", "minhash_probe_indexed",
    "winnow_candidates_indexed", "split_leakage_audit",
    "source_frequency_cap",
    "training_shuffle_order", "quality_rank_normalized",
    "crosslingual_near_dup", "rag_retrieve_diverse",
    # round 6: the dedup diagnostics now served from the stored MinHash
    # index (cold cost excludes signature construction) + the
    # degree-ordered triangle census.
    "dup_method_agreement", "dup_pagerank", "dup_triangles",
    "minhash_estimator_audit", "novelty_score",
    "local_clustering", "dedup_threshold_sweep", "minhash_band_stats",
    "vocab_coverage", "winnow_probe_indexed", "dup_cluster_stats",
    "dup_pair_sample",
    # round 6 continuation: per-source dup marginals (index-served),
    # shared-phrase census (gram-keyed shuffle), banded edit distance.
    "dedup_rate_by_source", "boilerplate_ngrams", "edit_distance_dedup",
    # round 7: intra-doc n-gram repetition census (gram explode + two
    # doc-keyed aggregations).
    "doc_repetition_stats",
    "curated_corpus_pipeline", "multi_epoch_shuffle",
    "media_feature_vectors", "quality_weighted_sample", "blocklist_kwic",
    "source_token_divergence",
    # round 11: the |docs|-sized text verdict + the composed corpus
    # verdict (exact + minhash + embedding by stage precedence) and its
    # attribution rollup; training_data_pipeline (above) now consumes
    # the composed verdict, so its time tracks these.
    "text_dedup_verdict", "corpus_dedup_verdict", "corpus_verdict_stats",
    "delta_dedup_verdict",
]
EMB_OPS = [
    "knn_bruteforce_cosine", "ann_lsh_cosine", "embedding_near_dup",
    "ivf_ann_cosine", "semdedup", "kmeans_refine", "label_centroids",
    "ann_multiprobe_cosine", "embedding_near_dup_multitable",
    # round 4: PQ encode+ADC (zero-shuffle map + broadcast LUT scan),
    # bounded-candidate MMR, different-label top-k mining.
    "pq_ann_adc", "mmr_rerank", "hard_negative_mining", "ivfpq_ann",
    "ann_recall_audit", "centroid_drift_audit",
    "ann_bucket_stats", "embedding_norm_outliers",
    # round 6 continuation: nprobe operating curve (candidate volume is
    # the quantity under test — alpha tracks probed-list population),
    # per-cell prototypicality pruning (one cell-keyed window sort),
    # stored cell-partitioned IVF serving (DPP probe).
    "ivf_probe_recall", "prototype_pruning", "ivf_ann_indexed",
    # round 7: the REGISTERED adaptive-geometry near-dups (clamp floor =
    # the pinned geometry, widening past 16k vectors) — the in-registry
    # answers to the pinned forms' SKIP_AT_64 entries. These supersede
    # the soak-local near_dup_adaptive/near_dup_multitable builders
    # earlier rounds measured (identical computation past the floor).
    "embedding_near_dup_adaptive",
    "embedding_near_dup_multitable_adaptive",
    # round-7 continuation: per-cell quota sampling (one cell-keyed
    # window sort over the shared Arrow IVF assignment).
    "cluster_balanced_sample",
    # round 9: WARM stored-index near-dup serving (geometry-keyed flat
    # index + skew sidecar); its first timed call builds the index, so
    # the min-over-repeats is the warm serving cost.
    "embedding_near_dup_indexed",
    # round 10: the |docs|-sized dedup verdict + its one-row rollup
    # (early-exit hot-bucket scan; wall decoupled from pair volume).
    "embedding_dedup_verdict", "dedup_verdict_stats",
    # round 11: the per-ingest-batch delta verdict (bucket-pruned probe).
    "embedding_delta_verdict",
]
#: events-table window/aggregation family (time-series scale risks:
#: per-user window sorts, global percentile sorts, self-join rollups).
EVENT_OPS = [
    "sessionization", "rate_window_counts", "sliding_window_counts",
    "event_transition_matrix", "running_balance", "multires_rollup",
    "value_percentiles", "duplicate_count", "event_sequence_rank",
    "rate_anomaly", "equidepth_histogram", "time_weighted_value",
    # round 4: delete-aware IVM family (joins the generated customer dim),
    # point-in-time SCD2 join, JSON payload profiling.
    "ivm_join_view", "ivm_delta_rows", "ivm_topk_view",
    "segment_migration_matrix",
    "scd2_point_in_time_join", "props_json_stats",
    # round 5: dense-grid gap filling (grid grows with wall time, not
    # event volume — alpha should be ~0 past the rollup scan), bounded-
    # frame rolling median / dyadic EWMA (one user_id window sort each).
    "gap_fill_locf", "gap_fill_interpolate",
    "rolling_median_value", "ewma_value",
    "cdc_backlog_stats",
]
BASE_EVENTS = 100_000  # sf0.1 events rows

#: Round 8 routed the unsuffixed ``embedding_near_dup`` /
#: ``embedding_near_dup_multitable`` / ``semdedup`` to their scale-safe
#: adaptive geometries, so no registered query is pinned-quadratic any
#: more and nothing needs skipping at x64 (the old pinned forms' blowups
#: — semdedup >600 s killed, embedding_near_dup 347 s/156 s — stay
#: recorded in SCALE.md history as the motivation). SOAK_SKIP_AT_64
#: (comma list) remains as an escape hatch for one-off runs.
SKIP_AT_64 = set(filter(None,
                        os.environ.get("SOAK_SKIP_AT_64", "").split(",")))


def gen_corpus(spark, out_dir: str, mult: int) -> None:
    n_docs, n_emb = BASE_DOCS * mult, BASE_EMB * mult
    docs_path = os.path.join(out_dir, "documents.parquet")
    emb_path = os.path.join(out_dir, "embeddings.parquet")
    ev_path = os.path.join(out_dir, "events.parquet")
    cust_path = os.path.join(out_dir, "customer.parquet")
    if all(os.path.exists(p)
           for p in (docs_path, emb_path, ev_path, cust_path)):
        return
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    base = (
        spark.range(n_docs).withColumnRenamed("id", "doc_id")
        # planted near-dup: every 50th doc re-derives its predecessor's words
        .withColumn("src_id", F.when(
            (F.col("doc_id") % 50 == 0) & (F.col("doc_id") > 0),
            F.col("doc_id") - 1).otherwise(F.col("doc_id")))
        .withColumn("n_words", F.pmod(F.hash("src_id"), F.lit(21)) + 40)
    )
    words = F.transform(
        F.sequence(F.lit(1), F.col("n_words")),
        lambda j: F.element_at(
            vocab, (F.pmod(F.hash(F.col("src_id") * 131 + j), F.lit(40))
                    + 1).cast("int")))
    docs = (
        base.withColumn("words", words)
        .withColumn("text", F.when(
            F.col("doc_id") == F.col("src_id"),
            F.array_join("words", " "))
            .otherwise(F.concat(F.array_join("words", " "), F.lit(" edit"))))
        .select(
            "doc_id", "text",
            F.lit("en").alias("lang"),
            F.concat(F.lit("src"),
                     F.pmod(F.hash("doc_id"), F.lit(20))).alias("source"),
            F.length("text").cast("long").alias("n_chars"))
    )
    docs.repartition(32).write.mode("overwrite").parquet(docs_path)
    # every 50th vector is a planted near-identical copy of its
    # predecessor (first component nudged by 0.01 -> cosine ~ 0.9998):
    # near-dup ops are scored on RECALL of these planted pairs.
    emb = (
        spark.range(n_emb).withColumnRenamed("id", "vec_id")
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
            F.pmod(F.hash("src_id"), F.lit(10)).cast("bigint").alias("label"))
    )
    emb.repartition(8).write.mode("overwrite").parquet(emb_path)
    # events: ~10 ev/s stream, 2k users per 100k events (constant rate per
    # user), one deliberately HOT user owning ~1% of all events so window
    # partitionBy skew is exercised, 5 event types, ts as TIMESTAMP(MICROS)
    # (the current testdata physical type).
    n_events = BASE_EVENTS * mult
    n_users = max(n_events // 50, 1)
    ev = (
        spark.range(n_events).withColumnRenamed("id", "event_id")
        .select(
            "event_id",
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000)
                + F.col("event_id") * 100_000
                + F.pmod(F.hash(F.col("event_id")), F.lit(90_000)))
            .alias("ts"),
            F.when(F.pmod(F.hash(F.col("event_id") + 7), 100) == 0, 0)
            .otherwise(F.pmod(F.hash(F.col("event_id") + 13),
                              F.lit(n_users))).cast("long").alias("user_id"),
            F.element_at(
                F.array(F.lit("click"), F.lit("view"), F.lit("purchase"),
                        F.lit("signup"), F.lit("error")),
                (F.pmod(F.hash(F.col("event_id") + 3), 5) + 1).cast("int"))
            .alias("event_type"),
            (F.pmod(F.hash(F.col("event_id") + 31), 10_000) / 100.0)
            .alias("value"),
            F.concat(F.lit('{"k": '),
                     F.pmod(F.hash(F.col("event_id") + 17), 100),
                     F.lit('}')).alias("props"))
    )
    ev.repartition(32).write.mode("overwrite").parquet(ev_path)
    # customer dim covering the user_id space (the IVM family joins it):
    # same shape as the TPC-H testdata (c_custkey superset of user ids,
    # 5 market segments).
    segs = F.array(F.lit("AUTOMOBILE"), F.lit("BUILDING"),
                   F.lit("FURNITURE"), F.lit("HOUSEHOLD"),
                   F.lit("MACHINERY"))
    cust = (spark.range(n_users * 10)
            .select(F.col("id").alias("c_custkey"),
                    F.concat(F.lit("Customer#"), F.col("id"))
                    .alias("c_name"),
                    F.pmod(F.hash("id"), 25).cast("int").alias("c_nationkey"),
                    (F.pmod(F.hash(F.col("id") + 5), 100000) / 100.0)
                    .alias("c_acctbal"),
                    F.element_at(
                        segs, (F.pmod(F.hash(F.col("id") + 9), 5) + 1)
                        .cast("int")).alias("c_mktsegment")))
    cust.repartition(8).write.mode("overwrite").parquet(cust_path)


def planted_recall(pairs, n_emb: int, a_col: str, b_col: str) -> float:
    """Fraction of planted (i-1, i) near-identical pairs present in the
    op's output (either id order)."""
    lo, hi = F.least(F.col(a_col), F.col(b_col)), F.greatest(
        F.col(a_col), F.col(b_col))
    found = (pairs.select(lo.alias("lo"), hi.alias("hi"))
             .where((F.col("hi") % 50 == 0) & (F.col("lo") == F.col("hi") - 1))
             .distinct().count())
    planted = (n_emb - 1) // 50
    return round(found / planted, 4) if planted else 1.0


def planted_drop_recall(drops, n_emb: int, drop_col: str) -> float:
    """For semdedup-shaped output (drop_id rows): fraction of planted
    near-dup ids marked as drops (keep_id may legitimately be a closer
    smaller-id partner, so only the drop side is scored)."""
    found = (drops.where((F.col(drop_col) % 50 == 0) & (F.col(drop_col) > 0))
             .select(drop_col).distinct().count())
    planted = (n_emb - 1) // 50
    return round(found / planted, 4) if planted else 1.0


def semdedup_scaled_build(spark, sf_dir: str, n_emb: int):
    """Registered semdedup's ivf_assign front half + the corpus-scaled
    sub-bucketed pair scan from operators.similarity.semdedup_scaled."""
    from tigerbeetle_cdc_nats_spark.operators import similarity as sim
    from tigerbeetle_cdc_nats_spark.queries_similarity import (
        centroid_vectors, ivf_assign)
    from tigerbeetle_cdc_nats_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dim = sim.embedding_dim(sf_dir)
    assigned = ivf_assign(emb, centroid_vectors(emb), dim=dim)
    return sim.semdedup_scaled(assigned, n_emb, dim=dim)


def gen_clustered_embeddings(spark, out_dir: str, mult: int,
                             k: int = 16, hot_frac: float = 0.05) -> None:
    """Clustered embedding corpus: 16 hash-derived centers + small noise,
    with 5% of all mass in ONE hot cluster — the realistic failure mode
    for bucket-equality LSH (a tight cluster lands wholesale in one
    bucket regardless of plane count). Same planted-near-dup recipe as
    the uniform corpus (every 50th vector copies its predecessor with a
    +0.01 nudge on dim 1)."""
    emb_path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(emb_path):
        return
    n_emb = BASE_EMB * mult
    n_hot = int(n_emb * hot_frac)
    # centers driver-side (16 x 64 literals), splitmix-derived like the
    # operator's own plane draw but from a disjoint index range
    def h(i: int, j: int) -> float:
        x = ((i * 131 + j + 1) * 0x9E3779B97F4A7C15) % (1 << 64)
        x ^= x >> 31
        return ((x % 2001) - 1000) / 1000.0

    centers = F.array(*[
        F.array(*[F.lit(h(c + 1_000_000, d)) for d in range(64)])
        for c in range(k)])
    emb = (
        spark.range(n_emb).withColumnRenamed("id", "vec_id")
        .withColumn("src_id", F.when(
            (F.col("vec_id") % 50 == 0) & (F.col("vec_id") > 0),
            F.col("vec_id") - 1).otherwise(F.col("vec_id")))
        .withColumn("cluster", F.when(
            F.col("src_id") < n_hot, F.lit(0)).otherwise(
            F.pmod(F.hash("src_id"), F.lit(k - 1)) + 1))
        .select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda d: (F.element_at(F.element_at(
                    centers, F.col("cluster") + 1), d)
                    + (F.pmod(F.hash(F.col("src_id") * 67 + d),
                              F.lit(2001)) - 1000) / 1000.0 * 0.05
                    + F.when((d == 1)
                             & (F.col("src_id") != F.col("vec_id")),
                             F.lit(0.01)).otherwise(F.lit(0.0)))
                .cast("float")).alias("embedding"),
            F.col("cluster").cast("bigint").alias("label"))
    )
    emb.repartition(8).write.mode("overwrite").parquet(emb_path)


def gen_clustered_documents(spark, out_dir: str, mult: int,
                            hot_frac: float = 0.05) -> None:
    """Clustered DOCUMENT corpus: ``hot_frac`` of all docs are
    near-identical boilerplate — every hot doc re-derives doc 0's word
    list and appends one doc-unique tail token, so their MinHash
    signatures agree on ~all slots and the whole cluster lands wholesale
    in ONE bucket per band (the realistic failure mode for banded LSH:
    candidate volume ~ bands x C(hot, 2)). The remainder follows the
    uniform recipe including the every-50th planted near-dup."""
    docs_path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(docs_path):
        return
    n_docs = BASE_DOCS * mult
    n_hot = int(n_docs * hot_frac)
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    base = (
        spark.range(n_docs).withColumnRenamed("id", "doc_id")
        .withColumn("src_id", F.when(F.col("doc_id") < n_hot, F.lit(0))
                    .otherwise(F.when(
                        (F.col("doc_id") % 50 == 0) & (F.col("doc_id") > 0),
                        F.col("doc_id") - 1).otherwise(F.col("doc_id"))))
        .withColumn("n_words", F.pmod(F.hash("src_id"), F.lit(21)) + 40)
    )
    words = F.transform(
        F.sequence(F.lit(1), F.col("n_words")),
        lambda j: F.element_at(
            vocab, (F.pmod(F.hash(F.col("src_id") * 131 + j), F.lit(40))
                    + 1).cast("int")))
    joined = F.array_join(words, " ")
    text = (F.when(F.col("doc_id") < n_hot,
                   F.concat(joined, F.lit(" v"),
                            F.pmod(F.col("doc_id"), F.lit(997))))
            .when(F.col("doc_id") == F.col("src_id"), joined)
            .otherwise(F.concat(joined, F.lit(" edit"))))
    docs = base.withColumn("text", text).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.concat(F.lit("src"),
                 F.pmod(F.hash("doc_id"), F.lit(20))).alias("source"),
        F.length("text").cast("long").alias("n_chars"))
    docs.repartition(32).write.mode("overwrite").parquet(docs_path)


def main() -> None:
    mults = [int(a) for a in sys.argv[1:] if not a.startswith("-")] or [1, 4, 16]
    emb_only = "--emb-only" in sys.argv
    clustered = "--clustered" in sys.argv
    clustered_docs = "--clustered-docs" in sys.argv
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    spark = get_spark(app_name="scale-soak")
    queries = registry.all_queries()
    results: dict[str, dict[int, float]] = {}
    recalls: dict[str, dict[int, float]] = {}

    if clustered_docs:
        # clustered-DOCUMENT mode (round 11): the text verdict on a
        # boilerplate-hot corpus — wall time must decouple from the
        # banded candidate-pair volume the way the embedding verdict's
        # clustered soak proved (hot buckets take the early-exit
        # signature scan; the pair product is timed at the small sizes
        # for contrast and skipped where it would materialize ~1e9 rows)
        from tigerbeetle_cdc_nats_spark.queries_dedup import corpus_banded
        from tigerbeetle_cdc_nats_spark.sources import dedup_index as di

        for mult in mults:
            out_dir = f"/tmp/scale/cd{mult}"
            os.makedirs(out_dir, exist_ok=True)
            gen_clustered_documents(spark, out_dir, mult)
            repeats = int(os.environ.get("SOAK_REPEATS", "1"))
            n_docs = BASE_DOCS * mult
            n_hot = int(n_docs * 0.05)

            def timed(name, build, recall_fn=None):
                if only is not None and name not in only:
                    return
                best = None
                for _ in range(max(1, repeats)):
                    t0 = time.perf_counter()
                    build().write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                results.setdefault(name, {})[mult] = round(best, 3)
                r = ""
                if recall_fn:
                    rec = recall_fn(build())
                    recalls.setdefault(name, {})[mult] = rec
                    r = f"  recall={rec}"
                print(f"cd{mult:<2} {name:<28} {best:7.2f}s{r}",
                      file=sys.stderr)

            # stored banded index built OUTSIDE the timed section (the
            # maintained-artifact serving shape, like every indexed soak)
            banded = corpus_banded(spark, out_dir)
            # candidate volume from the band census — the number the
            # verdict's wall time must NOT track (pairs never exist in
            # its plan, so the census is the only way to see them)
            vol = (queries["minhash_band_stats"].fn(spark, out_dir)
                   .agg(F.sum("n_candidate_pairs")).first()[0])
            print(f"cd{mult:<2} candidate pair volume: {vol:,}",
                  file=sys.stderr)

            def hot_drop_recall(df):
                d = df.where((F.col("doc_id") > 0)
                             & (F.col("doc_id") < n_hot))
                n = d.count()
                if not n:
                    return None
                return round(d.where(F.col("is_kept") == 0).count() / n, 3)

            timed("text_verdict_clustered",
                  lambda: queries["text_dedup_verdict"].fn(spark, out_dir),
                  hot_drop_recall)
            if mult <= 16:  # the pair PRODUCT for contrast; ~1e9 rows at 64
                timed("minhash_pairs_clustered",
                      lambda: di.minhash_pairs_from_index(banded))
        _report(results, recalls, mults)
        spark.stop()
        return

    if clustered:
        # clustered-corpus mode: the near-dup family only, on the
        # cluster-skewed embeddings — measures the hot-bucket failure
        # mode and the skew-safe fix (SCALE.md round-7 continuation)
        from tigerbeetle_cdc_nats_spark.operators import (
            similarity as _sim)
        from tigerbeetle_cdc_nats_spark.queries_similarity import (
            near_dup_pairs_skewsafe)
        from tigerbeetle_cdc_nats_spark.session import load_table

        for mult in mults:
            out_dir = f"/tmp/scale/c{mult}"
            os.makedirs(out_dir, exist_ok=True)
            gen_clustered_embeddings(spark, out_dir, mult)
            repeats = int(os.environ.get("SOAK_REPEATS", "1"))
            n_emb = BASE_EMB * mult

            def timed(name, build, recall_fn=None):
                if only is not None and name not in only:
                    return
                best = None
                for _ in range(max(1, repeats)):
                    t0 = time.perf_counter()
                    build().write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                results.setdefault(name, {})[mult] = round(best, 3)
                r = ""
                if recall_fn:
                    rec = recall_fn(build())
                    recalls.setdefault(name, {})[mult] = rec
                    r = f"  recall={rec}"
                print(f"c{mult:<3} {name:<28} {best:7.2f}s{r}",
                      file=sys.stderr)

            pair_rec = lambda df: planted_recall(df, n_emb,
                                                 "vec_a", "vec_b")
            timed("near_dup_adaptive_clustered",
                  lambda: queries["embedding_near_dup_adaptive"]
                  .fn(spark, out_dir), pair_rec)
            timed("near_dup_skewsafe_clustered",
                  lambda: near_dup_pairs_skewsafe(
                      load_table(spark, out_dir, "embeddings"),
                      _sim.embedding_dim(out_dir),
                      corpus_size=n_emb), pair_rec)
            # round 8: the REGISTERED unsuffixed name routes through the
            # skew-safe generator — time it as users reach it
            timed("near_dup_registered_clustered",
                  lambda: queries["embedding_near_dup"]
                  .fn(spark, out_dir), pair_rec)
            # round 9: WARM stored-index serving (geometry-keyed index +
            # skew sidecar with max_cell_pop) — the index build runs
            # OUTSIDE the timed section like the other stored-index
            # soaks; the number is what a production query pays when
            # the index is a maintained artifact.
            if only is None or "near_dup_indexed_clustered" in only:
                from tigerbeetle_cdc_nats_spark.queries_similarity import (
                    ensure_near_dup_index)
                ensure_near_dup_index(spark, out_dir)
            timed("near_dup_indexed_clustered",
                  lambda: queries["embedding_near_dup_indexed"]
                  .fn(spark, out_dir), pair_rec)
            # round 10: the |docs|-sized VERDICT over the same stored
            # index — wall time must decouple from the pair volume
            # (the c64 point's ~18.6M pairs never exist in this plan;
            # hot buckets take the early-exit ascending scan). Recall
            # scores the planted every-50th dup ids marked dropped.
            verdict_rec = lambda df: planted_drop_recall(
                df.where(F.col("is_kept") == 0), n_emb, "vec_id")
            timed("dedup_verdict_clustered",
                  lambda: queries["embedding_dedup_verdict"]
                  .fn(spark, out_dir), verdict_rec)
        _report(results, recalls, mults)
        spark.stop()
        return

    for mult in mults:
        out_dir = f"/tmp/scale/x{mult}"
        os.makedirs(out_dir, exist_ok=True)
        gen_corpus(spark, out_dir, mult)
        repeats = int(os.environ.get("SOAK_REPEATS", "2"))
        n_emb = BASE_EMB * mult

        def timed(name, build, recall_fn=None):
            if only is not None and name not in only:
                return
            # min over repeats: this host shows ~2x wall jitter between
            # identical runs; the minimum is the least-noisy estimate.
            best = None
            for _ in range(max(1, repeats)):
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[mult] = round(best, 3)
            r = ""
            if recall_fn:
                rec = recall_fn(build())
                recalls.setdefault(name, {})[mult] = rec
                r = f"  recall={rec}"
            print(f"x{mult:<3} {name:<28} {best:7.2f}s{r}", file=sys.stderr)

        pair_rec = lambda df: planted_recall(df, n_emb, "vec_a", "vec_b")
        drop_rec = lambda df: planted_drop_recall(df, n_emb, "drop_id")
        for name in ([] if emb_only else DOC_OPS + EVENT_OPS) + EMB_OPS:
            if mult >= 64 and name in SKIP_AT_64:
                print(f"x{mult:<3} {name:<28} skipped (known fixed-"
                      f"geometry blowup, see SCALE.md)", file=sys.stderr)
                continue
            rf = {"embedding_near_dup": pair_rec,
                  "embedding_near_dup_adaptive": pair_rec,
                  "embedding_near_dup_multitable_adaptive": pair_rec,
                  "embedding_near_dup_indexed": pair_rec,
                  "semdedup": drop_rec}.get(name)
            timed(name, lambda: queries[name].fn(spark, out_dir), rf)
        timed("semdedup_scaled",
              lambda: semdedup_scaled_build(spark, out_dir, n_emb), drop_rec)

        # Stored-index cold-query cost (round-5: sources/dedup_index.py):
        # the index build is OUTSIDE the timed section — the soak measures
        # what a query pays when the index is a maintained artifact,
        # vs the in-session variants above that rebuild it per query.
        if not emb_only and (only is None or {
                "minhash_from_stored_index",
                "winnow_from_stored_index"} & only):
            from tigerbeetle_cdc_nats_spark.session import load_table
            from tigerbeetle_cdc_nats_spark.sources import dedup_index as di

            docs = load_table(spark, out_dir, "documents")
            mh_path = os.path.join(out_dir, "mh_index")
            wn_path = os.path.join(out_dir, "wn_index")
            if not os.path.exists(mh_path):
                di.write_minhash_index(docs, mh_path)
            if not os.path.exists(wn_path):
                di.write_winnow_index(docs, wn_path)
            timed("minhash_from_stored_index",
                  lambda: di.minhash_pairs_from_index(
                      di.read_minhash_index(spark, mh_path)))
            timed("winnow_from_stored_index",
                  lambda: di.winnow_candidates_from_index(
                      di.read_winnow_index(spark, wn_path)))

    _report(results, recalls, mults)
    spark.stop()


def _report(results, recalls, mults) -> None:
    report = {}
    for name, times in results.items():
        # an op skipped at the largest size (SKIP_AT_64) has no times[hi]
        # — fit alpha between the largest two sizes it actually ran
        ran = sorted(times)
        alpha = (math.log(times[ran[-1]] / times[ran[0]])
                 / math.log(ran[-1] / ran[0]) if len(ran) > 1 else None)
        report[name] = {"times_s": times,
                        "alpha": round(alpha, 3) if alpha is not None
                        else None}
        if name in recalls:
            report[name]["planted_recall"] = recalls[name]
    print(json.dumps({"base_docs": BASE_DOCS, "mults": mults,
                      "ops": report}, indent=1))


if __name__ == "__main__":
    main()
