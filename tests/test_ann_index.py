"""Persisted ANN index layout (sources/ann_index.py): bucket partitioning,
file-level pruning for single- and multi-probe fetches, and agreement with
the in-session bucketing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.operators import similarity as sim
from tigerbeetle_cdc_nats_spark.sources import index_versioning as iv
from tigerbeetle_cdc_nats_spark.plans.inspect import physical_plan
from tigerbeetle_cdc_nats_spark.session import load_table
from tigerbeetle_cdc_nats_spark.sources.ann_index import (
    probe_buckets,
    read_ann_index,
    write_ann_index,
)

SF_DIR = "/root/testdata/sf0.001"
PLANES = sim.hyperplanes(4, sim.embedding_dim(SF_DIR))


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("annidx") / "index")
    emb = load_table(spark, SF_DIR, "embeddings")
    write_ann_index(emb, path, PLANES, dim=sim.embedding_dim(SF_DIR))
    return path


def _files_read(df) -> int:
    return df.select(F.input_file_name().alias("f")).distinct().count()


def test_roundtrip_and_bucket_agreement(spark, index):
    emb = load_table(spark, SF_DIR, "embeddings")
    idx = read_ann_index(spark, index)
    assert idx.count() == emb.count()
    # Stored partition value == in-session bucket expression, per vector.
    live = emb.select(
        "vec_id",
        sim.bucket_col(PLANES, "embedding",
                       sim.embedding_dim(SF_DIR)).alias("b"))
    joined = idx.select("vec_id", "bucket").join(live, "vec_id")
    assert joined.where(F.col("bucket") != F.col("b")).count() == 0


def test_single_probe_prunes_files(spark, index):
    idx = read_ann_index(spark, index)
    some_bucket = idx.select("bucket").first()["bucket"]
    probe = probe_buckets(idx, [some_bucket])
    plan = physical_plan(probe)
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1].split("]")[0]
    assert 0 < _files_read(probe) < _files_read(idx)


def test_multi_probe_reads_only_probe_set(spark, index):
    idx = read_ann_index(spark, index)
    base = int(idx.select("bucket").first()["bucket"])
    probes = [base] + [base ^ (1 << j) for j in range(len(PLANES))]
    probe = probe_buckets(idx, probes)
    got_buckets = {r["bucket"]
                   for r in probe.select("bucket").distinct().collect()}
    assert got_buckets <= set(probes)
    assert _files_read(probe) <= len(probes) * 2  # a few files per bucket


def test_incremental_append_equals_rebuild(spark, tmp_path):
    """Index built on a prefix + appended delta == full rebuild (the
    vector-side counterpart of the dedup-index append contract)."""
    from tigerbeetle_cdc_nats_spark.sources.ann_index import (
        append_ann_index,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    dim = sim.embedding_dim(SF_DIR)
    incr = str(tmp_path / "incr")
    full = str(tmp_path / "full")
    write_ann_index(emb.where(F.col("vec_id") % 4 != 0), incr, PLANES,
                    dim=dim)
    append_ann_index(emb.where(F.col("vec_id") % 4 == 0), incr, PLANES,
                     dim=dim)
    write_ann_index(emb, full, PLANES, dim=dim)
    a = sorted(map(tuple, read_ann_index(spark, incr)
                   .select("vec_id", "bucket").collect()))
    b = sorted(map(tuple, read_ann_index(spark, full)
                   .select("vec_id", "bucket").collect()))
    assert a == b and len(a) == emb.count()


def test_ann_compaction_drops_replay_duplicates(spark, tmp_path):
    from tigerbeetle_cdc_nats_spark.operators import similarity as sim
    from tigerbeetle_cdc_nats_spark.sources import ann_index as ai
    from tigerbeetle_cdc_nats_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(64)
    dim = sim.embedding_dim("/root/testdata/sf0.001")
    planes = sim.hyperplanes(n_planes=4, dim=dim)
    path = str(tmp_path / "annidx")
    ai.write_ann_index(emb, path, planes, dim=dim)
    baseline = spark.read.parquet(iv.current_dir(path)).count()

    replay = emb.limit(16)
    ai.append_ann_index(replay, path, planes, dim=dim)
    ai.append_ann_index(replay, path, planes, dim=dim)
    assert spark.read.parquet(iv.current_dir(path)).count() == baseline + 32

    ai.compact_ann_index(spark, path)
    after = ai.read_ann_index(spark, path)
    assert after.count() == baseline
    # partition pruning still works on the rewritten layout
    some_bucket = after.select("bucket").first()["bucket"]
    pruned = ai.probe_buckets(after, [some_bucket])
    assert pruned.count() > 0
    assert {r["bucket"] for r in pruned.select("bucket")
            .distinct().collect()} == {some_bucket}


def test_stored_ivf_equals_in_session(spark, tmp_path, monkeypatch):
    """ivf_ann_indexed must return row-identical results to
    ivf_ann_cosine — the stored assignment and the session assignment
    are the same Arrow argmax over the same integer-e6 centroids."""
    from tigerbeetle_cdc_nats_spark.registry import all_queries

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    fresh = sorted(map(tuple, qs["ivf_ann_cosine"].fn(spark, sf).collect()))
    stored = sorted(map(tuple, qs["ivf_ann_indexed"].fn(spark, sf).collect()))
    assert stored == fresh


def test_ivf_append_and_compact_lifecycle(spark, tmp_path):
    """Online insert assigns against the STORED centroids (no re-train);
    a replayed insert's duplicates compact away; the centroid sidecar
    survives compaction byte-for-byte."""
    from tigerbeetle_cdc_nats_spark.operators import similarity as sim
    from tigerbeetle_cdc_nats_spark.session import load_table
    from tigerbeetle_cdc_nats_spark.sources import ann_index as ai

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    dim = sim.embedding_dim(sf)
    base = emb.where("vec_id < 400")
    delta = emb.where("vec_id >= 400 and vec_id < 420")
    path = str(tmp_path / "ivfidx")
    ai.write_ivf_index(base, path, dim=dim)
    cent_before = sorted(map(tuple, ai.read_ivf_centroids(spark, path)
                             .collect()))
    n0 = spark.read.parquet(iv.current_dir(path)).count()

    ai.append_ivf_index(delta, path, dim=dim)
    ai.append_ivf_index(delta, path, dim=dim)  # at-least-once replay
    assert spark.read.parquet(iv.current_dir(path)).count() == n0 + 40

    ai.compact_ivf_index(spark, path)
    idx = ai.read_ivf_index(spark, path)
    assert idx.count() == n0 + 20
    # centroids untouched by insert AND compaction (no silent re-train)
    cent_after = sorted(map(tuple, ai.read_ivf_centroids(spark, path)
                            .collect()))
    assert cent_after == cent_before
    # appended vectors landed in the same cells a fresh assignment picks
    from tigerbeetle_cdc_nats_spark.queries_similarity import ivf_assign
    centv = ai.read_ivf_centroids(spark, path)
    fresh = {(r["vec_id"], r["cell"]) for r in
             ivf_assign(delta, centv, dim=dim)
             .select("vec_id", "cell").collect()}
    stored = {(r["vec_id"], r["cell"]) for r in
              idx.where("vec_id >= 400").select("vec_id", "cell").collect()}
    assert stored == fresh
