"""Defenses against the next plausible testdata drift: the embedding
column's physical element type changing (float -> double), and PQ encode
running over a stream (it is a stateless Arrow map, so online must equal
batch)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.operators import similarity as sim
from tigerbeetle_cdc_nats_spark.session import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def double_dir(spark, tmp_path_factory):
    """The sf0.001 embeddings re-written with array<double> elements."""
    out = str(tmp_path_factory.mktemp("embdrift"))
    emb = load_table(spark, SF_DIR, "embeddings")
    (emb.withColumn("embedding",
                    F.expr("transform(embedding, v -> CAST(v AS DOUBLE))"))
     .write.parquet(os.path.join(out, "embeddings.parquet")))
    return out


def test_knn_is_invariant_to_element_widening(spark, double_dir):
    dim = sim.embedding_dim(SF_DIR)
    a = sim.knn_bruteforce(load_table(spark, SF_DIR, "embeddings"),
                           (0, 1, 2), k=5, dim=dim).collect()
    b = sim.knn_bruteforce(load_table(spark, double_dir, "embeddings"),
                           (0, 1, 2), k=5, dim=dim).collect()
    key = lambda rows: sorted((r["q_id"], r["c_id"], r["sim_e6"], r["rank"])
                              for r in rows)
    assert key(a) == key(b)


def test_pq_codes_are_invariant_to_element_widening(spark, double_dir):
    dim = sim.embedding_dim(SF_DIR)
    emb_f = load_table(spark, SF_DIR, "embeddings")
    emb_d = load_table(spark, double_dir, "embeddings")
    cb_f, cb_d = sim.pq_codebook(emb_f), sim.pq_codebook(emb_d)
    codes_f = {r["vec_id"]: list(r["codes"])
               for r in sim.pq_encode(emb_f, cb_f, dim).collect()}
    codes_d = {r["vec_id"]: list(r["codes"])
               for r in sim.pq_encode(emb_d, cb_d, dim).collect()}
    assert codes_f == codes_d


def test_pq_encode_streaming_equals_batch(spark, tmp_path):
    """pq_encode is a stateless Arrow map — running it over a file stream
    must produce exactly the batch codes."""
    dim = sim.embedding_dim(SF_DIR)
    emb = load_table(spark, SF_DIR, "embeddings")
    cb = sim.pq_codebook(emb)
    batch = {r["vec_id"]: list(r["codes"])
             for r in sim.pq_encode(emb, cb, dim).collect()}

    src = str(tmp_path / "src")
    emb.write.parquet(src)
    stream = spark.readStream.schema(emb.schema).parquet(src)
    q = (sim.pq_encode(stream, cb, dim)
         .writeStream.format("memory").queryName("pq_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "chk"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    online = {r["vec_id"]: list(r["codes"])
              for r in spark.table("pq_stream").collect()}
    assert online == batch
