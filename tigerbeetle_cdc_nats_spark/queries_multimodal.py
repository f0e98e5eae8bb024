"""Multimodal-column queries (north-star surface): opaque binary payloads
with typed metadata and a mapInPandas frame-sampling fan-out."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from tigerbeetle_cdc_nats_spark.operators import multimodal as mm
from tigerbeetle_cdc_nats_spark.registry import register
from tigerbeetle_cdc_nats_spark.session import load_table


@register(
    "multimodal_meta",
    """SELECT doc_id,
  octet_length(encode(text)) AS n_bytes,
  sha256(text) AS sha256,
  hex(encode(substr(text, 1, 4))) AS magic_hex
FROM documents""",
    doc="typed metadata over an opaque binary media column "
        "(north star: multimodal columns)",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = mm.with_binary_payload(load_table(spark, sf_dir, "documents"))
    return mm.media_metadata(docs)


@register(
    "media_frame_extract",
    """WITH f AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes FROM documents
), fr AS (
  SELECT doc_id, n_bytes, unnest(range(0, n_bytes % 4 + 1)) AS frame_id FROM f
)
SELECT doc_id, frame_id, n_bytes,
  md5(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_id AS VARCHAR)) AS frame_hash
FROM fr""",
    doc="1->N frame sampling via mapInPandas (Arrow batches, real plumbing; "
        "decode itself stubbed deterministically — north star: multimodal)",
)
def q_media_frame_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = mm.with_binary_payload(load_table(spark, sf_dir, "documents"))
    return mm.frame_sample(docs, fake=True)


@register(
    "media_feature_vectors",
    """WITH f AS (
  SELECT doc_id,
         list_transform(range(0, 8), j ->
           CAST(('0x' || substr(md5(substr(text, CAST(j * 16 + 1 AS INT),
                                           16)), 1, 15)) AS BIGINT) % 1000)
           AS features
  FROM documents)
SELECT doc_id, generate_subscripts(features, 1) - 1 AS dim_j,
       unnest(features) AS feature
FROM f""",
    doc="binary -> fixed-width feature vectors (the embed-the-media "
        "stage): mapInPandas over the opaque payload column, Arrow batch "
        "streaming, deterministic stub embedder (md5 of byte segments) so "
        "the full plumbing is oracle-checked — a real model is a drop-in "
        "for the stub. Zero shuffle; one pass over payload bytes. Output "
        "is the long (doc, dim, value) form per the scalar-column "
        "registry convention.",
)
def q_media_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    feats = mm.feature_vectors(mm.with_binary_payload(docs))
    return feats.select(
        "doc_id", F.posexplode("features").alias("dim_j", "feature")
    ).select("doc_id", F.col("dim_j").cast("bigint").alias("dim_j"),
             "feature")
