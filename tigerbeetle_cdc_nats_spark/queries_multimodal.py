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
