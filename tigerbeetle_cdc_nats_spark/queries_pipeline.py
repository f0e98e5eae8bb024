"""Composite training-data pipeline query: the end-to-end showcase chaining
the north-star operators the way a real 100 TB corpus-preparation job would
— exact dedup -> quality gate -> language ID -> token accounting.

Each stage is the already-tested operator; the composition itself is what
this query verifies (operators must compose under one Catalyst plan without
materialization barriers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, Window

from tigerbeetle_cdc_nats_spark.operators import text as tx
from tigerbeetle_cdc_nats_spark.registry import register
from tigerbeetle_cdc_nats_spark.session import load_table

_QUALITY_SQL = (
    "(len(list_distinct(str_split(text, ' '))) / len(str_split(text, ' '))) * 0.5"
    " + (1 - " + tx.sql_stopword_hits("en") + " / len(str_split(text, ' '))) * 0.3"
    " + LEAST(((length(text) - (len(str_split(text, ' ')) - 1))"
    " / len(str_split(text, ' '))) / 10.0, 1.0) * 0.2"
)


def _lang_case() -> str:
    scores = {lang: tx.sql_stopword_hits(lang) for lang in tx.LANGS}
    greatest = "GREATEST(" + ", ".join(scores.values()) + ")"
    whens = " ".join(
        f"WHEN {scores[lang]} = {greatest} THEN '{lang}'" for lang in tx.LANGS
    )
    return f"CASE {whens} END"


@register(
    "training_data_pipeline",
    f"""WITH keepers AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
      MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id
    FROM documents
  ) WHERE doc_id = keeper_id
),
scored AS (
  SELECT doc_id,
    len(str_split(text, ' ')) AS n_tokens,
    {_QUALITY_SQL} AS quality,
    {_lang_case()} AS pred_lang
  FROM keepers
)
SELECT doc_id, n_tokens, quality, pred_lang
FROM scored WHERE quality >= 0.6""",
    doc="composite corpus-prep pipeline: exact-dedup keepers -> quality "
        "gate (>= 0.6) -> language ID -> token accounting, in ONE Catalyst "
        "plan (no materialization barriers between stages)",
)
def q_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    # stage 1: exact dedup, keep the minimum doc_id per content hash
    w = Window.partitionBy(F.md5("text"))
    keepers = (
        docs.withColumn("keeper_id", F.min("doc_id").over(w))
        .where(F.col("doc_id") == F.col("keeper_id"))
        .select("doc_id", "text")
    )

    # stage 2+3+4: quality features, language ID, token counts
    feats = tx.quality_score("text")
    score_cols = {lang: c for lang, c in
                  zip(tx.LANGS, tx.lang_scores("text"))}
    scored = keepers.select(
        "doc_id",
        feats["n_tokens"].alias("n_tokens"),
        feats["quality"].alias("quality"),
        tx.lang_pred(score_cols).alias("pred_lang"),
    )
    return scored.where(F.col("quality") >= 0.6)
