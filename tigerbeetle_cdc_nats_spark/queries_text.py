"""Text-analysis queries over ``documents`` (north-star surface): token
counting, language ID, quality scoring, fingerprinting."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tigerbeetle_cdc_nats_spark.operators import text as tx
from tigerbeetle_cdc_nats_spark.registry import register
from tigerbeetle_cdc_nats_spark.session import load_table

_RE = tx.REGEX_TOKEN_PATTERN


@register(
    "token_count",
    f"""SELECT doc_id,
  len(str_split(text, ' ')) AS n_tokens,
  len(regexp_extract_all(text, '{_RE}')) AS n_regex_tokens,
  length(text) AS n_chars
FROM documents""",
    doc="whitespace + BPE-ish regex token counts (north star: token counting)",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tx.token_count("text").cast("bigint").alias("n_tokens"),
        tx.regex_token_count("text").cast("bigint").alias("n_regex_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def _lang_scores_sql() -> str:
    return ",\n  ".join(
        f"{tx.sql_stopword_hits(lang)} AS score_{lang}" for lang in tx.LANGS
    )


@register(
    "lang_id",
    f"""WITH s AS (
  SELECT doc_id, {_lang_scores_sql()}
  FROM documents
), m AS (
  SELECT *, GREATEST({', '.join('score_' + lang for lang in tx.LANGS)}) AS mx
  FROM s
)
SELECT doc_id, {', '.join('score_' + lang for lang in tx.LANGS)},
  CASE {' '.join(f"WHEN score_{lang} = mx THEN '{lang}'" for lang in tx.LANGS)}
  END AS pred_lang
FROM m""",
    doc="stopword-profile language ID with alphabetical tiebreak "
        "(north star: language-ID heuristic)",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        *[c.cast("bigint").alias(f"score_{lang}")
          for lang, c in zip(tx.LANGS, [s for s in tx.lang_scores("text")])],
    )
    score_cols = {lang: F.col(f"score_{lang}") for lang in tx.LANGS}
    return scored.withColumn("pred_lang", tx.lang_pred(score_cols))


@register(
    "quality_score",
    """SELECT doc_id,
  len(str_split(text, ' ')) AS n_tokens,
  len(list_distinct(str_split(text, ' '))) AS n_uniq_tokens,
  """ + tx.sql_stopword_hits("en") + """ AS n_stopwords,
  (length(text) - (len(str_split(text, ' ')) - 1)) / len(str_split(text, ' ')) AS avg_token_len,
  len(list_distinct(str_split(text, ' '))) / len(str_split(text, ' ')) AS uniq_ratio,
  (len(list_distinct(str_split(text, ' '))) / len(str_split(text, ' '))) * 0.5
    + (1 - """ + tx.sql_stopword_hits("en") + """ / len(str_split(text, ' '))) * 0.3
    + LEAST(((length(text) - (len(str_split(text, ' ')) - 1)) / len(str_split(text, ' '))) / 10.0, 1.0) * 0.2
    AS quality
FROM documents""",
    doc="deterministic quality features + composite score "
        "(north star: quality scoring)",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = tx.quality_score("text")
    return docs.select("doc_id", *[c.alias(n) for n, c in feats.items()])


@register(
    "doc_fingerprint",
    """SELECT doc_id, md5(lower(text)) AS fp,
  CAST(('0x' || substr(md5(lower(text)), 1, 15)) AS BIGINT) AS fp60
FROM documents""",
    doc="content fingerprint: md5 + 60-bit integer form "
        "(north star: document fingerprinting)",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tigerbeetle_cdc_nats_spark.session import ensure_parallelism

    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        tx.doc_fingerprint("text").alias("fp"),
        tx.fingerprint60("text").alias("fp60"),
    )
