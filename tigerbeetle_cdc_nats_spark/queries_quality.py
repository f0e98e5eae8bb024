"""Corpus-hygiene gates: PII scan/redaction and blocklist filtering.

These are the first stages of a real training-data pipeline (scrub PII,
drop policy-violating documents) expressed as pure codegen'd regexp
expressions — linear in bytes scanned, zero shuffle before the final
per-source rollup. The synthetic corpus is digit-free, so the PII queries
append a deterministic doc_id-derived footer (planted emails / IPv4s /
phones at fixed residue rates) before scanning; the SAME footer SQL runs
on both engines, so the detector — not the planting — is what the oracle
checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tigerbeetle_cdc_nats_spark.operators import pii
from tigerbeetle_cdc_nats_spark.registry import register
from tigerbeetle_cdc_nats_spark.session import load_table

#: Footer planting PII into the sanitized corpus (identical SQL in Spark
#: and DuckDB: ||, CASE, CAST(... AS STRING), % on BIGINT).
_FOOTER_SQL = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' contact u' ||"
    " CAST(doc_id AS STRING) || '@example.com' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' ||"
    " CAST(doc_id % 256 AS STRING) || '.' || CAST(doc_id % 250 AS STRING)"
    " ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN ' call +49 555 ' ||"
    " CAST(1000 + doc_id % 9000 AS STRING) ELSE '' END"
)

_N_COLS = [name for name, _p, _t in pii.PATTERNS]


@register(
    "pii_scan",
    f"""WITH planted AS (
  SELECT source, {_FOOTER_SQL} AS text FROM documents
)
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN {' + '.join(pii.duck_count(n) for n in _N_COLS)} > 0
           THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
  {', '.join(f'CAST(SUM({pii.duck_count(n)}) AS BIGINT) AS n_{n}' for n in _N_COLS)}
FROM planted GROUP BY source""",
    doc="per-source PII audit over the planted corpus: affected-doc and "
        "per-class match counts. Codegen'd regexp_count scan + ONE "
        "map-side-combined rollup (|sources| groups).",
)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select("source", F.expr(_FOOTER_SQL).alias("text"))
    return pii.scan_summary(planted, "text", "source")


@register(
    "pii_redact",
    f"""WITH planted AS (
  SELECT doc_id, {_FOOTER_SQL} AS text FROM documents
)
SELECT doc_id,
  {' + '.join(pii.duck_count(n) for n in _N_COLS)} AS n_redactions,
  md5({pii.duck_redact()}) AS clean_hash
FROM planted
WHERE {' + '.join(pii.duck_count(n) for n in _N_COLS)} > 0""",
    doc="the scrubbing transform itself: every match replaced by its class "
        "token, output fingerprinted (md5) so the oracle verifies the exact "
        "redacted bytes. Pure per-row map — zero shuffle.",
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select("doc_id", F.expr(_FOOTER_SQL).alias("text"))
    n_total = sum(F.col(f"n_{n}") for n in _N_COLS)
    out = planted.select(
        "doc_id", *pii.pii_counts("text"),
        F.md5(pii.redact("text").cast("binary")).alias("clean_hash"))
    return (out.withColumn("n_redactions", n_total)
            .where(F.col("n_redactions") > 0)
            .select("doc_id", "n_redactions", "clean_hash"))


#: Policy blocklist. Deliberately includes vocabulary that actually occurs
#: in the corpus so the gate is non-degenerate.
BLOCKLIST = ("error", "slow", "big")
_BL_RE = r"\b(" + "|".join(BLOCKLIST) + r")\b"


@register(
    "blocklist_filter",
    f"""SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN len(regexp_extract_all(text, '{_BL_RE}')) > 0
           THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs,
  CAST(SUM(len(regexp_extract_all(text, '{_BL_RE}'))) AS BIGINT)
    AS total_hits,
  CAST(MAX(len(regexp_extract_all(text, '{_BL_RE}'))) AS BIGINT)
    AS max_hits_per_doc
FROM documents GROUP BY source""",
    doc="term-blocklist gate: per-source flagged-document rate and hit "
        "counts via one word-boundary alternation regex — the policy "
        "filter stage of the corpus pipeline.",
)
def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hits = F.regexp_count(F.col("text"), F.lit(_BL_RE)).cast("bigint")
    return (docs.select("source", hits.alias("_h"))
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum((F.col("_h") > 0).cast("bigint")).alias("flagged_docs"),
                 F.sum("_h").alias("total_hits"),
                 F.max("_h").alias("max_hits_per_doc")))


#: Capstone gate thresholds (chosen from the corpus quantiles so every
#: gate both passes and fails documents: quality ~5th pct, blocklist ~p85).
_CURATE_MIN_Q_E6 = 540000
_CURATE_MAX_BL_HITS = 6

#: Curation input: the PII-planted text, with every 97th doc replaced by a
#: shared boilerplate page so the normalized-hash dedup gate is exercised
#: (the synthetic corpus itself is dup-free).
_CURATE_TEXT_SQL = (
    "CASE WHEN doc_id % 97 = 0 "
    "THEN 'Shared boilerplate; navigation footer page!' "
    "ELSE " + _FOOTER_SQL + " END"
)


@register(
    "curated_corpus_pipeline",
    f"""WITH planted AS (
  SELECT doc_id, source, {_CURATE_TEXT_SQL} AS text FROM documents
),
red AS (
  SELECT doc_id, source,
         CAST({' + '.join(pii.duck_count(n) for n in _N_COLS)} AS BIGINT)
           AS n_redactions,
         {pii.duck_redact()} AS text
  FROM planted
),
scored AS (
  SELECT doc_id, source, n_redactions,
         CAST(('0x' || substr(md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))), 1, 15)) AS BIGINT)
           AS norm_h,
         CAST(FLOOR(((len(list_distinct(str_split(text, ' '))) / len(str_split(text, ' '))) * 0.5 + (1 - len(list_filter(str_split(text, ' '), t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'that'))) / len(str_split(text, ' '))) * 0.3 + LEAST(((length(text) - (len(str_split(text, ' ')) - 1)) / len(str_split(text, ' '))) / 10.0, 1.0) * 0.2) * 1000000.0) AS BIGINT)
           AS q_e6,
         len(regexp_extract_all(text, '{_BL_RE}')) AS bl_hits
  FROM red
)
SELECT doc_id, source, n_redactions,
       CAST(doc_id <> MIN(doc_id) OVER (PARTITION BY norm_h) AS BIGINT)
         AS is_dup,
       CAST(q_e6 >= {_CURATE_MIN_Q_E6} AS BIGINT) AS pass_quality,
       CAST(bl_hits <= {_CURATE_MAX_BL_HITS} AS BIGINT) AS pass_blocklist,
       CAST(doc_id = MIN(doc_id) OVER (PARTITION BY norm_h)
            AND q_e6 >= {_CURATE_MIN_Q_E6}
            AND bl_hits <= {_CURATE_MAX_BL_HITS} AS BIGINT) AS kept
FROM scored""",
    doc="capstone composite: plant -> redact PII -> normalize -> hash "
        "dedup -> quality gate -> blocklist gate, fused into ONE Catalyst "
        "plan (one scan, one shuffle on the normalized hash). Per-doc "
        "verdict columns let downstream stages filter on kept=1 or audit "
        "each gate independently — the curation pass a 100 TB corpus "
        "runs end to end.",
)
def q_curated_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tigerbeetle_cdc_nats_spark.operators import dedup as dd
    from tigerbeetle_cdc_nats_spark.operators import text as tx
    from tigerbeetle_cdc_nats_spark.queries_corpus import normalize_text
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select("doc_id", "source",
                          F.expr(_CURATE_TEXT_SQL).alias("text"))
    n_red = None
    for c in pii.pii_counts("text"):
        n_red = c if n_red is None else n_red + c
    red = planted.select(
        "doc_id", "source", n_red.cast("bigint").alias("n_redactions"),
        pii.redact("text").alias("text"))
    q_e6 = (F.floor(tx.quality_score("text")["quality"] * 1000000.0)
            .cast("bigint"))
    bl = F.regexp_count(F.col("text"), F.lit(_BL_RE)).cast("bigint")
    scored = red.select(
        "doc_id", "source", "n_redactions",
        dd.hash60(normalize_text(F.col("text"))).alias("norm_h"),
        q_e6.alias("q_e6"), bl.alias("bl_hits"))
    by_hash = Window.partitionBy("norm_h")
    out = scored.select(
        "doc_id", "source", "n_redactions",
        (F.col("doc_id") != F.min("doc_id").over(by_hash))
        .cast("bigint").alias("is_dup"),
        (F.col("q_e6") >= _CURATE_MIN_Q_E6).cast("bigint")
        .alias("pass_quality"),
        (F.col("bl_hits") <= _CURATE_MAX_BL_HITS).cast("bigint")
        .alias("pass_blocklist"))
    return out.withColumn(
        "kept",
        ((F.col("is_dup") == 0) & (F.col("pass_quality") == 1)
         & (F.col("pass_blocklist") == 1)).cast("bigint"))


@register(
    "blocklist_kwic",
    """WITH t AS (
  SELECT doc_id, str_split(text, ' ') AS toks FROM documents
),
x AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(1, len(toks) + 1)) AS pos
  FROM t
),
hit AS (
  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         toks[CAST(pos AS INT)] AS term,
         COALESCE(array_to_string(
           toks[CAST(GREATEST(1, pos - 3) AS INT):CAST(pos - 1 AS INT)],
           ' '), '') AS left_ctx,
         COALESCE(array_to_string(
           toks[CAST(pos + 1 AS INT):CAST(LEAST(n, pos + 3) AS INT)],
           ' '), '') AS right_ctx
  FROM x
  WHERE toks[CAST(pos AS INT)] IN ('error', 'slow', 'big')
)
SELECT doc_id, pos, term, left_ctx, right_ctx FROM hit""",
    doc="keyword-in-context concordance for every blocklist hit: the "
        "term, its token position, and ±3 tokens of context — the "
        "audit-trail provenance a human reviewer needs to adjudicate "
        "policy matches. Zero shuffle: posexplode + per-row array "
        "slices, all codegen.",
)
def q_blocklist_kwic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    x = docs.select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n"),
        F.posexplode(toks).alias("pos0", "term"))
    x = x.withColumn("pos", (F.col("pos0") + 1).cast("bigint"))
    left_start = F.greatest(F.lit(1), F.col("pos") - 3)
    left_len = (F.col("pos") - left_start).cast("int")
    right_len = F.least(F.col("n").cast("bigint"), F.col("pos") + 3) \
        - F.col("pos")
    return (x.where(F.col("term").isin(list(BLOCKLIST)))
            .select(
                "doc_id", "pos", "term",
                F.concat_ws(" ", F.slice("toks", left_start.cast("int"),
                                         left_len)).alias("left_ctx"),
                F.concat_ws(" ", F.slice("toks",
                                         (F.col("pos") + 1).cast("int"),
                                         right_len.cast("int")))
                .alias("right_ctx")))
