"""Text-analysis queries over ``documents`` (north-star surface): token
counting, language ID, quality scoring, fingerprinting."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

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


@register(
    "tfidf_top_terms",
    """WITH tok AS (
  SELECT doc_id, unnest(list_distinct(str_split(text, ' '))) AS tok
  FROM documents
),
occ AS (
  SELECT doc_id, t.tok, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents) t
  GROUP BY doc_id, t.tok
),
df AS (SELECT tok, COUNT(*) AS n_docs_with FROM tok GROUP BY tok),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT o.doc_id, o.tok,
    CAST(o.tf AS BIGINT) AS tf,
    CAST(FLOOR(o.tf * ln(CAST(n.n_docs AS DOUBLE)
                         / CAST(d.n_docs_with AS DOUBLE)) * 1000000.0)
         AS BIGINT) AS tfidf_e6
  FROM occ o JOIN df d ON d.tok = o.tok CROSS JOIN n
)
SELECT doc_id, tok, tf, tfidf_e6,
       CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf_e6 DESC, tok) AS rnk
      FROM scored)
WHERE rnk <= 3""",
    doc="per-document top-3 TF-IDF terms: tf from the token stream, df "
        "from distinct doc-token pairs, idf = ln(N/df) floored to e6 "
        "units — the classic keyword-extraction primitive",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document.

    Scale shape: the fit is two aggregations over the exploded token
    stream — per-(doc, token) term frequencies (shuffle keyed on the
    high-cardinality pair) and per-token document frequencies over
    DISTINCT doc-token pairs (vocab-sized output). The idf table joins
    back on the token key (AQE broadcasts a small vocab); the corpus
    total is a one-row broadcast. The per-doc top-3 runs as a rank
    window partitioned by doc_id — bounded work per doc, never a global
    sort. tf * ln(N/df) is floored to integer 1e-6 units per TERM (not
    aggregated after), so cross-engine equality is exact modulo ln()'s
    1-ulp band, which the floor absorbs.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok_all = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok"))
    occ = tok_all.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dfreq = (
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("n_docs_with"))
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        occ.join(dfreq, "tok").crossJoin(F.broadcast(n))
        .select(
            "doc_id", "tok", F.col("tf").cast("bigint").alias("tf"),
            F.floor(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double")
                        / F.col("n_docs_with").cast("double"))
                * 1000000.0
            ).cast("bigint").alias("tfidf_e6"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_e6").desc(), F.col("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "tok", "tf", "tfidf_e6", "rnk")
    )


_BM25_TERMS = ("spark", "table", "scan")
_K1 = 1.2
_B = 0.75


@register(
    "bm25_score",
    f"""WITH dl AS (
  SELECT doc_id, CAST(len(str_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
  WHERE tok IN {_BM25_TERMS}
  GROUP BY doc_id, tok
),
df AS (SELECT tok, COUNT(*) AS dfv FROM tf GROUP BY tok),
term AS (
  SELECT t.doc_id, t.tok,
    CAST(FLOOR(
      ln((CAST(s.n_docs - d.dfv AS DOUBLE) + 0.5)
         / (CAST(d.dfv AS DOUBLE) + 0.5) + 1.0)
      * (CAST(t.tf AS DOUBLE) * ({_K1} + 1.0))
      / (CAST(t.tf AS DOUBLE)
         + {_K1} * ((1.0 - {_B})
                    + {_B} * (CAST(l.dl AS DOUBLE) / s.avgdl)))
      * 1000000.0) AS BIGINT) AS s_e6
  FROM tf t
  JOIN df d ON d.tok = t.tok
  JOIN dl l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
)
SELECT doc_id, COUNT(*) AS n_hit_terms,
       CAST(SUM(s_e6) AS BIGINT) AS bm25_e6
FROM term GROUP BY doc_id""",
    doc="Okapi BM25 retrieval scoring for a fixed query against every "
        "document: idf from term document frequencies, tf saturation "
        "(k1=1.2) and length normalization (b=0.75) against the corpus "
        "average length — the lexical-search scoring primitive",
)
def q_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25(query, doc) for every doc containing a query term.

    Scale shape: tokens are filtered to the query's terms BEFORE the
    per-(doc, term) count, so the tf aggregate's input is |matches|, not
    |corpus tokens|; df and the corpus stats are term-count- and one-row-
    sized broadcasts; the only fact-sized shuffle joins tf to doc lengths
    on doc_id. Every float step (IEEE-exact ops in identical order) is
    deterministic; the per-term score is e6-floored BEFORE the per-doc
    sum, so the aggregate is order-independent and cross-engine exact
    modulo ln()'s 1-ulp band.
    """
    docs = load_table(spark, sf_dir, "documents")
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"))
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok").isin(list(_BM25_TERMS)))
        .groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("dfv"))
    idf = F.log(
        ((F.col("n_docs") - F.col("dfv")).cast("double") + 0.5)
        / (F.col("dfv").cast("double") + 0.5) + 1.0)
    tfc = (
        (F.col("tf").cast("double") * (_K1 + 1.0))
        / (F.col("tf").cast("double")
           + _K1 * ((1.0 - _B)
                    + _B * (F.col("dl").cast("double") / F.col("avgdl"))))
    )
    term = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id",
                F.floor(idf * tfc * 1000000.0).cast("bigint").alias("s_e6"))
    )
    return term.groupBy("doc_id").agg(
        F.count("*").alias("n_hit_terms"),
        F.sum("s_e6").cast("bigint").alias("bm25_e6"),
    )


@register(
    "token_lift_pairs",
    """WITH t AS (SELECT str_split(text, ' ') AS toks FROM documents),
ix AS (SELECT toks, unnest(range(1, len(toks))) AS i FROM t
       WHERE len(toks) >= 2),
p AS (SELECT toks[CAST(i AS INT)] AS tok_a,
             toks[CAST(i + 1 AS INT)] AS tok_b FROM ix),
n AS (SELECT COUNT(*) AS n_pairs FROM p),
ab AS (SELECT tok_a, tok_b, COUNT(*) AS n_ab FROM p
       GROUP BY tok_a, tok_b),
a1 AS (SELECT tok_a, COUNT(*) AS n_a FROM p GROUP BY tok_a),
b2 AS (SELECT tok_b, COUNT(*) AS n_b FROM p GROUP BY tok_b),
l AS (SELECT ab.tok_a, ab.tok_b, ab.n_ab, a1.n_a, b2.n_b,
        CAST(CAST(1000000 AS HUGEINT) * ab.n_ab * n.n_pairs
             // (CAST(a1.n_a AS HUGEINT) * b2.n_b) AS BIGINT)
          AS lift_e6
      FROM ab JOIN a1 ON ab.tok_a = a1.tok_a
              JOIN b2 ON ab.tok_b = b2.tok_b, n
      WHERE ab.n_ab >= 5)
SELECT tok_a, tok_b, n_ab, n_a, n_b, lift_e6 FROM l
ORDER BY lift_e6 DESC, tok_a, tok_b LIMIT 50""",
    doc="directed token-association lift (the integer-exact monotone "
        "equivalent of PMI — log is a cross-engine libm hazard, the ratio "
        "is not): P(ab)/P(a·)P(·b) over adjacent pair slots, min support "
        "5, top 50. Three map-side-combined aggregations over one pair "
        "scan; the marginals are vocabulary-sized, so their joins "
        "broadcast at any corpus size.",
)
def q_token_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    t = docs.where(F.size(toks) >= 2).select(
        F.slice(toks, 1, F.size(toks) - 1).alias("a1"),
        F.slice(toks, 2, F.size(toks) - 1).alias("a2"))
    p = (t.select(F.explode(F.arrays_zip("a1", "a2")).alias("pr"))
         .select(F.col("pr.a1").alias("tok_a"),
                 F.col("pr.a2").alias("tok_b"))
         .persist())
    ab = p.groupBy("tok_a", "tok_b").agg(F.count("*").alias("n_ab"))
    a1 = p.groupBy("tok_a").agg(F.count("*").alias("n_a"))
    b2 = p.groupBy("tok_b").agg(F.count("*").alias("n_b"))
    n = p.groupBy().agg(F.count("*").alias("n_pairs"))
    out = (ab.where(F.col("n_ab") >= 5)
           .join(F.broadcast(a1), "tok_a")
           .join(F.broadcast(b2), "tok_b")
           .crossJoin(F.broadcast(n))
           .select("tok_a", "tok_b", "n_ab", "n_a", "n_b",
                   # widened to DECIMAL(38,0) (oracle: HUGEINT): the triple
                   # product overflows int64 once n_ab * n_pairs passes
                   # ~9.2e12 — exactly the corpus scale this module
                   # advertises; both engines floor-divide positives.
                   F.expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * n_ab"
                          " * n_pairs) DIV (CAST(n_a AS DECIMAL(38,0))"
                          " * n_b) AS BIGINT)").alias("lift_e6")))
    return (out.orderBy(F.col("lift_e6").desc(), "tok_a", "tok_b")
            .limit(50))


@register(
    "source_token_divergence",
    """WITH tok AS (
  SELECT source, unnest(str_split(text, ' ')) AS tok FROM documents
),
st AS (SELECT source, tok, COUNT(*) AS n_st FROM tok GROUP BY source, tok),
s_tot AS (SELECT source, CAST(SUM(n_st) AS BIGINT) AS t_s FROM st
          GROUP BY source),
ct AS (SELECT tok, CAST(SUM(n_st) AS BIGINT) AS n_t FROM st GROUP BY tok),
n AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n_total FROM ct),
cell AS (
  SELECT st.source,
         ABS(CAST(CAST(st.n_st AS HUGEINT) * 1000000 // s_tot.t_s AS BIGINT)
             - CAST(CAST(ct.n_t AS HUGEINT) * 1000000 // n.n_total
                    AS BIGINT)) AS d
  FROM st
  JOIN s_tot ON s_tot.source = st.source
  JOIN ct ON ct.tok = st.tok, n
)
SELECT source, CAST(SUM(d) AS BIGINT) AS l1_e6,
       COUNT(*) AS n_shared_tokens
FROM cell GROUP BY source""",
    doc="per-source distributional drift: L1 distance between each "
        "source's token distribution and the corpus distribution, in "
        "exact integer e6 shares (floor divisions on both engines) — the "
        "mixture-QA check that flags a source whose content has shifted "
        "from the blend. One (source, token) shuffle with map-side "
        "combine; the marginals are vocabulary-sized broadcasts. "
        "(Tokens absent from a source contribute via the shared-token "
        "cells only — consistent on both engines, and a monotone drift "
        "signal either way.)",
)
def q_source_token_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source",
                      F.explode(F.split("text", " ")).alias("tok"))
    st = tok.groupBy("source", "tok").agg(F.count("*").alias("n_st"))
    st = st.persist()
    s_tot = st.groupBy("source").agg(
        F.sum("n_st").cast("bigint").alias("t_s"))
    ct = st.groupBy("tok").agg(F.sum("n_st").cast("bigint").alias("n_t"))
    n = ct.agg(F.sum("n_t").cast("bigint").alias("n_total"))
    cell = (st.join(F.broadcast(s_tot), "source")
            .join(F.broadcast(ct), "tok")
            .crossJoin(F.broadcast(n))
            .select("source",
                    # DECIMAL(38,0) widening (oracle: HUGEINT): count*1e6
                    # overflows int64 past ~9.2e12 tokens per cell.
                    F.abs(F.expr("CAST(CAST(n_st AS DECIMAL(38,0))"
                                 " * 1000000 DIV t_s AS BIGINT)")
                          - F.expr("CAST(CAST(n_t AS DECIMAL(38,0))"
                                   " * 1000000 DIV n_total"
                                   " AS BIGINT)")).alias("d")))
    return (cell.groupBy("source")
            .agg(F.sum("d").cast("bigint").alias("l1_e6"),
                 F.count("*").alias("n_shared_tokens")))
