"""PII detection / redaction over a text column — the scrubbing gate every
training-data pipeline runs before anything else sees the corpus.

Pure JVM-side regexp expressions (``regexp_count`` / ``regexp_replace``):
zero shuffle, whole-stage codegen, linear in bytes scanned — the ideal
100 TB shape (the scan cost IS the operator cost). Patterns are restricted
to the regex subset with identical semantics in Java regex (Spark) and RE2
(DuckDB): character classes, bounded repetition, alternation, ``\\b`` ASCII
word boundaries — no lookarounds, no backreferences.

The driver's synthetic corpus is digit-free, so the registered queries
plant deterministic PII footers (doc_id-derived emails / IPv4s / phone
numbers) before scanning — the standard way to exercise a detector against
a sanitized corpus; the operator itself takes any text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: pattern name -> (regex, redaction token). Kept in detection order; the
#: redactor applies them in this order so counts and replacements agree.
PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+\d{2} \d{3} \d{4}", "[PHONE]"),
    ("id_number", r"\b\d{9}\b", "[ID]"),
)


def pii_counts(col: str | Column) -> list[Column]:
    """Per-pattern non-overlapping match counts (one column per pattern)."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        F.regexp_count(c, F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, pat, _tok in PATTERNS
    ]


def redact(col: str | Column) -> Column:
    """Replace every PII match with its class token, in PATTERNS order."""
    c = F.col(col) if isinstance(col, str) else col
    for _name, pat, tok in PATTERNS:
        c = F.regexp_replace(c, pat, tok)
    return c


def duck_count(name: str, text_expr: str = "text") -> str:
    """DuckDB-side count for one pattern (RE2; 'g'-flag free counting)."""
    pat = dict((n, p) for n, p, _t in PATTERNS)[name]
    lit = pat.replace("'", "''")
    return f"len(regexp_extract_all({text_expr}, '{lit}'))"


def duck_redact(text_expr: str = "text") -> str:
    """DuckDB-side redaction expression mirroring :func:`redact`.

    DuckDB's ``regexp_replace`` replaces only the first match by default —
    the 'g' flag makes it global, matching Spark's replace-all.
    """
    expr = text_expr
    for _name, pat, tok in PATTERNS:
        lit = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{lit}', '{tok}', 'g')"
    return expr


def scan_summary(df: DataFrame, text_col: str, group_col: str) -> DataFrame:
    """Per-group PII audit: doc counts, affected docs, per-class totals."""
    counted = df.select(group_col, *pii_counts(text_col))
    any_pii = sum(F.col(f"n_{name}") for name, _p, _t in PATTERNS)
    counted = counted.withColumn("_hit", (any_pii > 0).cast("bigint"))
    aggs = [F.count("*").alias("n_docs"),
            F.sum("_hit").alias("docs_with_pii")]
    aggs += [F.sum(f"n_{name}").alias(f"n_{name}")
             for name, _p, _t in PATTERNS]
    return counted.groupBy(group_col).agg(*aggs)
