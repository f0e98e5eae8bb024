"""Portable JSON number encoding.

Reference semantics (/root/reference/message.go:12-41): unsigned integers
serialize as bare JSON numbers when <= 2^53-1 (exactly representable in an
IEEE double, so any JSON consumer round-trips them losslessly) and as decimal
*strings* above that. This is a per-VALUE decision, so the output column is
a JSON-literal STRING fragment, not a typed numeric column — the typed schema
keeps the numeric column; encoding happens only at JSON assembly time
(SURVEY.md §7 "portable-number typing").

Implemented as pure Column expressions (whole-stage codegen, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: 2^53 - 1 (message.go:12)
MAX_PORTABLE_JSON_INT = 9007199254740991


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def portable_uint_json(c: Column | str) -> Column:
    """JSON literal for an unsigned integer column (long or decimal):
    ``123`` when value <= 2^53-1, ``"123"`` above. NULL -> JSON ``null``.
    """
    c = _col(c)
    digits = c.cast("decimal(38,0)").cast("string")
    return (
        F.when(c.isNull(), F.lit("null"))
        .when(c > F.lit(MAX_PORTABLE_JSON_INT), F.concat(F.lit('"'), digits, F.lit('"')))
        .otherwise(digits)
    )


def portable_uint_json_str(c: Column | str) -> Column:
    """Portable encoding for a canonical-digit-STRING column (the lossless
    u128 path — DecimalType(38,0) cannot hold the full 39-digit u128 range,
    so encoding parity for extreme values flows through strings;
    SURVEY.md §7 "u128 fidelity").

    Branch on digit count: 2^53-1 has 16 digits, so >16 digits is always
    above threshold, <16 always below, and ==16 fits a long for an exact
    compare.
    """
    c = _col(c)
    quoted = F.concat(F.lit('"'), c, F.lit('"'))
    return (
        F.when(c.isNull(), F.lit("null"))
        .when(F.length(c) > 16, quoted)
        .when((F.length(c) == 16) & (c.cast("long") > F.lit(MAX_PORTABLE_JSON_INT)),
              quoted)
        .otherwise(c)
    )


def portable_uint_sql(expr: str) -> str:
    """The same encoding as ANSI/DuckDB SQL text, for oracle parity.

    ``expr`` must be an integer-typed SQL expression (BIGINT/HUGEINT).
    """
    return (
        f"CASE WHEN {expr} IS NULL THEN 'null' "
        f"WHEN {expr} > 9007199254740991 THEN '\"' || CAST({expr} AS VARCHAR) || '\"' "
        f"ELSE CAST({expr} AS VARCHAR) END"
    )


def portable_uint_spark_sql(expr: str) -> str:
    """The portable encoding as SPARK SQL text — the same values as
    :func:`portable_uint_json`, emitted as one parseable string so the
    full-envelope encoder can hand Catalyst a single F.expr instead of
    hundreds of py4j-built Column nodes (~1 s of driver time per query).
    """
    digits = f"CAST(CAST({expr} AS DECIMAL(38,0)) AS STRING)"
    return (
        f"CASE WHEN {expr} IS NULL THEN 'null' "
        f"WHEN {expr} > {MAX_PORTABLE_JSON_INT} "
        f"THEN concat('\"', {digits}, '\"') "
        f"ELSE {digits} END"
    )
