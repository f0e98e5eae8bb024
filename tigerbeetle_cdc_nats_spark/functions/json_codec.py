"""Byte-exact CDC event JSON encoding (the reference's core projection).

Reference: encodeEventJSON at /root/reference/message.go:96-152. The output
contract is exact bytes — golden tests pin a 564-byte all-zero encoding and a
1425-byte all-max encoding (message_test.go:22,88), with fixed field order
and the portable-number rule (number <= 2^53-1, decimal string above).

Spark's ``to_json`` cannot express "number or string per value", so the JSON
is assembled with ``concat`` of literal fragments and per-field encodings —
still a single whole-stage-codegen'd expression, no UDF, no Python in the hot
path. The same field spec also generates the equivalent DuckDB SQL expression
so the driver's oracle produces identical strings.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from tigerbeetle_cdc_nats_spark.functions.portable import (
    portable_uint_json,
    portable_uint_json_str,
    portable_uint_sql,
)

# Field kinds: "p" portable uint (u128/u64), "n" plain JSON number (u32/u16),
# "s" JSON string (enum names — no escaping needed, values are [a-z_] only).
TRANSFER_SPEC = (
    ("id", "p"), ("amount", "p"), ("pending_id", "p"), ("user_data_128", "p"),
    ("user_data_64", "p"), ("user_data_32", "n"), ("timeout", "n"),
    ("code", "n"), ("flags", "n"), ("timestamp", "p"),
)  # message.go:43-54

ACCOUNT_SPEC = (
    ("id", "p"), ("debits_pending", "p"), ("debits_posted", "p"),
    ("credits_pending", "p"), ("credits_posted", "p"), ("user_data_128", "p"),
    ("user_data_64", "p"), ("user_data_32", "n"), ("code", "n"),
    ("flags", "n"), ("timestamp", "p"),
)  # message.go:56-68

ENVELOPE_SPEC = (
    ("timestamp", "p"), ("type", "s"), ("ledger", "n"),
)  # message.go:70-77 scalar head; then transfer/debit_account/credit_account


def _encode_field(kind: str, c: Column, from_strings: bool = False) -> Column:
    if kind == "p":
        return portable_uint_json_str(c) if from_strings else portable_uint_json(c)
    if kind == "n":
        if from_strings:
            return c
        return c.cast("decimal(38,0)").cast("string")
    return F.concat(F.lit('"'), c, F.lit('"'))


def _encode_field_sql(kind: str, expr: str) -> str:
    if kind == "p":
        return portable_uint_sql(expr)
    if kind == "n":
        return f"CAST({expr} AS VARCHAR)"
    return f"'\"' || {expr} || '\"'"


def json_object(items: list[tuple[str, Column]]) -> Column:
    """``{"k1":<v1>,"k2":<v2>,...}`` — values are pre-encoded JSON fragments."""
    parts: list[Column] = [F.lit("{")]
    for i, (key, val) in enumerate(items):
        if i:
            parts.append(F.lit(","))
        parts.append(F.lit(f'"{key}":'))
        parts.append(val)
    parts.append(F.lit("}"))
    return F.concat(*parts)


def json_object_sql(items: list[tuple[str, str]]) -> str:
    parts: list[str] = []
    for key, val in items:
        prefix = f"""'{"," if parts else "{"}"{key}":'"""
        parts.append(f"{prefix} || {val}")
    return "(" + " || ".join(parts) + " || '}')"


def encode_cdc_json(event: Column | str, *, from_strings: bool = False) -> Column:
    """Encode a struct column shaped like ``schemas.CDC_EVENT_SCHEMA`` to the
    reference's exact JSON bytes (message.go:96-152).

    ``from_strings=True`` treats every numeric field as a canonical-digit
    string — the lossless u128 path needed for the all-max golden
    (message_test.go:88); the decimal-typed path covers the realistic range.
    """
    ev = F.col(event) if isinstance(event, str) else event
    items = [(n, _encode_field(k, ev[n], from_strings)) for n, k in ENVELOPE_SPEC]
    for nested, spec in (("transfer", TRANSFER_SPEC),
                         ("debit_account", ACCOUNT_SPEC),
                         ("credit_account", ACCOUNT_SPEC)):
        inner = [(n, _encode_field(k, ev[nested][n], from_strings)) for n, k in spec]
        items.append((nested, json_object(inner)))
    return json_object(items)


def encode_cdc_json_sql(field_expr) -> str:
    """DuckDB SQL producing the identical JSON string. ``field_expr(path)``
    maps a field path like ``"transfer.id"`` to an integer (or, for
    ``"type"``, string) SQL expression."""
    items = [(n, _encode_field_sql(k, field_expr(n))) for n, k in ENVELOPE_SPEC]
    for nested, spec in (("transfer", TRANSFER_SPEC),
                         ("debit_account", ACCOUNT_SPEC),
                         ("credit_account", ACCOUNT_SPEC)):
        inner = [(n, _encode_field_sql(k, field_expr(f"{nested}.{n}"))) for n, k in spec]
        items.append((nested, json_object_sql(inner)))
    return json_object_sql(items)


def _encode_field_spark_sql(kind: str, expr: str) -> str:
    from tigerbeetle_cdc_nats_spark.functions.portable import (
        portable_uint_spark_sql,
    )

    if kind == "p":
        return portable_uint_spark_sql(expr)
    if kind == "n":
        return f"CAST(CAST({expr} AS DECIMAL(38,0)) AS STRING)"
    return f"concat('\"', {expr}, '\"')"


def encode_cdc_json_spark_expr(event_col: str) -> Column:
    """The full envelope encoding as ONE Spark-SQL expression string.

    Value-identical to ``encode_cdc_json(F.col(event_col))`` (same field
    order, same portable rule, same cast chain) but built as a single
    F.expr: the Column-object form assembles ~500 expression nodes through
    py4j — ~1 s of driver time per query at plan-build — while the string
    parses JVM-side. The golden byte tests pin both forms to the same
    output.
    """
    items = [
        (n, _encode_field_spark_sql(k, f"{event_col}.{n}"))
        for n, k in ENVELOPE_SPEC
    ]
    for nested, spec in (("transfer", TRANSFER_SPEC),
                         ("debit_account", ACCOUNT_SPEC),
                         ("credit_account", ACCOUNT_SPEC)):
        inner = [
            (n, _encode_field_spark_sql(k, f"{event_col}.{nested}.{n}"))
            for n, k in spec
        ]
        items.append((nested, json_object_sql(inner)))
    return F.expr(json_object_sql(items))
