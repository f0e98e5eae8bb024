"""Regression: date-bearing columns must tolerate the generator shipping
either TIMESTAMP(MICROS) (current) or DATE32 (classic TPC-H) — the query
surface compares against timestamp literals, which Spark coerces for both
physical types."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from tigerbeetle_cdc_nats_spark import registry

SRC_DIR = "/root/testdata/sf0.001"
QUERIES = registry.all_queries()


@pytest.fixture(scope="module")
def date32_dir(tmp_path_factory):
    """sf0.001 lineitem/orders with every timestamp column downcast to
    date32 (the values are date-precision already)."""
    d = tmp_path_factory.mktemp("date32")
    for name, cols in (("lineitem", ["l_shipdate"]),
                       ("orders", ["o_orderdate"])):
        t = pq.read_table(os.path.join(SRC_DIR, f"{name}.parquet"))
        for col in cols:
            i = t.schema.get_field_index(col)
            if pa.types.is_timestamp(t.column(col).type):
                t = t.set_column(i, col, pc.cast(t.column(col), pa.date32()))
        pq.write_table(t, os.path.join(d, f"{name}.parquet"))
    return str(d)


def test_q6_identical_on_date32(spark, date32_dir):
    a = QUERIES["q6_forecast_revenue"].fn(spark, SRC_DIR).collect()
    b = QUERIES["q6_forecast_revenue"].fn(spark, date32_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_q4_runs_on_date32(spark, date32_dir):
    # q4 touches both orders and lineitem date columns (join + date output)
    a = QUERIES["q4_order_priority"].fn(spark, SRC_DIR).collect()
    b = QUERIES["q4_order_priority"].fn(spark, date32_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
