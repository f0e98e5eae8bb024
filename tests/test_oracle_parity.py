"""Every registered query must match its DuckDB oracle at sf0.001 (the
driver does the same at sf0.01 — keep this green and that gate stays green).
"""

from __future__ import annotations

import pytest

from tigerbeetle_cdc_nats_spark import registry
from tests.parity import compare, duck_connection

QUERIES = registry.all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = QUERIES[name]
    ok, msg = compare(q.fn(spark, sf_dir), duck, q.oracle)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize(
    "name", sorted(n for n, q in QUERIES.items() if not q.oracle)
)
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name].fn(spark, sf_dir)
    assert df.count() >= 0
