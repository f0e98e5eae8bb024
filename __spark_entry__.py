"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 with its
DuckDB oracle. Implementation lives in ``tigerbeetle_cdc_nats_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tigerbeetle_cdc_nats_spark import registry  # noqa: E402
from tigerbeetle_cdc_nats_spark.session import configure  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: one CDC incremental poll (scan + filter + order +
    limit) on sf0.001 — SURVEY.md §7's minimum end-to-end slice."""
    configure(spark)
    qs = registry.all_queries()
    return qs["cdc_incremental_scan"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, q in registry.all_queries().items():
        def run(spark: SparkSession, sf_dir: str, _q=q) -> DataFrame:
            configure(spark)
            return _q.fn(spark, sf_dir)
        out[name] = run
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys without SQL get a rows-only
    check (non-SQL-expressible ops)."""
    return {
        name: q.oracle
        for name, q in registry.all_queries().items()
        if q.oracle is not None
    }
