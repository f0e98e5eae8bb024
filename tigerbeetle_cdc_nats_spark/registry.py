"""Query registry: every implemented operator from SURVEY.md §2 as a
``(spark_fn, duckdb_oracle_sql)`` pair.

The driver runs each Spark query and its oracle side-by-side at sf=0.01 and
hash-compares values (order-insensitive, columns sorted by name), so:
- every computed column is aliased identically on both sides;
- output columns stick to BIGINT / DOUBLE / VARCHAR / DATE (no engine-specific
  types), with float arithmetic either pass-through or integer-exact.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(fn=fn, oracle=oracle, doc=doc)
        return fn
    return deco


def events_table(spark: SparkSession, sf_dir: str,
                 lo_ns: int | None = None,
                 hi_ns: int | None = None) -> DataFrame:
    """``events`` with ``ts`` normalized to BIGINT nanoseconds (µs precision)
    — see session.load_events. Optional ns cursor bounds are applied to the
    raw column first so the predicate pushes down to the parquet scan."""
    from tigerbeetle_cdc_nats_spark.session import load_events

    return load_events(spark, sf_dir, lo_ns=lo_ns, hi_ns=hi_ns)


# Importing the query modules populates REGISTRY.
def _load_all() -> None:
    for mod in ("queries_cdc", "queries_changelog", "queries_ivm",
                "queries_relational",
                "queries_dedup",
                "queries_text", "queries_quality",
                "queries_similarity", "queries_multimodal",
                "queries_scalar", "queries_pipeline", "queries_sketch_range",
                "queries_corpus"):
        __import__(f"tigerbeetle_cdc_nats_spark.{mod}")


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(REGISTRY)
