"""Physical-plan inspection helpers.

The reference gets its performance from hand-tuned tactics (SURVEY.md §4);
here the equivalent guarantees come from Catalyst — but only if the plan
actually contains them. These helpers make plan properties ASSERTABLE so
"the dim is broadcast" and "the filter reached the scan" are regression
tests, not hopes (see tests/test_plans.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan string (same text as ``df.explain(mode)``)."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def count_occurrences(df: DataFrame, needle: str) -> int:
    return physical_plan(df).count(needle)


def count_nodes(df: DataFrame, node: str) -> int:
    """Count physical nodes by their detail headers ``(N) <node>`` — each
    node appears exactly once there regardless of tree rendering."""
    return len(re.findall(rf"\(\d+\) {re.escape(node)}\b", physical_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    plan = physical_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out
