"""Schema evolution policy for the event store.

The reference fails fast on STREAM config mismatch at provisioning
(sources/provision.py mirrors that contract); this module is the
TABLE-level analog for a long-lived parquet store whose writers evolve:

- **Additive evolution is legal**: new nullable columns appear in newer
  files; readers merge footers (``mergeSchema``) and old files surface
  NULLs for the added columns. This is the only evolution a 100 TB store
  can afford — rewriting history for a column add is off the table.
- **Everything else fails fast**: a column changing TYPE between file
  generations is a corruption risk Spark may silently paper over (or
  crash on mid-query, after hours of work); ``audit_schemas`` detects it
  from FOOTERS ONLY (pyarrow, no data read) so the check is O(files)
  metadata work, and ``read_evolved`` refuses to scan until the store is
  repaired.

At scale the audit runs over the file listing the driver already holds;
per-file footer reads parallelize trivially and touch no row groups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class SchemaEvolutionError(RuntimeError):
    """A non-additive schema change between file generations."""


def _footer_fields(path: str) -> dict[str, str]:
    import pyarrow.parquet as pq

    s = pq.read_schema(path)
    return {name: str(s.field(name).type) for name in s.names}


def audit_schemas(store_dir: str) -> dict[str, str]:
    """Union schema across every parquet footer under ``store_dir``.

    Returns the merged {column: type}. Raises
    :class:`SchemaEvolutionError` when any column appears with two
    different types — the non-additive change the store must reject.
    """
    merged: dict[str, str] = {}
    owner: dict[str, str] = {}
    for root, _dirs, files in os.walk(store_dir):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            path = os.path.join(root, f)
            for col, typ in _footer_fields(path).items():
                if col in merged and merged[col] != typ:
                    raise SchemaEvolutionError(
                        f"column {col!r} is {merged[col]} in "
                        f"{owner[col]} but {typ} in {path} — "
                        "non-additive evolution; repair before reading")
                merged.setdefault(col, typ)
                owner.setdefault(col, path)
    return merged


def read_evolved(spark: SparkSession, store_dir: str) -> DataFrame:
    """Scan a store with additive schema evolution: audit footers first
    (fail fast on type flips), then read with ``mergeSchema`` so files
    predating a column add surface NULLs for it."""
    audit_schemas(store_dir)
    return (spark.read.option("mergeSchema", "true")
            .parquet(store_dir))
