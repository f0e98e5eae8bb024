#!/usr/bin/env python
"""Audit Spark-vs-DuckDB output dtypes for every oracle-checked query.

The driver's correctness gate compares schemas as well as values; this
catches silent divergences (32-bit ranks, HUGEINT sum widening) before the
driver does. Exit 1 on any mismatch. Usage: python scripts/schema_audit.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Allowed (spark, duckdb) dtype pairs.
OK_PAIRS = {
    ("bigint", "BIGINT"), ("double", "DOUBLE"), ("string", "VARCHAR"),
    ("date", "DATE"), ("int", "INTEGER"),
}

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> int:
    import duckdb

    from tigerbeetle_cdc_nats_spark import registry
    from tigerbeetle_cdc_nats_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("schema-audit", shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    bad = 0
    for name, q in sorted(registry.all_queries().items()):
        df = q.fn(spark, sf)
        stypes = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        if not q.oracle:
            continue
        rel = con.sql(q.oracle)
        dtypes = dict(zip([d[0] for d in rel.description],
                          [str(t) for t in rel.types]))
        for col, st in stypes.items():
            dt = dtypes.get(col, "MISSING")
            if (st, dt) not in OK_PAIRS:
                print(f"{name}.{col}: spark={st} duck={dt}")
                bad += 1
    print(f"mismatches: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
