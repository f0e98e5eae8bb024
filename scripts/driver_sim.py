#!/usr/bin/env python
"""Simulate the driver's correctness gate: load __spark_entry__ by path with
a bare SparkSession, run every queries()[name] vs oracle_sql()[name] through
DuckDB at the given SF dir (default sf0.01). Usage:

    python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[16]").appName("driver-sim")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    # Codegen gate: fail loudly on a janino compile blowup instead of
    # silently running the stage interpreted (round-4 judge finding #1).
    spark.conf.set("spark.sql.codegen.fallback", "false")

    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    entry_rows = mod.entry(spark).count()
    print(f"entry(): {entry_rows} rows")

    qs, oracles = mod.queries(), mod.oracle_sql()
    fails = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        sdf = fn(spark, sf)
        srows = sorted((tuple(norm(r[c]) for c in sorted(sdf.columns))
                        for r in sdf.collect()), key=repr)
        if name in oracles:
            rel = con.sql(oracles[name])
            cols = [d[0] for d in rel.description]
            drows = sorted((tuple(norm(dict(zip(cols, row))[c])
                                  for c in sorted(cols))
                            for row in rel.fetchall()), key=repr)
            ok = srows == drows
            print(f"{'OK  ' if ok else 'FAIL'} {name}: {len(srows)} rows")
            if not ok:
                fails.append(name)
                for i, (a, b) in enumerate(zip(srows, drows)):
                    if a != b:
                        print(f"  first diff row {i}:\n   spark={a}\n   duck ={b}")
                        break
                if len(srows) != len(drows):
                    print(f"  row counts: spark={len(srows)} duck={len(drows)}")
        else:
            print(f"ROWS {name}: {len(srows)} rows (no oracle)")
    print("FAILS:", fails)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
