"""Local replica of the driver's DuckDB-oracle comparison (row count +
columns-sorted-by-name, order-insensitive value compare). Stricter than the
driver: exact value equality after canonical normalization."""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from tigerbeetle_cdc_nats_spark.session import TABLES, table_path


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize()) if v != 0 else "0"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _normalize(rows: list[dict]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    return sorted(
        (tuple(_norm(r[c]) for c in cols) for r in rows), key=repr
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    srows = [r.asDict(recursive=True) for r in spark_df.collect()]
    rel = con.sql(sql)
    dcols = [d[0] for d in rel.description]
    drows = [dict(zip(dcols, row)) for row in rel.fetchall()]
    if srows and drows:
        sc, dc = sorted(srows[0].keys()), sorted(drows[0].keys())
        if sc != dc:
            return False, f"column mismatch: spark={sc} duck={dc}"
    if len(srows) != len(drows):
        return False, f"row count mismatch: spark={len(srows)} duck={len(drows)}"
    a, b = _normalize(srows), _normalize(drows)
    if a != b:
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                return False, f"first diff at sorted row {i}:\n spark={x}\n duck ={y}"
        return False, "normalized mismatch"
    return True, f"ok ({len(srows)} rows)"
