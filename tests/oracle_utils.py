"""Local stand-in for the driver's DuckDB oracle comparison.

Runs a Spark query and its oracle SQL over the same parquet, then
compares row count + canonicalized value multisets (columns sorted by
name, values normalized).  Stricter than needed so that passing here
implies passing the driver's order-insensitive value-hash.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb

from fide_crawler_spark.queries import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        # no normalize(): the driver's pandas hash sees engine-specific
        # Decimal representations, so a Decimal output column is a bug
        # (queries must cast final DECIMALs to DOUBLE) — keep the raw
        # string so scale mismatches fail here first.
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"f:{v!r}"
    if isinstance(v, datetime.datetime):
        return f"ts:{v.replace(tzinfo=None).isoformat()}"
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    if isinstance(v, (int,)):
        return f"i:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return f"s:{v}"


def canonical_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark, query_fn, sql: str, sf_dir: str) -> None:
    sdf = query_fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connect(sf_dir)
    try:
        cur = con.execute(sql)
        duck_cols = [d[0] for d in cur.description]
        duck_rows = cur.fetchall()
    finally:
        con.close()

    assert sorted(c.lower() for c in spark_cols) == sorted(
        c.lower() for c in duck_cols
    ), f"column mismatch: spark={spark_cols} duck={duck_cols}"
    assert len(spark_rows) == len(duck_rows), (
        f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    a = canonical_rows([c.lower() for c in spark_cols], spark_rows)
    b = canonical_rows([c.lower() for c in duck_cols], duck_rows)
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:5]
        diff_b = [r for r in b if r not in set(a)][:5]
        raise AssertionError(
            f"value mismatch\n spark-only: {diff_a}\n duck-only: {diff_b}"
        )
