"""Export surfaces: worksheet-shaped CSV sink, SQLite .db artifact,
JSON config scan.

These are the Spark-first forms of the reference's three presentation/
export paths:

* Google Sheets export (``old_scripts/fide-games-scraper-public.py:173-184``
  — gspread ``worksheet.clear()`` + ``set_with_dataframe``): the SaaS
  client is out of scope, but the data plane — "one named worksheet per
  key, header row + value rows, overwritten on re-run" — is
  ``worksheet_export``: a partitioned, headered CSV layout any sheet
  uploader (or spreadsheet app) consumes directly.  Fully distributed:
  one shuffle by sheet key, each sheet written by the executor that
  owns it, deterministic in-sheet row order.
* DB file export (``ui/streamlit_ui.py:379-394`` — the download button
  streaming fide_data.db): ``sqlite_export`` materializes bounded
  result tables into one SQLite file.  Driver-side by design — a .db
  FILE is a single-machine artifact; the guard refuses unbounded
  tables (at scale you export parquet/Iceberg and hand aggregates,
  not facts, to SQLite).
* JSON config scan (``localization/localization.py:3-8`` —
  ``json.load`` of the {lang: {key: text}} localization map):
  ``load_localization`` reads the same shape via ``spark.read.json``
  and melts the nested struct into (lang, key, text) rows with a
  generated ``stack`` — config joins (e.g. localized labels onto a
  result table) then happen as broadcast joins instead of driver dict
  lookups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def worksheet_export(
    df: DataFrame,
    out_dir: str,
    sheet_col: str,
    order_by: list[str] | None = None,
) -> None:
    """One worksheet (single headered CSV file) per distinct value of
    ``sheet_col`` under ``out_dir/<sheet_col>=<value>/``; re-running
    overwrites (the reference's ``clear()`` + rewrite).  Rows within a
    sheet are ordered by ``order_by`` (default: all non-sheet columns)
    so re-runs are byte-identical at any parallelism."""
    order = order_by or [c for c in df.columns if c != sheet_col]
    (
        df.repartition(F.col(sheet_col))
        .sortWithinPartitions(sheet_col, *order)
        .write.mode("overwrite")
        .partitionBy(sheet_col)
        .option("header", True)
        .csv(out_dir)
    )


def sqlite_export(
    tables: dict[str, DataFrame],
    path: str,
    max_rows_per_table: int = 100_000,
) -> dict[str, int]:
    """Write bounded tables into one SQLite .db file; returns
    {table: n_rows}.  Refuses tables over ``max_rows_per_table`` —
    the sanctioned driver-side collect is for RESULT tables (the
    reference's whole fide_data.db is a few hundred rows), never facts.
    Types: int→INTEGER, float→REAL, everything else TEXT (SQLite's own
    affinity model); nested values (array/map/struct — Python
    list/dict/Row) are JSON-encoded into their TEXT column; None passes
    through as NULL.

    Atomicity: writes to ``<path>.tmp`` and renames into place only
    after every table committed — a failure mid-export (including the
    max_rows guard firing on a later table) never leaves a partial .db
    at the target path."""
    import json
    import sqlite3

    from pyspark.sql import Row

    def jsonable(v):
        # Rows nest arbitrarily deep (array<struct>, map<string,struct>)
        if isinstance(v, Row):
            return {k: jsonable(x) for k, x in v.asDict().items()}
        if isinstance(v, dict):
            return {k: jsonable(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [jsonable(x) for x in v]
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        return v

    def encode(v):
        if isinstance(v, (Row, list, tuple, dict)):
            return json.dumps(jsonable(v), sort_keys=True)
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        return v

    counts: dict[str, int] = {}
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    try:
        # contextlib.closing: sqlite3's own context manager only scopes
        # the transaction, never closes the handle — the file must be
        # closed BEFORE os.replace for the atomic-rename story to hold
        # off-POSIX (ADVICE r5)
        import contextlib

        with contextlib.closing(sqlite3.connect(tmp)) as con, con:
            for name, df in tables.items():
                # limit+1 probe: counts the guard without a full count()
                rows = df.limit(max_rows_per_table + 1).collect()
                if len(rows) > max_rows_per_table:
                    raise ValueError(
                        f"table {name!r} exceeds max_rows_per_table="
                        f"{max_rows_per_table}; export facts as parquet, "
                        "not SQLite"
                    )
                cols = df.columns

                def sql_type(dt: str) -> str:
                    if dt in ("int", "bigint", "smallint", "tinyint"):
                        return "INTEGER"
                    if dt in ("double", "float"):
                        return "REAL"
                    return "TEXT"

                decl = ", ".join(
                    f'"{c}" {sql_type(t)}' for c, t in df.dtypes
                )
                con.execute(f'CREATE TABLE "{name}" ({decl})')
                ph = ", ".join("?" * len(cols))
                con.executemany(
                    f'INSERT INTO "{name}" VALUES ({ph})',
                    [tuple(encode(r[c]) for c in cols) for r in rows],
                )
                counts[name] = len(rows)
            con.commit()
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return counts


def load_localization(spark: SparkSession, path: str) -> DataFrame:
    """localization.json ({lang: {key: text}}) → (lang, key, text)
    rows.  Two-level melt: ``spark.read.json`` infers a struct per
    language, each melted with a generated ``stack`` over its fields.
    The result is broadcast-join-ready (the reference instead returns a
    driver dict per language, localization.py:3-8)."""
    raw = spark.read.option("multiLine", True).json(path)
    langs = raw.schema.fieldNames()
    parts = []
    for lang in langs:
        keys = [f.name for f in raw.schema[lang].dataType.fields]
        stack_args = ", ".join(f"'{k}', `{lang}`.`{k}`" for k in keys)
        parts.append(
            raw.select(
                F.lit(lang).alias("lang"),
                F.expr(f"stack({len(keys)}, {stack_args}) AS (key, text)"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
