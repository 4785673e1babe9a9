"""Physical-plan inspection helpers.

Used by tests to assert the plans we *want* — filters pushed into the
parquet scan, pruned read schemas, broadcast joins where a side is a
dim table, whole-stage codegen in the hot path — not merely plans that
produce the right rows.  (The reference has no planner at all;
SURVEY.md §4 maps which techniques Catalyst gives us for free and which
this repo hand-builds.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan advertises a pushed filter mentioning
    ``fragment`` (shows up as PushedFilters: [...])."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """The column sets actually read from each parquet scan
    (ReadSchema) — pruning evidence."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema"):
            cols = line.split("struct<", 1)[-1].rstrip(">").split(",")
            out.append([c.split(":")[0] for c in cols if c])
    return out


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (each operator
    appears once in the tree and once in the numbered detail section —
    count only the detail headers)."""
    import re

    return sum(
        1
        for line in formatted_plan(df).splitlines()
        if re.match(r"^\(\d+\) Exchange", line.strip())
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Distinct WholeStageCodegen stages in the EXECUTED plan (runs the
    query): AQE only finalizes codegen per query stage at runtime, so
    the pre-execution plans show none.  Stages appear as ``*(N)``
    markers."""
    import re

    df.collect()
    ex = df._jdf.queryExecution().executedPlan().toString()
    return len(set(re.findall(r"\*\((\d+)\)", ex)))
