"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``fide_crawler_spark/`` (see SURVEY.md §2 for
the operator inventory each query exercises).  The hash-family dedup
entries are oracled via the md5h bridge (dedup.md5h — bit-identical in
DuckDB).  The 3 entries without an oracle_sql are genuinely
non-SQL-expressible (the crawl pipeline, approximate IVF ANN, seed
search) and are checked by pytest sequential/planted/recall oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# importing the session module exports PYTHONPATH for Python workers
# (cloudpickled functions resolve by module name; the driver harness may
# run from any cwd) — must happen before any JVM launches
import fide_crawler_spark.session  # noqa: E402,F401

from fide_crawler_spark.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7 slice 0: G1 agg + F2 top-k latest) on
    /root/testdata/sf0.001."""
    return QUERIES["flagship_last3_days"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
