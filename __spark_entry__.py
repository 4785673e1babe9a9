"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``fide_crawler_spark/`` (see SURVEY.md §2 for
the operator inventory each query exercises).  The hash-family dedup
entries are oracled via the md5h bridge (dedup.md5h — bit-identical in
DuckDB); the IVF ANN entry (q32) unrolls its whole pipeline — md5
seeds, Lloyd rounds on the md5 hash-sample, argmax assignment, probe —
as one DuckDB CTE chain (queries._ivf_oracle_sql).  The 3 entries
without an oracle_sql are genuinely non-SQL-expressible (q35 crawl
pipeline, q47 seed search, q66 compression ratio whose zlib signal has
no SQL equivalent) and are checked by pytest sequential/planted/zlib
oracles instead.

``queries()`` returns the catalog in a deliberate order: the driver's
correctness harness records the first 50 entries, and the 84-entry
catalog is rotated round-to-round so every entry holds a driver row
(rounds 1-4 union: 69 entries).  Round 5's window = continuity anchors +
q69-q83 (the only never-driver-checked entries) + the veterans whose
newest rows are CORRECTNESS_r03 + the head of the catalog; the
rotated-out entries all hold green CORRECTNESS_r04 rows and keep their
local DuckDB-compare tests (tests/test_queries_oracle.py runs ALL
oracled pairs regardless of order).
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


# Continuity anchors: driver-green since round 1-3, kept inside the
# 50-entry window so every round's CORRECTNESS file shares a comparable
# core with the previous rounds'.
_ANCHORS = [
    "flagship_last3_days", "q1_pricing_summary", "q5_broadcast_join_revenue",
    "q9_window_dedup_keepfirst", "q29_minhash_lsh_candidates",
    "q31_embedding_neardup", "q45_player_profiles", "q48_asof_join",
]
# Round-4/5 additions: the only catalog entries with no driver row in
# any round (locally oracle-green; rounds 1-4 recorded the other 69).
_NEVER_CHECKED = [
    n for n in QUERIES
    if n[0] == "q" and n[1:3].isdigit() and 69 <= int(n[1:3]) <= 83
]
# Veterans rotated OUT of the round-4 window (their newest driver rows
# are CORRECTNESS_r03): back in-window this round for a fresh row, ahead
# of the q50-q68 block whose rows are the newer CORRECTNESS_r04.
_REFRESH = [
    n for n in QUERIES
    if n[0] == "q" and n[1:3].isdigit()
    and int(n[1:3]) in {27, 28, 30, *range(32, 45), 46, 47, 49}
]


def _ordered_names() -> list[str]:
    seen = set(_ANCHORS) | set(_NEVER_CHECKED) | set(_REFRESH)
    rest = [n for n in QUERIES if n not in seen]
    return _ANCHORS + _NEVER_CHECKED + _REFRESH + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {n: ORACLE[n] for n in _ordered_names() if n in ORACLE}
