"""Every (queries, oracle_sql) pair must match DuckDB — the same check
the driver runs at sf0.01 (CORRECTNESS gate)."""

from __future__ import annotations

import pytest

from fide_crawler_spark.queries import ORACLE, QUERIES
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    compare(spark, QUERIES[name], ORACLE[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_execute(spark, sf_dir, name):
    """Entries without an oracle still must run and be deterministic
    across two executions (the driver records a rows-only check)."""
    df1 = QUERIES[name](spark, sf_dir)
    df2 = QUERIES[name](spark, sf_dir)
    r1 = sorted(map(str, df1.collect()))
    r2 = sorted(map(str, df2.collect()))
    assert r1 == r2, f"{name} nondeterministic"


def test_q44_dataframe_twin_equals_sql_api(spark, sf_dir):
    """q44's spark.sql result alone only proves the two engines agree
    on one ANSI string; the operator evidence is that the DataFrame API
    builds the same result."""
    from fide_crawler_spark.queries import q44_dataframe_twin

    sql_rows = sorted(map(tuple, QUERIES["q44_sql_api"](spark, sf_dir).collect()))
    df_rows = sorted(map(tuple, q44_dataframe_twin(spark, sf_dir).collect()))
    assert sql_rows == df_rows
    assert QUERIES["q44_sql_api"](spark, sf_dir).columns == q44_dataframe_twin(
        spark, sf_dir
    ).columns
