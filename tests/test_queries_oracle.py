"""Every (queries, oracle_sql) pair must match DuckDB — the same check
the driver runs at sf0.01 (CORRECTNESS gate)."""

from __future__ import annotations

import pytest

from fide_crawler_spark.queries import ORACLE, QUERIES
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, sf_dir, name):
    compare(spark, QUERIES[name], ORACLE[name], sf_dir)


def test_all_queries_return_rows(spark, sf_dir):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
