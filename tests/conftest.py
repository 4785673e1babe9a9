from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fide_crawler_spark.session import get_spark  # noqa: E402

TEST_CPUS = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fide_crawler_spark_tests", cores=TEST_CPUS)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
