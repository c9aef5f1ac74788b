from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

SF_DIR = os.environ.get("CHERRY_SPARK_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from cherry_spark.session import get_spark

    s = get_spark("cherry_spark_tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle_con() -> duckdb.DuckDBPyConnection:
    from tools.verify_local import duckdb_connect

    return duckdb_connect(SF_DIR)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
