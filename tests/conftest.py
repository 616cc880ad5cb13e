from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from api_weather_kafka_clickhouse_spark.session import get_spark  # noqa: E402

# Small-but-nontrivial SF for oracle parity in tests; the driver runs
# sf0.01 itself. Override: SPARK_GRAFT_TEST_SF_DIR.
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return TEST_SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    from api_weather_kafka_clickhouse_spark.oracle import duckdb_connection

    con = duckdb_connection(sf_dir)
    yield con
    con.close()
