from __future__ import annotations

import os

import duckdb
import pytest

from flink_streaming_example_spark.session import get_spark
from flink_streaming_example_spark.testing import register_duckdb_views

# The driver's correctness gate runs at sf0.01; default tests to the same
# scale so a green suite is a faithful preview.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("flink-streaming-example-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    register_duckdb_views(con, SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
