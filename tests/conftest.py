"""Shared fixtures: one SparkSession and one DuckDB oracle per test run."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from iceberg_datafusion_arrow_flight_spark import get_spark  # noqa: E402
from iceberg_datafusion_arrow_flight_spark.testing.oracle import _duck_conn  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]",
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir) -> duckdb.DuckDBPyConnection:
    con = _duck_conn(sf_dir)
    yield con
    con.close()
