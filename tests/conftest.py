"""Shared fixtures: one local SparkSession + a DuckDB oracle connection
with the test tables registered as views (mirrors the driver harness)."""

from __future__ import annotations

import os

import duckdb
import pytest

from hive_task_spark.plans.session import get_session
from hive_task_spark.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="hive_task_spark_tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
