"""Differential tests: every registered query with an oracle is compared
against DuckDB on the same parquet (the driver's t2 check, run locally
at sf0.001 for speed). Queries without an oracle get a smoke run."""

from __future__ import annotations

import pytest

from hive_task_spark import registry
from tests.compare import assert_frames_match

registry.load_all()

ORACLE_NAMES = sorted(registry.ORACLES)
ROWS_ONLY_NAMES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(name, spark, oracle_con, sf_dir):
    spark_pdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = oracle_con.execute(registry.ORACLES[name]).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_smoke(name, spark, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    assert df.count() >= 0  # runs end-to-end with a stable schema
    assert len(df.schema.fields) > 0
