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


def test_every_query_is_oracle_backed():
    """r18 closed the last rows-only gap (hash_engine_specific grew a
    literal-boolean property oracle), so the registry carries ZERO
    oracle-less queries — pin that: a new rows-only registration must
    argue its way past this test, not silently weaken the driver's
    check to rows-only (the r16 red was exactly an unconfirmable op)."""
    assert ROWS_ONLY_NAMES == [], ROWS_ONLY_NAMES
