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

# Late additions to modules inside the audit window register with
# defer=True: they queue here and flush AFTER every module has
# registered, so the curated first-50 window (see load_all) is a
# stable function of the rotation plan, not of which file a new
# operator happens to live in.
_DEFERRED: list[tuple[str, QueryFn, str | None]] = []


def register(
    name: str, oracle: str | None = None, defer: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Register a named query and (optionally) its DuckDB oracle SQL.

    defer=True postpones the registration to the end of load_all —
    REQUIRED for new operators added to modules that feed the first-50
    audit window (relational/windows/setops/asof/sources/streaming/
    similarity in round 3), so they don't silently displace the
    families the current rotation promised driver signal to.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if defer:
            _DEFERRED.append((name, fn, oracle))
            return fn
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _flush_deferred() -> None:
    while _DEFERRED:
        name, fn, oracle = _DEFERRED.pop(0)
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle


def load_all() -> None:
    """Import every module that registers queries (idempotent).

    ORDER MATTERS: external audits sample the FIRST 50 queries in
    registration order, and the window rotates every round so each
    family eventually gets audit signal (CLAUDE.md).

    Round-3 window (exactly 50, all with zero prior audit signal):
    relational(9) + windows(7) + setops(6) + asof(4) + sources(7) +
    streaming(10) + similarity(7). Rounds 1-2 confirmed TPC-H
    workloads/subqueries, joins, dedup, most of pipeline/aggregates,
    and the scalar-function suites; round 4 should rotate in text,
    quality, multimodal, analytics, and the function suites that were
    red in round 1 (arrays/maps/json/math/strings) for re-confirmation.
    """
    # Imports are inside the function so `import hive_task_spark` stays
    # cheap and circular-import-free; modules self-register on import.
    from hive_task_spark.operators import (  # noqa: F401
        relational,
        windows,
        setops,
        asof,
    )
    from hive_task_spark.sources import readers  # noqa: F401
    from hive_task_spark.streaming import stream_queries  # noqa: F401
    from hive_task_spark.operators import (  # noqa: F401
        similarity,
        # ---- end of the 50-query audit window ----
        text,
        quality,
        multimodal,
        analytics,
        pipeline,
        aggregates,
        workloads,
        subqueries,
        joins,
        dedup,
        geo,
    )
    from hive_task_spark.functions import (  # noqa: F401
        arrays,
        maps,
        json_fns,
        math_fns,
        strings,
        dates,
        hashes,
        udfs,
    )

    _flush_deferred()
