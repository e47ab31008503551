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

# True registration order, UNAFFECTED by _apply_window's reorder of
# QUERIES. The r12+ reconfirm rule (CLAUDE.md) tie-breaks stalest
# names by registration order — tools/sampled_rounds.py reads this
# list, because iterating QUERIES after load_all yields the curated
# AUDIT_WINDOW first, not the order operators were registered in.
REGISTRATION_ORDER: list[str] = []

# Late additions to modules inside the audit window register with
# defer=True: they queue here and flush AFTER every module has
# registered, so the curated first-50 window (see load_all) is a
# stable function of the rotation plan, not of which file a new
# operator happens to live in.
_DEFERRED: list[tuple[str, QueryFn, str | None]] = []

# The external audit samples the FIRST 50 queries in registration
# order.  Rather than deriving that window from module import order
# (fragile — adding one operator to an early module silently evicts
# the 50th name), the window is an explicit curated list: load_all
# reorders QUERIES so these names come first, in this order, and
# everything else follows in plain registration order.  The rotation
# schedule lives in CLAUDE.md; this is round 11's row: the sql
# remainder (11) + all 18 never-sampled stream (incl. the r8-new
# rocksdb/state-metadata readers and the r10-new Python streaming
# sink) + all 12 never-sampled quality + window (4) + date (4) + the
# oldest never-sampled multimodal (1) — pool at r11 start = 78
# never-sampled of 562, recomputed from the CORRECTNESS_r1–r10
# union (matches VERDICT r10's recompute).  Round 10's window (agg
# rest 9 + source oldest 20 + text 17 + sql oldest 4) came back
# 50/50 green; cumulative driver-confirmed = 484/562.
AUDIT_WINDOW: tuple[str, ...] = (
    # -- sql: the 11 remaining never-sampled --
    "sql_identifier_template",
    "sql_execute_immediate",
    "sql_session_variables",
    "sql_masked_view",
    "sql_distribute_cluster_by",
    "sql_pipe_syntax",
    "sql_keyset_pagination",
    "sql_join_hints_shuffle_hash",
    "sql_values_inline_dimension",
    "sql_order_by_all",
    "sql_scripting_block",
    # -- stream: all 18 never-sampled --
    "stream_observe_progress",
    "stream_windowed_percentiles",
    "stream_session_window_dynamic_gap",
    "stream_rocksdb_statestore",
    "stream_state_metadata_reader",
    "stream_zscore_static",
    "stream_multibatch_agg",
    "stream_late_drop_proof",
    "stream_file_sink_roundtrip",
    "stream_statestore_inspect",
    "stream_chained_windows",
    "stream_outer_join_watermark",
    "stream_dedup_within_watermark",
    "stream_upsert_sink",
    "stream_lambda_backfill_union",
    "stream_update_mode_progression",
    "stream_python_datasource",
    "stream_python_datasource_sink",
    # -- quality: all 12 never-sampled --
    "quality_join_cardinality_audit",
    "quality_l_diversity_audit",
    "quality_freshness_lag",
    "quality_key_multiplicity",
    "quality_nchars_consistency",
    "quality_rare_levels",
    "quality_rowcount_reconciliation",
    "quality_functional_dependency_discovery",
    "quality_observe_metrics",
    "quality_t_closeness_audit",
    "quality_ece_calibration",
    "quality_order_total_reconciliation",
    # -- window: all 4 never-sampled --
    "window_running_sum_reset",
    "window_rolling_features",
    "window_rolling_median",
    "window_rolling_corr",
    # -- date: all 4 never-sampled --
    "date_calendar_spine",
    "date_fiscal_calendar",
    "date_business_days_between",
    "date_iso_week_rollup",
    # -- multimodal: the oldest never-sampled (of 3; other 2 -> r12) --
    "multimodal_scene_cuts",
)


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
        REGISTRATION_ORDER.append(name)
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
        REGISTRATION_ORDER.append(name)
        if oracle is not None:
            ORACLES[name] = oracle


def _apply_window() -> None:
    """Reorder QUERIES so AUDIT_WINDOW names come first (idempotent).

    Names in the window that aren't registered raise — the curated
    window must never silently shrink below 50.
    """
    missing = [n for n in AUDIT_WINDOW if n not in QUERIES]
    if missing:
        raise ValueError(f"AUDIT_WINDOW names not registered: {missing}")
    ordered = {n: QUERIES[n] for n in AUDIT_WINDOW}
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    QUERIES.clear()
    QUERIES.update(ordered)


def load_all() -> None:
    """Import every module that registers queries (idempotent).

    External audits sample the FIRST 50 queries in registration order.
    Since round 4 the window is the explicit AUDIT_WINDOW list above —
    _apply_window reorders QUERIES after all modules register, so the
    window is independent of module import order.  The round-by-round
    rotation schedule lives in CLAUDE.md.
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
    _apply_window()
