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
# schedule lives in CLAUDE.md; this is round 12's row — the rotation
# CLOSE-OUT: the full 30-name never-sampled pool (recomputed from the
# CORRECTNESS_r1–r11 union by tools/sampled_rounds.py — matches both
# CLAUDE.md's precompute and VERDICT r11's recompute exactly) + the
# 20 stalest-signal reconfirm names (max_round=1, registration-order
# tie-break, per the r12+ stalest rule).  Round 11's window (sql 11 +
# stream 18 + quality 12 + window 4 + date 4 + multimodal 1) came
# back 50/50 green; cumulative driver-confirmed = 534/564.  A green
# CORRECTNESS_r12 makes every registered query driver-confirmed at
# least once.
AUDIT_WINDOW: tuple[str, ...] = (
    # -- the 30-name never-sampled pool, registration order --
    "relational_transpose",
    "multimodal_vad_segments",
    "multimodal_patch_grid_plan",
    "join_temporal_pointintime",
    "join_broadcast_nested_loop",
    "join_runtime_bloom_filter",
    "join_lateral_dataframe",
    "dedup_winnowing_pairs",
    "geo_dbscan_grid",
    "geo_geohash_encode",
    "geo_point_in_polygon",
    "map_merge_aggregate",
    "math_hyperbolic_suite",
    "math_logsumexp_grouped",
    "str_split_part_suite",
    "str_printf_suite",
    "udf_arrow_optimized_python",
    "udtf_table_partition_arg",
    "udf_grouped_ols_fit",
    "udf_arrow_python_scalar",
    "udf_arrow_native_scalar",
    "merge_upsert_apply",
    "merge_mirror_sync_apply",
    "relational_pandas_api_pipeline",
    "setop_union_schema_evolution",
    "asof_join_nearest",
    "source_python_datasource_pushdown",
    "source_python_datasource_writer",
    "source_python_datasource_arrow_writer",
    "agg_theta_sketch_setops",
    # -- 20 stalest reconfirm (all last sampled r1), registration order --
    "array_explode_tokens",
    "array_posexplode",
    "array_set_algebra",
    "array_explode_outer",
    "analytics_resample_locf",
    "agg_stats_suite",
    "agg_count_distinct",
    "agg_median_exact",
    "agg_rollup",
    "agg_cube",
    "agg_filtered_conditional",
    "agg_having",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_unpivot_stack",
    "agg_percentile_grouped",
    "agg_corr_regression",
    "map_create_lookup",
    "map_explode_entries",
    "map_from_entries_roundtrip",
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
