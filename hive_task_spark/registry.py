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
    # -- r13 window: 3 never-sampled r12 additions first (new-op rule) --
    "agg_approx_top_k_partial_algebra",
    "json_variant_explode_lateral",
    "date_time_type_suite",
    # -- 47 stalest reconfirm per SAMPLED_ROUNDS.json (max-round asc, reg order) --
    "json_extract_scalar",
    "json_from_json_struct",
    "json_tuple_multi",
    "json_to_json_roundtrip",
    "math_conditional_null",
    "math_try_cast_safety",
    "math_bitwise_suite",
    "str_basic_suite",
    "str_regex_suite",
    "str_initcap_casefold",
    "date_parts_suite",
    "date_arithmetic_suite",
    "date_construction_suite",
    "hash_md5_sha2",
    "udf_pandas_scalar",
    "udf_grouped_agg",
    "udf_mapinpandas",
    "udf_python_udtf",
    "pipeline_hash_sample",
    "pipeline_token_budget",
    "pipeline_mixture_rebalance",
    "pipeline_decontaminate",
    "pipeline_mixture_weighted",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "q8_market_share",
    "q9_product_profit",
    "q12_late_shipments",
    "q13_order_distribution",
    "sql_lateral_topk",
    "sql_correlated_exists",
    "sql_recursive_cte",
    "q6_forecast_revenue",
    "q4_priority_exists",
    "q7_nation_volume",
    "q14_promo_share",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q22_idle_customers",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_count",
    "q20_excess_suppliers",
    "q21_waiting_suppliers",
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
