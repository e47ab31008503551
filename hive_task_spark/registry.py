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
# schedule lives in CLAUDE.md; this is round 16's row, exactly
# SAMPLED_ROUNDS.json's next_reconfirm_window_50: the 3 never-sampled
# r15 additions in slots 1–3 (new-op rule) + the 47 stalest-signal
# reconfirm names (max sampled round ascending, registration-order
# tie-break — all last sampled r4/r5: json/math/str/date suites, UDF
# family, window frames, text analysis depth, quality audits).
# Round 15's window came back 50/50 green; a green CORRECTNESS_r16
# makes every registered query driver-confirmed at least once
# (575/575 cumulative).
AUDIT_WINDOW: tuple[str, ...] = (
    # -- r16 window: 3 never-sampled r15 additions first (new-op rule) --
    "source_commit_log_optimistic_concurrency",
    "stream_rocksdb_changelog_checkpoint",
    "stream_statestore_time_travel",
    # -- 47 stalest reconfirm per SAMPLED_ROUNDS.json (max-round asc, reg order) --
    "json_variant_extract",
    "math_decimal_exact_money",
    "str_extract_all_map",
    "str_collation_suite",
    "date_calendar_arithmetic",
    "date_order_gaps",
    "date_timezone_suite",
    "date_business_days",
    "date_multiformat_parse_dispatch",
    "hash_engine_specific",
    "udf_mapinarrow",
    "udf_pandas_iterator",
    "udtf_polymorphic",
    "udf_cogrouped_map",
    "udf_grouped_arrow",
    "window_running_distinct",
    "window_time_range_frame",
    "window_rolling_regression",
    "agg_percentile_cont_disc",
    "agg_crosstab_contingency",
    "agg_melt_unpivot_api",
    "math_try_arithmetic_suite",
    "text_fingerprint",
    "text_stats_by_lang_source",
    "text_redact_patterns",
    "text_bigram_lm_score",
    "text_boilerplate_ngrams",
    "text_zipf_slope",
    "text_bpe_apply",
    "text_bm25_scoring",
    "text_ndcg_eval",
    "text_langid_confusion",
    "text_bpe_train_step",
    "text_pmi_collocations",
    "text_inverted_index",
    "text_kwic_concordance",
    "text_blocklist_leet_filter",
    "text_log_template_mining",
    "text_tokenizer_fertility",
    "text_vocab_coverage_curve",
    "quality_percentile_filter",
    "quality_expectations_audit",
    "quality_drift_report",
    "quality_referential_integrity",
    "quality_snapshot_diff",
    "quality_entity_resolution",
    "quality_sorted_neighborhood_er",
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
