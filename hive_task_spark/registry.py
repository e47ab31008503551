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

# The external audit samples the FIRST 50 queries in registration
# order.  Rather than deriving that window from module import order
# (fragile — adding one operator to an early module silently evicts
# the 50th name), the window is an explicit curated list: load_all
# reorders QUERIES so these names come first, in this order, and
# everything else follows in plain registration order.  The rotation
# schedule lives in CLAUDE.md; this is round 5's row: the never-
# sampled text/quality/multimodal/geo/dedup families (the families
# round 4 grew).  All of multimodal+geo+dedup (18 names, three
# families with zero driver signal so far) plus the 18 oldest-
# registered never-sampled text and 14 oldest never-sampled quality
# names; the text/quality remainder rolls into the r6+ windows.
# Round 4's window (the 15 ever-red reconfirmations + 35 function/
# agg/SQL/UDF names) came back 48 green + 1 no-oracle-by-design;
# the lone red, math_suite, was a dtype-repr mismatch (DOUBLE vs
# TINYINT sign()) fixed this round and guarded by tests/compare.py's
# dtype-kind check.
AUDIT_WINDOW: tuple[str, ...] = (
    # -- multimodal: never driver-sampled as a family (8) --
    "multimodal_metadata_profile",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_resize_plan",
    "multimodal_audio_windows",
    "multimodal_shard_manifest",
    "multimodal_phash_neardup",
    "multimodal_crossmodal_integrity",
    # -- geo: never driver-sampled as a family (5) --
    "geo_grid_density",
    "geo_radius_join",
    "geo_trajectory_stats",
    "geo_nearest_supplier",
    "geo_trajectory_similarity",
    # -- dedup: round-2+ additions never sampled (5) --
    "dedup_prefix_hash",
    "dedup_asymmetric_containment",
    "dedup_health_dashboard",
    "dedup_minhash_portable_eval",
    "dedup_incremental_ingest",
    # -- text: 18 oldest never-sampled --
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
    # -- quality: 14 oldest never-sampled --
    "quality_percentile_filter",
    "quality_expectations_audit",
    "quality_drift_report",
    "quality_referential_integrity",
    "quality_snapshot_diff",
    "quality_entity_resolution",
    "quality_sorted_neighborhood_er",
    "quality_k_anonymity_audit",
    "quality_retry_storm_census",
    "quality_column_size_profile",
    "quality_partition_fingerprint",
    "quality_fellegi_sunter_scoring",
    "quality_encoding_advisor",
    "quality_cdc_column_attribution",
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
