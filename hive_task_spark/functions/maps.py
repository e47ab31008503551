"""Map function family — SURVEY.md §2B "Scalar functions / Map".

Raw MapType columns are avoided at the comparison edge (arrow map
hashing is engine-fragile); queries project keys/values/lookups to
scalar or array columns instead — same discipline a production job
uses when sinking to parquet for downstream non-Spark readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_task_spark.registry import register
from hive_task_spark.tables import load


@register(
    "map_create_lookup",
    oracle="""
    SELECT
        event_id,
        element_at(map(['type', 'k'],
                       [event_type, json_extract_string(props, '$.k')]), 'type')[1]
                                                         AS type_via_map,
        CAST(element_at(map(['type', 'k'],
                       [event_type, json_extract_string(props, '$.k')]), 'k')[1]
             AS BIGINT)                                  AS k_via_map,
        CAST(cardinality(map(['type', 'k'],
                       [event_type, json_extract_string(props, '$.k')])) AS BIGINT)
                                                         AS map_size
    FROM events
    """,
)
def map_create_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_map + element_at + size (construct, look up, measure)."""
    e = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"),
        F.col("event_type"),
        F.lit("k"),
        F.get_json_object("props", "$.k"),
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("type_via_map"),
        F.element_at(m, "k").cast("long").alias("k_via_map"),
        F.size(m).cast("long").alias("map_size"),
    )


@register(
    "map_keys_values_entries",
    oracle="""
    SELECT
        event_id,
        array_to_string(list_sort(map_keys(map(['et', 'uid'],
                               [event_type, CAST(user_id AS VARCHAR)]))), '|') AS mkeys,
        array_to_string(map_values(map(['et'], [event_type])), '|')            AS mvals
    FROM events
    WHERE event_id < 50
    """,
)
def map_keys_values_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_keys / map_values projected to sorted '|'-joined strings
    (array edges crash order-insensitive hashers — see arrays._djoin)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 50)
    m2 = F.create_map(
        F.lit("et"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return e.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m2)), "|").alias("mkeys"),
        F.array_join(
            F.map_values(F.create_map(F.lit("et"), F.col("event_type"))), "|"
        ).alias("mvals"),
    )


@register(
    "map_explode_entries",
    oracle="""
    SELECT
        event_id,
        u.key                                 AS mkey,
        u.value                               AS mval
    FROM (
        SELECT event_id,
               UNNEST(map_entries(map(['et', 'val'],
                                  [event_type, CAST(value AS VARCHAR)]))) AS u
        FROM events
        WHERE event_id < 25
    )
    """,
)
def map_explode_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(map) → one row per entry."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 25)
    m = F.create_map(
        F.lit("et"), F.col("event_type"), F.lit("val"), F.col("value").cast("string")
    )
    return e.select("event_id", F.explode(m).alias("mkey", "mval"))


@register(
    "map_from_entries_roundtrip",
    oracle="""
    SELECT
        user_id,
        CAST(element_at(map_from_entries(list_transform(
                 list_sort(list(DISTINCT event_type)),
                 t -> {'k': t, 'v': 1})), 'purchase')[1] AS BIGINT)  AS has_purchase
    FROM events
    GROUP BY user_id
    """,
)
def map_from_entries_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_from_entries over an aggregated entry array, then lookup."""
    e = load(spark, sf_dir, "events")
    entries = F.transform(
        F.sort_array(F.collect_set("event_type")),
        lambda t: F.struct(t.alias("k"), F.lit(1).alias("v")),
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.element_at(F.map_from_entries(entries), "purchase")
            .cast("long")
            .alias("has_purchase")
        )
    )


@register(
    "map_higher_order",
    oracle="""
    SELECT n_nationkey,
           'region=' || CAST(n_regionkey * 2 AS VARCHAR)
               || '|self=' || CAST(n_nationkey * 2 AS VARCHAR) AS doubled_entries,
           CASE WHEN n_regionkey >= 2
                THEN 'region=' || CAST(n_regionkey AS VARCHAR)
                ELSE '' END                                    AS filtered_entries
    FROM nation
    """,
)
def map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: transform_values and map_filter,
    emitted as sorted 'k=v' entry strings (maps have no cross-engine
    order and complex edges crash order-insensitive hashers; DuckDB
    lacks map HOFs entirely, so the oracle constructs the expected
    strings directly — the comparison IS the semantics check).
    Row-local JVM expressions, scan-speed."""
    n = load(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("region"), F.col("n_regionkey"),
        F.lit("self"), F.col("n_nationkey"),
    )

    def entries_str(mcol):
        return F.array_join(
            F.transform(
                F.sort_array(F.map_entries(mcol)),
                lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
            ),
            "|",
        )

    return n.select(
        "n_nationkey",
        entries_str(F.transform_values(m, lambda k, v: v * 2)).alias(
            "doubled_entries"
        ),
        entries_str(
            F.map_filter(m, lambda k, v: (k == "region") & (v >= 2))
        ).alias("filtered_entries"),
    )


@register(
    "map_merge_aggregate",
    oracle="""
    WITH cells AS (
        SELECT l_returnflag, l_linestatus, count(*) AS c
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag,
           string_agg(l_linestatus || '=' || CAST(c AS VARCHAR), '|'
                      ORDER BY l_linestatus) AS status_counts,
           CAST(count(*) AS BIGINT) AS n_keys
    FROM cells GROUP BY l_returnflag
    """,
)
def map_merge_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-valued aggregation: per return flag, the linestatus→count
    map built by merging per-row contributions — the 'aggregate into
    a map column' idiom (feature maps, per-key counters) expressed as
    the cell aggregate + map_from_entries it compiles to anyway. The
    edge serializes to sorted 'k=v' entries ('|'-joined) per the
    complex-type edge rule; internally the value IS a MapType (the
    map_from_entries construction is exercised, then serialized).
    Two stacked map-side-combinable aggregates — the same shape as
    the key-multiplicity audit."""
    li = load(spark, sf_dir, "lineitem")
    cells = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("c")
    )
    as_map = cells.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct(F.col("l_linestatus"), F.col("c")))
            )
        ).alias("m")
    )
    entries = F.expr(
        "array_join(transform(map_keys(m), k -> concat(k, '=', "
        "CAST(element_at(m, k) AS STRING))), '|')"
    )
    return as_map.select(
        "l_returnflag",
        entries.alias("status_counts"),
        F.size(F.map_keys(F.col("m"))).cast("long").alias("n_keys"),
    )
