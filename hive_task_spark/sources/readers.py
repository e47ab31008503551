"""Sources & sinks — SURVEY.md §2B: CSV/JSON scan with explicit
schemas, partitioned parquet write + partition-pruned read-back, and
catalog tables (saveAsTable / spark.table).

Each query is a write→read round-trip whose final result is oracle-
checked against the ORIGINAL table — proving the format round-trips
losslessly, not just that the write succeeded.

100 TB posture: always pass an explicit schema to text formats
(schema inference is a full extra scan); always partitionBy a
low-cardinality column users filter on, so partition pruning turns
full scans into directory listings (`PartitionFilters` in .explain);
CSV/JSON are exchange formats only — parquet is the storage format.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_task_spark.registry import register
from hive_task_spark.tables import load

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "_scratch")


def _scratch(name: str) -> str:
    os.makedirs(_SCRATCH, exist_ok=True)
    return os.path.join(_SCRATCH, name)


_NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

_CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)


@register(
    "source_csv_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → CSV (header) → CSV scan with explicit schema.

    The read-back result must equal the source table exactly — the
    oracle never sees the CSV, so any quoting/typing loss fails the
    value-hash."""
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    path = _scratch("nation_csv")
    n.write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.schema(_NATION_SCHEMA).option("header", "true").csv(path)


@register(
    "source_json_roundtrip",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → JSON-lines → JSON scan with explicit schema (doubles
    round-trip via shortest-repr literals)."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    path = _scratch("customer_json")
    c.write.mode("overwrite").json(path)
    return spark.read.schema(_CUSTOMER_SCHEMA).json(path)


@register(
    "source_parquet_partitioned",
    oracle="""
    SELECT
        CAST(year(o_orderdate) AS INT)  AS o_year,
        CAST(count(*) AS BIGINT)        AS n_orders,
        sum(o_totalprice)               AS total_price
    FROM orders
    WHERE year(o_orderdate) BETWEEN 1996 AND 1997
    GROUP BY 1
    """,
)
def source_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet write + pruned read-back.

    Writes orders partitioned by year, reads back with a year filter —
    the filter is satisfied by directory pruning (PartitionFilters in
    the scan node), the 100 TB pattern for time-partitioned facts."""
    o = load(spark, sf_dir, "orders")
    path = _scratch("orders_by_year")
    (
        o.withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return (
        back.filter(F.col("o_year").between(1996, 1997))
        .groupBy(F.col("o_year").cast("int").alias("o_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "source_catalog_table",
    oracle="""
    SELECT
        r.r_name                 AS region_name,
        CAST(count(*) AS BIGINT) AS n_nations
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def source_catalog_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """saveAsTable → spark.table round-trip (catalog-backed external
    table with an explicit path, so it works with both the in-memory
    catalog and a Hive metastore; `enableHiveSupport()` swaps the
    catalog implementation, not this code)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    (
        n.write.mode("overwrite")
        .option("path", _scratch("nation_tbl"))
        .saveAsTable("htspark_nation")
    )
    (
        r.write.mode("overwrite")
        .option("path", _scratch("region_tbl"))
        .saveAsTable("htspark_region")
    )
    nt = spark.table("htspark_nation")
    rt = spark.table("htspark_region")
    return (
        nt.join(F.broadcast(rt), nt["n_regionkey"] == rt["r_regionkey"])
        .groupBy(rt["r_name"].alias("region_name"))
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


@register(
    "source_orc_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           sum(c_acctbal)           AS total_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parquet → ORC → ORC scan → aggregate (SURVEY §2B "Parquet/ORC
    write"). ORC is the other columnar format a Hive-metastore shop
    runs on; Spark's native vectorized ORC reader gives the same
    pushdown/pruning behavior as parquet. The oracle aggregates the
    original parquet — value-identical iff the round-trip is
    lossless (longs, doubles, strings all are)."""
    c = load(spark, sf_dir, "customer")
    path = _scratch("customer_orc")
    c.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("c_acctbal").alias("total_bal"),
    )


@register(
    "source_json_permissive_corrupt",
    oracle="""
    SELECT
        CAST(sum(CASE WHEN n_nationkey % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_good,
        CAST(sum(CASE WHEN n_nationkey % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_corrupt,
        CAST(sum(CASE WHEN n_nationkey % 7 <> 0 THEN n_regionkey END) AS BIGINT)
            AS sum_region_good
    FROM nation
    """,
)
def source_json_permissive_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record tolerance: a JSON-lines file where every 7th
    nation row is deliberately truncated mid-object is read back in
    PERMISSIVE mode with a `_corrupt` capture column — bad records
    become rows, not job failures (at 100 TB one bad record must
    never kill the job; FAILFAST is opt-in). The oracle derives the
    same good/corrupt split from the corruption rule itself, proving
    the reader classified every line correctly."""
    n = load(spark, sf_dir, "nation")
    lines = n.select(
        F.when(
            F.col("n_nationkey") % 7 == 0,
            F.concat(F.lit('{"n_nationkey": '), F.col("n_nationkey").cast("string")),
        )
        .otherwise(F.to_json(F.struct("n_nationkey", "n_name", "n_regionkey")))
        .alias("value")
    )
    path = _scratch("nation_corrupt_json")
    lines.write.mode("overwrite").text(path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    return back.agg(
        F.sum(F.when(F.col("_corrupt").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_good"),
        F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("n_regionkey")))
        .cast("long")
        .alias("sum_region_good"),
    )


@register(
    "source_bucketed_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT)     AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_spend
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def source_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join: both tables written bucketBy(8)
    + sortBy on the join key, so the SortMergeJoin reads bucket files
    pre-partitioned AND pre-sorted — no Exchange and no Sort under
    the join (plan-asserted in tests/test_plans.py). This is THE
    scale pattern for a fact-fact join both of whose sides are too big
    to broadcast: at 100 TB, bucketing both tables once at write time
    removes the shuffle from every subsequent join on that key. The
    merge hint forces the comparison against the broadcast-free plan;
    the result is oracle-checked against the unbucketed originals."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    for tbl in ("ht_orders_b", "ht_customer_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        o.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", _scratch("orders_bucketed"))
        .saveAsTable("ht_orders_b")
    )
    (
        c.write.mode("overwrite")
        .format("parquet")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", _scratch("customer_bucketed"))
        .saveAsTable("ht_customer_b")
    )
    ob = spark.table("ht_orders_b")
    cb = spark.table("ht_customer_b")
    return (
        ob.hint("merge")
        .join(cb, ob["o_custkey"] == cb["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
    )


@register(
    "source_join_dpp_prune",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(count(*) AS BIGINT)          AS n_orders,
           round(sum(o_totalprice), 2)       AS total_r
    FROM orders
    WHERE year(o_orderdate) IN (1996, 1997)
    GROUP BY year(o_orderdate)
    """,
)
def source_join_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is stored partitioned
    by year; the year predicate arrives through a JOIN with a filtered
    dimension, not as a literal on the fact — at planning time Spark
    injects the dim's key set as a runtime partition filter
    (dynamicpruning subquery in the scan), so only the two matching
    year directories are read. THE 100 TB star-join pattern: date-dim
    filters prune the fact scan without the query author repeating
    the predicate. Plan-asserted in tests/test_plans.py; the oracle
    states the post-pruning semantics as a plain filter."""
    o = load(spark, sf_dir, "orders")
    path = _scratch("orders_dpp_by_year")
    (
        o.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(path)
    )
    fact = spark.read.parquet(path)
    years = (
        fact.select(F.col("o_year").alias("y"))
        .distinct()
        .filter(F.col("y").isin(1996, 1997))
    )
    return (
        fact.join(years, fact["o_year"] == years["y"])
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_r"),
        )
        .select(F.col("o_year").cast("long").alias("o_year"), "n_orders", "total_r")
    )
