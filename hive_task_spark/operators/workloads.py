"""Composite analytical workloads — TPC-H-shaped queries over the full
star schema (the fixture tables carry a TPC-H-ish subset of columns;
FIXTURES.md). These are the "everything at once" proofs: multi-way
joins + selective filters + aggregation + top-k in one plan, the query
shapes a user of a batch OLAP engine actually runs.

Plan posture (verified via .explain, see SCALE.md): every dimension
side broadcasts, filters push into the parquet scans of both fact and
dimensions, aggregates are partial+final, top-k compiles to
TakeOrderedAndProject. The fact table is scanned once per query and
never shuffled for a dimension join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_task_spark.registry import register
from hive_task_spark.tables import load

def _revenue():
    # built lazily — Column arithmetic needs an active SparkContext
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT
        l.l_orderkey,
        sum(l.l_extendedprice * (1 - l.l_discount))  AS revenue,
        CAST(epoch(o.o_orderdate) AS BIGINT)         AS orderdate_s,
        o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderdate_s
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped high-value orders in one segment.
    Segment filter reaches the customer scan, both date filters reach
    their scans; top-10 is TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.unix_timestamp("o_orderdate").cast("long").alias("orderdate_s"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("orderdate_s"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT
        n.n_name                                    AS nation,
        sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue through local suppliers per nation of
    one region — a 6-way join whose five dimension sides all broadcast;
    the only shuffle is the final small groupBy."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_revenue()).alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT
        c.c_custkey,
        c.c_name,
        sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue,
        c.c_acctbal,
        n.n_name                                    AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top customers by returned-item revenue in a
    quarter-ish window. returnflag filter pushes into the fact scan."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(F.sum(_revenue()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "sql_hiveql_interface",
    oracle="""
    WITH ev AS (
        SELECT e.event_type,
               unnest(string_split(e.props, ',')) AS kv
        FROM events e
        WHERE e.event_id < 500
    )
    SELECT
        event_type,
        trim(string_split(kv, ':')[1]) AS prop_key,
        CAST(count(*) AS BIGINT)       AS n
    FROM ev
    GROUP BY 1, 2
    """,
)
def sql_hiveql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HiveQL-dialect SQL surface (the north star names HiveQL
    compatibility explicitly): LATERAL VIEW explode + DISTRIBUTE BY /
    SORT BY run unmodified on Spark SQL. Splits raw JSON prop text
    into key tokens per event type — the query text is the operator
    here; DISTRIBUTE/SORT BY shape partitioning without changing
    results (the value-hash is order-insensitive)."""
    from hive_task_spark.tables import load

    load(spark, sf_dir, "events").createOrReplaceTempView("ht_events_hql")
    return spark.sql(
        """
        SELECT event_type, prop_key, count(*) AS n
        FROM (
            SELECT e.event_type, trim(split(kv, ':')[0]) AS prop_key
            FROM ht_events_hql e
            LATERAL VIEW explode(split(e.props, ',')) t AS kv
            WHERE e.event_id < 500
            DISTRIBUTE BY event_type SORT BY event_type
        )
        GROUP BY event_type, prop_key
        """
    )
