"""TPC-H-shaped subquery workloads — EXISTS / NOT EXISTS / IN /
correlated-scalar shapes, each expressed Spark-first as an explicit
decorrelation (aggregate + join) while the DuckDB oracle keeps the
natural correlated-SQL form. That pairing is the point: it proves the
DataFrame rewrite computes exactly the subquery semantics.

Scale posture (SCALE.md): every decorrelated aggregate groups on the
join key, so the rewrite adds one keyed shuffle that AQE sizes; scalar
subqueries become one-row broadcasts (no shuffle); dimension sides
broadcast. None of these plans materialize a correlated loop — at
100 TB the per-row subquery form would be O(n) joins, the rewrite is
exactly one.

Reference parity note: the reference (/root/reference, a Lisp STM task
library) has no query layer — these shapes are mandated by the target
layer (SURVEY.md §2B "composite workloads" + north-star HiveQL OLAP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_task_spark.registry import register
from hive_task_spark.tables import load


def _rev():
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, no join, no group.
    All three predicates push to the parquet scan (min/max row-group
    skipping on l_shipdate at scale); the aggregate is partial+final
    with a single-row exchange."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        )
    )


@register(
    "q4_priority_exists",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: the fixture lineitem has no
    commit/receipt dates, so "late" = shipped >60 days after order
    date). Correlated EXISTS → left-semi join carrying both the equi
    key and the correlated inequality; the equi key keeps it a hash
    semi-join, and the quarter filter pushes into the orders scan."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
           OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. The disjunctive nation-pair predicate lands after both
    nation broadcasts; all five non-fact sides broadcast so the fact
    table is never shuffled before the final small groupBy."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8"))
        | ((F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).alias("revenue"))
    )


@register(
    "q14_promo_share",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                            THEN l.l_extendedprice * (1 - l.l_discount)
                            ELSE 0.0 END)
                / sum(l.l_extendedprice * (1 - l.l_discount)), 9) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share in one month — conditional
    aggregate over a broadcast part join; the month filter prunes the
    fact scan before the join."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01") & (F.col("l_shipdate") < "1996-10-01")
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0))
                / F.sum(rev),
                9,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    ORDER BY r.total_revenue DESC, s.s_suppkey
    LIMIT 1
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the quarter's top-revenue supplier. The
    classic formulation equates revenue with a scalar-subquery max;
    top-1-with-tiebreak computes the same winner without a float
    equality between independently-summed doubles (cross-engine ulp
    hazard), and compiles to TakeOrderedAndProject — no global sort."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(_rev()), 4).alias("total_revenue")
    )
    return (
        s.join(rev, s["s_suppkey"] == rev["l_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy(F.col("total_revenue").desc(), "s_suppkey")
        .limit(1)
    )


@register(
    "q17_small_qty_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 3) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (
          SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: small-quantity-order revenue for one brand.
    The correlated scalar subquery (per-part average quantity) is
    decorrelated into a groupBy on the correlation key + equi join —
    one keyed shuffle instead of a per-row subquery. The brand filter
    broadcasts through part and prunes the join's build side."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    thresh = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(thresh, li["l_partkey"] == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 3).alias("avg_yearly"))
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey,
           CAST(epoch(o.o_orderdate) AS BIGINT) AS orderdate_s,
           o.o_totalprice, sum(l.l_quantity) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders. The IN-subquery (orders
    whose line quantities sum past a threshold) is computed ONCE as a
    grouped aggregate + HAVING filter, then equi-joined — the same
    aggregate also supplies total_qty, so the fact table is scanned
    and shuffled exactly once. Quantities are integer-valued doubles,
    so the >250 membership test is exact on both engines."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        o.join(big, o["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "o_orderkey",
            F.unix_timestamp("o_orderdate").cast("long").alias("orderdate_s"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 20 AND 45
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of (brand, size, quantity) triples
    across the join. Catalyst extracts the common join key and derives
    per-side OR'd filters (brand/size push into the part scan,
    quantity into the fact scan) — verified via .explain."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    cond = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(20, 45)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(cond).agg(F.round(F.sum(_rev()), 4).alias("revenue"))


@register(
    "q22_idle_customers",
    oracle="""
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: "idle" = no order since 2000-01-01;
    the fixture has no phone country codes, so results group by
    nation). Two subquery forms in one plan: the scalar avg becomes a
    one-row broadcast cross join (no shuffle), the NOT EXISTS becomes
    a left-anti join whose date filter pushes into the orders scan."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT c.l_partkey, c.unit_cost, s.s_name, s.s_acctbal,
               n.n_name AS nation
        FROM cost c
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    )
    SELECT p.p_partkey, p.p_name, e.s_name, e.s_acctbal, e.nation, e.unit_cost
    FROM part p
    JOIN eu e ON e.l_partkey = p.p_partkey
    WHERE p.p_type = 'SMALL' AND p.p_size <= 25
      AND e.unit_cost = (SELECT min(e2.unit_cost) FROM eu e2
                         WHERE e2.l_partkey = p.p_partkey)
    ORDER BY e.s_acctbal DESC, e.nation, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest regional supplier per part (adapted:
    no partsupp in the fixture, so unit cost = min observed
    l_extendedprice/l_quantity per (part, supplier)). The correlated
    min subquery decorrelates into a min() window over the partkey —
    one shuffle, no self-join. The equality filter is exact: both
    sides select the min of the identical double set, no re-
    arithmetic. Supplier/nation/region all broadcast."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 25)
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    eu = (
        cost.join(F.broadcast(s), cost["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_partkey", "unit_cost", "s_name", "s_acctbal",
                F.col("n_name").alias("nation"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    best = eu.withColumn("min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(p), best["l_partkey"] == p["p_partkey"])
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "nation", "unit_cost")
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH val AS (
        SELECT l.l_partkey, round(sum(l.l_extendedprice * l.l_quantity), 2) AS part_value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_3'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, part_value
    FROM val
    WHERE part_value > (SELECT 3.0 * avg(part_value) FROM val)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant share of one
    nation's stock value (adapted: value = sum of extendedprice *
    quantity over that nation's shipments — no partsupp; threshold =
    3x the average part value, scale-free where TPC-H's fixed share
    fraction empties out as part count grows). The scalar
    threshold subquery is the same aggregate re-reduced to one row and
    broadcast: the per-part table is computed once, the global sum is
    a one-row cross join, no second scan of the fact table."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    val = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2
            ).alias("part_value")
        )
    )
    thresh = val.agg((3.0 * F.avg("part_value")).alias("threshold"))
    return (
        val.crossJoin(F.broadcast(thresh))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


@register(
    "q16_supplier_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can serve each qualifying
    part profile (adapted: the supplier blacklist is negative account
    balance — no comment column). The NOT IN becomes a left-anti join
    against the tiny blacklist (safe: s_suppkey is non-null, so NOT
    IN ≡ anti join); part filters broadcast; the count(distinct) is
    a two-phase aggregate Spark plans automatically."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "q20_excess_suppliers",
    oracle="""
    WITH sp AS (
        SELECT l_suppkey, l_partkey, sum(l_quantity) AS sp_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey
    ),
    pt AS (SELECT l_partkey, sum(sp_qty) AS part_qty FROM sp GROUP BY l_partkey)
    SELECT s.s_suppkey, s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
        SELECT sp.l_suppkey
        FROM sp
        JOIN pt ON pt.l_partkey = sp.l_partkey
        WHERE sp.l_partkey IN (SELECT p_partkey FROM part
                               WHERE p_name LIKE 'red%')
          AND sp.sp_qty > 0.3 * pt.part_qty
    )
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding an outsized share of a
    product line's volume (adapted: "excess stock" = shipped >30% of
    a red part's 1996 volume — no partsupp availqty). Two nested INs
    decorrelate into two semi joins over ONE shared grouped
    aggregate: sp is computed once, its re-aggregation to part grain
    is a rollup of the same shuffle output, and the red-part filter
    is a broadcast semi join before the expensive share filter."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    red = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    sp = li.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("sp_qty"))
    sp = sp.join(F.broadcast(red), sp["l_partkey"] == red["p_partkey"], "left_semi")
    pt = sp.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("sp_qty").alias("part_qty")
    )
    excess = (
        sp.join(pt, sp["l_partkey"] == pt["pt_partkey"])
        .filter(F.col("sp_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(excess, s["s_suppkey"] == excess["l_suppkey"], "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", F.col("n_name").alias("nation"))
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders o   ON o.o_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_3'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who alone held up multi-supplier
    orders (adapted: "late" = shipped >60 days after order date). The
    two correlated EXISTS decorrelate into per-order supplier
    statistics instead of two fact-table self-joins: with l1 known
    late, EXISTS(other supplier) ≡ n_suppliers ≥ 2 and NOT EXISTS
    (other LATE supplier) ≡ n_late_suppliers = 1 — two keyed
    aggregates on the same orderkey grain, a 100 TB-safe plan where
    the self-join form would shuffle the fact table three times."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    # One fact-orders join carries a late flag; BOTH per-order
    # statistics come from the same relation in one grouped aggregate
    # (two distinct-aggs share one Expand), so the fact table is
    # joined and shuffled once — not once per statistic. n_suppliers
    # over status-F orders equals the oracle's unrestricted EXISTS
    # because l1's order is itself status F.
    j = li.join(
        o, li["l_orderkey"] == o["o_orderkey"]
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("is_late"),
    )
    # Two-level aggregate instead of two countDistinct in one agg:
    # dedup to (order, supplier) grain first (carrying an any-late
    # flag), then plain count/sum — avoids the Expand that doubles
    # the shuffled rows for multi-distinct aggregates (−14% at sf0.1).
    #
    # r17 examined, deliberately left in this shape: two rewrites both
    # MEASURED SLOWER at sf0.1 — (a) per-order stats as a WINDOW over
    # the deduped grain (removes the stats join's fact re-reference)
    # inserts a full Sort under WindowExec: 1.39 s vs 1.00 s; (b) an
    # explicit repartition(l_orderkey) reused by dedup+window defeats
    # map-side partial aggregation (guide §2.3), shipping raw lines:
    # 1.38 s. The original join-back touches the fact twice but both
    # passes are combine-first hash aggregates with a cheap late-row
    # exchange.
    per_os = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("any_late")
    )
    stats = per_os.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("any_late").alias("n_late_suppliers"),
    )
    return (
        j.filter("is_late")
        .join(stats, F.col("l_orderkey") == F.col("k"))
        .filter((F.col("n_suppliers") >= 2) & (F.col("n_late_suppliers") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
