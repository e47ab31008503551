"""Product/time-series analytics over `events` — resampling with
gap-fill + last-observation-carried-forward, funnel conversion, and
cohort retention. The query shapes a warehouse user runs daily; each
is pure DataFrame algebra with an exact DuckDB oracle.

Determinism note: all time keys are integer epoch-day / year-month
values (no DATE columns cross the comparison boundary), and per-day
values are averages (no cross-engine arg-max tie-breaking).

Reference parity note: the reference (/root/reference, a Lisp STM
task-scheduling library) has no analytics layer; these are
target-layer operators (SURVEY.md §2B, north-star batch OLAP).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_task_spark.plans.checkpoints import (
    checkpoint_conservative as _checkpoint_conservative,
)
from hive_task_spark.registry import register
from hive_task_spark.functions.exact import cents as _cents
from hive_task_spark.tables import load


def _copurchase_edges(
    items: DataFrame,
    u: str = "u",
    v: str = "v",
    *,
    distinct: bool = True,
    checkpoint: bool = True,
) -> DataFrame:
    """The co-purchase edge kernel shared by every graph operator
    (kcore / modularity / Louvain / link prediction / assortativity /
    label propagation): part pairs sharing an order, as an undirected
    edge list with ``u < v``.

    ``items`` is an (l_orderkey, l_partkey) projection of lineitem
    (optionally pre-filtered / pre-distinct'd by the caller).

    Kernel choice (r17 optimization round): the basket-explode kernel —
    ONE fact shuffle (groupBy orderkey + collect_set) instead of the
    r7-r16 orderkey self-join's three.  Measured r17 at sf0.1
    (best-of-3, identical 1,196,000-edge output, checkpoint included):
    explode 1.31 s vs self-join 2.15 s.  The r7 trap that kept the
    self-join alive — the explode plan advertises ~1.25 B/row
    (Generate never re-inflates the Aggregate's shrunken row estimate;
    1.49 MB for the 1.2M edges), flipping every downstream AQE join to
    broadcasting the edge list (kcore 3.6 s -> 16.3 s, three graph-op
    OOMs) — is closed structurally by
    ``plans.checkpoints.checkpoint_conservative``: the checkpointed RDD
    is re-wrapped in a LogicalRDD with NO origin stats, so downstream
    planning sees the unknown-stats default (Long.MaxValue) and every
    consumer join stays a shuffle — the same pessimistic posture the
    self-join's multi-TB estimate produced, the only plan that
    survives 100 TB.  Guards: tests/test_plans.py broadcast-bait
    invariant (now asserts the conservative stats directly) +
    test_memory_envelope.  The r8 persist(MEMORY_AND_DISK)+count()
    alternative (accurate 16 B/row stats) stays rejected: the
    CacheManager would serve plan-identical rebuilds from cache across
    bench best-of-3 iterations — measuring cache hits, not builds.

    Degree-bound rationale — why the pair explosion is safe at 100 TB:
    TPC-H orders carry <= 7 lineitems (the co-purchase graph's avg
    degree ~120 is SF-invariant), so each basket emits <= C(7,2) = 21
    pairs — the blowup is capped by DATA SHAPE, not scale factor.  The
    ``u < v`` filter halves the pair count and collapses the
    (u,v)/(v,u) twins so each undirected edge appears exactly once;
    collect_set dedupes within-order part repeats exactly like the
    self-join over a distinct (orderkey, partkey) projection.

    ``distinct=True`` (default) collapses multi-order repeats so
    downstream degree counts are simple edge counts — dropping it is
    only correct when the caller dedupes later itself (label
    propagation unions reversed stubs + self-loops before its own
    ``.distinct()``).  NOTE (ADVICE r17 #3): regardless of the flag,
    ``items`` is consumed at (orderkey, partkey)-DISTINCT grain —
    collect_set dedupes within-order part repeats, so
    ``distinct=False`` means "one row per pair per ORDER", never "per
    row combination of repeated items".  The sole distinct=False
    caller (label propagation) pre-distincts its items, so both
    readings coincide today; a future caller wanting within-order
    multiplicity needs a different kernel, not this flag.  ``checkpoint=True`` materializes the kernel for
    operators that reference the edge list repeatedly (BSP unrolls):
    without it the unroll multiplies the basket build once per
    downstream reference.
    """
    baskets = items.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    e = (
        baskets.select(F.explode("ps").alias(u), "ps")
        .select(u, F.explode("ps").alias(v))
        .filter(F.col(u) < F.col(v))
    )
    if distinct:
        e = e.distinct()
    return _checkpoint_conservative(e) if checkpoint else e


@register(
    "analytics_resample_locf",
    oracle="""
    WITH daily AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               avg(value) AS day_val
        FROM events
        GROUP BY user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT)
    ),
    span AS (
        SELECT user_id, min(day_idx) AS d0, max(day_idx) AS d1
        FROM daily GROUP BY user_id
    ),
    spine AS (
        SELECT user_id, unnest(range(d0, d1 + 1)) AS day_idx FROM span
    ),
    j AS (
        SELECT s.user_id, s.day_idx, d.day_val
        FROM spine s
        LEFT JOIN daily d ON s.user_id = d.user_id AND s.day_idx = d.day_idx
    )
    SELECT user_id, CAST(day_idx AS BIGINT) AS day_idx,
           (day_val IS NOT NULL) AS observed,
           last_value(day_val IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day_idx
               ROWS UNBOUNDED PRECEDING) AS filled_val
    FROM j
    """,
)
def analytics_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's event stream onto a dense daily grid
    (sequence-explode spine between the user's first and last day),
    left-join observed daily averages, and gap-fill by
    last-observation-carried-forward (`last(ignorenulls)` over an
    unbounded-preceding frame). One shuffle keys everything: daily
    agg, spine join, and LOCF window all partition on user_id. At
    100 TB the spine explode is generated, not stored — rows appear
    only at the executor, never in the shuffle upstream."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id",
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx"),
    ).agg(F.avg("value").alias("day_val"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day_idx").alias("d0"), F.max("day_idx").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day_idx"),
        )
    )
    j = spine.join(daily, ["user_id", "day_idx"], "left")
    w = Window.partitionBy("user_id").orderBy("day_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return j.select(
        "user_id",
        F.col("day_idx").cast("long").alias("day_idx"),
        F.col("day_val").isNotNull().alias("observed"),
        F.last("day_val", ignorenulls=True).over(w).alias("filled_val"),
    )


@register(
    "analytics_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.t2
        GROUP BY e.user_id
    )
    SELECT
        CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
        CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
        CAST((SELECT count(*) FROM p) AS BIGINT) AS n_full_funnel
    """,
)
def analytics_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion: users who viewed, then clicked at or
    after their first view, then purchased at or after that first
    qualifying click. Each stage is a per-user min-timestamp
    aggregate semi-constrained by the previous stage — three keyed
    aggregates over one pre-projected (user, type, ts) relation, NOT
    a per-user sort: at 100 TB the event order never materializes,
    only per-user stage timestamps (one row per user per stage)."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_view_click"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_full_funnel"))))
    )


@register(
    "analytics_retention_cohorts",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               CAST(floor(epoch(min(ts)) / 86400) AS BIGINT) AS cohort_day
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS act_day
        FROM events
    )
    SELECT f.cohort_day,
           CAST(a.act_day - f.cohort_day AS BIGINT) AS days_since,
           CAST(count(*) AS BIGINT)                 AS active_users
    FROM first_seen f JOIN activity a ON f.user_id = a.user_id
    GROUP BY f.cohort_day, a.act_day - f.cohort_day
    """,
)
def analytics_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-active day,
    counted on each subsequent day they return (day grain because the
    fixture's events span one month; the month-grain query is the
    same shape with year*12+month keys). Keys are integer epoch-day
    arithmetic — no date types cross the engine boundary. Two
    aggregates share the user_id shuffle; the one-row-per-user cohort
    side broadcasts into the activity join wherever users ≪ events."""
    e = load(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("double") / 86400).cast("long")
    first_seen = e.groupBy("user_id").agg(F.min("ts").alias("t0")).select(
        "user_id",
        F.floor(F.col("t0").cast("double") / 86400).cast("long").alias("cohort_day"),
    )
    activity = e.select("user_id", day.alias("act_day")).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("act_day") - F.col("cohort_day")).cast("long").alias("days_since"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
    )


@register(
    "analytics_copurchase_pairs",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM items a
    JOIN items b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING count(*) >= 2
    """,
)
def analytics_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing together in
    ≥2 orders (the support-counting core of frequent-itemset mining).

    Single-pass shape: collect each basket once (collect_set also
    dedupes repeated parts), pair via DOUBLE explode + a<b filter,
    count. Generating n² candidates in whole-stage-codegen
    GenerateExec and filtering beats both the interpreted triangular
    HOF (-30%) and the items-self-join (3 fact shuffles vs 1 here) at
    sf0.1; quadratic only in basket size (~7). For huge baskets the
    standard cap is a per-basket top-N by item frequency before
    pairing."""
    li = load(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    pairs = (
        baskets.select(F.explode("ps").alias("part_a"), "ps")
        .select("part_a", F.explode("ps").alias("part_b"))
        .filter(F.col("part_a") < F.col("part_b"))
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


@register(
    "analytics_pagerank_lite",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION ALL SELECT dst FROM edges
        )
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d FROM edges GROUP BY src),
    r1 AS (
        SELECT nodes.node,
               0.15 / nn.n
                 + 0.85 * coalesce(sum((1.0 / nn.n) / deg.d), 0.0) AS rank
        FROM nodes CROSS JOIN nn
        LEFT JOIN edges ON edges.dst = nodes.node
        LEFT JOIN deg   ON deg.src = edges.src
        GROUP BY nodes.node, nn.n
    ),
    r2 AS (
        SELECT nodes.node,
               0.15 / nn.n
                 + 0.85 * coalesce(sum(r1.rank / deg.d), 0.0) AS rank
        FROM nodes CROSS JOIN nn
        LEFT JOIN edges ON edges.dst = nodes.node
        LEFT JOIN r1    ON r1.node = edges.src
        LEFT JOIN deg   ON deg.src = edges.src
        GROUP BY nodes.node, nn.n
    )
    SELECT node, round(rank, 8) AS rank_r FROM r2
    """,
)
def analytics_pagerank_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (two unrolled iterations, damping 0.85, no dangling
    redistribution) over the customer→supplier purchase graph — the
    iterative-algorithm-as-DataFrame pattern. Each iteration is one
    keyed join + aggregate on edge destination; the rank vector is
    node-cardinality (≪ edges) so at 100 TB iterations shuffle the
    edge list by dst once each, and the loop unrolls to a fixed plan
    (no driver-side convergence collect needed for fixed k). Node ids
    are prefixed strings so the customer and supplier key spaces
    can't collide."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # r17 (guide §2.4, the kcore lesson): edges/nodes each feed both
    # unrolled iterations, so without checkpoints the fact join +
    # distinct re-executed once per reference (~6 full rebuilds, 5.5 s
    # at sf0.1 -> ~2 s). r18 (guide §2.3/§2.4, measured 3.07 -> 2.71 s
    # per full invocation incl. checkpoint builds; the lazy iteration
    # subtree alone 3x faster): (a) contributions pre-aggregate by dst
    # BEFORE the nodes join (|E| rows shuffle once into |V| partials
    # instead of shuffling the joined relation for a post-join
    # groupBy); (b) iteration 1's rank is the uniform 1/n constant, so
    # its rank join is algebra, not a join. A third variant — hoisting
    # edges⋈deg into its own checkpointed `wedges` — measured SLOWER
    # per invocation (3.20 s: the extra materialization job costs more
    # than the per-iteration deg join it saves) and was not shipped.
    # Value-identical: the
    # original's LEFT rank join was inner in effect (every src IS a
    # node and every node has a rank), per-edge w = rank/d is the same
    # two operands, and regrouping the Σ only permutes summation order
    # of identical doubles — noise ≤1e-18 against the 8dp edge grain
    # (verified row-identical on all 15999 nodes at sf0.1).
    # Conservative checkpoints throughout: every materialized relation
    # scales with the graph and must never be invited to broadcast.
    edges = _checkpoint_conservative(
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    nodes = _checkpoint_conservative(
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    deg = _checkpoint_conservative(
        edges.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("d"))
    )

    def finish(contrib_agg):
        """rank(v) = 0.15/n + 0.85 * Σ rank(u)/deg(u) from dst-grouped
        partial sums (nodes with no in-edges coalesce to 0)."""
        return (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib_agg, nodes["node"] == contrib_agg["dst"], "left")
            .select(
                "node",
                (
                    0.15 / F.col("n")
                    + 0.85 * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
        )

    c1 = (
        edges.join(deg, "src")
        .crossJoin(F.broadcast(nn))
        .select("dst", ((F.lit(1.0) / F.col("n")) / F.col("d")).alias("w"))
        .groupBy("dst")
        .agg(F.sum("w").alias("s"))
    )
    r1 = finish(c1)
    c2 = (
        edges.join(deg, "src")
        .join(r1, F.col("src") == r1["node"])
        .select("dst", (F.col("rank") / F.col("d")).alias("w"))
        .groupBy("dst")
        .agg(F.sum("w").alias("s"))
    )
    r2 = finish(c2)
    return r2.select("node", F.round("rank", 8).alias("rank_r"))


@register(
    "analytics_skyline_2d",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def analytics_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier): parts not dominated on (cheaper,
    bigger) — the multi-criteria shortlist operator (skyline-on-Spark
    is literally a paper topic, EDBT 2023 in PAPERS.md; the oracle is
    the O(n²) NOT-EXISTS definition).

    Spark-first rewrite is the 2D sort-based algorithm, not a pair
    join: reduce to one best-size row per distinct price, take the
    running max of best sizes over strictly-cheaper prices, and a
    point is dominated iff that prefix max reaches its size or a
    same-price point strictly beats it. Two keyed aggregates + one
    ordered window over the distinct-price relation — O(n log n).
    At 100 TB: range-partition by price and prefix-merge per-partition
    maxima (the paper's local-skyline/merge shape); dominance
    transitivity makes the two-phase result exact."""
    p = load(spark, sf_dir, "part")
    per_price = p.groupBy("p_retailprice").agg(
        F.max("p_size").alias("best_size")
    )
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    marked = per_price.select(
        "p_retailprice",
        "best_size",
        F.max("best_size").over(w).alias("strict_prefix_max"),
    )
    return (
        p.join(F.broadcast(marked), "p_retailprice")
        .filter(
            (
                F.col("strict_prefix_max").isNull()
                | (F.col("strict_prefix_max") < F.col("p_size"))
            )
            & (F.col("best_size") <= F.col("p_size"))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


@register(
    "analytics_outlier_zscore",
    oracle="""
    WITH s AS (
        SELECT event_id, event_type, value,
               avg(value) OVER w AS mu,
               stddev_samp(value) OVER w AS sigma
        FROM events
        WINDOW w AS (PARTITION BY event_type)
    )
    SELECT event_id, event_type,
           round((value - mu) / sigma, 6) AS zscore_r,
           (abs((value - mu) / sigma) > 3.0) AS is_outlier
    FROM s
    """,
)
def analytics_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection by per-group z-score: each event scored
    against its type's mean/stddev (whole-partition window — the
    two-pass mean/std fused into one shuffle), flagged beyond 3σ.
    At 100 TB the window form holds if group cardinality ≪ rows;
    for degenerate grouping use a groupBy stats table + broadcast
    join — identical semantics, same single fact scan."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    return e.select(
        "event_id",
        "event_type",
        F.round(z, 6).alias("zscore_r"),
        (F.abs(z) > 3.0).alias("is_outlier"),
    )


@register(
    "analytics_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events
    )
    SELECT from_type, to_type,
           CAST(count(*) AS BIGINT) AS n_trans,
           round(count(*) * 1.0 /
                 sum(count(*)) OVER (PARTITION BY from_type), 6) AS p_trans
    FROM seq
    WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def analytics_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: lead(event_type) within each user's time-ordered stream
    forms (from → to) bigrams; counts normalize per source state into
    transition probabilities (rounded at the edge).

    Scale shape: ONE shuffle on user_id produces the sequence pairs
    (the lead window), then a small groupBy on the 5×5 type matrix
    with map-side partial aggregation; the probability normalizer is
    a window over the tiny transition table, not the fact table.
    Deterministic tiebreak (ts, event_id) makes the bigram stream —
    and therefore the matrix — engine-independent."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_trans")
    )
    wnorm = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n_trans",
        F.round(F.col("n_trans") / F.sum("n_trans").over(wnorm), 6).alias(
            "p_trans"
        ),
    )


@register(
    "analytics_triangle_count",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM items a
        JOIN items b ON a.l_orderkey = b.l_orderkey
                    AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    ),
    deg AS (
        SELECT node, count(*) AS d
        FROM (SELECT u AS node FROM edges
              UNION ALL SELECT v AS node FROM edges)
        GROUP BY node
    ),
    oriented AS (
        SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                    THEN e.u ELSE e.v END AS s,
               CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                    THEN e.v ELSE e.u END AS t
        FROM edges e
        JOIN deg du ON e.u = du.node
        JOIN deg dv ON e.v = dv.node
    )
    SELECT
        CAST((SELECT count(*) FROM deg) AS BIGINT)   AS n_nodes,
        CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges,
        CAST((SELECT count(*)
              FROM oriented o1
              JOIN oriented o2 ON o2.s = o1.t
              JOIN oriented o3 ON o3.s = o1.s AND o3.t = o2.t)
             AS BIGINT) AS n_triangles
    """,
)
def analytics_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count on the co-purchase graph (part pairs sharing ≥2
    orders) via DEGREE ORIENTATION — the standard distributed
    algorithm (Suri & Vassilvitskii's MR triangle counting): orient
    every edge from its lower-(degree, id) endpoint to the higher
    one, making the graph acyclic with out-degrees bounded by
    O(sqrt(edges)); a triangle then appears exactly once as oriented
    wedge a→b→c closed by oriented edge a→c.

    Scale shape: the wedge join keys on the shared middle node and
    the closing join on the (s, t) edge identity — both plain equi-
    joins whose size is Σ out-deg², the quantity degree orientation
    minimizes (a hub of degree 1M contributes its sqrt-bounded
    out-neighborhood, not 10¹² wedges). No collect, no iteration;
    the three one-row counts cross-join via broadcast. The degree
    joins broadcast (O(nodes) rows); on a graph too large for that
    the same joins fall back to shuffles with identical semantics."""
    li = load(spark, sf_dir, "lineitem")
    # Edge generation = the co-purchase kernel: collect each basket
    # once (collect_set dedupes), pair via codegen double-explode —
    # ONE fact shuffle (the items-self-join formulation costs three
    # and benched 3x slower at sf0.1). Support >= 2 prunes the edge
    # set to broadcast size, so every later stage is dimension-scale.
    baskets = li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("ps")
    )
    edges = (
        baskets.select(F.explode("ps").alias("u"), "ps")
        .select("u", F.explode("ps").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 2)
        .select("u", "v")
        .localCheckpoint()  # edges feed deg + oriented + 2 self-joins
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("un"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("vn"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(F.broadcast(du), F.col("u") == F.col("un"))
        .join(F.broadcast(dv), F.col("v") == F.col("vn"))
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
        .localCheckpoint()  # reused by all three triangle-join legs
    )
    o1 = oriented.select(F.col("s").alias("s1"), F.col("t").alias("t1"))
    o2 = oriented.select(F.col("s").alias("s2"), F.col("t").alias("t2"))
    o3 = oriented.select(F.col("s").alias("s3"), F.col("t").alias("t3"))
    tri = (
        o1.join(o2, F.col("t1") == F.col("s2"))
        .join(o3, (F.col("s3") == F.col("s1")) & (F.col("t3") == F.col("t2")))
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return (
        deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .crossJoin(
            F.broadcast(edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges")))
        )
        .crossJoin(F.broadcast(tri))
    )


@register(
    "analytics_sequence_pattern",
    oracle="""
    WITH s AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events
        GROUP BY user_id
    )
    SELECT user_id, seq,
           CAST((length(seq) - length(replace(seq, 'vcp', ''))) / 3
                AS BIGINT) AS n_vcp
    FROM s
    """,
)
def analytics_sequence_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern mining (MATCH_RECOGNIZE-lite): each user's
    event stream collapses to an ordered initial-letter string, and
    contiguous view→click→purchase runs are counted by the
    replace-length identity (engine-portable, unlike regex counting
    whose greediness differs across engines). One groupBy(user)
    collect with an in-row sort — per-user sequences are bounded
    (events per user ≪ partition size); the pattern scan itself is a
    string kernel at scan speed. The staged-aggregate funnel
    (analytics_funnel) answers "did the user ever convert"; this
    answers "how many times, contiguously" — the stricter sessionized
    product metric."""
    e = load(spark, sf_dir, "events")
    agged = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "ts", "event_id", F.substring("event_type", 1, 1).alias("c")
                )
            )
        ).alias("arr")
    )
    seqd = agged.select(
        "user_id",
        F.array_join(F.expr("transform(arr, x -> x.c)"), "").alias("seq"),
    )
    n_vcp = (
        (F.length("seq") - F.length(F.expr("replace(seq, 'vcp', '')"))) / 3
    )
    return seqd.select("user_id", "seq", n_vcp.cast("long").alias("n_vcp"))


@register(
    "analytics_ab_welch_ttest",
    oracle="""
    WITH g AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 'treat'
                    ELSE 'ctrl' END AS grp,
               value
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    s AS (
        SELECT grp, count(*) AS n, avg(value) AS mu,
               var_samp(value) AS v
        FROM g GROUP BY grp
    ),
    w AS (
        SELECT max(CASE WHEN grp = 'treat' THEN n END)  AS nt,
               max(CASE WHEN grp = 'treat' THEN mu END) AS mt,
               max(CASE WHEN grp = 'treat' THEN v END)  AS vt,
               max(CASE WHEN grp = 'ctrl' THEN n END)   AS nc,
               max(CASE WHEN grp = 'ctrl' THEN mu END)  AS mc,
               max(CASE WHEN grp = 'ctrl' THEN v END)   AS vc
        FROM s
    )
    SELECT CAST(nt AS BIGINT)              AS n_treat,
           CAST(nc AS BIGINT)              AS n_ctrl,
           round(mt - mc, 6)               AS mean_diff_r,
           round((mt - mc) / sqrt(vt / nt + vc / nc), 4) AS t_stat_r,
           round(pow(vt / nt + vc / nc, 2) /
                 (pow(vt / nt, 2) / (nt - 1) + pow(vc / nc, 2) / (nc - 1)),
                 2)                        AS welch_df_r
    FROM w
    """,
)
def analytics_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: Welch's unequal-variance t-test between
    two event cohorts (purchase vs view values) — group means,
    difference, t statistic and Welch-Satterthwaite degrees of
    freedom, all from ONE pass of per-group (n, mean, var) partial
    aggregates; the test statistic itself is O(1) arithmetic on the
    two summary rows (conditional-max pivot). This is the whole
    distributed cost model of experimentation analytics: sufficient
    statistics shuffle, never observations. Stats edges round per the
    transcendental rule (t at 4dp, df at 2dp)."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    g = e.select(
        F.when(F.col("event_type") == "purchase", "treat")
        .otherwise("ctrl")
        .alias("grp"),
        "value",
    )
    s = g.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mu"),
        F.var_samp("value").alias("v"),
    )
    pick = lambda c, grp: F.max(F.when(F.col("grp") == grp, F.col(c)))
    w = s.agg(
        pick("n", "treat").alias("nt"),
        pick("mu", "treat").alias("mt"),
        pick("v", "treat").alias("vt"),
        pick("n", "ctrl").alias("nc"),
        pick("mu", "ctrl").alias("mc"),
        pick("v", "ctrl").alias("vc"),
    )
    se2 = F.col("vt") / F.col("nt") + F.col("vc") / F.col("nc")
    df_num = F.pow(se2, 2)
    df_den = F.pow(F.col("vt") / F.col("nt"), 2) / (F.col("nt") - 1) + F.pow(
        F.col("vc") / F.col("nc"), 2
    ) / (F.col("nc") - 1)
    return w.select(
        F.col("nt").cast("long").alias("n_treat"),
        F.col("nc").cast("long").alias("n_ctrl"),
        F.round(F.col("mt") - F.col("mc"), 6).alias("mean_diff_r"),
        F.round((F.col("mt") - F.col("mc")) / F.sqrt(se2), 4).alias("t_stat_r"),
        F.round(df_num / df_den, 2).alias("welch_df_r"),
    )


@register(
    "analytics_hypertable_rollup",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS b,
               count(*) AS n, sum(value) AS sv
        FROM events GROUP BY date_trunc('hour', ts)
    )
    SELECT 'hour' AS granularity,
           CAST(floor(epoch(b)) AS BIGINT) AS bucket_s,
           CAST(n AS BIGINT)               AS n_events,
           round(sv, 2)                    AS sum_value_r
    FROM hourly
    UNION ALL
    SELECT 'day',
           CAST(floor(epoch(date_trunc('day', b))) AS BIGINT),
           CAST(sum(n) AS BIGINT),
           round(sum(sv), 2)
    FROM hourly
    GROUP BY date_trunc('day', b)
    """,
)
def analytics_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: the hourly rollup is
    computed from the fact scan ONCE, and the daily grain re-
    aggregates the HOURLY PARTIALS (count/sum are algebraic), never
    touching the events table again — Timescale's continuous-
    aggregate / materialized-rollup contract. At 100 TB the fine
    grain is the only fact-sized job; every coarser grain costs
    O(buckets), and refreshing a late hour cascades through partials
    the same way (see pipeline_incremental_agg for the merge proof).
    The oracle states both grains independently — equality holds
    because the partial states are exactly mergeable."""
    e = load(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .localCheckpoint()  # the materialized fine-grain rollup
    )
    hour_rows = hourly.select(
        F.lit("hour").alias("granularity"),
        F.unix_timestamp("b").alias("bucket_s"),
        F.col("n").cast("long").alias("n_events"),
        F.round("sv", 2).alias("sum_value_r"),
    )
    day_rows = (
        hourly.groupBy(F.date_trunc("day", "b").alias("d"))
        .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
        .select(
            F.lit("day").alias("granularity"),
            F.unix_timestamp("d").alias("bucket_s"),
            F.col("n").cast("long").alias("n_events"),
            F.round("sv", 2).alias("sum_value_r"),
        )
    )
    return hour_rows.unionByName(day_rows)


@register(
    "analytics_rfm_segmentation",
    oracle="""
    WITH m AS (SELECT max(o_orderdate) AS mx FROM orders),
    rfm AS (
        SELECT o_custkey,
               datediff('day', max(o_orderdate), any_value(m.mx)) AS rec_days,
               count(*) AS freq,
               sum(o_totalprice) AS monetary
        FROM orders, m
        GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey,
               ntile(4) OVER (ORDER BY rec_days, o_custkey)          AS r_rank,
               ntile(4) OVER (ORDER BY freq DESC, o_custkey)         AS f_rank,
               ntile(4) OVER (ORDER BY monetary DESC, o_custkey)     AS m_rank
        FROM rfm
    )
    SELECT CAST(r_rank AS BIGINT) AS r_rank,
           CAST(f_rank AS BIGINT) AS f_rank,
           CAST(m_rank AS BIGINT) AS m_rank,
           CAST(count(*) AS BIGINT) AS n_custs,
           CAST(min(o_custkey) AS BIGINT) AS sample_cust
    FROM scored
    GROUP BY r_rank, f_rank, m_rank
    """,
)
def analytics_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: recency (days since last order,
    against the corpus max date), frequency, monetary — each
    quartiled by ntile with a custkey tiebreak (ntile over a total
    order is engine-portable), then the 4x4x4 segment census. One
    customer-keyed aggregate + three windows over the per-customer
    summary (NOT the fact table) + a tiny census groupBy. The
    unpartitioned ntile windows run over customer-grain rows — at
    100 TB that's still ~millions, and the standard fix is quantile
    cutpoints (approx or exact two-pass) + broadcast, preserving
    these exact semantics."""
    o = load(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderdate").alias("mx"))
    rfm = (
        o.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("mx"), F.max("o_orderdate")).alias("rec_days"),
            F.count(F.lit(1)).alias("freq"),
            F.sum("o_totalprice").alias("monetary"),
        )
    )
    scored = rfm.select(
        "o_custkey",
        F.ntile(4).over(Window.orderBy("rec_days", "o_custkey")).alias("r_rank"),
        F.ntile(4)
        .over(Window.orderBy(F.col("freq").desc(), "o_custkey"))
        .alias("f_rank"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary").desc(), "o_custkey"))
        .alias("m_rank"),
    )
    return (
        scored.groupBy("r_rank", "f_rank", "m_rank")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_custs"),
            F.min("o_custkey").cast("long").alias("sample_cust"),
        )
        .select(
            F.col("r_rank").cast("long").alias("r_rank"),
            F.col("f_rank").cast("long").alias("f_rank"),
            F.col("m_rank").cast("long").alias("m_rank"),
            "n_custs",
            "sample_cust",
        )
    )


@register(
    "analytics_attribution_models",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id, event_type,
               first_value(CASE WHEN event_type IN ('view','click','signup')
                                THEN event_type END IGNORE NULLS) OVER wb
                   AS first_touch_type,
               last_value(CASE WHEN event_type IN ('view','click','signup')
                               THEN event_type END IGNORE NULLS) OVER wb
                   AS last_touch_type,
               sum(CASE WHEN event_type = 'view'   THEN 1 ELSE 0 END) OVER wb AS n_view,
               sum(CASE WHEN event_type = 'click'  THEN 1 ELSE 0 END) OVER wb AS n_click,
               sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) OVER wb AS n_signup
        FROM events
        WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    conv AS (
        SELECT *, n_view + n_click + n_signup AS n_touch
        FROM seq
        WHERE event_type = 'purchase' AND last_touch_type IS NOT NULL
    ),
    scal AS (
        SELECT
          CAST(count(*) FILTER (first_touch_type = 'view')   AS BIGINT) AS ft_view,
          CAST(count(*) FILTER (first_touch_type = 'click')  AS BIGINT) AS ft_click,
          CAST(count(*) FILTER (first_touch_type = 'signup') AS BIGINT) AS ft_signup,
          CAST(count(*) FILTER (last_touch_type = 'view')    AS BIGINT) AS lt_view,
          CAST(count(*) FILTER (last_touch_type = 'click')   AS BIGINT) AS lt_click,
          CAST(count(*) FILTER (last_touch_type = 'signup')  AS BIGINT) AS lt_signup,
          CAST(sum(CAST(round(1000000.0 * n_view   / n_touch) AS BIGINT)) AS BIGINT) AS lin_view,
          CAST(sum(CAST(round(1000000.0 * n_click  / n_touch) AS BIGINT)) AS BIGINT) AS lin_click,
          CAST(sum(CAST(round(1000000.0 * n_signup / n_touch) AS BIGINT)) AS BIGINT) AS lin_signup
        FROM conv
    )
    SELECT 'view' AS touch_type, ft_view AS first_touch,
           lt_view AS last_touch, lin_view AS linear_micros FROM scal
    UNION ALL
    SELECT 'click', ft_click, lt_click, lin_click FROM scal
    UNION ALL
    SELECT 'signup', ft_signup, lt_signup, lin_signup FROM scal
    """,
)
def analytics_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch marketing attribution, three models at once: for
    each conversion (purchase) credit the user's PRIOR touches
    (view/click/signup) by first-touch, last-touch, and linear
    fractional models. Everything is window algebra over ONE
    (user_id)-partitioned, time-ordered frame — running touch counts
    and ignore-nulls first/last touch — so the whole query costs a
    single shuffle of the event log; no per-conversion join, no
    range explosion, at any corpus size. Linear credit is emitted as
    integer micro-credits (round(1e6 * n_type / n_touch) per
    conversion, summed): the per-conversion ratio is binary-exact at
    every half boundary (power-of-two denominators), so the BIGINT
    edge is engine-stable where a summed DOUBLE ratio would not be."""
    touch = F.when(
        F.col("event_type").isin("view", "click", "signup"),
        F.col("event_type"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.first(touch, ignorenulls=True).over(wb).alias("first_touch_type"),
        F.last(touch, ignorenulls=True).over(wb).alias("last_touch_type"),
        F.sum((F.col("event_type") == "view").cast("long")).over(wb).alias("n_view"),
        F.sum((F.col("event_type") == "click").cast("long")).over(wb).alias("n_click"),
        F.sum((F.col("event_type") == "signup").cast("long")).over(wb).alias("n_signup"),
    )
    conv = seq.filter(
        (F.col("event_type") == "purchase")
        & F.col("last_touch_type").isNotNull()
    ).withColumn("n_touch", F.col("n_view") + F.col("n_click") + F.col("n_signup"))

    def _lin(col: str):
        return F.sum(
            F.round(F.lit(1000000.0) * F.col(col) / F.col("n_touch"), 0).cast(
                "long"
            )
        ).cast("long")

    def _cnt(col: str, v: str):
        return F.count(F.when(F.col(col) == v, 1)).cast("long")

    scal = conv.agg(
        _cnt("first_touch_type", "view").alias("ft_view"),
        _cnt("first_touch_type", "click").alias("ft_click"),
        _cnt("first_touch_type", "signup").alias("ft_signup"),
        _cnt("last_touch_type", "view").alias("lt_view"),
        _cnt("last_touch_type", "click").alias("lt_click"),
        _cnt("last_touch_type", "signup").alias("lt_signup"),
        _lin("n_view").alias("lin_view"),
        _lin("n_click").alias("lin_click"),
        _lin("n_signup").alias("lin_signup"),
    )
    return scal.select(
        F.expr(
            "stack(3, "
            "'view',   ft_view,   lt_view,   lin_view, "
            "'click',  ft_click,  lt_click,  lin_click, "
            "'signup', ft_signup, lt_signup, lin_signup) "
            "AS (touch_type, first_touch, last_touch, linear_micros)"
        )
    )


@register(
    "analytics_dau_mau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ),
    dau AS (
        SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY d
    ),
    cover AS (
        SELECT user_id, d + CAST(unnest(range(0, 7)) AS INT) AS cd FROM ud
    ),
    wau AS (
        SELECT cd AS d, CAST(count(DISTINCT user_id) AS BIGINT) AS wau7
        FROM cover GROUP BY cd
    )
    SELECT dau.d AS day, dau.dau, wau.wau7,
           CAST(dau.dau AS DOUBLE) / wau.wau7 AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def analytics_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day-AU stickiness, the product-health ratio:
    each (user, day) activity row COVERS days d..d+6, so trailing
    distinct actives become a plain per-day count(distinct) after a
    bounded 7x row expansion — no self-join over a date range, no
    windowed distinct (which Spark/SQL both lack), and therefore a
    fixed fan-out regardless of corpus size (the standard scalable
    rewrite for sliding distinct counts). The stickiness ratio is one
    double division of exact BIGINTs — bit-identical cross-engine.
    Days with activity report their ratio; the trailing window
    denominator includes users whose 7-day cover extends into the
    day."""
    ud = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"))
        .distinct()
    )
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    cover = ud.select(
        "user_id",
        "d",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
    ).select("user_id", F.expr("date_add(d, k)").alias("cd"))
    wau = cover.groupBy("cd").agg(
        F.countDistinct("user_id").cast("long").alias("wau7")
    )
    return (
        dau.join(wau, dau.d == wau.cd)
        .select(
            dau.d.alias("day"),
            "dau",
            "wau7",
            (F.col("dau").cast("double") / F.col("wau7")).alias("stickiness"),
        )
    )


@register(
    "analytics_anomaly_mad",
    oracle="""
    WITH m AS (
        SELECT event_type, median(value) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN m USING (event_type)
    ),
    mad AS (
        SELECT event_type, med, median(adev) AS mad
        FROM dev GROUP BY event_type, med
    )
    SELECT d.event_type,
           round(mad.med, 2)        AS median_r,
           round(mad.mad, 2)        AS mad_r,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad USING (event_type)
    GROUP BY d.event_type, mad.med, mad.mad
    """,
)
def analytics_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection via median absolute deviation: the
    z-score twin (`analytics_outlier_zscore`) that outliers CANNOT
    poison, because both the center (median) and the spread (MAD,
    scaled by the normal-consistency constant 1.4826) are quantile
    statistics. Two grouped exact medians + one broadcast of the
    per-group constants back onto the rows; both interpolated medians
    are the same two-value midpoint computation on each engine, so
    the 3-sigma-equivalent threshold compare is bit-deterministic.
    At 100 TB swap the exact medians for percentile_approx (same
    shape, mergeable sketch) — the exact form here is the oracle
    anchor, like `agg_percentile_grouped`."""
    e = load(spark, sf_dir, "events").select("event_type", "value")
    m = e.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = e.join(F.broadcast(m), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type", "med").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad.select("event_type", "mad")), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                (F.col("adev") > 3 * 1.4826 * F.col("mad")).cast("long")
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            F.round("med", 2).alias("median_r"),
            F.round("mad", 2).alias("mad_r"),
            "n_events",
            "n_outliers",
        )
    )


@register(
    "analytics_label_propagation",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        WHERE l_partkey <= 120
    ),
    und AS (
        SELECT a.l_partkey AS a, b.l_partkey AS b
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (
        SELECT a, b FROM und
        UNION SELECT b, a FROM und
        UNION SELECT DISTINCT l_partkey, l_partkey FROM items
    ),
    l0 AS (SELECT DISTINCT l_partkey AS part, l_partkey AS lbl FROM items),
    l1 AS (SELECT e.a AS part, min(l.lbl) AS lbl
           FROM edges e JOIN l0 l ON e.b = l.part GROUP BY e.a),
    l2 AS (SELECT e.a AS part, min(l.lbl) AS lbl
           FROM edges e JOIN l1 l ON e.b = l.part GROUP BY e.a),
    l3 AS (SELECT e.a AS part, min(l.lbl) AS lbl
           FROM edges e JOIN l2 l ON e.b = l.part GROUP BY e.a)
    SELECT part AS l_partkey, CAST(lbl AS BIGINT) AS community
    FROM l3
    """,
)
def analytics_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous min-label propagation (3 unrolled rounds) over the
    co-purchase graph — the community-detection sibling of
    `dedup_cluster_components`: every vertex repeatedly adopts the
    minimum label in its closed neighborhood (self-loops make own-
    label part of the min, so the update is one join+groupBy per
    round, no coalesce step). Deterministic by construction (min is
    order-free), so the oracle is three chained CTEs. Scale shape:
    each round costs one equi-join on the vertex key + one aggregate
    — the standard bounded-rounds BSP pattern; at 100 TB you
    checkpoint every few rounds exactly like the connected-components
    loop (label range shrinks monotonically, convergence detection by
    count of changed labels)."""
    items = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") <= 120)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    # distinct=False: the union below (reversed stubs + self-loops)
    # carries its own .distinct(); checkpoint lands on that union.
    und = _copurchase_edges(items, "a", "b", distinct=False, checkpoint=False)
    edges = (
        und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .unionByName(
            items.select(
                F.col("l_partkey").alias("a"), F.col("l_partkey").alias("b")
            )
        )
        .distinct()
        .localCheckpoint()  # reused by all three rounds
    )
    lab = items.select(F.col("l_partkey").alias("part")).distinct().select(
        "part", F.col("part").alias("lbl")
    )
    for _ in range(3):
        lab = (
            edges.join(lab, edges.b == lab.part)
            .groupBy(edges.a.alias("part"))
            .agg(F.min("lbl").alias("lbl"))
        )
    return lab.select(
        F.col("part").alias("l_partkey"), F.col("lbl").cast("long").alias("community")
    )


@register(
    "analytics_association_rules",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        WHERE l_partkey <= 80
    ),
    n_orders AS (
        SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
        FROM lineitem
    ),
    supp AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
        FROM items GROUP BY l_partkey
    ),
    pair AS (
        SELECT a.l_partkey AS ante, b.l_partkey AS cons,
               CAST(count(*) AS BIGINT) AS n_both
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT p.ante, p.cons, p.n_both,
           CAST(p.n_both AS DOUBLE) / t.n                       AS support,
           CAST(p.n_both AS DOUBLE) / sa.n_item                 AS confidence,
           (CAST(p.n_both AS DOUBLE) / t.n)
             / ((CAST(sa.n_item AS DOUBLE) / t.n)
                * (CAST(sc.n_item AS DOUBLE) / t.n))            AS lift
    FROM pair p
    JOIN supp sa ON p.ante = sa.l_partkey
    JOIN supp sc ON p.cons = sc.l_partkey
    CROSS JOIN n_orders t
    WHERE p.n_both >= 2
    """,
)
def analytics_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining (the Apriori readout): for item pairs
    co-occurring in ≥2 baskets, emit support, confidence and lift —
    the classic recommendation signals, all derived from THREE exact
    integer counts (pair count, per-item counts, basket total) so
    every ratio is an int/int double division, bit-stable on both
    engines. The pair join is the bounded co-purchase wedge join
    (`analytics_copurchase_pairs` discipline — distinct items first,
    equi-join on the basket key); support counts broadcast back onto
    the pair relation. At 100 TB frequent-itemset mining prunes by
    min-support FIRST (the supp relation filter) so the pair join
    only ever sees items that can possibly qualify."""
    items = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") <= 80)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = (
        load(spark, sf_dir, "lineitem")
        .agg(F.countDistinct("l_orderkey").cast("long").alias("n"))
    )
    supp = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_item")
    )
    a = items.alias("a")
    b = items.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("ante"),
            F.col("b.l_partkey").alias("cons"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .filter(F.col("n_both") >= 2)
    )
    sa = supp.select(F.col("l_partkey").alias("ante"), F.col("n_item").alias("na"))
    sc = supp.select(F.col("l_partkey").alias("cons"), F.col("n_item").alias("nc"))
    out = (
        pair.join(F.broadcast(sa), "ante")
        .join(F.broadcast(sc), "cons")
        .crossJoin(F.broadcast(n_orders))
    )
    nb = F.col("n_both").cast("double")
    return out.select(
        "ante",
        "cons",
        "n_both",
        (nb / F.col("n")).alias("support"),
        (nb / F.col("na")).alias("confidence"),
        (
            (nb / F.col("n"))
            / (
                (F.col("na").cast("double") / F.col("n"))
                * (F.col("nc").cast("double") / F.col("n"))
            )
        ).alias("lift"),
    )


@register(
    "analytics_chi_square",
    oracle="""
    WITH cells AS (
        SELECT event_type, CAST(user_id % 4 AS BIGINT) AS seg,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY event_type, user_id % 4
    ),
    m AS (
        SELECT event_type, seg, o,
               sum(o) OVER (PARTITION BY event_type) AS rm,
               sum(o) OVER (PARTITION BY seg)        AS cm,
               sum(o) OVER ()                        AS n
        FROM cells
    )
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT seg) - 1) AS BIGINT) AS dof,
           round(sum(pow(o - rm * cm / CAST(n AS DOUBLE), 2)
                     / (rm * cm / CAST(n AS DOUBLE))), 4) AS chi2_r,
           round(sqrt(sum(pow(o - rm * cm / CAST(n AS DOUBLE), 2)
                          / (rm * cm / CAST(n AS DOUBLE)))
                      / (max(n) * least(count(DISTINCT event_type) - 1,
                                        count(DISTINCT seg) - 1))), 6)
               AS cramers_v_r
    FROM m
    """,
)
def analytics_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event_type and a user
    segment (user_id % 4), plus Cramer's V effect size. ONE shuffle
    builds the contingency cells; marginals come from window sums
    OVER the tiny cells relation, never a second pass of the fact
    table — the sufficient-statistics discipline that makes the test
    O(cells) after the count, at any corpus scale. chi2 is a short
    float sum → round 4 (stats-ratio grain, CLAUDE.md)."""
    e = load(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type", (F.col("user_id") % 4).cast("long").alias("seg")
    ).agg(F.count(F.lit(1)).cast("long").alias("o"))
    m = cells.select(
        "event_type",
        "seg",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("rm"),
        F.sum("o").over(Window.partitionBy("seg")).alias("cm"),
        F.sum("o").over(
            Window.partitionBy()
        ).alias("n"),
    )
    exp = F.col("rm") * F.col("cm") / F.col("n").cast("double")
    term = F.pow(F.col("o") - exp, 2) / exp
    return m.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        (
            (F.count_distinct(F.col("event_type")) - 1)
            * (F.count_distinct(F.col("seg")) - 1)
        ).cast("long").alias("dof"),
        F.round(F.sum(term), 4).alias("chi2_r"),
        F.round(
            F.sqrt(
                F.sum(term)
                / (
                    F.max("n")
                    * F.least(
                        F.count_distinct(F.col("event_type")) - 1,
                        F.count_distinct(F.col("seg")) - 1,
                    )
                )
            ),
            6,
        ).alias("cramers_v_r"),
    )


@register(
    "analytics_mann_whitney",
    oracle="""
    WITH s AS (
        SELECT value,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS c1,
               CAST(count(*) FILTER (event_type = 'view')  AS BIGINT) AS c2
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY value
    ),
    r AS (
        SELECT c1, c2, c1 + c2 AS ct,
               coalesce(sum(c1 + c2) OVER (
                   ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cum_before
        FROM s
    ),
    agg AS (
        SELECT sum(c1) AS n1, sum(c2) AS n2,
               sum((cum_before + (ct + 1) / 2.0) * c1) AS r1,
               sum(CAST(ct AS DOUBLE) * ct * ct - ct)  AS tie3
        FROM r
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(r1 - n1 * (n1 + 1) / 2.0, 1) AS u_stat_r,
           round((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0)
                 / sqrt(n1 * n2 / 12.0
                        * ((n1 + n2 + 1)
                           - tie3 / ((n1 + n2) * CAST(n1 + n2 - 1 AS DOUBLE)))),
                 4) AS z_r
    FROM agg
    """,
)
def analytics_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (click vs view event values) with
    midrank tie handling and the tie-corrected normal approximation.
    Shape: group the pooled sample BY VALUE (ties collapse to one row
    with per-sample counts), one global ordered window assigns
    midranks from the running count — so the shuffle carries distinct
    values, not observations, and the rank sum R1 is assembled from
    exact integer counts (midranks are .5-grain → exact in double;
    U is rounded only at the display grain). z uses the standard
    tie-corrected sigma. The single ordered window over distinct
    values is the only global stage; at 100 TB you'd range-partition
    that sort exactly like global_sort_limit."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    s = e.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).cast("long").alias("c1"),
        F.count(F.when(F.col("event_type") == "view", 1)).cast("long").alias("c2"),
    )
    wb = (
        Window.orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = s.select(
        "c1",
        "c2",
        (F.col("c1") + F.col("c2")).alias("ct"),
        F.coalesce(F.sum(F.col("c1") + F.col("c2")).over(wb), F.lit(0)).alias(
            "cum_before"
        ),
    )
    agg = r.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(
            (F.col("cum_before") + (F.col("ct") + 1) / 2.0) * F.col("c1")
        ).alias("r1"),
        F.sum(
            F.col("ct").cast("double") * F.col("ct") * F.col("ct") - F.col("ct")
        ).alias("tie3"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    u = F.col("r1") - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    sigma = F.sqrt(
        n1 * n2 / 12.0
        * ((n + 1) - F.col("tie3") / (n * (n - 1).cast("double")))
    )
    return agg.select(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        F.round(u, 1).alias("u_stat_r"),
        F.round((u - n1 * n2 / 2.0) / sigma, 4).alias("z_r"),
    )


@register(
    "analytics_ks_test",
    oracle="""
    WITH s AS (
        SELECT value,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS c1,
               CAST(count(*) FILTER (event_type = 'view')  AS BIGINT) AS c2
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY value
    ),
    c AS (
        SELECT sum(c1) OVER (ORDER BY value) AS cum1,
               sum(c2) OVER (ORDER BY value) AS cum2,
               sum(c1) OVER () AS n1, sum(c2) OVER () AS n2
        FROM s
    )
    SELECT CAST(max(n1) AS BIGINT) AS n1,
           CAST(max(n2) AS BIGINT) AS n2,
           round(max(abs(cum1 / CAST(n1 AS DOUBLE)
                         - cum2 / CAST(n2 AS DOUBLE))), 6) AS d_stat_r,
           round(max(abs(cum1 / CAST(n1 AS DOUBLE)
                         - cum2 / CAST(n2 AS DOUBLE)))
                 * sqrt(max(n1) * max(n2)
                        / CAST(max(n1) + max(n2) AS DOUBLE)), 4)
               AS ks_lambda_r
    FROM c
    """,
)
def analytics_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov: D = sup |F1 - F2| between the
    click and view value distributions, from ONE grouped pass (distinct
    values with per-sample counts) + one ordered running-sum window —
    the ECDFs never materialize per-observation, so the sort carries
    |distinct values| rows. ks_lambda is the scaled statistic fed to
    the asymptotic p-value series. Distribution-shift monitoring for
    training corpora in one shuffle + one window."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    s = e.groupBy("value").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).cast("long").alias("c1"),
        F.count(F.when(F.col("event_type") == "view", 1)).cast("long").alias("c2"),
    )
    wr = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    c = s.select(
        F.sum("c1").over(wr).alias("cum1"),
        F.sum("c2").over(wr).alias("cum2"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c2").over(wall).alias("n2"),
    )
    d = F.abs(
        F.col("cum1") / F.col("n1").cast("double")
        - F.col("cum2") / F.col("n2").cast("double")
    )
    return c.agg(
        F.max("n1").cast("long").alias("n1"),
        F.max("n2").cast("long").alias("n2"),
        F.round(F.max(d), 6).alias("d_stat_r"),
        F.round(
            F.max(d)
            * F.sqrt(
                F.max("n1")
                * F.max("n2")
                / (F.max("n1") + F.max("n2")).cast("double")
            ),
            4,
        ).alias("ks_lambda_r"),
    )


@register(
    "analytics_gini_pareto",
    oracle="""
    WITH rev AS (
        SELECT o_custkey, sum(o_totalprice) AS x
        FROM orders GROUP BY o_custkey
    ),
    asc_r AS (
        SELECT x,
               row_number() OVER (ORDER BY x, o_custkey) AS i,
               count(*) OVER () AS n, sum(x) OVER () AS s
        FROM rev
    ),
    gini AS (
        SELECT round(2.0 * sum(i * x) / (max(n) * max(s))
                     - (max(n) + 1.0) / max(n), 6) AS g
        FROM asc_r
    ),
    ranked AS (
        SELECT x, sum(x) OVER (ORDER BY x DESC, o_custkey) / sum(x) OVER ()
                   AS cum_share
        FROM rev
    ),
    classed AS (
        SELECT CASE WHEN cum_share <= 0.80 THEN 'A'
                    WHEN cum_share <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class, x
        FROM ranked
    )
    SELECT abc_class, CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(x) / (SELECT sum(x) FROM rev), 6) AS revenue_share_r,
           (SELECT g FROM gini) AS gini_r
    FROM classed GROUP BY abc_class
    """,
)
def analytics_gini_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration readout: Gini coefficient over per-customer
    revenue (ascending rank-weighted sum identity) plus Pareto/ABC
    classing on the descending cumulative share (A: top 80% of
    revenue, B: to 95%, C: tail). One aggregate shuffles the fact
    table; everything after runs on the per-customer summary —
    running-share windows are order-pinned (tie-break custkey), so
    the cumulative sums are sequentially identical across engines.
    The two ordered windows over the summary are the global stage; at
    100 TB the summary is ~|customers| rows, range-partition the
    sort."""
    rev = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("x"))
    )
    asc_w = Window.orderBy("x", "o_custkey")
    wall = Window.partitionBy()
    asc_r = rev.select(
        "x",
        F.row_number().over(asc_w).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x").over(wall).alias("s"),
    )
    gini = asc_r.agg(
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")) / (F.max("n") * F.max("s"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini_r")
    )
    desc_w = (
        Window.orderBy(F.col("x").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = rev.select(
        "x",
        (F.sum("x").over(desc_w) / F.sum("x").over(wall)).alias("cum_share"),
        F.sum("x").over(wall).alias("s"),
    )
    classed = ranked.select(
        F.when(F.col("cum_share") <= 0.80, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
        "x",
        "s",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum("x") / F.max("s"), 6).alias("revenue_share_r"),
        )
        .crossJoin(F.broadcast(gini))
    )


@register(
    "analytics_ewma_horizon",
    oracle="""
    WITH daily AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               avg(value) AS v
        FROM events GROUP BY user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT)
    ),
    lagged AS (
        SELECT user_id, day_idx, v,
               lag(v, 1) OVER w AS v1, lag(v, 2) OVER w AS v2,
               lag(v, 3) OVER w AS v3, lag(v, 4) OVER w AS v4,
               lag(v, 5) OVER w AS v5, lag(v, 6) OVER w AS v6
        FROM daily
        WINDOW w AS (PARTITION BY user_id ORDER BY day_idx)
    )
    SELECT user_id, day_idx,
           CAST(1 + (v1 IS NOT NULL)::INT + (v2 IS NOT NULL)::INT
                  + (v3 IS NOT NULL)::INT + (v4 IS NOT NULL)::INT
                  + (v5 IS NOT NULL)::INT + (v6 IS NOT NULL)::INT
                AS BIGINT) AS n_obs,
           round((v + coalesce(v1, 0) * 0.5 + coalesce(v2, 0) * 0.25
                    + coalesce(v3, 0) * 0.125 + coalesce(v4, 0) * 0.0625
                    + coalesce(v5, 0) * 0.03125 + coalesce(v6, 0) * 0.015625)
                 / (1 + (v1 IS NOT NULL)::INT * 0.5
                      + (v2 IS NOT NULL)::INT * 0.25
                      + (v3 IS NOT NULL)::INT * 0.125
                      + (v4 IS NOT NULL)::INT * 0.0625
                      + (v5 IS NOT NULL)::INT * 0.03125
                      + (v6 IS NOT NULL)::INT * 0.015625), 6) AS ewma_r
    FROM lagged
    """,
)
def analytics_ewma_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finite-horizon exponentially weighted moving average (alpha=0.5,
    7-observation FIR window) over each user's daily series, weight-
    renormalized at the series head where fewer lags exist. Pure lag
    algebra: one user-keyed window supplies all six lags in a single
    pass (no self-joins, no recursion), so the whole smoother is one
    shuffle + one sort per user partition — the scale-safe way to
    ship IIR-style smoothing: truncate to a fixed horizon so state
    never crosses partition boundaries. Weights are exact binary
    fractions; the only rounding is the avg-derived input (6dp
    edge)."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id",
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx"),
    ).agg(F.avg("value").alias("v"))
    w = Window.partitionBy("user_id").orderBy("day_idx")
    cols = {f"v{j}": F.lag("v", j).over(w) for j in range(1, 7)}
    lagged = daily.select("user_id", "day_idx", "v", *[
        c.alias(nm) for nm, c in cols.items()
    ])
    weights = [1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.015625]
    vs = [F.col("v")] + [F.col(f"v{j}") for j in range(1, 7)]
    num = sum(
        (F.coalesce(v, F.lit(0.0)) * F.lit(wt) for v, wt in zip(vs, weights)),
        F.lit(0.0),
    )
    den = sum(
        (v.isNotNull().cast("int") * F.lit(wt) for v, wt in zip(vs, weights)),
        F.lit(0.0),
    )
    n_obs = sum(
        (v.isNotNull().cast("int") for v in vs), F.lit(0)
    ).cast("long")
    return lagged.select(
        "user_id",
        "day_idx",
        n_obs.alias("n_obs"),
        F.round(num / den, 6).alias("ewma_r"),
    )


@register(
    "analytics_shortest_path_bfs",
    oracle="""
    WITH nodes AS (
        SELECT p_partkey AS u FROM part WHERE p_partkey <= 150
    ),
    edges AS (
        SELECT u, ((u * 3 + 7) % 150) + 1 AS v FROM nodes
        UNION ALL
        SELECT u, ((u * 5 + 11) % 150) + 1 AS v FROM nodes
    ),
    bfs AS (
        WITH RECURSIVE walk(node, dist) AS (
            SELECT CAST(1 AS BIGINT), 0
            UNION
            SELECT e.v, w.dist + 1
            FROM walk w JOIN edges e ON e.u = w.node
            WHERE w.dist < 6
        )
        SELECT node, min(dist) AS dist FROM walk GROUP BY node
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
    FROM bfs
    """,
)
def analytics_shortest_path_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS shortest paths (6 unrolled supersteps) over a
    deterministic 2-regular expander on the part keys (edges
    u -> (3u+7)%N+1 and (5u+11)%N+1, N=150, source=1). Each
    superstep is the BSP frontier pattern: join current distances to
    the edge list, add 1, union, min-aggregate on the vertex key —
    one equi-join + one groupBy per round, the same shape Pregel
    compiles to, with no driver-side frontier collect. At 100 TB you
    checkpoint every few supersteps (like the connected-components
    loop) and stop when the frontier count stops changing; the
    oracle is the equivalent depth-bounded recursive CTE."""
    nodes = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 150)
        .select(F.col("p_partkey").alias("u"))
    )
    e1 = nodes.select("u", (((F.col("u") * 3 + 7) % 150) + 1).alias("v"))
    e2 = nodes.select("u", (((F.col("u") * 5 + 11) % 150) + 1).alias("v"))
    edges = e1.unionByName(e2).localCheckpoint()  # reused every superstep
    dist = spark.range(1, 2).select(
        F.col("id").alias("node"), F.lit(0).alias("dist")
    )
    for _ in range(6):
        step = (
            dist.join(edges, dist.node == edges.u)
            .select(F.col("v").alias("node"), (F.col("dist") + 1).alias("dist"))
        )
        dist = (
            dist.unionByName(step)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist.select(
        F.col("node").cast("long").alias("node"),
        F.col("dist").cast("long").alias("dist"),
    )


@register(
    "analytics_anova_f",
    oracle="""
    WITH g AS (
        SELECT event_type AS grp, count(*) AS n, avg(value) AS mu,
               var_samp(value) AS v
        FROM events GROUP BY event_type
    ),
    tot AS (
        SELECT sum(n) AS nn, count(*) AS k,
               sum(n * mu) / sum(n) AS grand
        FROM g
    )
    SELECT CAST(tot.nn AS BIGINT) AS n_obs,
           CAST(tot.k AS BIGINT) AS n_groups,
           round(sum(g.n * pow(g.mu - tot.grand, 2)) / (max(tot.k) - 1)
                 / (sum((g.n - 1) * g.v) / (max(tot.nn) - max(tot.k))), 4)
               AS f_stat_r,
           round(sum(g.n * pow(g.mu - tot.grand, 2))
                 / (sum(g.n * pow(g.mu - tot.grand, 2))
                    + sum((g.n - 1) * g.v)), 6) AS eta_sq_r
    FROM g, tot
    GROUP BY tot.nn, tot.k
    """,
)
def analytics_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test across event-type cohorts: between-group
    and within-group sums of squares assembled purely from per-group
    sufficient statistics (n, mean, sample variance) — the same
    one-pass discipline as the Welch t-test, generalized to k groups:
    the fact table shuffles once into k summary rows, and F plus the
    eta-squared effect size are O(k) arithmetic on that summary
    (broadcast of a one-row grand-mean relation). Stats edges: F at
    4dp, eta^2 at 6dp."""
    e = load(spark, sf_dir, "events")
    g = e.groupBy(F.col("event_type").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("mu"),
        F.var_samp("value").alias("v"),
    )
    tot = g.agg(
        F.sum("n").alias("nn"),
        F.count(F.lit(1)).alias("k"),
        (F.sum(F.col("n") * F.col("mu")) / F.sum("n")).alias("grand"),
    )
    j = g.crossJoin(F.broadcast(tot))
    ssb = F.sum(F.col("n") * F.pow(F.col("mu") - F.col("grand"), 2))
    ssw = F.sum((F.col("n") - 1) * F.col("v"))
    return j.groupBy("nn", "k").agg(
        F.round(
            (ssb / (F.max("k") - 1)) / (ssw / (F.max("nn") - F.max("k"))), 4
        ).alias("f_stat_r"),
        F.round(ssb / (ssb + ssw), 6).alias("eta_sq_r"),
    ).select(
        F.col("nn").cast("long").alias("n_obs"),
        F.col("k").cast("long").alias("n_groups"),
        "f_stat_r",
        "eta_sq_r",
    )


@register(
    "analytics_benford",
    oracle="""
    WITH d AS (
        SELECT CAST(floor(o_totalprice
                          / pow(10, floor(log10(o_totalprice))))
                    AS BIGINT) AS digit
        FROM orders WHERE o_totalprice > 0
    )
    SELECT digit,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE), 6)
               AS obs_share_r,
           round(log10(1 + 1.0 / digit), 6) AS exp_share_r,
           round(abs(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE)
                     - log10(1 + 1.0 / digit)), 6) AS abs_dev_r
    FROM d GROUP BY digit
    """,
)
def analytics_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    anomaly/fraud screen a warehouse runs on money columns: observed
    leading-digit shares vs the log10(1+1/d) expectation, with
    per-digit absolute deviation. The digit extraction is closed-form
    (floor over log10 — no string casts), so the whole audit is one
    map expression + one 9-row aggregate; the share denominators come
    from a window over the 9-row result, never a second scan."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.floor(
            F.col("o_totalprice")
            / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
        )
        .cast("long")
        .alias("digit")
    )
    wall = Window.partitionBy()
    cells = d.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    share = F.col("n") / F.sum("n").over(wall).cast("double")
    exp = F.log10(1 + 1.0 / F.col("digit"))
    return cells.select(
        "digit",
        "n",
        F.round(share, 6).alias("obs_share_r"),
        F.round(exp, 6).alias("exp_share_r"),
        F.round(F.abs(share - exp), 6).alias("abs_dev_r"),
    )


@register(
    "analytics_period_over_period",
    oracle="""
    WITH m AS (
        SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
                   AS ym,
               sum(o_totalprice) AS rev,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT ym, n_orders, round(rev, 2) AS rev_r,
           round((rev - lag(rev) OVER (ORDER BY ym))
                 / lag(rev) OVER (ORDER BY ym), 6) AS mom_pct_r,
           round((rev - lag(rev, 12) OVER (ORDER BY ym))
                 / lag(rev, 12) OVER (ORDER BY ym), 6) AS yoy_pct_r
    FROM m
    """,
)
def analytics_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth: one monthly
    aggregate of the fact table, then lag(1)/lag(12) deltas over the
    ~|months| summary — the period-comparison shape behind every KPI
    dashboard. Growth ratios are computed from the UNROUNDED sums on
    both sides (ratio-of-sums at the 6dp stats grain); the revenue
    edge itself rounds at the exact-decimal 2dp money grain. The
    ordered lag window runs over the tiny month summary, so the
    global sort is free at any fact scale."""
    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("long")
        .alias("ym")
    ).agg(
        F.sum("o_totalprice").alias("rev"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    w = Window.orderBy("ym")
    prev = F.lag("rev").over(w)
    prev12 = F.lag("rev", 12).over(w)
    return m.select(
        "ym",
        "n_orders",
        F.round("rev", 2).alias("rev_r"),
        F.round((F.col("rev") - prev) / prev, 6).alias("mom_pct_r"),
        F.round((F.col("rev") - prev12) / prev12, 6).alias("yoy_pct_r"),
    )


@register(
    "analytics_cohort_ltv",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               min(CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT))
                   AS cohort_m
        FROM orders GROUP BY o_custkey
    ),
    sized AS (
        SELECT cohort_m, count(*) AS cohort_size
        FROM firsts GROUP BY cohort_m
    ),
    aged AS (
        SELECT f.cohort_m,
               CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                    AS BIGINT) - f.cohort_m AS age_m,
               sum(o.o_totalprice) AS rev
        FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    )
    SELECT a.cohort_m,
           a.age_m,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           round(sum(a.rev) OVER (PARTITION BY a.cohort_m ORDER BY a.age_m),
                 2) AS cum_rev_r
    FROM aged a JOIN sized s ON a.cohort_m = s.cohort_m
    """,
)
def analytics_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers cohorted by first-order
    month (linear month index — no date arithmetic at the edge),
    revenue aggregated per (cohort, age-in-months), then the running
    cumulative sum per cohort divided by cohort size = the LTV curve
    finance actually plots (cum revenue + cohort size; the per-user
    ratio is a client-side division — emitting it would round a
    money/2^k dyadic below its exact decimal grain, the half-boundary
    trap CLAUDE.md bans). Two keyed aggregates (first-order month,
    then cohort/age) + one cumulative window over the tiny
    cohort-age summary; the per-customer first-purchase aggregate is
    the only fact-scale shuffle. Money edge at the exact 2dp grain."""
    o = load(spark, sf_dir, "orders")
    m = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    firsts = o.groupBy("o_custkey").agg(F.min(m).alias("cohort_m"))
    sized = firsts.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    aged = (
        o.join(firsts, "o_custkey")
        .groupBy("cohort_m", (m - F.col("cohort_m")).alias("age_m"))
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age_m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return aged.join(F.broadcast(sized), "cohort_m").select(
        "cohort_m",
        "age_m",
        F.col("cohort_size").cast("long").alias("cohort_size"),
        F.round(F.sum("rev").over(w), 2).alias("cum_rev_r"),
    )


@register(
    "analytics_survival_km",
    oracle="""
    WITH x AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    y AS (
        SELECT user_id, ts,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sess
        FROM x
    ),
    span AS (
        SELECT CAST(floor(epoch(max(ts) - min(ts)) / 60) AS BIGINT) AS dur,
               (max(ts) < (SELECT max(ts) FROM events) - INTERVAL 1 HOUR)
                   AS completed
        FROM y GROUP BY user_id, sess
    ),
    steps AS (
        SELECT dur,
               CAST(sum(CASE WHEN completed THEN 1 ELSE 0 END) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS m
        FROM span GROUP BY dur
    ),
    risk0 AS (
        SELECT dur, d,
               CAST((SELECT count(*) FROM span)
                    - coalesce(sum(m) OVER (ORDER BY dur
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS n_at_risk
        FROM steps
    ),
    risk AS (
        SELECT dur, d, n_at_risk,
               CASE WHEN max(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END)
                        OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING) = 1
                    THEN 0.0
                    ELSE round(exp(sum(CASE WHEN d < n_at_risk
                                  THEN ln(1.0 - CAST(d AS DOUBLE) / n_at_risk)
                                  ELSE 0.0 END)
                         OVER (ORDER BY dur ROWS UNBOUNDED PRECEDING)), 6)
               END AS survival_r
        FROM risk0
    )
    SELECT dur AS duration_min, n_at_risk, d AS n_events, survival_r
    FROM risk WHERE d > 0
    """,
)
def analytics_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier product-limit survival estimator over SESSION
    lifetimes (gaps-and-islands sessionization, 30-min gap; duration
    = whole minutes first-to-last event; right-censored when the
    session is still open near corpus end, i.e. last event within 1h
    of max ts). The estimator is pure sufficient-statistics window
    algebra: per-session aggregate -> groupBy duration -> n-at-risk
    from a running count -> survival as exp(running sum of
    log-hazards) — the cumulative-product-as-exp-sum-log identity
    (no recursion, no UDF). Censoring enters only through the
    at-risk denominators, as in the textbook estimator. The running
    windows order on the tiny duration summary; the only fact-scale
    work is the sessionize shuffle on user_id. 6dp transcendental
    edge. NOTE the window sum in `risk` runs over ALL duration rows
    (d=0 rows contribute ln(1)=0), matching the Spark side exactly."""
    e = load(spark, sf_dir, "events")
    wkey = Window.partitionBy("user_id").orderBy("ts")
    x = e.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(wkey).isNull()
            | (
                F.col("ts").cast("double")
                - F.lag("ts").over(wkey).cast("double")
                >= 1800
            ),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    y = x.select(
        "user_id",
        "ts",
        F.sum("brk")
        .over(wkey.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess"),
    )
    corpus_end = e.agg(F.max("ts").alias("end_ts"))
    span = (
        y.groupBy("user_id", "sess")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        .crossJoin(F.broadcast(corpus_end))
        .select(
            F.floor(
                (F.col("t1").cast("double") - F.col("t0").cast("double")) / 60
            )
            .cast("long")
            .alias("dur"),
            (
                F.col("t1") < F.col("end_ts") - F.expr("INTERVAL 1 HOUR")
            ).alias("completed"),
        )
    )
    steps = span.groupBy("dur").agg(
        F.sum(F.when(F.col("completed"), 1).otherwise(0)).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("m"),
    )
    n_total = span.agg(F.count(F.lit(1)).alias("n_total"))
    wb = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    wc = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    risk = steps.crossJoin(F.broadcast(n_total)).select(
        "dur",
        "d",
        (F.col("n_total") - F.coalesce(F.sum("m").over(wb), F.lit(0)))
        .cast("long")
        .alias("n_at_risk"),
    )
    log_term = F.when(
        F.col("d") < F.col("n_at_risk"),
        F.log(1.0 - F.col("d").cast("double") / F.col("n_at_risk")),
    ).otherwise(F.lit(0.0))
    hit_zero = F.max(
        F.when(F.col("d") == F.col("n_at_risk"), 1).otherwise(0)
    ).over(wc)
    surv = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.round(F.exp(F.sum(log_term).over(wc)), 6)
    )
    return (
        risk.select(
            F.col("dur").alias("duration_min"),
            "n_at_risk",
            F.col("d").alias("n_events"),
            surv.alias("survival_r"),
        )
        .filter(F.col("n_events") > 0)
    )


@register(
    "analytics_path_flows",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS step
        FROM events
    ),
    p AS (
        SELECT user_id,
               max(CASE WHEN step = 1 THEN event_type END) AS s1,
               max(CASE WHEN step = 2 THEN event_type END) AS s2,
               max(CASE WHEN step = 3 THEN event_type END) AS s3
        FROM ranked WHERE step <= 3 GROUP BY user_id
    )
    SELECT concat(coalesce(s1, '-'), '>', coalesce(s2, '-'), '>',
                  coalesce(s3, '-'))  AS path3,
           CAST(count(*) AS BIGINT)   AS n_users
    FROM p GROUP BY 1
    """,
)
def analytics_path_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sankey-style user-path analysis: each user's first three event
    types (deterministic order: ts then event_id) concatenated into a
    path string, counted per path — the flow diagram feeding every
    onboarding dashboard. One user-keyed window ranks steps, a
    conditional-max pivot collapses to one row per user (never a
    collect_list of the whole history), and the path space is
    |event_types|^3 so the final aggregate is tiny. At 100 TB the
    ranking window is the only fact-scale stage and it reuses the
    user_id partitioning every other per-user operator shuffles on."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = e.select(
        "user_id", "event_type", F.row_number().over(w).alias("step")
    ).filter(F.col("step") <= 3)
    pick = lambda i: F.max(F.when(F.col("step") == i, F.col("event_type")))
    p = ranked.groupBy("user_id").agg(
        pick(1).alias("s1"), pick(2).alias("s2"), pick(3).alias("s3")
    )
    path = F.concat_ws(
        ">",
        F.coalesce(F.col("s1"), F.lit("-")),
        F.coalesce(F.col("s2"), F.lit("-")),
        F.coalesce(F.col("s3"), F.lit("-")),
    )
    return p.groupBy(path.alias("path3")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


@register(
    "analytics_streak_longest",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx
        FROM events
    ),
    grp AS (
        SELECT user_id, day_idx,
               day_idx - row_number() OVER (PARTITION BY user_id
                                            ORDER BY day_idx) AS island
        FROM days
    ),
    streaks AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS streak_len,
               min(day_idx) AS streak_start
        FROM grp GROUP BY user_id, island
    )
    SELECT user_id,
           max(streak_len) AS longest_streak,
           CAST(min(streak_start) FILTER (
               streak_len = (SELECT max(s2.streak_len) FROM streaks s2
                             WHERE s2.user_id = streaks.user_id))
             AS BIGINT) AS first_best_start
    FROM streaks GROUP BY user_id
    """,
)
def analytics_streak_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the classic
    gaps-and-islands at daily grain: distinct active days, island id
    = day_idx - row_number (constant within a consecutive run), one
    groupBy per (user, island), then per-user argmax with a
    deterministic earliest-start tie-break. Two aggregates + one
    ranking window, all partitioned on user_id — one logical shuffle
    key end-to-end. The correlated-max oracle decorrelates to the
    same window form under Catalyst."""
    e = load(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_idx")
    grp = days.select(
        "user_id",
        "day_idx",
        (F.col("day_idx") - F.row_number().over(w)).alias("island"),
    )
    streaks = grp.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).cast("long").alias("streak_len"),
        F.min("day_idx").alias("streak_start"),
    )
    wmax = Window.partitionBy("user_id")
    return (
        streaks.withColumn("best", F.max("streak_len").over(wmax))
        .filter(F.col("streak_len") == F.col("best"))
        .groupBy("user_id")
        .agg(
            F.max("streak_len").alias("longest_streak"),
            F.min("streak_start").cast("long").alias("first_best_start"),
        )
    )


@register(
    "analytics_bootstrap_ci",
    oracle="""
    WITH reps AS (
        SELECT b.b AS b,
               CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                   / (count(*) * 100) AS mu
        FROM events e
        CROSS JOIN (SELECT unnest(range(0, 32)) AS b) b
        WHERE CAST('0x' || substr(md5(CAST(e.event_id AS VARCHAR)
                                      || '-' || CAST(b.b AS VARCHAR)), 1, 2)
                   AS BIGINT) < 128
        GROUP BY b.b
    )
    SELECT CAST(count(*) AS BIGINT)      AS n_replicates,
           round(avg(mu), 6)             AS boot_mean_r,
           round(min(mu), 6)             AS ci_lo_r,
           round(max(mu), 6)             AS ci_hi_r,
           round(stddev_samp(mu), 6)     AS boot_se_r
    FROM reps
    """,
)
def analytics_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic subsample bootstrap for the mean of event values:
    32 half-density replicates drawn by content-keyed md5(event_id, b)
    coin flips, each replicate's mean aggregated in ONE pass (the
    replicate id explodes 32x BUT the subsample filter keeps the
    expected shuffle volume at 16x row-count of tiny (b, partial)
    pairs — at 100 TB you push the replicate loop into the partial
    aggregate exactly like this, never 32 separate scans). The CI
    readout (range + bootstrap SE of the replicate means) is O(B)
    arithmetic. Content-keyed draws make the whole resampling
    rerun-stable — the determinism discipline of every sampling
    operator here."""
    from hive_task_spark.functions import exact

    e = load(spark, sf_dir, "events")
    b = spark.range(0, 32).select(F.col("id").alias("b"))
    # r18: (a) the 32x replicate explosion evaluated 3.2M md5s in the
    # single-split events scan's ONE task — a cores-derived repartition
    # before the exploding crossJoin restores parallelism (the r17
    # Class-B recipe; guide §2.5); (b) that is only value-neutral
    # because mu now moves through exact BIGINT cents + one division on
    # BOTH engines (events.value is a 2dp grid; avg of grid cells is
    # the r16 grid-average class, whose double-sum order the old form
    # pinned to file order). The outer CI aggregates see 32
    # bit-identical mu inputs, unchanged.
    keyed = (
        e.select("event_id", "value")
        .repartition(spark.sparkContext.defaultParallelism)
        .crossJoin(F.broadcast(b))
        .filter(
            F.expr(
                "CAST(conv(substr(md5(concat(CAST(event_id AS STRING), '-',"
                " CAST(b AS STRING))), 1, 2), 16, 10) AS BIGINT)"
            )
            < 128
        )
    )
    reps = keyed.groupBy("b").agg(
        (
            F.sum(exact.cents(F.col("value"))).cast("double")
            / (F.count(F.lit(1)) * 100)
        ).alias("mu")
    )
    return reps.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
        F.round(F.avg("mu"), 6).alias("boot_mean_r"),
        F.round(F.min("mu"), 6).alias("ci_lo_r"),
        F.round(F.max("mu"), 6).alias("ci_hi_r"),
        F.round(F.stddev_samp("mu"), 6).alias("boot_se_r"),
    )


@register(
    "analytics_ols_normal_equations",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               sum(l_quantity)            AS x1,
               CAST(count(*) AS DOUBLE)   AS x2,
               sum(l_extendedprice)       AS y
        FROM lineitem GROUP BY l_orderkey
    ),
    m AS (
        SELECT count(*) AS n,
               sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
               sum(x1 * x1) AS s11, sum(x1 * x2) AS s12,
               sum(x2 * x2) AS s22, sum(x1 * y) AS s1y,
               sum(x2 * y) AS s2y
        FROM per_order
    ),
    c AS (  -- centered second moments
        SELECT n,
               s11 - s1 * s1 / n AS a11, s12 - s1 * s2 / n AS a12,
               s22 - s2 * s2 / n AS a22,
               s1y - s1 * sy / n AS b1,  s2y - s2 * sy / n AS b2,
               s1 / n AS m1, s2 / n AS m2, sy / n AS my
        FROM m
    )
    SELECT CAST(n AS BIGINT) AS n_orders,
           round((b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12), 6)
               AS beta_qty_r,
           round((b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12), 6)
               AS beta_items_r,
           round(my - (b1 * a22 - b2 * a12) / (a11 * a22 - a12 * a12) * m1
                    - (b2 * a11 - b1 * a12) / (a11 * a22 - a12 * a12) * m2,
                 4) AS intercept_r
    FROM c
    """,
)
def analytics_ols_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature multivariate OLS solved in closed form via the
    normal equations (Cramer's rule on the centered 2x2 moment
    matrix): order revenue regressed on total quantity and line
    count. The entire regression is NINE sufficient statistics from
    one aggregate pass — the pattern that lets linear models fit on
    100 TB without any iterative solver or driver-side matrix: the
    moment sums are map-side combinable, the solve is O(1) driver
    arithmetic in the plan. regr_* builtins cover the univariate
    case (`agg_corr_regression`); this is the multivariate step
    beyond them. 6dp coefficient / 4dp intercept stat edges."""
    li = load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("x1"),
        F.count(F.lit(1)).cast("double").alias("x2"),
        F.sum("l_extendedprice").alias("y"),
    )
    m = per_order.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    n = F.col("n")
    c = m.select(
        n,
        (F.col("s11") - F.col("s1") * F.col("s1") / n).alias("a11"),
        (F.col("s12") - F.col("s1") * F.col("s2") / n).alias("a12"),
        (F.col("s22") - F.col("s2") * F.col("s2") / n).alias("a22"),
        (F.col("s1y") - F.col("s1") * F.col("sy") / n).alias("b1"),
        (F.col("s2y") - F.col("s2") * F.col("sy") / n).alias("b2"),
        (F.col("s1") / n).alias("m1"),
        (F.col("s2") / n).alias("m2"),
        (F.col("sy") / n).alias("my"),
    )
    det = F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12")
    beta1 = (F.col("b1") * F.col("a22") - F.col("b2") * F.col("a12")) / det
    beta2 = (F.col("b2") * F.col("a11") - F.col("b1") * F.col("a12")) / det
    return c.select(
        F.col("n").cast("long").alias("n_orders"),
        F.round(beta1, 6).alias("beta_qty_r"),
        F.round(beta2, 6).alias("beta_items_r"),
        F.round(
            F.col("my") - beta1 * F.col("m1") - beta2 * F.col("m2"), 4
        ).alias("intercept_r"),
    )


@register(
    "analytics_changepoint_cusum",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               avg(value) AS v
        FROM events GROUP BY 1
    ),
    stats AS (SELECT avg(v) AS mu, count(*) AS n FROM daily),
    cusum AS (
        SELECT d.day_idx,
               sum(d.v - s.mu) OVER (ORDER BY d.day_idx
                                     ROWS UNBOUNDED PRECEDING) AS s_t
        FROM daily d, stats s
    )
    SELECT day_idx AS changepoint_day,
           round(abs(s_t), 4) AS max_abs_cusum_r,
           (SELECT CAST(n AS BIGINT) FROM stats) AS n_days
    FROM cusum
    ORDER BY abs(s_t) DESC, day_idx LIMIT 1
    """,
)
def analytics_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the corpus-wide daily value
    series: the cumulative sum of deviations from the global mean
    peaks (in absolute value) at the most likely regime-shift day —
    the classic offline CUSUM statistic, fully window-expressible
    (no recursion: S_t = running_sum(x) - t*mu needs only one
    ordered cumsum and a broadcast scalar mean). argmax with
    day tie-break via TakeOrderedAndProject. The series is ~|days|
    rows, so everything after the daily aggregate is free; at 100 TB
    per-segment changepoints partition the window by the segment
    key."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx")
    ).agg(F.avg("value").alias("v"))
    stats = daily.agg(
        F.avg("v").alias("mu"), F.count(F.lit(1)).alias("n")
    )
    wc = Window.orderBy("day_idx").rowsBetween(Window.unboundedPreceding, 0)
    cusum = daily.crossJoin(F.broadcast(stats)).select(
        "day_idx",
        F.sum(F.col("v") - F.col("mu")).over(wc).alias("s_t"),
        F.col("n"),
    )
    return (
        cusum.select(
            F.col("day_idx").alias("changepoint_day"),
            F.round(F.abs("s_t"), 4).alias("max_abs_cusum_r"),
            F.col("n").cast("long").alias("n_days"),
        )
        .orderBy(F.abs("s_t").desc(), "changepoint_day")
        .limit(1)
    )


@register(
    "analytics_proration_largest_remainder",
    oracle="""
    WITH li AS (
        SELECT l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS ep_cents
        FROM lineitem WHERE l_orderkey < 1000
    ),
    od AS (
        SELECT o_orderkey,
               CAST(floor(o_totalprice) AS BIGINT) AS rebate_cents
        FROM orders WHERE o_orderkey < 1000
    ),
    base AS (
        SELECT li.l_orderkey, li.l_linenumber, od.rebate_cents,
               li.ep_cents,
               sum(li.ep_cents) OVER (PARTITION BY li.l_orderkey)
                   AS sum_ep,
               (od.rebate_cents * li.ep_cents) //
                   sum(li.ep_cents) OVER (PARTITION BY li.l_orderkey)
                   AS base_cents
        FROM li JOIN od ON li.l_orderkey = od.o_orderkey
    ),
    ranked AS (
        SELECT *,
               rebate_cents * ep_cents - base_cents * sum_ep AS rem_num,
               rebate_cents - sum(base_cents)
                   OVER (PARTITION BY l_orderkey) AS shortfall,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY rebate_cents * ep_cents - base_cents * sum_ep
                            DESC, l_linenumber) AS rk
        FROM base
    )
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(base_cents + CASE WHEN rk <= shortfall THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_cents,
           CAST(sum(base_cents + CASE WHEN rk <= shortfall THEN 1 ELSE 0 END)
                    OVER (PARTITION BY l_orderkey) = rebate_cents
                AS BIGINT) AS order_exact
    FROM ranked
    """,
)
def analytics_proration_largest_remainder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact money proration by the largest-remainder (Hamilton)
    method: a 1%-of-order rebate, fixed in whole cents, is allocated
    across the order's line items proportionally to extended price —
    integer floor division gives each line its base share, and the
    leftover cents (rebate - sum(base)) go one each to the lines with
    the largest fractional remainders (line-number tie-break). The
    classic finance requirement "allocations must sum to the invoiced
    amount exactly" that naive round(share) violates. All arithmetic
    is int64 (remainder comparison uses the exact integer numerator
    rebate*ep - base*sum_ep, never a float), so the edge is
    bit-stable on both engines; `order_exact` proves conservation per
    order. Two window passes over one l_orderkey partitioning — a
    single hash-partition exchange at scale, no driver math."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .alias("ep_cents"),
        )
    )
    od = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 1000)
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.floor("o_totalprice").cast("long").alias("rebate_cents"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    base = (
        li.join(F.broadcast(od), "l_orderkey")
        .withColumn("sum_ep", F.sum("ep_cents").over(w))
        .withColumn(
            "base_cents",
            F.expr("(rebate_cents * ep_cents) div sum_ep"),
        )
    )
    ranked = (
        base.withColumn(
            "rem_num",
            F.col("rebate_cents") * F.col("ep_cents")
            - F.col("base_cents") * F.col("sum_ep"),
        )
        .withColumn(
            "shortfall", F.col("rebate_cents") - F.sum("base_cents").over(w)
        )
        .withColumn(
            "rk",
            F.row_number().over(
                w.orderBy(F.col("rem_num").desc(), "l_linenumber")
            ),
        )
    )
    alloc = F.col("base_cents") + F.when(
        F.col("rk") <= F.col("shortfall"), F.lit(1)
    ).otherwise(F.lit(0))
    return ranked.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        alloc.cast("long").alias("alloc_cents"),
        (F.sum(alloc).over(w) == F.col("rebate_cents"))
        .cast("long")
        .alias("order_exact"),
    )


@register(
    "analytics_fifo_inventory_matching",
    oracle="""
    WITH flows AS (
        SELECT l_partkey, l_orderkey, l_linenumber, l_linestatus,
               CAST(l_quantity AS BIGINT) AS qty,
               sum(CAST(l_quantity AS BIGINT)) OVER (
                   PARTITION BY l_partkey, l_linestatus
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING) AS cum_end
        FROM lineitem WHERE l_partkey < 150
    ),
    inflow AS (
        SELECT l_partkey, l_orderkey AS in_order, l_linenumber AS in_line,
               cum_end - qty AS in_lo, cum_end AS in_hi
        FROM flows WHERE l_linestatus = 'F'
    ),
    outflow AS (
        SELECT l_partkey, l_orderkey AS out_order, l_linenumber AS out_line,
               cum_end - qty AS out_lo, cum_end AS out_hi
        FROM flows WHERE l_linestatus = 'O'
    )
    SELECT i.l_partkey,
           i.in_order, CAST(i.in_line AS BIGINT) AS in_line,
           o.out_order, CAST(o.out_line AS BIGINT) AS out_line,
           CAST(least(i.in_hi, o.out_hi) - greatest(i.in_lo, o.out_lo)
                AS BIGINT) AS matched_qty
    FROM inflow i JOIN outflow o ON i.l_partkey = o.l_partkey
    WHERE i.in_lo < o.out_hi AND o.out_lo < i.in_hi
    """,
)
def analytics_fifo_inventory_matching(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FIFO lot matching — the inventory/cost-basis kernel: inflow
    lots (linestatus 'F') and outflow demands ('O') per part are each
    laid on a cumulative-quantity number line in ship-date order, and
    a lot funds a demand exactly where their cumulative intervals
    overlap: matched = min(hi,hi) - max(lo,lo). This closed form
    replaces the sequential "walk both lists" algorithm with two
    per-(part,status) window cumsums and one equi-join with an
    interval predicate — each FIFO assignment appears exactly once,
    quantities are int64-exact, and conservation (sum of matches per
    lot = min(lot, remaining demand)) is implied by the interval
    algebra. At 100 TB both cumsums and the join hash-partition on
    partkey — one exchange, no per-key iteration, and a part's match
    count is O(inflows + outflows), never a cross product."""
    w = (
        Window.partitionBy("l_partkey", "l_linestatus")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fl = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_partkey") < 150)
        .withColumn("qty", F.col("l_quantity").cast("long"))
        .withColumn("cum_end", F.sum("qty").over(w))
        .withColumn("cum_lo", F.col("cum_end") - F.col("qty"))
    )
    inflow = fl.filter(F.col("l_linestatus") == "F").select(
        "l_partkey",
        F.col("l_orderkey").alias("in_order"),
        F.col("l_linenumber").cast("long").alias("in_line"),
        F.col("cum_lo").alias("in_lo"),
        F.col("cum_end").alias("in_hi"),
    )
    outflow = fl.filter(F.col("l_linestatus") == "O").select(
        "l_partkey",
        F.col("l_orderkey").alias("out_order"),
        F.col("l_linenumber").cast("long").alias("out_line"),
        F.col("cum_lo").alias("out_lo"),
        F.col("cum_end").alias("out_hi"),
    )
    return (
        inflow.join(outflow, "l_partkey")
        .filter(
            (F.col("in_lo") < F.col("out_hi")) & (F.col("out_lo") < F.col("in_hi"))
        )
        .select(
            "l_partkey",
            "in_order",
            "in_line",
            "out_order",
            "out_line",
            (
                F.least("in_hi", "out_hi") - F.greatest("in_lo", "out_lo")
            )
            .cast("long")
            .alias("matched_qty"),
        )
    )


@register(
    "analytics_lift_gains_table",
    oracle="""
    WITH scored AS (
        SELECT c.c_custkey, c.c_acctbal,
               CASE WHEN EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_orderpriority = '1-URGENT')
                    THEN 1 ELSE 0 END AS responder,
               ntile(10) OVER (ORDER BY c.c_acctbal DESC, c.c_custkey)
                   AS decile
        FROM customer c
    ),
    per AS (
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(responder) AS BIGINT) AS responders
        FROM scored GROUP BY decile
    ),
    tot AS (SELECT sum(responders) AS r_tot, sum(n) AS n_tot FROM per)
    SELECT CAST(per.decile AS BIGINT) AS decile, per.n, per.responders,
           round(per.responders * 1.0 / per.n, 6) AS resp_rate_r,
           round(sum(per.responders) OVER (ORDER BY per.decile
                     ROWS UNBOUNDED PRECEDING) * 1.0 / tot.r_tot, 6)
               AS cum_capture_r,
           round((per.responders * 1.0 / per.n)
                 / (tot.r_tot * 1.0 / tot.n_tot), 6) AS lift_r
    FROM per, tot
    """,
)
def analytics_lift_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift & gains chart — the standard tabular evaluation of
    a propensity score: customers ranked by score (account balance as
    the stand-in model output, custkey tie-break), cut into ntile(10)
    deciles, and each decile reports response rate, cumulative
    capture of all responders, and lift over the base rate. Response
    = placed at least one URGENT-priority order (left-semi join).
    This is how ranking models are accepted/rejected in CRM/ads
    pipelines when AUC alone is too abstract. Exact integer
    numerators everywhere; ratios rounded at 6dp. One sort for the
    ntile (at 100 TB: range-partitioned global sort), then a
    10-row summary — the expensive part is exactly one pass."""
    c = load(spark, sf_dir, "customer")
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    scored = (
        c.join(F.broadcast(urgent.withColumn("responder", F.lit(1))), "c_custkey", "left")
        .select(
            "c_custkey",
            "c_acctbal",
            F.coalesce("responder", F.lit(0)).alias("responder"),
        )
        .withColumn(
            "decile",
            F.ntile(10).over(
                Window.orderBy(F.col("c_acctbal").desc(), "c_custkey")
            ),
        )
    )
    per = scored.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("responder").cast("long").alias("responders"),
    )
    tot = per.agg(
        F.sum("responders").alias("r_tot"), F.sum("n").alias("n_tot")
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n",
            "responders",
            F.round(F.col("responders") / F.col("n"), 6).alias("resp_rate_r"),
            F.round(
                F.sum("responders").over(wcum) / F.col("r_tot"), 6
            ).alias("cum_capture_r"),
            F.round(
                (F.col("responders") / F.col("n"))
                / (F.col("r_tot") / F.col("n_tot")),
                6,
            ).alias("lift_r"),
        )
    )


@register(
    "analytics_peak_concurrency",
    oracle="""
    WITH s AS (
        SELECT user_id,
               CAST(epoch_us(min(ts)) AS BIGINT)                AS st,
               CAST(epoch_us(max(ts)) + 1800000000 AS BIGINT)   AS en
        FROM events
        GROUP BY user_id, date_trunc('day', ts)
    ),
    pts AS (
        SELECT st AS t, 1 AS d FROM s
        UNION ALL
        SELECT en AS t, -1 AS d FROM s
    ),
    run AS (
        SELECT t, d,
               sum(d) OVER (ORDER BY t, d ROWS UNBOUNDED PRECEDING) AS c
        FROM pts
    )
    SELECT CAST(c AS BIGINT) AS peak_concurrency,
           CAST(t AS BIGINT) AS first_peak_at_us,
           (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_intervals
    FROM run ORDER BY c DESC, t LIMIT 1
    """,
)
def analytics_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-concurrency sweep line — max simultaneously-active user
    sessions (capacity planning's "how many servers at the spike").
    Activity intervals are per-(user, day) spans padded by the 30-min
    idle timeout, half-open [start, end): each interval contributes a
    +1 point at start and a -1 at end, the points are swept in
    (t, delta) order (-1 before +1 at the same instant, so a session
    ending exactly when another starts never double-counts), and the
    running sum IS the concurrency curve; its argmax (earliest-time
    tie-break) is the answer. The O(n log n) closed form of the
    naive per-timestamp recount. The interval build is one
    map-side-combined groupBy; the sweep itself runs on 2x|intervals|
    points — at 100 TB partition the sweep by calendar day (intervals
    are day-bounded here) and take the max of per-day peaks."""
    e = load(spark, sf_dir, "events")
    s = e.groupBy("user_id", F.date_trunc("day", "ts").alias("d")).agg(
        F.unix_micros(F.min("ts")).alias("st"),
        (F.unix_micros(F.max("ts")) + 1800000000).alias("en"),
    )
    pts = s.select(F.col("st").alias("t"), F.lit(1).alias("d")).unionByName(
        s.select(F.col("en").alias("t"), F.lit(-1).alias("d"))
    )
    wrun = Window.orderBy("t", "d").rowsBetween(Window.unboundedPreceding, 0)
    run = pts.withColumn("c", F.sum("d").over(wrun))
    n = s.agg(F.count(F.lit(1)).cast("long").alias("n_intervals"))
    return (
        run.crossJoin(F.broadcast(n))
        .select(
            F.col("c").cast("long").alias("peak_concurrency"),
            F.col("t").cast("long").alias("first_peak_at_us"),
            "n_intervals",
        )
        .orderBy(F.col("peak_concurrency").desc(), "first_peak_at_us")
        .limit(1)
    )


@register(
    "analytics_bom_explosion",
    oracle="""
    WITH RECURSIVE parts AS (
        SELECT p_partkey FROM part
    ),
    edges AS (
        SELECT p_partkey AS child, p_partkey // 10 AS parent,
               CAST(p_partkey % 3 + 1 AS BIGINT) AS qty
        FROM parts WHERE p_partkey >= 10
    ),
    walk AS (
        SELECT child, parent, qty AS units FROM edges
        UNION ALL
        SELECT w.child, e.parent, w.units * e.qty
        FROM walk w JOIN edges e ON w.parent = e.child
    )
    SELECT parent AS root_part,
           CAST(count(*) AS BIGINT) AS n_descendants,
           CAST(sum(units) AS BIGINT) AS total_units
    FROM walk
    WHERE parent < 10
    GROUP BY parent
    """,
)
def analytics_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials explosion — transitive closure WITH
    multiplicities: a synthetic containment forest over the part
    table (child p sits inside parent p div 10, qty = p mod 3 + 1)
    is walked to the roots, multiplying edge quantities along each
    path, and each root reports its full descendant count and total
    effective units — the manufacturing/BOM rollup (and the same
    algebra as account-hierarchy consolidation in finance). The
    part-key domain bounds the forest depth at 4 levels, so the walk
    is a statically unrolled chain of 3 broadcast self-joins (each
    level's frontier shrinks 10x — the oracle spells it as a
    recursive CTE, Spark runs the unrolled equi-join plan; at 100 TB
    the edge table hash-partitions by child and each level is one
    shuffle, with BFS frontiers this is delta-iteration)."""
    edges = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_partkey") >= 10)
        .select(
            F.col("p_partkey").alias("child"),
            F.expr("p_partkey div 10").alias("parent"),
            (F.col("p_partkey") % 3 + 1).cast("long").alias("qty"),
        )
    )
    # level-1 paths: every edge
    walk = edges.select("child", "parent", F.col("qty").alias("units"))
    frontier = walk
    for _ in range(3):  # key domain <= 5 digits -> depth <= 4
        nxt = (
            frontier.alias("w")
            .join(edges.alias("e"), F.col("w.parent") == F.col("e.child"))
            .select(
                F.col("w.child").alias("child"),
                F.col("e.parent").alias("parent"),
                (F.col("w.units") * F.col("e.qty")).alias("units"),
            )
        )
        walk = walk.unionByName(nxt)
        frontier = nxt
    return (
        walk.filter(F.col("parent") < 10)
        .groupBy(F.col("parent").alias("root_part"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_descendants"),
            F.sum("units").cast("long").alias("total_units"),
        )
    )


@register(
    "analytics_interval_day_split",
    oracle="""
    WITH s AS (
        SELECT user_id,
               CAST(epoch_us(min(ts)) AS BIGINT)              AS st,
               CAST(epoch_us(max(ts)) + 1800000000 AS BIGINT) AS en
        FROM events
        GROUP BY user_id, date_trunc('day', ts)
    ),
    split AS (
        SELECT user_id, st, en,
               unnest(range(st // 86400000000,
                            (en - 1) // 86400000000 + 1)) AS day_idx
        FROM s
    )
    SELECT user_id, CAST(day_idx AS BIGINT) AS day_idx,
           CAST(sum(least(en, (day_idx + 1) * 86400000000)
                    - greatest(st, day_idx * 86400000000)) AS BIGINT)
               AS busy_us,
           CAST(count(*) AS BIGINT) AS n_intervals
    FROM split
    GROUP BY user_id, day_idx
    """,
)
def analytics_interval_day_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-to-calendar proration — billing/utilization's "split
    each session across the days it touches": per-(user, day)
    activity intervals (30-min idle pad, so spans DO cross
    midnight) explode onto the epoch-day spine they overlap
    (sequence over integer day indices — at most 2 days here, never
    a wide blowup), and each covered day gets the exact µs overlap
    min(en, day_end) - max(st, day_start). The kernel behind
    per-day usage metering, SLA uptime attribution, and shift-cost
    allocation. Pure int64 µs arithmetic; explode fan-out is bounded
    by interval length / day, and the regrouping keys on (user, day)
    — the same hash partitioning the interval build already has."""
    e = load(spark, sf_dir, "events")
    s = e.groupBy("user_id", F.date_trunc("day", "ts").alias("d")).agg(
        F.unix_micros(F.min("ts")).alias("st"),
        (F.unix_micros(F.max("ts")) + 1800000000).alias("en"),
    )
    day_us = 86400000000
    split = s.select(
        "user_id",
        "st",
        "en",
        F.explode(
            F.sequence(
                F.expr(f"st div {day_us}"), F.expr(f"(en - 1) div {day_us}")
            )
        ).alias("day_idx"),
    )
    return split.groupBy("user_id", "day_idx").agg(
        F.sum(
            F.least(F.col("en"), (F.col("day_idx") + 1) * day_us)
            - F.greatest(F.col("st"), F.col("day_idx") * day_us)
        )
        .cast("long")
        .alias("busy_us"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    ).select(
        "user_id",
        F.col("day_idx").cast("long").alias("day_idx"),
        "busy_us",
        "n_intervals",
    )


@register(
    "analytics_forecast_backtest",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               round(sum(value), 2) AS a
        FROM events GROUP BY 1
    ),
    eval AS (
        SELECT t.day_idx, t.a, f.a AS fcst
        FROM daily t JOIN daily f ON f.day_idx = t.day_idx - 7
    ),
    naive AS (
        SELECT t.a, f.a AS prev
        FROM daily t JOIN daily f ON f.day_idx = t.day_idx - 1
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               round(avg(abs(a - fcst)), 2) AS mae_r,
               round(avg(abs(a - fcst) / abs(a)), 6) AS mape_r
        FROM eval
    ),
    d AS (SELECT round(avg(abs(a - prev)), 2) AS naive_mae FROM naive)
    SELECT m.n_days, m.mae_r, m.mape_r,
           round(m.mae_r / d.naive_mae, 6) AS mase_r
    FROM m, d
    """,
)
def analytics_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest of the seasonal-naive predictor (forecast =
    same weekday last week) on the corpus-wide daily value series:
    MAE, MAPE, and MASE (MAE scaled by the one-step-naive MAE — the
    scale-free skill score; MASE < 1 beats naive). This is the
    evaluation harness every demand/capacity forecasting pipeline
    runs before trusting a model; here the "model" is the baseline
    itself, giving an honest yardstick row. Daily totals round at
    the money grain BEFORE differencing so both engines difference
    identical operands (float-sum order never reaches the edge).
    Self-joins on day_idx-7/-1 keep gap days honest (a day without
    its lag is excluded, not zero-filled). Series is |days| rows —
    everything after the daily aggregate is free; per-segment
    backtests would partition all three CTEs by the segment key."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx")
    ).agg(F.round(F.sum("value"), 2).alias("a"))
    t = daily.alias("t")
    ev = t.join(
        daily.select((F.col("day_idx") + 7).alias("day_idx"), F.col("a").alias("fcst")),
        "day_idx",
    )
    nv = t.join(
        daily.select((F.col("day_idx") + 1).alias("day_idx"), F.col("a").alias("prev")),
        "day_idx",
    )
    m = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.avg(F.abs(F.col("a") - F.col("fcst"))), 2).alias("mae_r"),
        F.round(
            F.avg(F.abs(F.col("a") - F.col("fcst")) / F.abs("a")), 6
        ).alias("mape_r"),
    )
    d = nv.agg(F.round(F.avg(F.abs(F.col("a") - F.col("prev"))), 2).alias("naive_mae"))
    return m.crossJoin(F.broadcast(d)).select(
        "n_days",
        "mae_r",
        "mape_r",
        F.round(F.col("mae_r") / F.col("naive_mae"), 6).alias("mase_r"),
    )


@register(
    "analytics_ohlc_candles",
    oracle="""
    WITH pricked AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               value, ts, event_id,
               row_number() OVER (PARTITION BY event_type,
                                  CAST(floor(epoch(ts) / 86400) AS BIGINT)
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type,
                                  CAST(floor(epoch(ts) / 86400) AS BIGINT)
                                  ORDER BY ts DESC, event_id DESC) AS rn_z
        FROM events
    )
    SELECT event_type, day_idx,
           round(max(CASE WHEN rn_a = 1 THEN value END), 6) AS open_r,
           round(max(value), 6)                             AS high_r,
           round(min(value), 6)                             AS low_r,
           round(max(CASE WHEN rn_z = 1 THEN value END), 6) AS close_r,
           CAST(count(*) AS BIGINT)                         AS n_ticks
    FROM pricked
    GROUP BY event_type, day_idx
    """,
)
def analytics_ohlc_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick aggregation — open/high/low/close per
    (series, day), the finance/metrics downsampling that turns tick
    streams into charts and the shape behind "first/last value in
    window by event time". Open and close are true argmin/argmax by
    (ts, event_id) — the unique composite makes the pick
    deterministic where a bare arg_min(ts) would tie; high/low/count
    are plain aggregates fused into the same groupBy. One window
    pass + one hash aggregate, both partitioned on the same
    (series, day) key — a single exchange; at 100 TB this is the
    classic pre-aggregation that shrinks the stream 1000x before it
    ever reaches a join."""
    e = load(spark, sf_dir, "events").withColumn(
        "day_idx",
        F.floor(F.col("ts").cast("double") / 86400).cast("long"),
    )
    wgrp = Window.partitionBy("event_type", "day_idx")
    wa = wgrp.orderBy("ts", "event_id")
    wz = wgrp.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    pricked = e.select(
        "event_type",
        "day_idx",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wz).alias("rn_z"),
    )
    return pricked.groupBy("event_type", "day_idx").agg(
        F.round(F.max(F.when(F.col("rn_a") == 1, F.col("value"))), 6).alias(
            "open_r"
        ),
        F.round(F.max("value"), 6).alias("high_r"),
        F.round(F.min("value"), 6).alias("low_r"),
        F.round(F.max(F.when(F.col("rn_z") == 1, F.col("value"))), 6).alias(
            "close_r"
        ),
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
    )


@register(
    "analytics_time_weighted_avg",
    oracle="""
    WITH obs AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               value,
               CAST(epoch_us(ts) AS BIGINT) AS t_us,
               lead(CAST(epoch_us(ts) AS BIGINT)) OVER (
                   PARTITION BY user_id,
                                CAST(floor(epoch(ts) / 86400) AS BIGINT)
                   ORDER BY ts, event_id) AS nxt_us
        FROM events
    ),
    seg AS (
        SELECT user_id, day_idx, value,
               (nxt_us - t_us) / 1000000.0 AS w_s
        FROM obs WHERE nxt_us IS NOT NULL
    )
    SELECT user_id, day_idx,
           CAST(count(*) AS BIGINT) AS n_segments,
           round(sum(value * w_s) / sum(w_s), 6) AS twap_r
    FROM seg
    GROUP BY user_id, day_idx
    """,
)
def analytics_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) over irregularly-sampled series —
    metering/billing's correct mean: each observation holds until the
    next one, so its weight is the µs gap to its successor (the last
    observation of a (user, day) closes no segment and carries no
    weight). A plain avg() over irregular samples over-weights bursts;
    TWAP is burst-invariant. lead() over the same (user, day)
    partitioning the final groupBy uses — one exchange total. Weights
    convert µs → seconds through one identical double division on
    both engines; the 6dp edge absorbs float-sum association noise
    (weights and values are O(10^2..10^4) at O(10^2) rows/group).
    This is Prometheus' rate()/avg_over_time() and every usage-based
    billing engine, as one window + one aggregate."""
    e = load(spark, sf_dir, "events").withColumn(
        "day_idx",
        F.floor(F.col("ts").cast("double") / 86400).cast("long"),
    )
    wseq = Window.partitionBy("user_id", "day_idx").orderBy("ts", "event_id")
    obs = e.select(
        "user_id",
        "day_idx",
        "value",
        F.unix_micros("ts").alias("t_us"),
        F.lead(F.unix_micros("ts")).over(wseq).alias("nxt_us"),
    )
    seg = obs.filter(F.col("nxt_us").isNotNull()).withColumn(
        "w_s", (F.col("nxt_us") - F.col("t_us")) / 1000000.0
    )
    return seg.groupBy("user_id", "day_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.round(
            F.sum(F.col("value") * F.col("w_s")) / F.sum("w_s"), 6
        ).alias("twap_r"),
    )


@register(
    "analytics_woe_iv_bins",
    oracle="""
    WITH scored AS (
        SELECT c.c_custkey,
               CASE WHEN EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_orderpriority = '1-URGENT')
                    THEN 1 ELSE 0 END AS good,
               ntile(10) OVER (ORDER BY c.c_acctbal DESC, c.c_custkey)
                   AS bin
        FROM customer c
    ),
    per AS (
        SELECT bin,
               CAST(sum(good) AS BIGINT)            AS n_good,
               CAST(count(*) - sum(good) AS BIGINT) AS n_bad
        FROM scored GROUP BY bin
    ),
    tot AS (SELECT sum(n_good) AS g, sum(n_bad) AS b FROM per)
    SELECT CAST(per.bin AS BIGINT) AS bin, per.n_good, per.n_bad,
           round(ln(((per.n_good + 0.5) / (tot.g + 5.0))
                    / ((per.n_bad + 0.5) / (tot.b + 5.0))), 6) AS woe_r,
           round(sum(((per.n_good + 0.5) / (tot.g + 5.0)
                      - (per.n_bad + 0.5) / (tot.b + 5.0))
                     * ln(((per.n_good + 0.5) / (tot.g + 5.0))
                          / ((per.n_bad + 0.5) / (tot.b + 5.0))))
                 OVER (), 6) AS iv_total_r
    FROM per, tot
    """,
)
def analytics_woe_iv_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value binning — credit
    scoring's standard univariate screen: score deciles (account
    balance, custkey tie-break) report WOE = ln(good-share /
    bad-share) with 0.5 Laplace smoothing (so empty cells never blow
    up), and the summed IV quantifies the feature's separating power
    (IV < 0.02 = useless, > 0.3 = strong). Same exact-integer decile
    census as the lift/gains row — WOE/IV is its log-scale sibling,
    used to pick features BEFORE training where lift evaluates the
    model after. The ntile sort is the only large operation; the
    10-row WOE table and the IV window are free. Edge ratios share
    one spelled-identically formula on both engines, rounded 6dp."""
    c = load(spark, sf_dir, "customer")
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("good", F.lit(1))
    )
    scored = (
        c.join(F.broadcast(urgent), "c_custkey", "left")
        .select("c_custkey", "c_acctbal", F.coalesce("good", F.lit(0)).alias("good"))
        .withColumn(
            "bin",
            F.ntile(10).over(Window.orderBy(F.col("c_acctbal").desc(), "c_custkey")),
        )
    )
    per = scored.groupBy("bin").agg(
        F.sum("good").cast("long").alias("n_good"),
        (F.count(F.lit(1)) - F.sum("good")).cast("long").alias("n_bad"),
    )
    tot = per.agg(F.sum("n_good").alias("g"), F.sum("n_bad").alias("b"))
    gs = (F.col("n_good") + 0.5) / (F.col("g") + 5.0)
    bs = (F.col("n_bad") + 0.5) / (F.col("b") + 5.0)
    woe = F.log(gs / bs)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("long").alias("bin"),
            "n_good",
            "n_bad",
            F.round(woe, 6).alias("woe_r"),
            F.round(
                F.sum((gs - bs) * woe).over(
                    Window.partitionBy()
                ),
                6,
            ).alias("iv_total_r"),
        )
    )


@register(
    "analytics_markov_absorption",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events
    ),
    t AS (
        SELECT from_type, to_type,
               count(*) * 1.0 /
                 sum(count(*)) OVER (PARTITION BY from_type) AS p
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    ),
    h1 AS (
        SELECT from_type AS s,
               coalesce(sum(CASE WHEN to_type = 'purchase' THEN p END), 0)
                   AS h
        FROM t GROUP BY from_type
    ),
    h2 AS (
        SELECT t.from_type AS s,
               any_value(h1a.h)
               + coalesce(sum(CASE WHEN t.to_type <> 'purchase'
                                   THEN t.p * h1b.h END), 0) AS h
        FROM t
        JOIN h1 h1a ON h1a.s = t.from_type
        LEFT JOIN h1 h1b ON h1b.s = t.to_type
        GROUP BY t.from_type
    ),
    h3 AS (
        SELECT t.from_type AS s,
               any_value(h1a.h)
               + coalesce(sum(CASE WHEN t.to_type <> 'purchase'
                                   THEN t.p * h2b.h END), 0) AS h
        FROM t
        JOIN h1 h1a ON h1a.s = t.from_type
        LEFT JOIN h2 h2b ON h2b.s = t.to_type
        GROUP BY t.from_type
    )
    SELECT h1.s AS from_type,
           round(h1.h, 6) AS p_hit1_r,
           round(h2.h, 6) AS p_hit2_r,
           round(h3.h, 6) AS p_hit3_r
    FROM h1 JOIN h2 ON h2.s = h1.s JOIN h3 ON h3.s = h1.s
    """,
)
def analytics_markov_absorption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-step absorption probability — "how likely does a user reach
    `purchase` within k steps from each state", computed as
    relational matrix powers over the Markov transition matrix:
    h_{k+1}(s) = P(s, purchase) + Σ_{t≠purchase} P(s,t) · h_k(t).
    Two unrolled join-aggregate iterations over the 5x5 transition
    table give the 1/2/3-step hitting probabilities — the
    journey-scoring signal behind "propensity to convert in the next
    k events". The fact table is touched ONCE (the same single
    user_id exchange as the transition matrix); every iteration
    joins 25-row broadcasts, so k grows cost-free. Monotonicity
    h1 <= h2 <= h3 is asserted as a property test."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = (
        seq.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "p",
            F.col("n") / F.sum("n").over(Window.partitionBy("from_type")),
        )
        .select("from_type", "to_type", "p")
        .localCheckpoint()
    )
    h1 = t.groupBy(F.col("from_type").alias("s")).agg(
        F.coalesce(
            F.sum(F.when(F.col("to_type") == "purchase", F.col("p"))),
            F.lit(0.0),
        ).alias("h")
    )

    def step(hk: DataFrame) -> DataFrame:
        return (
            t.join(
                F.broadcast(h1.select(F.col("s").alias("from_type"), F.col("h").alias("ha"))),
                "from_type",
            )
            .join(
                F.broadcast(hk.select(F.col("s").alias("to_type"), F.col("h").alias("hb"))),
                "to_type",
                "left",
            )
            .groupBy(F.col("from_type").alias("s"))
            .agg(
                (
                    F.first("ha")
                    + F.coalesce(
                        F.sum(
                            F.when(
                                F.col("to_type") != "purchase",
                                F.col("p") * F.col("hb"),
                            )
                        ),
                        F.lit(0.0),
                    )
                ).alias("h")
            )
        )

    h2 = step(h1)
    h3 = step(h2)
    return (
        h1.select(F.col("s").alias("from_type"), F.col("h").alias("a"))
        .join(h2.select(F.col("s").alias("from_type"), F.col("h").alias("b")), "from_type")
        .join(h3.select(F.col("s").alias("from_type"), F.col("h").alias("c")), "from_type")
        .select(
            "from_type",
            F.round("a", 6).alias("p_hit1_r"),
            F.round("b", 6).alias("p_hit2_r"),
            F.round("c", 6).alias("p_hit3_r"),
        )
    )


@register(
    "analytics_diff_in_diff",
    oracle="""
    WITH cells AS (
        SELECT CAST(user_id % 2 AS BIGINT) AS arm,
               CAST(CAST(floor(epoch(ts) / 86400) AS BIGINT) >= 19738
                    AS BIGINT) AS post,
               avg(value) AS m,
               count(*) AS n
        FROM events
        GROUP BY 1, 2
    )
    SELECT max(CASE WHEN arm = 1 AND post = 0 THEN n END) AS n_t_pre,
           max(CASE WHEN arm = 1 AND post = 1 THEN n END) AS n_t_post,
           max(CASE WHEN arm = 0 AND post = 0 THEN n END) AS n_c_pre,
           max(CASE WHEN arm = 0 AND post = 1 THEN n END) AS n_c_post,
           round(max(CASE WHEN arm = 1 AND post = 0 THEN m END), 4)
               AS m_t_pre_r,
           round(max(CASE WHEN arm = 1 AND post = 1 THEN m END), 4)
               AS m_t_post_r,
           round(max(CASE WHEN arm = 0 AND post = 0 THEN m END), 4)
               AS m_c_pre_r,
           round(max(CASE WHEN arm = 0 AND post = 1 THEN m END), 4)
               AS m_c_post_r,
           round((max(CASE WHEN arm = 1 AND post = 1 THEN m END)
                  - max(CASE WHEN arm = 1 AND post = 0 THEN m END))
                 - (max(CASE WHEN arm = 0 AND post = 1 THEN m END)
                    - max(CASE WHEN arm = 0 AND post = 0 THEN m END)), 4)
               AS did_r
    FROM cells
    """,
)
def analytics_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences — the workhorse causal estimator for
    rollouts without randomization: treatment arm (user_id parity as
    the deterministic stand-in assignment) and period (before/after
    the Jan-16 epoch-day split) form a 2x2 mean table, and DiD =
    (treat_post - treat_pre) - (ctrl_post - ctrl_pre) nets out both
    the arm's level difference and the common time trend. One
    map-side-combined groupBy over the fact table produces the four
    sufficient cells; the estimator itself is arithmetic on a 4-row
    table. The parallel-trends caveat is the analyst's burden — the
    engine's job, done here, is exact cell census + deterministic
    pivot."""
    e = load(spark, sf_dir, "events")
    cells = e.groupBy(
        (F.col("user_id") % 2).cast("long").alias("arm"),
        (
            F.floor(F.col("ts").cast("double") / 86400).cast("long") >= 19738
        )
        .cast("long")
        .alias("post"),
    ).agg(F.avg("value").alias("m"), F.count(F.lit(1)).alias("n"))

    def cell(a, p, col):
        return F.max(
            F.when((F.col("arm") == a) & (F.col("post") == p), F.col(col))
        )

    return cells.agg(
        cell(1, 0, "n").cast("long").alias("n_t_pre"),
        cell(1, 1, "n").cast("long").alias("n_t_post"),
        cell(0, 0, "n").cast("long").alias("n_c_pre"),
        cell(0, 1, "n").cast("long").alias("n_c_post"),
        F.round(cell(1, 0, "m"), 4).alias("m_t_pre_r"),
        F.round(cell(1, 1, "m"), 4).alias("m_t_post_r"),
        F.round(cell(0, 0, "m"), 4).alias("m_c_pre_r"),
        F.round(cell(0, 1, "m"), 4).alias("m_c_post_r"),
        F.round(
            (cell(1, 1, "m") - cell(1, 0, "m"))
            - (cell(0, 1, "m") - cell(0, 0, "m")),
            4,
        ).alias("did_r"),
    )


@register(
    "analytics_seasonal_index",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               round(sum(value), 2) AS a
        FROM events GROUP BY 1
    ),
    ma AS (
        SELECT day_idx, a,
               avg(a) OVER (ORDER BY day_idx
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS m,
               count(*) OVER (ORDER BY day_idx
                              ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                   AS w
        FROM daily
    )
    SELECT CAST((day_idx + 4) % 7 AS BIGINT) AS dow,
           CAST(count(*) AS BIGINT) AS n_days,
           round(avg(a / m), 6) AS seasonal_index_r
    FROM ma WHERE w = 7
    GROUP BY 1
    """,
)
def analytics_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonal index by ratio-to-moving-average — classical
    decomposition's first step: each day's total is divided by its
    centered 7-day moving average (full windows only, so the trend
    estimate is unbiased at the edges by construction), and the
    ratios average per day-of-week ((epoch_day+4) % 7; epoch day 0
    was a Thursday). Index > 1 = that weekday runs structurally hot —
    the deseasonalization factor every capacity/demand forecast
    divides by before modeling trend. Daily totals round at the money
    grain before any ratio. The series is |days| rows post-aggregate;
    per-segment indexes would partition the MA window by segment."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx")
    ).agg(F.round(F.sum("value"), 2).alias("a"))
    wma = Window.orderBy("day_idx").rowsBetween(-3, 3)
    ma = daily.select(
        "day_idx",
        "a",
        F.avg("a").over(wma).alias("m"),
        F.count(F.lit(1)).over(wma).alias("w"),
    )
    return (
        ma.filter(F.col("w") == 7)
        .groupBy(((F.col("day_idx") + 4) % 7).cast("long").alias("dow"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(F.avg(F.col("a") / F.col("m")), 6).alias(
                "seasonal_index_r"
            ),
        )
    )


@register(
    "analytics_rle_event_runs",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
        SELECT user_id, event_type, ts, event_id,
               sum(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS run_id
        FROM seq
    )
    SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
           CAST(count(*) AS BIGINT) AS run_len,
           CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
           CAST(epoch_us(max(ts)) AS BIGINT) AS end_us
    FROM runs
    GROUP BY user_id, run_id, event_type
    """,
)
def analytics_rle_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of per-user event streams — collapse
    consecutive same-type events into (type, length, span) runs: the
    telemetry-compression / state-change-log transform ("the sensor
    reported OK 500 times, then ERROR 3 times" as 2 rows instead of
    503). Change points come from lag() null-safely compared, run ids
    from the running sum of change flags — the gaps-and-islands
    numbering specialized to value changes — and one groupBy per
    (user, run) emits length and time span. Both windows and the
    aggregate share the user_id hash partitioning: ONE exchange. At
    100 TB RLE before storage is often a 100x row reduction for
    state-style streams, and this exact plan does it in a single
    pass."""
    e = load(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            ~F.lag("event_type").over(wseq).eqNullSafe(F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("is_new"),
    )
    runs = seq.withColumn(
        "run_id",
        F.sum("is_new").over(wseq.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return runs.groupBy(
        "user_id", F.col("run_id").cast("long").alias("run_id"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("run_len"),
        F.unix_micros(F.min("ts")).alias("start_us"),
        F.unix_micros(F.max("ts")).alias("end_us"),
    )


@register(
    "analytics_hhi_concentration",
    oracle="""
    WITH spend AS (
        SELECT c.c_mktsegment AS seg, c.c_custkey,
               round(sum(o.o_totalprice), 2) AS s
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT seg, sum(s) AS t, count(*) AS n FROM spend GROUP BY seg
    )
    SELECT sp.seg AS mktsegment,
           CAST(any_value(tot.n) AS BIGINT) AS n_customers,
           round(sum((sp.s / tot.t) * (sp.s / tot.t)), 6) AS hhi_r,
           round(1.0 / sum((sp.s / tot.t) * (sp.s / tot.t)), 4)
               AS effective_n_r
    FROM spend sp JOIN tot ON tot.seg = sp.seg
    GROUP BY sp.seg
    """,
)
def analytics_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index per market segment —
    "is this segment's revenue spread across customers or dominated
    by a few": HHI = Σ share², and 1/HHI is the effective number of
    equal-size customers (the interpretable twin). The
    antitrust/portfolio-concentration metric, complementing the Gini
    row (inequality of the distribution) with dominance mass. Customer
    spends round at the money grain; shares divide by the segment
    total computed from the SAME rounded values, so both engines
    square identical quotients. Two aggregates sharing the segment
    key; the customer-grain table is the only large intermediate."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("seg"), "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("s"))
    )
    tot = spend.groupBy("seg").agg(
        F.sum("s").alias("t"), F.count(F.lit(1)).alias("n")
    )
    share = F.col("s") / F.col("t")
    return (
        spend.join(F.broadcast(tot), "seg")
        .groupBy(F.col("seg").alias("mktsegment"))
        .agg(
            F.first("n").cast("long").alias("n_customers"),
            F.round(F.sum(share * share), 6).alias("hhi_r"),
            F.round(1.0 / F.sum(share * share), 4).alias("effective_n_r"),
        )
    )


@register(
    "analytics_clock_repair",
    oracle="""
    WITH arrival AS (
        SELECT user_id, event_id,
               CAST(epoch_us(ts) AS BIGINT) AS t_us,
               max(CAST(epoch_us(ts) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS UNBOUNDED PRECEDING) AS repaired_us
        FROM events WHERE user_id < 30
    )
    SELECT user_id, event_id, t_us, repaired_us,
           CAST(repaired_us > t_us AS BIGINT) AS was_repaired
    FROM arrival
    """,
)
def analytics_clock_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic clock repair — telemetry's out-of-order-timestamp
    fix: within each device/user stream in ARRIVAL order (event_id
    as the ingestion sequence), the repaired event time is the
    running maximum of claimed times, which enforces monotonicity
    while never moving a timestamp backwards — the standard
    pre-processing before sessionization or interval math on
    clock-skewed clients (NTP steps, device reboots). The
    was_repaired flag doubles as the skew-rate data-quality metric.
    One cummax window per user partition — the same exchange the
    downstream sessionizer needs, so repair is free in-line."""
    e = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = F.unix_micros("ts")
    return e.select(
        "user_id",
        "event_id",
        t.alias("t_us"),
        F.max(t).over(w).alias("repaired_us"),
    ).withColumn(
        "was_repaired",
        (F.col("repaired_us") > F.col("t_us")).cast("long"),
    )


@register(
    "analytics_first_per_hour_throttle",
    oracle="""
    WITH ranked AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_idx,
               event_id,
               row_number() OVER (
                   PARTITION BY user_id, CAST(floor(epoch(ts) / 3600)
                                              AS BIGINT)
                   ORDER BY ts, event_id) AS rn,
               count(*) OVER (
                   PARTITION BY user_id, CAST(floor(epoch(ts) / 3600)
                                              AS BIGINT)) AS n_in_hour
        FROM events
    )
    SELECT user_id, hour_idx,
           event_id AS first_event_id,
           CAST(n_in_hour - 1 AS BIGINT) AS n_suppressed
    FROM ranked WHERE rn = 1
    """,
)
def analytics_first_per_hour_throttle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Keyed rate limiting / event throttling — keep the FIRST event
    per (user, hour), suppress the rest, and report how many each
    kept event stands for: the notification-dedup / alert-throttle /
    telemetry-downsampling kernel ("page once per host per hour, with
    a suppressed-count"). Deterministic keep rule (earliest by ts
    with event_id tie-break), and the suppressed census makes the
    lossy step auditable — downstream counts can be reconstructed,
    nothing silently vanishes. One window partitioning on the
    (key, window) grain; at 100 TB this IS the pre-aggregation that
    keeps alerting pipelines O(keys/hour) instead of O(events)."""
    e = load(spark, sf_dir, "events").withColumn(
        "hour_idx",
        F.floor(F.col("ts").cast("double") / 3600).cast("long"),
    )
    w = Window.partitionBy("user_id", "hour_idx")
    ranked = e.select(
        "user_id",
        "hour_idx",
        "event_id",
        F.row_number().over(w.orderBy("ts", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n_in_hour"),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "user_id",
        "hour_idx",
        F.col("event_id").alias("first_event_id"),
        (F.col("n_in_hour") - 1).cast("long").alias("n_suppressed"),
    )


@register(
    "analytics_wau_overlap",
    oracle="""
    WITH wk AS (
        SELECT DISTINCT CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week_idx,
               user_id
        FROM events
    ),
    pair AS (
        SELECT a.week_idx AS w0, a.user_id,
               CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END AS ret
        FROM wk a
        LEFT JOIN wk b ON b.week_idx = a.week_idx + 1
                      AND b.user_id = a.user_id
    ),
    nxt AS (
        SELECT week_idx - 1 AS w0, count(*) AS n_next
        FROM wk GROUP BY week_idx
    )
    SELECT p.w0 AS week_idx,
           CAST(count(*) AS BIGINT) AS wau,
           CAST(sum(p.ret) AS BIGINT) AS n_both,
           round(sum(p.ret) * 1.0 /
                 (count(*) + any_value(nxt.n_next) - sum(p.ret)), 6)
               AS jaccard_r
    FROM pair p JOIN nxt ON nxt.w0 = p.w0
    GROUP BY p.w0
    """,
)
def analytics_wau_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week audience overlap — "is next week's audience the
    same people": weekly-active-user sets for consecutive weeks
    compared by exact Jaccard (|both| / |either|). High overlap =
    sticky core audience; low = churn-and-replace (growth that
    retention charts alone can't distinguish — a flat WAU can be
    100% replacement). Exact integer set algebra via one distinct
    (user, week) census and a self-equi-join on (user, week+1) —
    never materializing user sets as arrays; at 100 TB this is the
    HLL-sketch shape's exact twin, and the census join partitions on
    user_id like every other per-user op here."""
    e = load(spark, sf_dir, "events")
    wk = e.select(
        F.floor(F.col("ts").cast("double") / 604800).cast("long").alias("week_idx"),
        "user_id",
    ).distinct()
    nxt_wk = wk.select(
        (F.col("week_idx") - 1).alias("week_idx"),
        F.col("user_id").alias("nxt_user"),
    )
    pair = wk.join(
        nxt_wk,
        (wk["week_idx"] == nxt_wk["week_idx"])
        & (wk["user_id"] == nxt_wk["nxt_user"]),
        "left",
    ).select(wk["week_idx"], "user_id", F.col("nxt_user").isNotNull().cast("int").alias("ret"))
    n_next = wk.groupBy((F.col("week_idx") - 1).alias("week_idx")).agg(
        F.count(F.lit(1)).alias("n_next")
    )
    return (
        pair.groupBy("week_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("wau"),
            F.sum("ret").cast("long").alias("n_both"),
        )
        .join(n_next, "week_idx")
        .select(
            "week_idx",
            "wau",
            "n_both",
            F.round(
                F.col("n_both")
                / (F.col("wau") + F.col("n_next") - F.col("n_both")),
                6,
            ).alias("jaccard_r"),
        )
    )


@register(
    "analytics_degree_powerlaw_fit",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    deg AS (
        SELECT l_partkey, count(*) AS d FROM items GROUP BY l_partkey
    ),
    filt AS (SELECT d FROM deg WHERE d >= 3)
    SELECT CAST(count(*) AS BIGINT) AS n_tail,
           CAST(min(d) AS BIGINT) AS d_min,
           CAST(max(d) AS BIGINT) AS d_max,
           round(1.0 + count(*) / sum(ln(d * 1.0 / 3)), 4) AS alpha_hill_r
    FROM filt
    """,
)
def analytics_degree_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution power-law fit — graph-health diagnosis on
    the order-part bipartite graph: part degrees (distinct orders
    containing the part) above d_min=3 feed the Hill/MLE estimator
    alpha = 1 + n / Σ ln(d/d_min). Alpha near 2-3 = scale-free hubs
    (expect join skew on those keys — the quantitative justification
    for the salting and df-cap rows); large alpha = near-uniform
    degrees (skew handling unnecessary). The text twin is the Zipf
    slope row; this is the graph version, and together they are the
    two checks run before choosing a partitioning strategy. One
    distinct + one count groupBy + a 4-number aggregate."""
    items = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    deg = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("d"))
    filt = deg.filter(F.col("d") >= 3)
    return filt.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.min("d").cast("long").alias("d_min"),
        F.max("d").cast("long").alias("d_max"),
        F.round(
            1.0 + F.count(F.lit(1)) / F.sum(F.log(F.col("d") / 3.0)), 4
        ).alias("alpha_hill_r"),
    )


@register(
    "analytics_information_gain",
    oracle="""
    WITH base AS (
        SELECT c.c_custkey,
               CASE WHEN EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_custkey = c.c_custkey
                                   AND o.o_orderpriority = '1-URGENT')
                    THEN 1 ELSE 0 END AS y,
               c.c_mktsegment AS f_seg,
               CAST(c.c_nationkey % 5 AS VARCHAR) AS f_natgrp
        FROM customer c
    ),
    feats AS (
        SELECT 'mktsegment' AS feature, f_seg AS x, y FROM base
        UNION ALL
        SELECT 'nation_group', f_natgrp, y FROM base
    ),
    cell AS (
        SELECT feature, x, y, count(*) AS n FROM feats GROUP BY 1, 2, 3
    ),
    nx AS (SELECT feature, x, sum(n) AS nx FROM cell GROUP BY 1, 2),
    ny AS (SELECT feature, y, sum(n) AS ny FROM cell GROUP BY 1, 2),
    ftot AS (SELECT feature, sum(n) AS tot FROM cell GROUP BY 1),
    hy AS (
        SELECT ny.feature,
               -sum(ny.ny * 1.0 / ftot.tot * ln(ny.ny * 1.0 / ftot.tot))
                   AS h
        FROM ny JOIN ftot ON ftot.feature = ny.feature
        GROUP BY ny.feature
    ),
    hx_terms AS (
        SELECT c.feature, c.x,
               sum(c.n * 1.0 / nx.nx * ln(c.n * 1.0 / nx.nx)) AS sum_p
        FROM cell c
        JOIN nx ON nx.feature = c.feature AND nx.x = c.x
        GROUP BY c.feature, c.x
    ),
    hyx AS (
        SELECT t.feature,
               sum(nx.nx * 1.0 / ftot.tot * (-t.sum_p)) AS h
        FROM hx_terms t
        JOIN nx ON nx.feature = t.feature AND nx.x = t.x
        JOIN ftot ON ftot.feature = t.feature
        GROUP BY t.feature
    )
    SELECT hy.feature,
           round(hy.h, 6) AS h_y_r,
           round(hy.h - hyx.h, 6) AS info_gain_r
    FROM hy JOIN hyx ON hyx.feature = hy.feature
""",
)
def analytics_information_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-gain feature ranking — the decision-tree split
    criterion as a screening report: IG(feature) = H(y) − H(y|x)
    over exact cell counts, for each candidate categorical feature
    against the urgent-responder target. Third member of the
    univariate-screen family (chi-square tests dependence, WOE/IV
    scores monotone strength, IG measures entropy reduction — trees
    and mutual-information selectors consume this one). Everything
    flows from ONE (feature, x, y) cell census (the features unpivot
    into rows, so adding a feature adds rows, not passes); entropies
    are sums over ≤ dozens of cells. Log-ratio edges round at 6dp."""
    c = load(spark, sf_dir, "customer")
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("y1", F.lit(1))
    )
    base = c.join(F.broadcast(urgent), "c_custkey", "left").select(
        F.coalesce("y1", F.lit(0)).alias("y"),
        F.col("c_mktsegment").alias("f_seg"),
        (F.col("c_nationkey") % 5).cast("string").alias("f_natgrp"),
    )
    feats = base.select(
        F.lit("mktsegment").alias("feature"), F.col("f_seg").alias("x"), "y"
    ).unionByName(
        base.select(
            F.lit("nation_group").alias("feature"),
            F.col("f_natgrp").alias("x"),
            "y",
        )
    )
    cell = feats.groupBy("feature", "x", "y").agg(F.count(F.lit(1)).alias("n"))
    wf = Window.partitionBy("feature")
    # H(y) per feature
    ny = cell.groupBy("feature", "y").agg(F.sum("n").alias("ny"))
    ny = ny.withColumn("tot", F.sum("ny").over(wf))
    hy = ny.groupBy("feature").agg(
        (-F.sum((F.col("ny") / F.col("tot")) * F.log(F.col("ny") / F.col("tot")))).alias("h")
    )
    # H(y|x) per feature
    wfx = Window.partitionBy("feature", "x")
    cond = cell.withColumn("nx", F.sum("n").over(wfx)).withColumn(
        "p", F.col("n") / F.col("nx")
    )
    per_x = cond.groupBy("feature", "x").agg(
        F.first("nx").alias("nx"),
        F.sum(F.col("p") * F.log("p")).alias("sum_p"),
    )
    per_x = per_x.withColumn("tot", F.sum("nx").over(wf))
    hyx = per_x.groupBy("feature").agg(
        F.sum((F.col("nx") / F.col("tot")) * (-F.col("sum_p"))).alias("h")
    )
    return (
        hy.select("feature", F.col("h").alias("h_y"))
        .join(hyx.select("feature", F.col("h").alias("h_yx")), "feature")
        .select(
            "feature",
            F.round("h_y", 6).alias("h_y_r"),
            F.round(F.col("h_y") - F.col("h_yx"), 6).alias("info_gain_r"),
        )
    )


@register(
    "analytics_dwell_time_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER w AS to_type,
               CAST(lead(epoch_us(ts)) OVER w - epoch_us(ts) AS BIGINT)
                   AS dwell_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT from_type, to_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(dwell_us) AS BIGINT) AS total_dwell_us,
           CAST(sum(dwell_us) // count(*) AS BIGINT) AS mean_dwell_us
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def analytics_dwell_time_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State dwell-time matrix — how long users sit in state A before
    moving to state B: the time-weighted companion to the Markov
    transition matrix (same (from, to) bigram stream, but measuring
    µs between the events instead of counting them). Product
    analytics reads this as friction — a long view→purchase dwell is
    a slow checkout, a short anything→error dwell is a crash loop.
    Pure int64 µs; the mean is integer floor division so no float
    touches the edge. Same single user_id exchange as the transition
    matrix and sessionizer — at 100 TB all three ship as one pass
    over one shuffle."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros("ts")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
        (F.lead(t).over(w) - t).alias("dwell_us"),
    ).filter(F.col("to_type").isNotNull())
    return seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dwell_us").cast("long").alias("total_dwell_us"),
        F.expr("sum(dwell_us) div count(*)").cast("long").alias("mean_dwell_us"),
    )


@register(
    "analytics_customer_timeline",
    oracle="""
    WITH merged AS (
        SELECT o_custkey AS custkey, 'order' AS kind,
               CAST(epoch_us(o_orderdate) AS BIGINT) AS t_us,
               o_orderkey AS ref_id,
               round(o_totalprice, 2) AS amount_r
        FROM orders WHERE o_custkey < 40
        UNION ALL
        SELECT user_id, 'event:' || event_type,
               CAST(epoch_us(ts) AS BIGINT), event_id, round(value, 6)
        FROM events WHERE user_id < 40
    )
    SELECT custkey, kind, t_us, ref_id, amount_r,
           CAST(row_number() OVER (PARTITION BY custkey
                                   ORDER BY t_us, kind, ref_id) AS BIGINT)
               AS seq
    FROM merged
    """,
)
def analytics_customer_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-360 activity timeline — the union of heterogeneous
    fact tables (orders + behavioral events) into ONE per-customer
    time-ordered feed with source tags and a deterministic sequence
    number ((t, kind, ref) total order). The shape behind every
    "activity feed", support-console history, and
    journey-reconstruction job: schemas align by projection, the
    union is free (no shuffle), and the only exchange is the
    per-customer sequence window — which downstream journey ops
    (sessionize, funnel, Markov, dwell) then reuse. At 100 TB the
    win is unioning N sources in one pass instead of N join
    round-trips against a customer spine."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 40)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.lit("order").alias("kind"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("t_us"),
            F.col("o_orderkey").alias("ref_id"),
            F.round("o_totalprice", 2).alias("amount_r"),
        )
    )
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .select(
            F.col("user_id").alias("custkey"),
            F.concat(F.lit("event:"), F.col("event_type")).alias("kind"),
            F.unix_micros("ts").alias("t_us"),
            F.col("event_id").alias("ref_id"),
            F.round("value", 6).alias("amount_r"),
        )
    )
    merged = o.unionByName(e)
    w = Window.partitionBy("custkey").orderBy("t_us", "kind", "ref_id")
    return merged.withColumn(
        "seq", F.row_number().over(w).cast("long")
    )


@register(
    "analytics_psi_drift",
    oracle="""
    WITH lab AS (
        SELECT o_totalprice AS v,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) >=
                    (SELECT min(year(o_orderdate) * 12 + month(o_orderdate))
                           + 24 FROM orders) AS INTEGER) AS post
        FROM orders
    ),
    rng AS (SELECT min(v) AS lo, max(v) AS hi FROM lab),
    binned AS (
        SELECT least(CAST(floor((v - rng.lo) / ((rng.hi - rng.lo) / 10.0))
                          AS BIGINT), 9) AS bin,
               post
        FROM lab, rng
    ),
    cell AS (
        SELECT bin,
               sum(CASE WHEN post = 0 THEN 1 ELSE 0 END) AS n_pre,
               sum(CASE WHEN post = 1 THEN 1 ELSE 0 END) AS n_post
        FROM binned GROUP BY bin
    ),
    tots AS (SELECT sum(n_pre) AS tp, sum(n_post) AS tq FROM cell)
    SELECT CAST(cell.bin AS BIGINT) AS bin,
           CAST(cell.n_pre AS BIGINT) AS n_pre,
           CAST(cell.n_post AS BIGINT) AS n_post,
           round(((cell.n_pre + 0.5) / (tots.tp + 5.0)
                  - (cell.n_post + 0.5) / (tots.tq + 5.0))
                 * ln(((cell.n_pre + 0.5) / (tots.tp + 5.0))
                      / ((cell.n_post + 0.5) / (tots.tq + 5.0))), 6)
               AS psi_term_r,
           round(sum(((cell.n_pre + 0.5) / (tots.tp + 5.0)
                      - (cell.n_post + 0.5) / (tots.tq + 5.0))
                     * ln(((cell.n_pre + 0.5) / (tots.tp + 5.0))
                          / ((cell.n_post + 0.5) / (tots.tq + 5.0))))
                 OVER (), 6) AS psi_total_r
    FROM cell, tots
    """,
)
def analytics_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — THE model-monitoring drift metric:
    the order-value distribution before vs after a cutoff (first 24
    months vs the rest) is binned into 10 fixed-width buckets and
    PSI = Σ (p_i − q_i) ln(p_i/q_i) with 0.5 Laplace smoothing (so an
    empty bin contributes a finite penalty instead of ∞). Industry
    thresholds: < 0.1 stable, 0.1–0.25 watch, > 0.25 retrain.
    Complements the mean/std drift monitor (which misses
    shape-preserving shifts) and the KS row (which gives a p-value,
    not a monitorable magnitude). One cell census from one scan;
    bin edges come from the global min/max so both periods share the
    grid. Per-bin terms + the windowed total on a 10-row table."""
    o = load(spark, sf_dir, "orders")
    m = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    cut = o.agg((F.min(m) + 24).alias("cut"))
    lab = o.crossJoin(F.broadcast(cut)).select(
        F.col("o_totalprice").alias("v"),
        (m >= F.col("cut")).cast("int").alias("post"),
    )
    rng = lab.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    binned = lab.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.floor(
                (F.col("v") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 10.0)
            ).cast("long"),
            F.lit(9),
        ).alias("bin"),
        "post",
    )
    cell = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("post") == 0, 1).otherwise(0)).alias("n_pre"),
        F.sum(F.when(F.col("post") == 1, 1).otherwise(0)).alias("n_post"),
    )
    tots = cell.agg(
        F.sum("n_pre").alias("tp"), F.sum("n_post").alias("tq")
    )
    p = (F.col("n_pre") + 0.5) / (F.col("tp") + 5.0)
    q = (F.col("n_post") + 0.5) / (F.col("tq") + 5.0)
    term = (p - q) * F.log(p / q)
    return cell.crossJoin(F.broadcast(tots)).select(
        F.col("bin").cast("long").alias("bin"),
        F.col("n_pre").cast("long").alias("n_pre"),
        F.col("n_post").cast("long").alias("n_post"),
        F.round(term, 6).alias("psi_term_r"),
        F.round(F.sum(term).over(Window.partitionBy()), 6).alias(
            "psi_total_r"
        ),
    )


@register(
    "analytics_rank_stability_spearman",
    oracle="""
    WITH cut AS (
        SELECT min(year(o_orderdate) * 12 + month(o_orderdate)) + 24 AS c
        FROM orders
    ),
    spend AS (
        SELECT o_custkey,
               round(sum(CASE WHEN year(o_orderdate) * 12
                                   + month(o_orderdate) < cut.c
                              THEN o_totalprice ELSE 0 END), 2) AS s_pre,
               round(sum(CASE WHEN year(o_orderdate) * 12
                                   + month(o_orderdate) >= cut.c
                              THEN o_totalprice ELSE 0 END), 2) AS s_post
        FROM orders, cut
        GROUP BY o_custkey
        HAVING s_pre > 0 AND s_post > 0
    ),
    ranked AS (
        SELECT o_custkey,
               row_number() OVER (ORDER BY s_pre DESC, o_custkey) AS r1,
               row_number() OVER (ORDER BY s_post DESC, o_custkey) AS r2
        FROM spend
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2,
           round(1.0 - 6.0 * sum((r1 - r2) * (r1 - r2))
                 / (count(*) * (count(*) * count(*) - 1.0)), 6)
               AS spearman_r
    FROM ranked
    """,
)
def analytics_rank_stability_spearman(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leaderboard rank stability — Spearman rho between customer
    spend ranks in two periods (first 24 months vs the rest),
    computed by the exact integer formula rho = 1 − 6Σd²/(n(n²−1)):
    ranks and squared displacements are int64, so the statistic's
    numerator is exact and only the final ratio rounds. Near 1 =
    the same customers dominate both periods (stable book); near 0 =
    complete reshuffle (the "whale churn" a mean-spend drift monitor
    cannot see — totals can match while the identities rotate).
    Pearson-on-values is the corr row; this is its robust
    rank-based sibling. Two window ranks over a customer-grain
    aggregate — the fact pass is one groupBy."""
    o = load(spark, sf_dir, "orders")
    m = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    cut = o.agg((F.min(m) + 24).alias("c"))
    spend = (
        o.crossJoin(F.broadcast(cut))
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.when(m < F.col("c"), F.col("o_totalprice")).otherwise(0.0)),
                2,
            ).alias("s_pre"),
            F.round(
                F.sum(F.when(m >= F.col("c"), F.col("o_totalprice")).otherwise(0.0)),
                2,
            ).alias("s_post"),
        )
        .filter((F.col("s_pre") > 0) & (F.col("s_post") > 0))
    )
    ranked = spend.select(
        F.row_number()
        .over(Window.orderBy(F.col("s_pre").desc(), "o_custkey"))
        .alias("r1"),
        F.row_number()
        .over(Window.orderBy(F.col("s_post").desc(), "o_custkey"))
        .alias("r2"),
    )
    d2 = (F.col("r1") - F.col("r2")) * (F.col("r1") - F.col("r2"))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d2).cast("long").alias("sum_d2"),
        F.round(
            1.0
            - 6.0
            * F.sum(d2)
            / (
                F.count(F.lit(1))
                * (F.count(F.lit(1)) * F.count(F.lit(1)) - 1.0)
            ),
            6,
        ).alias("spearman_r"),
    )


@register(
    "analytics_time_to_convert",
    oracle="""
    WITH signup AS (
        SELECT user_id, min(ts) AS t0
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT s.user_id,
               min(epoch_us(e.ts) - epoch_us(s.t0)) AS dt_us
        FROM signup s
        JOIN events e ON e.user_id = s.user_id
                     AND e.event_type = 'purchase'
                     AND e.ts >= s.t0
        GROUP BY s.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST((SELECT count(*) FROM signup) AS BIGINT) AS n_signed_up,
           CAST(min(dt_us) AS BIGINT) AS min_us,
           CAST(CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dt_us)
                     AS BIGINT) AS BIGINT) AS p50_us,
           CAST(CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY dt_us)
                     AS BIGINT) AS BIGINT) AS p90_us,
           CAST(max(dt_us) AS BIGINT) AS max_us
    FROM conv
    """,
)
def analytics_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution — the funnel's missing dimension:
    the staged funnel counts WHO converts; this measures HOW LONG
    first-signup → first-subsequent-purchase takes, reported as
    min/p50/p90/max µs (discrete percentiles over int64 durations —
    exact values from the data, no interpolation float). p90 sizing
    is how activation teams set nudge timers and how capacity
    planning sizes the conversion-attribution window (the as-of and
    stream-stream joins' tolerance parameter SHOULD be this p90, not
    a guess — that's the operational tie-in). Two per-user aggregates
    sharing the user_id partitioning, then a 1-row summary."""
    e = load(spark, sf_dir, "events")
    signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("tp")
    )
    conv = (
        signup.join(purch, "user_id")
        .filter(F.col("tp") >= F.col("t0"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_micros("tp") - F.unix_micros("t0")
            ).alias("dt_us")
        )
    )
    n_signed = signup.agg(F.count(F.lit(1)).cast("long").alias("n_signed_up"))
    wr = Window.orderBy("dt_us", "user_id")
    ranked = conv.select(
        "dt_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    # percentile_disc semantics: smallest value with cume_dist >= p,
    # i.e. the value at 1-based rank ceil(p * n) — exact, no
    # interpolation float (Spark's percentile() interpolates).
    p50_rn = F.expr("CAST(ceil(n * 0.5) AS BIGINT)")
    p90_rn = F.expr("CAST(ceil(n * 0.9) AS BIGINT)")
    return ranked.crossJoin(F.broadcast(n_signed)).agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.first("n_signed_up").alias("n_signed_up"),
        F.min("dt_us").cast("long").alias("min_us"),
        F.max(F.when(F.col("rn") == p50_rn, F.col("dt_us")))
        .cast("long")
        .alias("p50_us"),
        F.max(F.when(F.col("rn") == p90_rn, F.col("dt_us")))
        .cast("long")
        .alias("p90_us"),
        F.max("dt_us").cast("long").alias("max_us"),
    )


@register(
    "analytics_qq_decile_table",
    oracle="""
    WITH lab AS (
        SELECT o_totalprice AS v,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
                    ELSE 'other' END AS grp
        FROM orders
    ),
    ranked AS (
        SELECT grp, v,
               row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
               count(*) OVER (PARTITION BY grp) AS n
        FROM lab
    ),
    dec AS (SELECT unnest(range(1, 10)) AS d)
    SELECT CAST(dec.d AS BIGINT) AS decile,
           round(max(CASE WHEN grp = 'urgent' THEN v END), 2) AS q_urgent_r,
           round(max(CASE WHEN grp = 'other' THEN v END), 2)  AS q_other_r,
           round(max(CASE WHEN grp = 'urgent' THEN v END)
                 - max(CASE WHEN grp = 'other' THEN v END), 2) AS gap_r
    FROM ranked JOIN dec
      ON ranked.rn = CAST(ceil(ranked.n * dec.d / 10.0) AS BIGINT)
    GROUP BY dec.d
    """,
)
def analytics_qq_decile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q-Q decile comparison — the tabular quantile-quantile plot:
    order values of two populations (urgent vs other priority) lined
    up decile-by-decile, with the per-decile gap. Where the KS row
    reduces the comparison to one statistic, this shows WHERE the
    distributions diverge (head, body, or tail) — the diagnostic
    analysts actually read before trusting a KS rejection. Discrete
    quantiles by rank selection (value at ceil(n*d/10), same rule as
    percentile_disc) so every reported number is a real observed
    value — no interpolation float. Two window ranks sharing one
    partitioning, then a 9-row pivot."""
    o = load(spark, sf_dir, "orders")
    lab = o.select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == "1-URGENT", "urgent")
        .otherwise("other")
        .alias("grp"),
    )
    wg = Window.partitionBy("grp")
    ranked = lab.select(
        "grp",
        "v",
        F.row_number().over(wg.orderBy("v")).alias("rn"),
        F.count(F.lit(1)).over(wg).alias("n"),
    )
    dec = spark.range(1, 10).select(F.col("id").alias("d"))
    hit = ranked.join(
        F.broadcast(dec),
        F.col("rn") == F.ceil(F.col("n") * F.col("d") / 10.0).cast("long"),
    )
    qu = F.max(F.when(F.col("grp") == "urgent", F.col("v")))
    qo = F.max(F.when(F.col("grp") == "other", F.col("v")))
    return hit.groupBy(F.col("d").cast("long").alias("decile")).agg(
        F.round(qu, 2).alias("q_urgent_r"),
        F.round(qo, 2).alias("q_other_r"),
        F.round(qu - qo, 2).alias("gap_r"),
    )


@register(
    "analytics_dispersion_index",
    oracle="""
    WITH daily AS (
        SELECT event_type, user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               count(*) AS n
        FROM events GROUP BY 1, 2, 3
    ),
    stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_cells,
               sum(n) AS s1,
               sum(n * n) AS s2
        FROM daily GROUP BY event_type
    )
    SELECT event_type,
           n_cells,
           floor(CAST(s1 AS DOUBLE) * 1e6 / n_cells + 0.5) / 1e6
               AS mean_r,
           floor(CAST(n_cells * s2 - s1 * s1 AS DOUBLE) * 1e6
                 / (CAST(n_cells AS DOUBLE) * CAST(n_cells AS DOUBLE))
                 + 0.5) / 1e6 AS var_r,
           floor(CAST(n_cells * s2 - s1 * s1 AS DOUBLE) * 1e6
                 / (CAST(n_cells AS DOUBLE) * CAST(s1 AS DOUBLE))
                 + 0.5) / 1e6 AS dispersion_r
    FROM stats
    """,
)
def analytics_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson dispersion index — variance-to-mean ratio of per-
    (user, day) event counts by type: D ≈ 1 means counts behave
    Poisson (rate models, Poisson regression, and the DP-counts
    noise calibration are all safe); D >> 1 is overdispersion
    (bursty users — switch to negative-binomial assumptions and
    expect heavier shuffle skew on hot keys); D << 1 is
    under-dispersion (throttled/metered behavior). The cheapest
    model-assumption check in the stats family, and the quantitative
    bridge between the statistical rows and the skew-diagnosis row.
    One (type, user, day) census then a 5-row moment aggregate.

    Determinism (r16 grid-avg rule): the inputs are INTEGER counts,
    so mean/var/dispersion are small-denominator rationals that can
    sit exactly on .5e-6 edge boundaries — all three edges are
    computed from the exact integer moments (n, Σx, Σx²):
    var_pop = (nΣx² − (Σx)²)/n², D = (nΣx² − (Σx)²)/(nΣx), each one
    identical FP division of identical integers (decimal(38,0) sums
    in Spark / HUGEINT in DuckDB keep the moments exact past the
    BIGINT range at large SF)."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        "user_id",
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx"),
    ).agg(F.count(F.lit(1)).alias("n"))
    moments = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(F.col("n").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("n") * F.col("n")).cast("decimal(38,0)")).alias("s2"),
    )
    num = (
        (F.col("n_cells").cast("decimal(38,0)") * F.col("s2"))
        - F.col("s1") * F.col("s1")
    ).cast("double")
    nd = F.col("n_cells").cast("double")
    s1d = F.col("s1").cast("double")
    return moments.select(
        "event_type",
        "n_cells",
        (
            F.floor(s1d * F.lit(1e6) / F.col("n_cells") + F.lit(0.5))
            / F.lit(1e6)
        ).alias("mean_r"),
        (F.floor(num * F.lit(1e6) / (nd * nd) + F.lit(0.5)) / F.lit(1e6)).alias(
            "var_r"
        ),
        (
            F.floor(num * F.lit(1e6) / (nd * s1d) + F.lit(0.5)) / F.lit(1e6)
        ).alias("dispersion_r"),
    )


@register(
    "analytics_neyman_allocation",
    oracle="""
    WITH strata AS (
        SELECT c_mktsegment AS stratum,
               count(*) AS nh,
               stddev_pop(c_acctbal) AS sh
        FROM customer GROUP BY c_mktsegment
    ),
    tot AS (SELECT sum(nh * sh) AS w FROM strata)
    SELECT s.stratum,
           CAST(s.nh AS BIGINT) AS n_population,
           round(s.sh, 4) AS stddev_r,
           CAST(floor(500 * s.nh * s.sh / tot.w) AS BIGINT)
               AS neyman_n,
           CAST(floor(500.0 * s.nh / sum(s.nh) OVER ()) AS BIGINT)
               AS proportional_n
    FROM strata s, tot
    """,
)
def analytics_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman (optimal) stratified-sample allocation — survey
    sampling's classic: a 500-unit audit budget splits across strata
    proportional to N_h·σ_h, oversampling volatile strata so the
    stratified-mean variance is MINIMIZED for the budget — shown
    next to naive proportional allocation, and the gap between the
    two columns is exactly where variance is won. This is how data-
    quality audits, financial-statement sampling, and eval-set
    construction should size per-segment samples (uniform or
    proportional sampling wastes budget on homogeneous strata). One
    moment pass per stratum; floor-integer allocations (top up the
    slack by largest remainder — that row shows how)."""
    c = load(spark, sf_dir, "customer")
    strata = c.groupBy(F.col("c_mktsegment").alias("stratum")).agg(
        F.count(F.lit(1)).alias("nh"),
        F.stddev_pop("c_acctbal").alias("sh"),
    )
    tot = strata.agg(F.sum(F.col("nh") * F.col("sh")).alias("w"))
    return strata.crossJoin(F.broadcast(tot)).select(
        "stratum",
        F.col("nh").cast("long").alias("n_population"),
        F.round("sh", 4).alias("stddev_r"),
        F.floor(500 * F.col("nh") * F.col("sh") / F.col("w"))
        .cast("long")
        .alias("neyman_n"),
        F.floor(
            500.0 * F.col("nh") / F.sum("nh").over(Window.partitionBy())
        )
        .cast("long")
        .alias("proportional_n"),
    )


@register(
    "analytics_ab_power_analysis",
    oracle="""
    WITH base AS (
        SELECT count(*) AS n,
               sum(CASE WHEN o_orderpriority = '1-URGENT'
                        THEN 1 ELSE 0 END) AS k
        FROM orders
    ),
    mde AS (SELECT unnest([0.01, 0.02, 0.05]) AS d),
    calc AS (
        SELECT mde.d,
               k * 1.0 / n AS p1,
               k * 1.0 / n + mde.d AS p2
        FROM base, mde
    )
    SELECT round(d, 2) AS mde,
           round(p1, 6) AS baseline_rate_r,
           CAST(ceil(pow(1.959964 * sqrt(2 * ((p1 + p2) / 2)
                                         * (1 - (p1 + p2) / 2))
                         + 0.841621 * sqrt(p1 * (1 - p1)
                                           + p2 * (1 - p2)), 2)
                     / (d * d)) AS BIGINT) AS n_per_arm
    FROM calc
    """,
)
def analytics_ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size (power) analysis — the pre-registration table
    every experiment platform computes before a launch: per minimum
    detectable effect (+1/+2/+5 pp on the measured baseline
    urgent-order rate), the required n per arm for alpha = 0.05
    two-sided (z = 1.959964) and 80% power (z = 0.841621), by the
    standard two-proportion formula n = (z_a·sqrt(2 p̄ q̄) +
    z_b·sqrt(p1 q1 + p2 q2))² / δ². Running it as a QUERY means the
    baseline rate is measured, not guessed — the step most
    underpowered experiments skip. The z constants are literals on
    both engines; the whole thing is one count aggregate plus a
    3-row broadcast of MDEs."""
    o = load(spark, sf_dir, "orders")
    base = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("o_orderpriority") == "1-URGENT").cast("int")).alias("k"),
    )
    mde = spark.createDataFrame([(0.01,), (0.02,), (0.05,)], "d DOUBLE")
    calc = base.crossJoin(F.broadcast(mde)).select(
        "d",
        (F.col("k") / F.col("n")).alias("p1"),
        (F.col("k") / F.col("n") + F.col("d")).alias("p2"),
    )
    pbar = (F.col("p1") + F.col("p2")) / 2
    n_arm = F.ceil(
        F.pow(
            F.lit(1.959964) * F.sqrt(2 * pbar * (1 - pbar))
            + F.lit(0.841621)
            * F.sqrt(
                F.col("p1") * (1 - F.col("p1"))
                + F.col("p2") * (1 - F.col("p2"))
            ),
            F.lit(2.0),
        )
        / (F.col("d") * F.col("d"))
    )
    return calc.select(
        F.round("d", 2).alias("mde"),
        F.round("p1", 6).alias("baseline_rate_r"),
        n_arm.cast("long").alias("n_per_arm"),
    )


@register(
    "analytics_cuped_adjustment",
    oracle="""
    WITH cut AS (
        SELECT min(CAST(floor(epoch(ts) / 86400) AS BIGINT)) + 15 AS c
        FROM events
    ),
    per_user AS (
        SELECT user_id,
               round(sum(CASE WHEN CAST(floor(epoch(ts) / 86400) AS BIGINT)
                                   < cut.c THEN value ELSE 0 END), 2) AS pre,
               round(sum(CASE WHEN CAST(floor(epoch(ts) / 86400) AS BIGINT)
                                   >= cut.c THEN value ELSE 0 END), 2) AS post
        FROM events, cut
        GROUP BY user_id
    ),
    m AS (
        SELECT count(*) AS n,
               avg(pre) AS mx, avg(post) AS my,
               covar_pop(pre, post) AS cxy,
               var_pop(pre) AS vx, var_pop(post) AS vy,
               corr(pre, post) AS rho
        FROM per_user
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           round(cxy / vx, 6) AS theta_r,
           round(vy, 4) AS var_post_r,
           round(vy - cxy * cxy / vx, 4) AS var_cuped_r,
           round(rho * rho, 6) AS var_reduction_frac_r
    FROM m
    """,
)
def analytics_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction — the modern experimentation-platform
    standard (Deng et al.): adjust each user's experiment-period
    metric by theta times their PRE-period metric
    (theta = cov(pre, post)/var(pre)); the adjusted metric's
    variance drops by exactly rho² — with rho = 0.5 an experiment
    needs 25% fewer users for the same power (compose with the
    power-analysis row: divide its n_per_arm by (1 - rho²)). The
    report gives theta, raw vs adjusted variance, and the reduction
    fraction, all from ONE per-user pre/post aggregate and a moment
    pass — the pre-period sums round at the money grain so both
    engines' moments see identical inputs."""
    e = load(spark, sf_dir, "events").withColumn(
        "day_idx",
        F.floor(F.col("ts").cast("double") / 86400).cast("long"),
    )
    cut = e.agg((F.min("day_idx") + 15).alias("c"))
    per_user = (
        e.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("day_idx") < F.col("c"), F.col("value")).otherwise(
                        0.0
                    )
                ),
                2,
            ).alias("pre"),
            F.round(
                F.sum(
                    F.when(
                        F.col("day_idx") >= F.col("c"), F.col("value")
                    ).otherwise(0.0)
                ),
                2,
            ).alias("post"),
        )
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(F.covar_pop("pre", "post") / F.var_pop("pre"), 6).alias(
            "theta_r"
        ),
        F.round(F.var_pop("post"), 4).alias("var_post_r"),
        F.round(
            F.var_pop("post")
            - F.covar_pop("pre", "post")
            * F.covar_pop("pre", "post")
            / F.var_pop("pre"),
            4,
        ).alias("var_cuped_r"),
        F.round(F.corr("pre", "post") * F.corr("pre", "post"), 6).alias(
            "var_reduction_frac_r"
        ),
    )


@register(
    "analytics_progressive_brackets",
    oracle="""
    WITH spend AS (
        SELECT o_custkey,
               CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT) AS s_cents
        FROM orders GROUP BY o_custkey
    ),
    brackets AS (
        SELECT * FROM (VALUES
            (CAST(0 AS BIGINT),        CAST(10000000 AS BIGINT), 0),
            (CAST(10000000 AS BIGINT), CAST(50000000 AS BIGINT), 2),
            (CAST(50000000 AS BIGINT), CAST(9223372036854775807 AS BIGINT), 5)
        ) AS b(lo, hi, rate_pct)
    )
    SELECT sp.o_custkey,
           sp.s_cents,
           CAST(sum(least(greatest(sp.s_cents - b.lo, 0), b.hi - b.lo)
                    * b.rate_pct // 100) AS BIGINT) AS fee_cents,
           CAST(max(CASE WHEN sp.s_cents > b.lo THEN b.rate_pct
                         ELSE 0 END) AS BIGINT) AS marginal_rate_pct
    FROM spend sp CROSS JOIN brackets b
    GROUP BY sp.o_custkey, sp.s_cents
    """,
)
def analytics_progressive_brackets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Progressive bracket computation — the tax/royalty/tiered-
    pricing kernel: each customer's annual spend is charged
    per-bracket marginal rates (0% to $100k, 2% to $500k, 5% above),
    with each bracket contributing min(max(x - lo, 0), hi - lo) ×
    rate — the closed form that replaces the CASE-ladder (which
    breaks the moment brackets change) with a data-driven bracket
    table you can UPDATE without touching the query. All arithmetic
    int64 cents with floor division per bracket (the statutory
    rounding convention — document yours!), so the fee can never
    float-drift; marginal_rate is the audit column. One customer
    aggregate crossed with a 3-row broadcast bracket dim — rates
    change by editing data, not code, which at 100 TB means no
    redeploy."""
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice") * 100, 0).cast("long").alias("s_cents")
    )
    brackets = spark.createDataFrame(
        [
            (0, 10000000, 0),
            (10000000, 50000000, 2),
            (50000000, 9223372036854775807, 5),
        ],
        "lo LONG, hi LONG, rate_pct INT",
    )
    j = spend.crossJoin(F.broadcast(brackets))
    slab = F.least(
        F.greatest(F.col("s_cents") - F.col("lo"), F.lit(0)),
        F.col("hi") - F.col("lo"),
    )
    return j.groupBy("o_custkey", "s_cents").agg(
        F.sum(F.expr(
            "least(greatest(s_cents - lo, CAST(0 AS BIGINT)), hi - lo)"
            " * rate_pct div 100"
        ))
        .cast("long")
        .alias("fee_cents"),
        F.max(
            F.when(F.col("s_cents") > F.col("lo"), F.col("rate_pct")).otherwise(0)
        )
        .cast("long")
        .alias("marginal_rate_pct"),
    )


@register(
    "analytics_auto_binning_fd",
    oracle="""
    WITH ranked AS (
        SELECT o_totalprice AS v,
               row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
               count(*) OVER () AS n
        FROM orders
    ),
    q AS (
        SELECT max(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT)
                        THEN v END) AS q1,
               max(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT)
                        THEN v END) AS q3,
               max(n) AS n, min(v) AS lo, max(v) AS hi
        FROM ranked
    ),
    plan AS (
        SELECT n, lo, hi,
               2.0 * (q3 - q1) / pow(n, 1.0 / 3.0) AS width,
               CAST(ceil((hi - lo) / (2.0 * (q3 - q1)
                                      / pow(n, 1.0 / 3.0))) AS BIGINT)
                   AS n_bins
        FROM q
    )
    SELECT CAST(plan.n AS BIGINT) AS n_rows,
           round(plan.width, 4) AS bin_width_r,
           plan.n_bins,
           CAST(b.bin AS BIGINT) AS bin,
           CAST(count(r.v) AS BIGINT) AS n_in_bin
    FROM plan,
         ranked r,
         LATERAL (SELECT least(CAST(floor((r.v - plan.lo) / plan.width)
                                    AS BIGINT), plan.n_bins - 1) AS bin) b
    GROUP BY plan.n, plan.width, plan.n_bins, b.bin
    """,
)
def analytics_auto_binning_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freedman–Diaconis automatic histogram design — the bin width
    is DERIVED from the data (2·IQR/n^⅓, robust to outliers where
    Sturges and fixed-width guesses are not), then the histogram is
    built with it in the same query: the two-phase "design from
    statistics, then apply" pattern every auto-profiling UI runs.
    Quartiles come from exact rank selection (ceil(n·p), the
    percentile_disc rule used across this repo); the plan row
    (width, bin count) broadcasts onto the value scan for the
    counting pass. Two passes total at any scale — one for order
    statistics, one for the histogram — vs the naive
    guess-rebuild-repeat loop."""
    o = load(spark, sf_dir, "orders")
    wr = Window.orderBy("o_totalprice", "o_orderkey")
    ranked = o.select(
        F.col("o_totalprice").alias("v"),
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    q = ranked.agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.25).cast("long"), F.col("v")
            )
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(F.col("n") * 0.75).cast("long"), F.col("v")
            )
        ).alias("q3"),
        F.max("n").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    plan = q.select(
        F.col("n").alias("n_total"),
        "lo",
        "hi",
        (2.0 * (F.col("q3") - F.col("q1")) / F.pow("n", F.lit(1.0 / 3.0))).alias(
            "width"
        ),
    ).withColumn(
        "n_bins",
        F.ceil((F.col("hi") - F.col("lo")) / F.col("width")).cast("long"),
    )
    binned = ranked.drop("n", "rn").crossJoin(F.broadcast(plan)).select(
        "n_total",
        "width",
        "n_bins",
        F.least(
            F.floor((F.col("v") - F.col("lo")) / F.col("width")).cast("long"),
            F.col("n_bins") - 1,
        ).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.first("n_total").cast("long").alias("n_rows"),
        F.round(F.first("width"), 4).alias("bin_width_r"),
        F.first("n_bins").alias("n_bins"),
        F.count(F.lit(1)).cast("long").alias("n_in_bin"),
    ).select("n_rows", "bin_width_r", "n_bins", "bin", "n_in_bin")


@register(
    "analytics_margin_waterfall",
    oracle="""
    WITH li AS (
        SELECT n.n_name AS segment_key,
               sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                   * 10000) AS gross_mu,
               sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                   * CAST(round(l.l_discount * 100, 0) AS BIGINT)
                   * 100) AS disc_mu,
               sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT))
                   * CAST(round(l.l_tax * 100, 0) AS BIGINT)) AS tax_mu
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
    )
    SELECT segment_key, 'gross_revenue' AS stage,
           CAST(1 AS BIGINT) AS stage_no,
           CAST(gross_mu AS BIGINT) AS amount_mu FROM li
    UNION ALL
    SELECT segment_key, 'less_discounts', CAST(2 AS BIGINT),
           CAST(-disc_mu AS BIGINT) FROM li
    UNION ALL
    SELECT segment_key, 'less_tax', CAST(3 AS BIGINT),
           CAST(-tax_mu AS BIGINT) FROM li
    UNION ALL
    SELECT segment_key, 'net_revenue', CAST(4 AS BIGINT),
           CAST(gross_mu - disc_mu - tax_mu AS BIGINT) FROM li
    """,
)
def analytics_margin_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution-margin waterfall — the finance bridge chart as
    data: per supplier nation, gross revenue steps down through
    discounts and tax to net revenue, each step a signed row so the
    running total of the waterfall IS the bridge, and the net row
    equals the sum of the steps by integer identity. Every amount is
    an EXACT int64 in micro-dollars (price cents x discount
    hundredths x tax hundredths — the 6-decimal true grain of
    2dp x 2dp x 2dp), because a float edge here sits on the round-2
    half boundary where engines legitimately disagree (this exact
    query caught one at sf0.01 before the integer rewrite). All
    three step measures fuse into ONE star-join aggregate; the
    unpivot to (stage, amount) rows is free."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ep_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_c = F.round(F.col("l_discount") * 100, 0).cast("long")
    tax_c = F.round(F.col("l_tax") * 100, 0).cast("long")
    base = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("segment_key"))
        .agg(
            F.sum(ep_c * 10000).alias("gross_mu"),
            F.sum(ep_c * disc_c * 100).alias("disc_mu"),
            F.sum(ep_c * (100 - disc_c) * tax_c).alias("tax_mu"),
        )
    )

    def stage(name, no, amount):
        return base.select(
            "segment_key",
            F.lit(name).alias("stage"),
            F.lit(no).cast("long").alias("stage_no"),
            amount.cast("long").alias("amount_mu"),
        )

    return (
        stage("gross_revenue", 1, F.col("gross_mu"))
        .unionByName(stage("less_discounts", 2, -F.col("disc_mu")))
        .unionByName(stage("less_tax", 3, -F.col("tax_mu")))
        .unionByName(
            stage(
                "net_revenue",
                4,
                F.col("gross_mu") - F.col("disc_mu") - F.col("tax_mu"),
            )
        )
    )


@register(
    "analytics_holt_trend_forecast",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               round(sum(value), 2) AS a
        FROM events GROUP BY 1
    ),
    lagged AS (
        SELECT day_idx, a,
               lag(a, 1) OVER w AS a1, lag(a, 2) OVER w AS a2,
               lag(a, 3) OVER w AS a3, lag(a, 4) OVER w AS a4
        FROM daily WINDOW w AS (ORDER BY day_idx)
    ),
    smoothed AS (
        SELECT day_idx, a,
               (a + a1 * 0.5 + a2 * 0.25 + a3 * 0.125 + a4 * 0.0625)
                   / 1.9375 AS level,
               ((a - a1) + (a1 - a2) * 0.5 + (a2 - a3) * 0.25
                + (a3 - a4) * 0.125) / 1.875 AS trend
        FROM lagged
        WHERE a4 IS NOT NULL
    )
    SELECT day_idx,
           round(level, 4) AS level_r,
           round(trend, 4) AS trend_r,
           round(level + trend, 4) AS forecast_next_r
    FROM smoothed
    """,
)
def analytics_holt_trend_forecast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Holt-style trend-adjusted smoothing as a finite FIR — the
    level is a 5-tap exponential moving average and the trend a
    4-tap EWMA of first differences; forecast(t+1) = level + trend.
    Plain EWMA (the per-user row) lags a trending series by design;
    adding the smoothed slope removes that lag — the one-line reason
    demand forecasting uses Holt over EWMA. The textbook recursive
    Holt is not window-expressible (infinite memory); the truncated
    FIR form is, keeps >96% of the weight mass at alpha=0.5, and is
    exactly reproducible on both engines (full-window rows only, so
    every tap is real data — no edge renormalization ambiguity).
    The series is |days| rows after one aggregate; per-segment
    forecasts partition the same window."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx")
    ).agg(F.round(F.sum("value"), 2).alias("a"))
    w = Window.orderBy("day_idx")
    lagged = daily.select(
        "day_idx",
        "a",
        F.lag("a", 1).over(w).alias("a1"),
        F.lag("a", 2).over(w).alias("a2"),
        F.lag("a", 3).over(w).alias("a3"),
        F.lag("a", 4).over(w).alias("a4"),
    ).filter(F.col("a4").isNotNull())
    level = (
        F.col("a")
        + F.col("a1") * 0.5
        + F.col("a2") * 0.25
        + F.col("a3") * 0.125
        + F.col("a4") * 0.0625
    ) / 1.9375
    trend = (
        (F.col("a") - F.col("a1"))
        + (F.col("a1") - F.col("a2")) * 0.5
        + (F.col("a2") - F.col("a3")) * 0.25
        + (F.col("a3") - F.col("a4")) * 0.125
    ) / 1.875
    return lagged.select(
        "day_idx",
        F.round(level, 4).alias("level_r"),
        F.round(trend, 4).alias("trend_r"),
        F.round(level + trend, 4).alias("forecast_next_r"),
    )


@register(
    "analytics_retention_half_life",
    oracle="""
    WITH first_day AS (
        SELECT user_id,
               min(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS d0
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id,
               CAST(floor(epoch(e.ts) / 86400) AS BIGINT) - f.d0 AS offset_d
        FROM events e JOIN first_day f ON f.user_id = e.user_id
    ),
    decay AS (
        SELECT offset_d, count(*) AS n_active
        FROM activity WHERE offset_d BETWEEN 1 AND 14
        GROUP BY offset_d
    )
    SELECT CAST(count(*) AS BIGINT) AS n_points,
           round(regr_slope(ln(n_active), offset_d), 6) AS slope_r,
           round(regr_intercept(ln(n_active), offset_d), 6)
               AS intercept_r,
           round(-ln(2) / regr_slope(ln(n_active), offset_d), 4)
               AS half_life_days_r
    FROM decay
    """,
)
def analytics_retention_half_life(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Retention half-life — fit ln(active users) ~ days-since-first-
    seen over offsets 1-14 and report -ln2/slope: the single number
    ("engagement halves every H days") that growth teams quote where
    the full retention matrix row gives the curve. Exponential-decay
    fitting by log-linear least squares is the standard trick, and
    regr_slope over exact integer day-counts makes it one aggregate
    over a 14-row table — the fact pass is the same first-seen +
    distinct-activity census the cohort-retention row builds.
    Negative slope => finite half-life; a flat/positive slope (no
    decay in this synthetic fixture's uniform activity) shows up as
    a negative "half-life", which is precisely the sanity check the
    property test pins."""
    e = load(spark, sf_dir, "events").withColumn(
        "day_idx",
        F.floor(F.col("ts").cast("double") / 86400).cast("long"),
    )
    first = e.groupBy("user_id").agg(F.min("day_idx").alias("d0"))
    act = (
        e.join(first, "user_id")
        .select("user_id", (F.col("day_idx") - F.col("d0")).alias("offset_d"))
        .distinct()
    )
    decay = (
        act.filter(F.col("offset_d").between(1, 14))
        .groupBy("offset_d")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    lx = F.log(F.col("n_active").cast("double"))
    return decay.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.round(F.expr("regr_slope(ln(CAST(n_active AS DOUBLE)), offset_d)"), 6).alias(
            "slope_r"
        ),
        F.round(
            F.expr("regr_intercept(ln(CAST(n_active AS DOUBLE)), offset_d)"), 6
        ).alias("intercept_r"),
        F.round(
            -F.log(F.lit(2.0))
            / F.expr("regr_slope(ln(CAST(n_active AS DOUBLE)), offset_d)"),
            4,
        ).alias("half_life_days_r"),
    )


# ---------------------------------------------------------------------------
# Round-4 additions: robust/rank statistics, time-series diagnostics,
# and inequality curves. All window after aggregation (bounded inputs,
# enforced by tests/test_plans.py::test_unpartitioned_windows_are_bounded).
# ---------------------------------------------------------------------------


@register(
    "analytics_kendall_tau",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 6) AS day_val
        FROM events
        GROUP BY CAST(floor(epoch(ts) / 86400) AS BIGINT)
    ),
    pairs AS (
        SELECT a.n_events - b.n_events AS dx, a.day_val - b.day_val AS dy
        FROM daily a JOIN daily b ON a.day_idx < b.day_idx
    ),
    s AS (
        SELECT
            CAST(count(*) AS BIGINT) AS n0,
            CAST(sum(CASE WHEN dx <> 0 AND dy <> 0
                          AND (dx > 0) = (dy > 0) THEN 1 ELSE 0 END)
                 AS BIGINT) AS concordant,
            CAST(sum(CASE WHEN dx <> 0 AND dy <> 0
                          AND (dx > 0) <> (dy > 0) THEN 1 ELSE 0 END)
                 AS BIGINT) AS discordant,
            CAST(sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tied_x,
            CAST(sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tied_y
        FROM pairs
    )
    SELECT n0, concordant, discordant,
           round((concordant - discordant)
                 / sqrt((n0 - tied_x) * 1.0 * (n0 - tied_y)), 6) AS tau_b_r
    FROM s
    """,
)
def analytics_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between daily event volume and
    daily value total — the robust monotone-association sibling of the
    Pearson (corr) and Spearman rows. Concordant/discordant/tied pair
    counts come from the O(days^2) self-join of the DAILY aggregate
    (bounded: |days| rows regardless of corpus size — the fact table
    is touched once by the groupBy), so the statistic's numerator is
    exact integer arithmetic and only the final ratio rounds (6dp
    stats grain). Day values round to 6dp before differencing so sign
    comparisons are identical cross-engine."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 6).alias("day_val"),
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(b, F.col("a.day_idx") < F.col("b.day_idx")).select(
        (F.col("a.n_events") - F.col("b.n_events")).alias("dx"),
        (F.col("a.day_val") - F.col("b.day_val")).alias("dy"),
    )
    s = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        F.sum(
            F.when(
                (F.col("dx") != 0)
                & (F.col("dy") != 0)
                & ((F.col("dx") > 0) == (F.col("dy") > 0)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("concordant"),
        F.sum(
            F.when(
                (F.col("dx") != 0)
                & (F.col("dy") != 0)
                & ((F.col("dx") > 0) != (F.col("dy") > 0)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("discordant"),
        F.sum(F.when(F.col("dx") == 0, 1).otherwise(0)).cast("long").alias("tied_x"),
        F.sum(F.when(F.col("dy") == 0, 1).otherwise(0)).cast("long").alias("tied_y"),
    )
    return s.select(
        "n0",
        "concordant",
        "discordant",
        F.round(
            (F.col("concordant") - F.col("discordant"))
            / F.sqrt(
                (F.col("n0") - F.col("tied_x"))
                * F.lit(1.0)
                * (F.col("n0") - F.col("tied_y"))
            ),
            6,
        ).alias("tau_b_r"),
    )


@register(
    "analytics_theil_sen",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS x,
               floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                          AS DOUBLE) * 1e4 / count(*) + 0.5) / 1e6 AS y
        FROM events
        GROUP BY CAST(floor(epoch(ts) / 86400) AS BIGINT)
    ),
    slopes AS (
        SELECT (b.y - a.y) / (b.x - a.x) AS m
        FROM daily a JOIN daily b ON a.x < b.x
    ),
    sl AS (SELECT median(m) AS slope FROM slopes),
    ic AS (
        SELECT median(d.y - sl.slope * d.x) AS intercept
        FROM daily d CROSS JOIN sl
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n_days,
           round(sl.slope, 6) AS slope_r,
           round(ic.intercept, 4) AS intercept_r
    FROM sl CROSS JOIN ic
    """,
)
def analytics_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend — the median of all pairwise slopes of
    the daily value average, with the median-residual intercept. The
    pairwise slope set is O(days^2) over the bounded DAILY aggregate
    (never the raw corpus); both medians interpolate identically in
    Spark and DuckDB because the slope values are bit-identical IEEE
    divisions of 6dp-rounded inputs. Robust to the outlier days that
    wreck the OLS row (analytics_ols_normal_equations): up to 29%
    contamination leaves the estimate unmoved."""
    e = load(spark, sf_dir, "events")
    # y is an exact-cents integer sum + one identical division, not a
    # double avg + round: value is 2dp grid data, so the daily mean is
    # a small-denominator rational that can sit exactly on a .5e-6
    # boundary (r16 grid-avg rule)
    daily = e.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("x")
    ).agg(
        (
            F.floor(
                F.sum(
                    _cents(F.col("value"))
                ).cast("double")
                * F.lit(1e4)
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("y")
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(b, F.col("a.x") < F.col("b.x")).select(
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x"))).alias("m")
    )
    sl = slopes.agg(F.median("m").alias("slope"))
    ic = (
        daily.crossJoin(F.broadcast(sl))
        .select((F.col("y") - F.col("slope") * F.col("x")).alias("resid"))
        .agg(F.median("resid").alias("intercept"))
    )
    n = daily.agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    return (
        sl.crossJoin(F.broadcast(ic))
        .crossJoin(F.broadcast(n))
        .select(
            "n_days",
            F.round(F.col("slope"), 6).alias("slope_r"),
            F.round(F.col("intercept"), 4).alias("intercept_r"),
        )
    )


@register(
    "analytics_acf_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               round(sum(value), 6) AS day_val
        FROM events
        GROUP BY CAST(floor(epoch(ts) / 86400) AS BIGINT)
    ),
    lags AS (SELECT * FROM (VALUES (1), (2), (3), (7)) AS t(lag_d))
    SELECT lag_d,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(corr(a.day_val, b.day_val), 4) AS acf_r
    FROM lags
    JOIN daily a ON TRUE
    JOIN daily b ON b.day_idx = a.day_idx + lags.lag_d
    GROUP BY lag_d
    """,
)
def analytics_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily value series at lags
    1/2/3/7 — the seasonality screen run before fitting any forecast
    (a spike at lag 7 = weekly cycle; slow decay = trend; the Holt row
    consumes exactly this diagnosis). Each lag is a keyed self-join of
    the bounded daily aggregate shifted by the lag, so the whole ACF
    costs one corpus pass + O(|lags| * days) joins; corr is the exact
    same sample-Pearson in both engines, rounded at the 4dp stats
    grain. The lag spine is a 4-row literal dimension (broadcast)."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx")
    ).agg(F.round(F.sum("value"), 6).alias("day_val"))
    lags = spark.createDataFrame([(1,), (2,), (3,), (7,)], "lag_d int").select(
        F.col("lag_d").cast("int")
    )
    a = daily.select(F.col("day_idx"), F.col("day_val").alias("v0"))
    b = daily.select(
        F.col("day_idx").alias("day_idx_b"), F.col("day_val").alias("v1")
    )
    return (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("day_idx_b") == F.col("day_idx") + F.col("lag_d"))
        .groupBy("lag_d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.corr("v0", "v1"), 4).alias("acf_r"),
        )
    )


@register(
    "analytics_js_divergence",
    oracle="""
    WITH cells AS (
        SELECT event_type,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_p,
               CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_q
        FROM events GROUP BY event_type
    ),
    tot AS (
        SELECT sum(n_p) AS tp, sum(n_q) AS tq FROM cells
    ),
    terms AS (
        SELECT c.event_type,
               c.n_p / (1.0 * t.tp) AS p,
               c.n_q / (1.0 * t.tq) AS q
        FROM cells c CROSS JOIN tot t
    )
    SELECT CAST(count(*) AS BIGINT) AS n_types,
           round(sum(CASE WHEN p > 0
                          THEN 0.5 * p * ln(p / ((p + q) / 2)) / ln(2)
                          ELSE 0 END)
                 + sum(CASE WHEN q > 0
                            THEN 0.5 * q * ln(q / ((p + q) / 2)) / ln(2)
                            ELSE 0 END), 9) AS js_divergence_r
    FROM terms
    """,
)
def analytics_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between the event-type distributions
    of two user cohorts (even vs odd user_id) — the symmetric,
    bounded [0,1] drift metric an LLM-data pipeline tracks between
    data mixes (PSI's bounded cousin: PSI explodes on near-zero bins,
    JS doesn't). ONE corpus pass builds the (type × cohort) cell
    census; divergence is a sum over |types| cells. Transcendental
    edge → 9dp round (CLAUDE.md); log2 phrased as ln/ln(2) so both
    engines run the same libm composition."""
    e = load(spark, sf_dir, "events")
    cells = e.groupBy("event_type").agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_p"),
        F.sum(F.when(F.col("user_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_q"),
    )
    tot = cells.agg(
        F.sum("n_p").alias("tp"), F.sum("n_q").alias("tq")
    )
    terms = cells.crossJoin(F.broadcast(tot)).select(
        "event_type",
        (F.col("n_p") / (F.lit(1.0) * F.col("tp"))).alias("p"),
        (F.col("n_q") / (F.lit(1.0) * F.col("tq"))).alias("q"),
    )
    m = (F.col("p") + F.col("q")) / 2
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.round(
            F.sum(
                F.when(
                    F.col("p") > 0,
                    0.5 * F.col("p") * F.log(F.col("p") / m) / F.log(F.lit(2.0)),
                ).otherwise(0.0)
            )
            + F.sum(
                F.when(
                    F.col("q") > 0,
                    0.5 * F.col("q") * F.log(F.col("q") / m) / F.log(F.lit(2.0)),
                ).otherwise(0.0)
            ),
            9,
        ).alias("js_divergence_r"),
    )


@register(
    "analytics_burstiness",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
               / 1000000.0 AS gap_s
        FROM events
    ),
    st AS (
        SELECT user_id,
               CAST(count(gap_s) AS BIGINT) AS n_gaps,
               avg(gap_s) AS mu,
               stddev_samp(gap_s) AS sigma
        FROM gaps WHERE gap_s IS NOT NULL
        GROUP BY user_id
        HAVING count(gap_s) >= 2
    )
    SELECT user_id, n_gaps,
           round(mu, 4) AS mean_gap_s_r,
           round((sigma - mu) / (sigma + mu), 6) AS burstiness_r
    FROM st
    """,
)
def analytics_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user burstiness index B = (σ−μ)/(σ+μ) of inter-event gaps
    (Goh–Barabási): −1 = metronome, 0 = Poisson, →1 = heavy-tailed
    bursts. The signal a rate-limiter or bot-detector keys on, and a
    direct consumer of the lag-window gap idiom: gaps are exact
    integer microsecond differences (unix_micros, never fractional
    epoch()) scaled to seconds, one user-partitioned window + one
    groupBy — a single shuffle on user_id. σ is sample stddev in both
    engines; ratio edges round at 6dp, the mean gap at 4dp."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)) / 1000000.0
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    st = (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_s").cast("long").alias("n_gaps"),
            F.avg("gap_s").alias("mu"),
            F.stddev_samp("gap_s").alias("sigma"),
        )
        .filter(F.col("n_gaps") >= 2)
    )
    return st.select(
        "user_id",
        "n_gaps",
        F.round(F.col("mu"), 4).alias("mean_gap_s_r"),
        F.round(
            (F.col("sigma") - F.col("mu")) / (F.col("sigma") + F.col("mu")), 6
        ).alias("burstiness_r"),
    )


@register(
    "analytics_lorenz_deciles",
    oracle="""
    WITH spend AS (
        SELECT o_custkey, round(sum(o_totalprice), 2) AS s
        FROM orders GROUP BY o_custkey
    ),
    dec AS (
        SELECT s, CAST(ntile(10) OVER (ORDER BY s, o_custkey) AS BIGINT) AS decile
        FROM spend
    ),
    agg AS (
        SELECT decile,
               CAST(count(*) AS BIGINT) AS n_customers,
               round(sum(s), 2) AS decile_spend
        FROM dec GROUP BY decile
    )
    SELECT decile, n_customers, decile_spend,
           round(sum(decile_spend) OVER (ORDER BY decile)
                 / (sum(decile_spend) OVER ()), 6) AS cum_share_r
    FROM agg
    """,
)
def analytics_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve by customer-spend decile — the table behind the
    Gini row (analytics_gini_pareto): ntile(10) over the customer-
    grain spend aggregate, then each decile's spend and cumulative
    share. Reads as 'the bottom 50% of customers carry X% of
    revenue'. The global ntile and cumulative windows run over
    customer- and decile-grain aggregates (bounded — the fact pass is
    the one groupBy); spend rounds at the 2dp money grain before
    ranking so decile boundaries are cross-engine identical."""
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("s")
    )
    dec = spend.select(
        "s",
        F.ntile(10).over(Window.orderBy("s", "o_custkey")).cast("long").alias("decile"),
    )
    agg = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.round(F.sum("s"), 2).alias("decile_spend"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return agg.select(
        "decile",
        "n_customers",
        "decile_spend",
        F.round(
            F.sum("decile_spend").over(w_cum) / F.sum("decile_spend").over(w_all), 6
        ).alias("cum_share_r"),
    )


@register(
    "analytics_record_highs",
    oracle="""
    WITH daily AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               round(sum(value), 6) AS day_val
        FROM events GROUP BY user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT)
    ),
    flagged AS (
        SELECT user_id, day_val,
               CASE WHEN max(day_val) OVER (
                        PARTITION BY user_id ORDER BY day_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL THEN 1
                    WHEN day_val > max(day_val) OVER (
                        PARTITION BY user_id ORDER BY day_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS is_record
        FROM daily
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(is_record) AS BIGINT) AS n_records
    FROM flagged GROUP BY user_id
    """,
)
def analytics_record_highs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-high days per user: how many days set a new personal
    maximum of daily value total (first day always counts). The
    running-max-vs-current idiom every leaderboard/'new ATH' feature
    uses, as one user-partitioned window over the daily aggregate —
    daily totals round at 6dp BEFORE comparison so the strict '>' is
    decided on identical values in both engines. One shuffle keys the
    daily groupBy, the window, and the final per-user count."""
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id",
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx"),
    ).agg(F.round(F.sum("value"), 6).alias("day_val"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("day_val").over(w)
    flagged = daily.select(
        "user_id",
        F.when(prev_max.isNull(), 1)
        .when(F.col("day_val") > prev_max, 1)
        .otherwise(0)
        .alias("is_record"),
    )
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("is_record").cast("long").alias("n_records"),
    )


@register(
    "analytics_dow_hour_heatmap",
    oracle="""
    WITH cells AS (
        SELECT CAST((CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7
                    AS BIGINT) AS dow,
               CAST(floor((epoch_us(ts) % CAST(86400000000 AS BIGINT))
                          / 3600000000.0) AS BIGINT) AS hour,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT sum(n) AS total FROM cells)
    SELECT dow, hour, CAST(n AS BIGINT) AS n_events,
           round(n / (1.0 * tot.total), 6) AS share_r
    FROM cells CROSS JOIN tot
    """,
)
def analytics_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap with share of total
    — the seasonality fingerprint behind capacity planning and
    anomaly baselines. The dow key is computed arithmetically from
    the epoch day ((day+4) mod 7, Sunday=0) rather than an engine
    dayofweek() (Spark counts Sunday=1, DuckDB Sunday=0 — the
    calendar-function trap); hour comes from exact integer
    microseconds-of-day. One map-side-combinable aggregate over ≤168
    cells + a broadcast total."""
    e = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    cells = e.groupBy(
        ((F.floor(F.col("ts").cast("double") / 86400).cast("long") + 4) % 7).alias(
            "dow"
        ),
        F.floor((us % F.lit(86400000000)) / 3600000000.0)
        .cast("long")
        .alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(F.sum("n").alias("total"))
    return cells.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hour",
        F.col("n").cast("long").alias("n_events"),
        F.round(F.col("n") / (F.lit(1.0) * F.col("total")), 6).alias("share_r"),
    )


@register(
    "analytics_kcore",
    oracle="""
    WITH edges0 AS (
        SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
                        greatest(a.l_partkey, b.l_partkey) AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg0 AS (
        SELECT node, count(*) AS d FROM (
            SELECT u AS node FROM edges0
            UNION ALL SELECT v AS node FROM edges0
        ) GROUP BY node
    ),
    kk AS (SELECT CAST(ceil(0.6 * avg(d)) AS BIGINT) AS k FROM deg0),
    keep1 AS (SELECT node FROM deg0 CROSS JOIN kk WHERE d >= kk.k),
    edges1 AS (
        SELECT e.u, e.v FROM edges0 e
        JOIN keep1 ka ON e.u = ka.node
        JOIN keep1 kb ON e.v = kb.node
    ),
    deg1 AS (
        SELECT node, count(*) AS d FROM (
            SELECT u AS node FROM edges1
            UNION ALL SELECT v AS node FROM edges1
        ) GROUP BY node
    ),
    keep2 AS (SELECT node FROM deg1 CROSS JOIN kk WHERE d >= kk.k),
    edges2 AS (
        SELECT e.u, e.v FROM edges1 e
        JOIN keep2 ka ON e.u = ka.node
        JOIN keep2 kb ON e.v = kb.node
    ),
    deg2 AS (
        SELECT node, count(*) AS d FROM (
            SELECT u AS node FROM edges2
            UNION ALL SELECT v AS node FROM edges2
        ) GROUP BY node
    )
    SELECT d2.node AS part_id,
           CAST(d2.d AS BIGINT) AS degree_after_peel,
           kk.k AS core_k
    FROM deg2 d2 CROSS JOIN kk
    WHERE d2.d >= kk.k
    """,
)
def analytics_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core extraction on the co-purchase graph (parts sharing an
    order), two unrolled peel rounds at k = ceil(0.6 x mean degree): each
    round drops nodes below k and re-filters edges to surviving
    endpoints — the dense-subgraph screen behind community seeding
    and fraud-ring detection. Unrolled BSP like the PageRank/label-
    propagation rows (no driver-side convergence loop; at 100 TB each
    round is two semi-joins of the edge list against the shrinking
    keep-set — join strategy left to AQE, since the keep-set scales
    with the node universe and must not be force-broadcast — and the
    edge list itself comes from the one basket-explode pass). All-integer edges, adaptive k makes the
    peel meaningful at every SF. The edge lists materialize via
    localCheckpoint between rounds (the minhash/triangle discipline):
    each round's plan reads the PREVIOUS round's result, not the
    whole re-derived lineage — without it the unroll multiplies the
    edge build once per downstream reference (~200 exchanges at
    depth 2). deg0 materializes too (r17, guide §2.4): the kk scalar
    and the round-1 keep-set reference it 4x across the unroll, and
    without the checkpoint every reference re-aggregated the 2.4M-row
    endpoint union from scratch (the before-plan carried 48 Exchanges
    — four full degree recomputations where one suffices)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges0 = _copurchase_edges(li)

    def degrees(edges):
        # explode(array(u, v)) instead of a two-branch unionAll: the
        # union referenced `edges` TWICE, so for the one edge list
        # that is deliberately NOT checkpointed (edges2, consumed
        # once) the whole peel-join subtree executed twice — explode
        # emits both endpoints in a single pass (r17, guide §2.4).
        return (
            edges.select(F.explode(F.array("u", "v")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )

    # Conservative checkpoint (plans.checkpoints): the node universe
    # scales with the part dimension, so downstream keep-set joins must
    # never be invited to broadcast it (VERDICT r5).
    deg0 = _checkpoint_conservative(degrees(edges0))
    # kk is a 1-row scalar referenced three times (both peel keep-sets
    # + the final filter); without its own checkpoint each reference
    # re-aggregated deg0 through an extra exchange (r17). Plain
    # localCheckpoint: a 1-row relation is exactly what the explicit
    # F.broadcast below wants.
    kk = deg0.agg(
        F.ceil(0.6 * F.avg("d")).cast("long").alias("k")
    ).localCheckpoint()

    def peel(edges, deg):
        keep = deg.crossJoin(F.broadcast(kk)).filter(
            F.col("d") >= F.col("k")
        ).select("node")
        # No broadcast on the keep-set: it scales with the part
        # universe (all nodes above degree k), not a bounded dim
        # table — forcing broadcast would OOM the driver at large SF
        # (VERDICT r5). The scale-safe strategy is a shuffled HASH
        # join (hinted): it co-partitions edges and keep on the node
        # key without sorting either side — at sf0.1 the exchange-
        # reuse wiring keeps AQE from converting these to broadcast
        # anyway, and hash beats the sort-merge default measurably.
        keep = keep.hint("shuffle_hash")
        return (
            edges.join(keep.withColumnRenamed("node", "u"), "u")
            .join(keep.withColumnRenamed("node", "v"), "v")
            .select("u", "v")
        )

    edges1 = peel(edges0, deg0).localCheckpoint()
    edges2 = peel(edges1, degrees(edges1))
    deg2 = degrees(edges2)
    return (
        deg2.crossJoin(F.broadcast(kk))
        .filter(F.col("d") >= F.col("k"))
        .select(
            F.col("node").alias("part_id"),
            F.col("d").cast("long").alias("degree_after_peel"),
            F.col("k").alias("core_k"),
        )
    )


@register(
    "analytics_two_proportion_ztest",
    oracle="""
    WITH u AS (
        SELECT user_id % 2 AS cohort,
               user_id,
               CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END) / (1.0 * count(*)) > 0.2
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id % 2, user_id
    ),
    c AS (
        SELECT cohort,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(converted) AS BIGINT) AS n_converted
        FROM u GROUP BY cohort
    ),
    wide AS (
        SELECT
            max(CASE WHEN cohort = 0 THEN n_users END) AS n1,
            max(CASE WHEN cohort = 0 THEN n_converted END) AS x1,
            max(CASE WHEN cohort = 1 THEN n_users END) AS n2,
            max(CASE WHEN cohort = 1 THEN n_converted END) AS x2
        FROM c
    )
    SELECT n1, x1, n2, x2,
           round(x1 / (1.0 * n1), 6) AS p1_r,
           round(x2 / (1.0 * n2), 6) AS p2_r,
           round((x1 / (1.0 * n1) - x2 / (1.0 * n2))
                 / sqrt(((x1 + x2) / (1.0 * (n1 + n2)))
                        * (1 - (x1 + x2) / (1.0 * (n1 + n2)))
                        * (1.0 / n1 + 1.0 / n2)), 6) AS z_r
    FROM wide
    """,
)
def analytics_two_proportion_ztest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-proportion z-test on a user-level binary outcome
    (purchase-heavy: >20% of the user's events are purchases — an
    outcome with real variance in this fixture; 'ever purchased'
    saturates at p=1) between the even/odd user cohorts — the A/B readout for
    binary outcomes, complementing the Welch row (means) and the
    chi-square row (k×m independence): pooled proportion, both rates,
    and the z statistic. Sufficient statistics come from one
    user-grain aggregate + one 2-row rollup; the test itself is
    O(1) arithmetic on exact integers, rounded at the 6dp stats
    grain."""
    e = load(spark, sf_dir, "events")
    n_purch = F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
    u = e.groupBy((F.col("user_id") % 2).alias("cohort"), "user_id").agg(
        F.when(n_purch / (F.lit(1.0) * F.count(F.lit(1))) > 0.2, 1)
        .otherwise(0)
        .alias("converted")
    )
    c = u.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    wide = c.agg(
        F.max(F.when(F.col("cohort") == 0, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("cohort") == 0, F.col("n_converted"))).alias("x1"),
        F.max(F.when(F.col("cohort") == 1, F.col("n_users"))).alias("n2"),
        F.max(F.when(F.col("cohort") == 1, F.col("n_converted"))).alias("x2"),
    )
    p1 = F.col("x1") / (F.lit(1.0) * F.col("n1"))
    p2 = F.col("x2") / (F.lit(1.0) * F.col("n2"))
    pp = (F.col("x1") + F.col("x2")) / (F.lit(1.0) * (F.col("n1") + F.col("n2")))
    return wide.select(
        "n1",
        "x1",
        "n2",
        "x2",
        F.round(p1, 6).alias("p1_r"),
        F.round(p2, 6).alias("p2_r"),
        F.round(
            (p1 - p2)
            / F.sqrt(pp * (1 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))),
            6,
        ).alias("z_r"),
    )


@register(
    "analytics_price_elasticity",
    oracle="""
    WITH pt AS (
        SELECT p.p_brand,
               ln(l.l_quantity) AS ln_q,
               ln(l.l_extendedprice / l.l_quantity) AS ln_p
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_quantity > 0
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(regr_slope(ln_q, ln_p), 6) AS elasticity_r,
           round(regr_r2(ln_q, ln_p), 6) AS r2_r
    FROM pt GROUP BY p_brand
    """,
)
def analytics_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per brand — the textbook
    econometric readout (elasticity = d ln q / d ln p via regr_slope,
    with R² as trust): the pricing team's first screen for which
    brands tolerate a price move. Unit price derives in-row from the
    line (extendedprice/quantity); the regression consumes exact
    sufficient statistics inside ONE partial+final aggregate — no
    per-brand subquery, no second fact pass, identical regr_*
    semantics in both engines. Transcendental inputs → 6dp edges."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    p = load(spark, sf_dir, "part")
    pt = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "p_brand",
        F.log(F.col("l_quantity")).alias("ln_q"),
        F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias("ln_p"),
    )
    return pt.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.round(F.expr("regr_slope(ln_q, ln_p)"), 6).alias("elasticity_r"),
        F.round(F.expr("regr_r2(ln_q, ln_p)"), 6).alias("r2_r"),
    )


@register(
    "analytics_abc_classification",
    oracle="""
    WITH rev AS (
        SELECT l_partkey, round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, revenue,
               sum(revenue) OVER (ORDER BY revenue DESC, l_partkey) AS cum_rev,
               sum(revenue) OVER () AS total_rev
        FROM rev
    ),
    classed AS (
        SELECT CASE WHEN cum_rev <= 0.8 * total_rev THEN 'A'
                    WHEN cum_rev <= 0.95 * total_rev THEN 'B'
                    ELSE 'C' END AS abc_class,
               revenue
        FROM ranked
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(revenue), 2) AS class_revenue,
           round(sum(revenue) / max(1.0 * (SELECT sum(revenue) FROM rev)), 6)
               AS revenue_share_r
    FROM classed GROUP BY abc_class
    """,
)
def analytics_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, class A
    = the head covering 80% of cumulative revenue, B to 95%, C the
    tail — the Pareto cut every supply-chain and SKU-rationalization
    review starts from (Lorenz/Gini's operational sibling: those
    report the curve, this assigns the actionable classes). The
    cumulative window runs over the part-grain aggregate (bounded —
    one fact pass); revenue rounds at the 2dp money grain BEFORE
    ranking so class boundaries are cross-engine identical."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("revenue")
    )
    w_cum = Window.orderBy(F.col("revenue").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = rev.select(
        "revenue",
        F.sum("revenue").over(w_cum).alias("cum_rev"),
        F.sum("revenue").over(w_all).alias("total_rev"),
    )
    classed = ranked.select(
        F.when(F.col("cum_rev") <= 0.8 * F.col("total_rev"), "A")
        .when(F.col("cum_rev") <= 0.95 * F.col("total_rev"), "B")
        .otherwise("C")
        .alias("abc_class"),
        "revenue",
        "total_rev",
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.round(F.sum("revenue"), 2).alias("class_revenue"),
        F.round(F.sum("revenue") / F.max(F.lit(1.0) * F.col("total_rev")), 6).alias(
            "revenue_share_r"
        ),
    )


@register(
    "analytics_funnel_windowed",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(epoch_us(ts)) AS t1
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click'
          AND epoch_us(e.ts) >= s1.t1
          AND epoch_us(e.ts) < s1.t1 + CAST(604800000000 AS BIGINT)
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) >= s2.t2
          AND epoch_us(e.ts) < s2.t2 + CAST(604800000000 AS BIGINT)
        GROUP BY e.user_id
    ),
    med AS (
        SELECT round(quantile_cont((s2.t2 - s1.t1) / 1000000.0, 0.5), 4)
            AS median_step2_s_r
        FROM s2 JOIN s1 ON s2.user_id = s1.user_id
    )
    SELECT
        (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_signup,
        (SELECT CAST(count(*) AS BIGINT) FROM s2) AS n_click_7d,
        (SELECT CAST(count(*) AS BIGINT) FROM s3) AS n_purchase_7d,
        round((SELECT count(*) FROM s2) / (1.0 * (SELECT count(*) FROM s1)), 6)
            AS rate_click_r,
        round((SELECT count(*) FROM s3) / (1.0 * (SELECT count(*) FROM s1)), 6)
            AS rate_purchase_r,
        (SELECT median_step2_s_r FROM med) AS median_step2_s_r
    """,
)
def analytics_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-windowed ordered funnel: signup → click within 7 days →
    purchase within 7 days of the qualifying click, plus the median
    signup→click latency — the deadline-funnel every growth team
    reports (the unwindowed ordered funnel is the analytics_funnel
    row; deadlines change the answer and the join shape). Stages stay
    per-user min-timestamp aggregates with the deadline as a join
    predicate — event order never materializes, each stage is one
    keyed aggregate + broadcastable join of user-grain rows. Exact
    integer microsecond deadlines; the median latency rounds at 4dp
    seconds."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    week = F.lit(604800000000)
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("us") >= F.col("t1")) & (F.col("us") < F.col("t1") + week))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("us") >= F.col("t2")) & (F.col("us") < F.col("t2") + week))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    n1 = s1.agg(F.count(F.lit(1)).cast("long").alias("n_signup"))
    n2 = s2.agg(F.count(F.lit(1)).cast("long").alias("n_click_7d"))
    n3 = s3.agg(F.count(F.lit(1)).cast("long").alias("n_purchase_7d"))
    med = (
        s2.join(s1, "user_id")
        .select(((F.col("t2") - F.col("t1")) / 1000000.0).alias("lat_s"))
        .agg(F.round(F.expr("percentile(lat_s, 0.5)"), 4).alias("median_step2_s_r"))
    )
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(n3))
        .crossJoin(F.broadcast(med))
        .select(
            "n_signup",
            "n_click_7d",
            "n_purchase_7d",
            F.round(
                F.col("n_click_7d") / (F.lit(1.0) * F.col("n_signup")), 6
            ).alias("rate_click_r"),
            F.round(
                F.col("n_purchase_7d") / (F.lit(1.0) * F.col("n_signup")), 6
            ).alias("rate_purchase_r"),
            "median_step2_s_r",
        )
    )


@register(
    "analytics_poisson_rate_ci",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT))
                    AS BIGINT) AS n_days
        FROM events GROUP BY event_type
    )
    SELECT event_type, n_events, n_days,
           round(n_events / (1.0 * n_days), 6) AS rate_per_day_r,
           round(n_events / (1.0 * n_days)
                 - 1.96 * sqrt(n_events) / n_days, 6) AS ci_lo_r,
           round(n_events / (1.0 * n_days)
                 + 1.96 * sqrt(n_events) / n_days, 6) AS ci_hi_r
    FROM s
    """,
)
def analytics_poisson_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily event rate with a 95% Poisson CI (normal
    approximation, se = √n/days) — the SLO/ops-report statistic that
    turns raw counts into 'is today's rate outside the band'. One
    partial+final aggregate (count + distinct-day count per type);
    the CI is O(1) arithmetic on exact integers, 6dp edges."""
    e = load(spark, sf_dir, "events")
    day = F.floor(F.col("ts").cast("double") / 86400).cast("long")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct(day).cast("long").alias("n_days"),
    )
    rate = F.col("n_events") / (F.lit(1.0) * F.col("n_days"))
    half = 1.96 * F.sqrt(F.col("n_events")) / F.col("n_days")
    return s.select(
        "event_type",
        "n_events",
        "n_days",
        F.round(rate, 6).alias("rate_per_day_r"),
        F.round(rate - half, 6).alias("ci_lo_r"),
        F.round(rate + half, 6).alias("ci_hi_r"),
    )


@register(
    "analytics_conversion_curve",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(epoch_us(ts)) AS t1
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
        SELECT e.user_id,
               floor((min(epoch_us(e.ts)) - s1.t1)
                     / CAST(86400000000 AS BIGINT)) AS days_to_convert
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s1.t1
        GROUP BY e.user_id, s1.t1
    ),
    ks AS (
        SELECT unnest(range(1, 15)) AS k
    ),
    tot AS (SELECT count(*) AS n_cohort FROM s1)
    SELECT CAST(ks.k AS BIGINT) AS day_k,
           CAST(sum(CASE WHEN c.days_to_convert < ks.k THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted_by_k,
           round(sum(CASE WHEN c.days_to_convert < ks.k THEN 1 ELSE 0 END)
                 / (1.0 * max(t.n_cohort)), 6) AS share_converted_r
    FROM ks CROSS JOIN tot t LEFT JOIN conv c ON TRUE
    GROUP BY ks.k
    """,
)
def analytics_conversion_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative conversion curve — share of the signup cohort that
    purchased within k days, for k = 1..14: the CDF the windowed
    funnel samples at one point, drawn in full (where the curve
    plateaus tells you the attribution window to use). Per-user
    latency is one keyed aggregate; the day spine is a broadcast
    14-row literal crossed against the BOUNDED latency relation
    (never the raw corpus), so the curve costs |users|×14 cheap rows
    after one fact pass. Exact integer day floors."""
    e = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("t1"))
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .filter(us >= F.col("t1"))
        .groupBy("user_id", "t1")
        .agg(
            F.floor((F.min(us) - F.col("t1")) / F.lit(86400000000)).alias(
                "days_to_convert"
            )
        )
    )
    ks = F.broadcast(
        spark.range(1, 15).select(F.col("id").cast("long").alias("day_k"))
    )
    tot = s1.agg(F.count(F.lit(1)).alias("n_cohort"))
    curve = (
        ks.crossJoin(F.broadcast(tot))
        .join(conv, F.col("days_to_convert") < F.col("day_k"), "left")
        .groupBy("day_k")
        .agg(
            F.sum(F.when(F.col("user_id").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_converted_by_k"),
            F.round(
                F.sum(F.when(F.col("user_id").isNotNull(), 1).otherwise(0))
                / (F.lit(1.0) * F.max("n_cohort")),
                6,
            ).alias("share_converted_r"),
        )
    )
    return curve


@register(
    "analytics_uplift_by_decile",
    oracle="""
    WITH u AS (
        SELECT user_id,
               user_id % 2 AS treated,
               count(*) AS n_events,
               CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                  THEN 1 ELSE 0 END) / (1.0 * count(*)) > 0.2
                    THEN 1 ELSE 0 END AS converted
        FROM events GROUP BY user_id
    ),
    dec AS (
        SELECT treated, converted,
               CAST(ntile(5) OVER (ORDER BY n_events DESC, user_id)
                    AS BIGINT) AS activity_quintile
        FROM u
    ),
    cell AS (
        SELECT activity_quintile,
               CAST(sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_treat,
               CAST(sum(CASE WHEN treated = 1 AND converted = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS x_treat,
               CAST(sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ctrl,
               CAST(sum(CASE WHEN treated = 0 AND converted = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS x_ctrl
        FROM dec GROUP BY activity_quintile
    )
    SELECT activity_quintile, n_treat, x_treat, n_ctrl, x_ctrl,
           CASE WHEN n_treat > 0
                THEN round(x_treat / (1.0 * n_treat), 6) END AS rate_treat_r,
           CASE WHEN n_ctrl > 0
                THEN round(x_ctrl / (1.0 * n_ctrl), 6) END AS rate_ctrl_r,
           CASE WHEN n_treat > 0 AND n_ctrl > 0
                THEN round(x_treat / (1.0 * n_treat)
                           - x_ctrl / (1.0 * n_ctrl), 6) END AS uplift_r
    FROM cell
    """,
)
def analytics_uplift_by_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift by activity quintile — the heterogeneous-treatment-
    effect table behind Qini curves: users binned by engagement
    (event count), treatment = even/odd cohort, outcome = the same
    purchase-heavy flag the z-test row uses; each bin reports
    treatment/control conversion and their difference. Where the
    z-test answers 'did it work on average', this shows WHERE it
    worked. One user-grain aggregate, one bounded ntile window, one
    bin rollup — a single fact pass. Rates NULL out when a tiny
    quintile holds only one arm (possible at the smallest SF)."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    n_purch = F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
    u = e.groupBy("user_id").agg(
        (F.col("user_id") % 2).alias("treated"),
        F.count(F.lit(1)).alias("n_events"),
        F.when(n_purch / (F.lit(1.0) * F.count(F.lit(1))) > 0.2, 1)
        .otherwise(0)
        .alias("converted"),
    )
    dec = u.select(
        "treated",
        "converted",
        F.ntile(5)
        .over(Window.orderBy(F.col("n_events").desc(), "user_id"))
        .cast("long")
        .alias("activity_quintile"),
    )
    cell = dec.groupBy("activity_quintile").agg(
        F.sum(F.when(F.col("treated") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_treat"),
        F.sum(F.when((F.col("treated") == 1) & (F.col("converted") == 1), 1).otherwise(0))
        .cast("long")
        .alias("x_treat"),
        F.sum(F.when(F.col("treated") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_ctrl"),
        F.sum(F.when((F.col("treated") == 0) & (F.col("converted") == 1), 1).otherwise(0))
        .cast("long")
        .alias("x_ctrl"),
    )
    rt = F.col("x_treat") / (F.lit(1.0) * F.col("n_treat"))
    rc = F.col("x_ctrl") / (F.lit(1.0) * F.col("n_ctrl"))
    has_t = F.col("n_treat") > 0
    has_c = F.col("n_ctrl") > 0
    return cell.select(
        "activity_quintile",
        "n_treat",
        "x_treat",
        "n_ctrl",
        "x_ctrl",
        F.when(has_t, F.round(rt, 6)).alias("rate_treat_r"),
        F.when(has_c, F.round(rc, 6)).alias("rate_ctrl_r"),
        F.when(has_t & has_c, F.round(rt - rc, 6)).alias("uplift_r"),
    )


@register(
    "analytics_order_lead_time",
    oracle="""
    WITH per_order AS (
        SELECT o.o_orderkey, o.o_orderpriority,
               floor((min(epoch_us(l.l_shipdate)) - epoch_us(o.o_orderdate))
                     / CAST(86400000000 AS BIGINT)) AS first_ship_days,
               floor((max(epoch_us(l.l_shipdate)) - epoch_us(o.o_orderdate))
                     / CAST(86400000000 AS BIGINT)) AS last_ship_days
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, epoch_us(o.o_orderdate)
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(quantile_cont(first_ship_days, 0.5), 4) AS p50_first_ship_r,
           round(quantile_cont(last_ship_days, 0.9), 4) AS p90_complete_r,
           round(sum(CASE WHEN last_ship_days <= 30 THEN 1 ELSE 0 END)
                 / (1.0 * count(*)), 6) AS within_30d_r
    FROM per_order GROUP BY o_orderpriority
    """,
)
def analytics_order_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-fulfilment lead time by priority: days from order to
    first shipment (responsiveness p50) and to the LAST line shipped
    (completion p90), plus the 30-day completion SLA rate — the
    supply-chain table that answers 'do urgent orders actually move
    faster'. One fact join + order-grain aggregate, then a bounded
    per-priority percentile rollup; day arithmetic is exact integer
    microsecond floors."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # Date-native arithmetic (datediff), NOT unix_micros of a DATE→
    # TIMESTAMP cast: the cast is session-timezone-dependent and a DST
    # zone whose offset changes between orderdate and shipdate would
    # skew the midnight-to-midnight diff by ±1h (ADVICE r4). Both
    # columns are midnight-aligned, so whole-day datediff equals the
    # oracle's exact-µs floor division.
    per_order = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_orderdate").cast("date").alias("odate"),
        )
        .agg(
            F.datediff(F.min(F.col("l_shipdate").cast("date")), F.col("odate"))
            .cast("long")
            .alias("first_ship_days"),
            F.datediff(F.max(F.col("l_shipdate").cast("date")), F.col("odate"))
            .cast("long")
            .alias("last_ship_days"),
        )
    )
    return per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.expr("percentile(first_ship_days, 0.5)"), 4).alias(
            "p50_first_ship_r"
        ),
        F.round(F.expr("percentile(last_ship_days, 0.9)"), 4).alias(
            "p90_complete_r"
        ),
        F.round(
            F.sum(F.when(F.col("last_ship_days") <= 30, 1).otherwise(0))
            / (F.lit(1.0) * F.count(F.lit(1))),
            6,
        ).alias("within_30d_r"),
    )


@register(
    "analytics_growth_accounting",
    oracle="""
    WITH um AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 604800) AS BIGINT) AS m
        FROM events
    ),
    flags AS (
        SELECT user_id, m,
               min(m) OVER (PARTITION BY user_id) AS first_m,
               lag(m) OVER (PARTITION BY user_id ORDER BY m) AS prev_m,
               lead(m) OVER (PARTITION BY user_id ORDER BY m) AS next_m
        FROM um
    ),
    classed AS (
        SELECT m,
               CASE WHEN m = first_m THEN 'new'
                    WHEN prev_m = m - 1 THEN 'retained'
                    ELSE 'resurrected' END AS status
        FROM flags
    ),
    churn AS (
        SELECT m + 1 AS m, 'churned' AS status
        FROM flags
        WHERE next_m IS NULL OR next_m > m + 1
    ),
    all_rows AS (
        SELECT m, status FROM classed
        UNION ALL SELECT m, status FROM churn
    ),
    bounds AS (SELECT max(m) AS max_m FROM um)
    SELECT a.m AS week_idx, a.status,
           CAST(count(*) AS BIGINT) AS n_users
    FROM all_rows a CROSS JOIN bounds b
    WHERE a.m <= b.max_m
    GROUP BY a.m, a.status
    """,
)
def analytics_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting — every active user classified as
    new (first week), retained (also active last week), or
    resurrected (returning after a gap), plus churned counted into
    the week after the user went quiet: the four flows whose sum
    explains every MAU delta (the standard Social-Capital growth
    table; retention_cohorts shows decay, THIS shows composition).
    One distinct user-month census + one user-partitioned window
    pass derives all four classes; churn rows are generated from
    activity-run ends, clipped to the observation window. All
    integer month arithmetic."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    um = e.select(
        "user_id",
        F.floor(F.col("ts").cast("double") / 604800).cast("long").alias("m"),
    ).distinct()
    w_all = Window.partitionBy("user_id")
    w_ord = Window.partitionBy("user_id").orderBy("m")
    flags = um.select(
        "user_id",
        "m",
        F.min("m").over(w_all).alias("first_m"),
        F.lag("m").over(w_ord).alias("prev_m"),
        F.lead("m").over(w_ord).alias("next_m"),
    )
    classed = flags.select(
        "m",
        F.when(F.col("m") == F.col("first_m"), "new")
        .when(F.col("prev_m") == F.col("m") - 1, "retained")
        .otherwise("resurrected")
        .alias("status"),
    )
    churn = flags.filter(
        F.col("next_m").isNull() | (F.col("next_m") > F.col("m") + 1)
    ).select((F.col("m") + 1).alias("m"), F.lit("churned").alias("status"))
    bounds = um.agg(F.max("m").alias("max_m"))
    return (
        classed.unionAll(churn)
        .crossJoin(F.broadcast(bounds))
        .filter(F.col("m") <= F.col("max_m"))
        .groupBy(F.col("m").alias("week_idx"), "status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@register(
    "analytics_band_breach",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               round(sum(value), 6) AS day_val
        FROM events GROUP BY CAST(floor(epoch(ts) / 86400) AS BIGINT)
    ),
    banded AS (
        SELECT day_idx, day_val,
               quantile_cont(day_val, 0.1) OVER w AS p10,
               quantile_cont(day_val, 0.9) OVER w AS p90,
               count(*) OVER w AS n_window
        FROM daily
        WINDOW w AS (ORDER BY day_idx ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day_idx, day_val,
           round(p10, 4) AS band_lo_r,
           round(p90, 4) AS band_hi_r,
           CASE WHEN day_val < p10 THEN 'below'
                WHEN day_val > p90 THEN 'above'
                ELSE 'in_band' END AS breach
    FROM banded
    WHERE n_window >= 5
    """,
)
def analytics_band_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-percentile band monitoring: each day's value total vs
    the p10–p90 band of the PREVIOUS 7 days (current row excluded —
    no self-contamination), flagged below/in/above once 5 trailing
    points exist. The nonparametric anomaly band ops dashboards
    prefer over z-scores when the metric is skewed (the MAD row is
    the robust-center sibling; this is the robust-envelope one).
    Percentiles run as window aggregates over the bounded daily
    series with identical interpolation in both engines; band edges
    round at 4dp."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx")
    ).agg(F.round(F.sum("value"), 6).alias("day_val"))
    w = Window.orderBy("day_idx").rowsBetween(-7, -1)
    banded = daily.select(
        "day_idx",
        "day_val",
        F.expr("percentile(day_val, 0.1)").over(w).alias("p10"),
        F.expr("percentile(day_val, 0.9)").over(w).alias("p90"),
        F.count(F.lit(1)).over(w).alias("n_window"),
    )
    return (
        banded.filter(F.col("n_window") >= 5)
        .select(
            "day_idx",
            "day_val",
            F.round(F.col("p10"), 4).alias("band_lo_r"),
            F.round(F.col("p90"), 4).alias("band_hi_r"),
            F.when(F.col("day_val") < F.col("p10"), "below")
            .when(F.col("day_val") > F.col("p90"), "above")
            .otherwise("in_band")
            .alias("breach"),
        )
    )


@register(
    "analytics_wilson_ci",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM events GROUP BY event_type
    )
    SELECT event_type, n, x,
           round(x / (1.0 * n), 6) AS p_hat_r,
           round((x / (1.0 * n) + 1.9208 / n
                  - 1.96 * sqrt((x / (1.0 * n)) * (1 - x / (1.0 * n)) / n
                                + 0.9604 / (n * n)))
                 / (1 + 3.8416 / n), 6) AS wilson_lo_r,
           round((x / (1.0 * n) + 1.9208 / n
                  + 1.96 * sqrt((x / (1.0 * n)) * (1 - x / (1.0 * n)) / n
                                + 0.9604 / (n * n)))
                 / (1 + 3.8416 / n), 6) AS wilson_hi_r
    FROM s
    """,
)
def analytics_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score interval for a per-type binomial share (fraction
    of events from the even-user cohort) — the CI that stays inside
    [0,1] and behaves at small n or extreme p where the normal
    approximation (the z-test row) collapses; what ranking-by-rating
    and conversion dashboards should use. Closed form on exact
    integer counts from one aggregate; z=1.96 constants are spelled
    out (1.9208 = z²/2, 3.8416 = z², 0.9604 = z²/4) so both engines
    evaluate the identical expression tree. 6dp edges."""
    e = load(spark, sf_dir, "events")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("x"),
    )
    p = F.col("x") / (F.lit(1.0) * F.col("n"))
    n = F.col("n")
    half = 1.96 * F.sqrt(p * (1 - p) / n + 0.9604 / (n * n))
    denom = 1 + 3.8416 / n
    return s.select(
        "event_type",
        "n",
        "x",
        F.round(p, 6).alias("p_hat_r"),
        F.round((p + 1.9208 / n - half) / denom, 6).alias("wilson_lo_r"),
        F.round((p + 1.9208 / n + half) / denom, 6).alias("wilson_hi_r"),
    )


@register(
    "analytics_new_vs_repeat_revenue",
    oracle="""
    WITH seq AS (
        SELECT o_custkey, o_totalprice,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                   AS month_idx,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) AS order_seq
        FROM orders
    )
    SELECT month_idx,
           round(sum(CASE WHEN order_seq = 1 THEN o_totalprice ELSE 0 END), 2)
               AS new_revenue,
           round(sum(CASE WHEN order_seq > 1 THEN o_totalprice ELSE 0 END), 2)
               AS repeat_revenue,
           CAST(sum(CASE WHEN order_seq = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_first_orders,
           round(sum(CASE WHEN order_seq > 1 THEN o_totalprice ELSE 0 END)
                 / sum(o_totalprice), 6) AS repeat_share_r
    FROM seq GROUP BY month_idx
    """,
)
def analytics_new_vs_repeat_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """New-vs-repeat revenue split per month: each order ranked within
    its customer (first order = acquisition revenue, the rest =
    retention revenue) — the one chart every commerce business review
    opens with, and the growth-accounting sibling in money terms. One
    customer-partitioned window ranks orders, one month rollup splits
    the sums; money at 2dp exact-decimal grain, share at 6dp."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_totalprice",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("month_idx"),
        F.row_number().over(w).alias("order_seq"),
    )
    first = F.when(F.col("order_seq") == 1, F.col("o_totalprice")).otherwise(0.0)
    rep = F.when(F.col("order_seq") > 1, F.col("o_totalprice")).otherwise(0.0)
    return seq.groupBy("month_idx").agg(
        F.round(F.sum(first), 2).alias("new_revenue"),
        F.round(F.sum(rep), 2).alias("repeat_revenue"),
        F.sum(F.when(F.col("order_seq") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_first_orders"),
        F.round(F.sum(rep) / F.sum("o_totalprice"), 6).alias("repeat_share_r"),
    )


@register(
    "analytics_price_index",
    oracle="""
    WITH cut AS (
        SELECT CAST((min(year(o_orderdate) * 12 + month(o_orderdate))
                     + max(year(o_orderdate) * 12 + month(o_orderdate))) // 2
                    AS BIGINT) AS c
        FROM orders
    ),
    li AS (
        SELECT l.l_partkey,
               CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate)
                    AS BIGINT) AS m,
               l.l_quantity,
               l.l_extendedprice / l.l_quantity AS unit_price
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity > 0
    ),
    per AS (
        SELECT l_partkey,
               CASE WHEN li.m < cut.c THEN 0 ELSE 1 END AS period,
               sum(l_quantity) AS q,
               sum(unit_price * l_quantity) / sum(l_quantity) AS p
        FROM li CROSS JOIN cut
        GROUP BY l_partkey, CASE WHEN li.m < cut.c THEN 0 ELSE 1 END
    ),
    paired AS (
        SELECT a.l_partkey, a.p AS p0, a.q AS q0, b.p AS p1, b.q AS q1
        FROM per a JOIN per b
          ON a.l_partkey = b.l_partkey AND a.period = 0 AND b.period = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_common_parts,
           round(sum(p1 * q0) / sum(p0 * q0), 6) AS laspeyres_r,
           round(sum(p1 * q1) / sum(p0 * q1), 6) AS paasche_r,
           round(sqrt((sum(p1 * q0) / sum(p0 * q0))
                      * (sum(p1 * q1) / sum(p0 * q1))), 6) AS fisher_r
    FROM paired
    """,
)
def analytics_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices between the first
    and second half of the observation window — the inflation-
    measurement triple over parts transacted in BOTH periods
    (base-quantity weighted, current-quantity weighted, and their
    geometric mean). Per-(part, period) quantity-weighted average
    unit prices come from one fact pass; the index is a ratio of
    sums over the common-parts join (dim-sized). The half-way cut
    derives from the data (broadcast one-row aggregate), so the
    query is fixture-scale-proof. 6dp stats edges."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    m = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    cut = o.agg(F.floor((F.min(m) + F.max(m)) / 2).cast("long").alias("c"))
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .crossJoin(F.broadcast(cut))
        .select(
            "l_partkey",
            F.when(m < F.col("c"), 0).otherwise(1).alias("period"),
            "l_quantity",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
    )
    per = j.groupBy("l_partkey", "period").agg(
        F.sum("l_quantity").alias("q"),
        (
            F.sum(F.col("unit_price") * F.col("l_quantity"))
            / F.sum("l_quantity")
        ).alias("p"),
    )
    a = per.filter(F.col("period") == 0).select(
        "l_partkey", F.col("p").alias("p0"), F.col("q").alias("q0")
    )
    b = per.filter(F.col("period") == 1).select(
        "l_partkey", F.col("p").alias("p1"), F.col("q").alias("q1")
    )
    paired = a.join(b, "l_partkey")
    lasp = F.sum(F.col("p1") * F.col("q0")) / F.sum(F.col("p0") * F.col("q0"))
    paas = F.sum(F.col("p1") * F.col("q1")) / F.sum(F.col("p0") * F.col("q1"))
    return paired.agg(
        F.count(F.lit(1)).cast("long").alias("n_common_parts"),
        F.round(lasp, 6).alias("laspeyres_r"),
        F.round(paas, 6).alias("paasche_r"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher_r"),
    )


@register(
    "analytics_stl_lite",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               round(sum(value), 6) AS day_val
        FROM events GROUP BY CAST(floor(epoch(ts) / 86400) AS BIGINT)
    ),
    tr AS (
        SELECT day_idx, day_val,
               CASE WHEN count(*) OVER w = 7
                    THEN avg(day_val) OVER w END AS trend
        FROM daily
        WINDOW w AS (ORDER BY day_idx ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    det AS (
        SELECT day_idx, day_val, trend,
               CAST((day_idx + 4) % 7 AS BIGINT) AS dow,
               day_val - trend AS detrended
        FROM tr WHERE trend IS NOT NULL
    ),
    seas AS (
        SELECT dow, avg(detrended) AS seasonal FROM det GROUP BY dow
    )
    SELECT d.day_idx, d.day_val,
           round(d.trend, 4) AS trend_r,
           round(s.seasonal, 4) AS seasonal_r,
           round(d.day_val - d.trend - s.seasonal, 4) AS residual_r
    FROM det d JOIN seas s ON d.dow = s.dow
    """,
)
def analytics_stl_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal-trend decomposition (STL-lite): trend = the
    centered 7-day moving average (emitted only where the full window
    exists — no edge bias), seasonal = mean detrended value per
    day-of-week, residual = the rest. The decomposition behind every
    'is this dip seasonal or real' judgement; the seasonal-index row
    gives the multiplicative ratio, THIS gives the additive
    components per day. Bounded daily aggregate feeds one centered
    window + one dow aggregate + one broadcast join; dow is the
    engine-neutral arithmetic form. 4dp component edges."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        F.floor(F.col("ts").cast("double") / 86400).cast("long").alias("day_idx")
    ).agg(F.round(F.sum("value"), 6).alias("day_val"))
    w = Window.orderBy("day_idx").rowsBetween(-3, 3)
    tr = daily.select(
        "day_idx",
        "day_val",
        F.when(
            F.count(F.lit(1)).over(w) == 7, F.avg("day_val").over(w)
        ).alias("trend"),
    ).filter(F.col("trend").isNotNull())
    det = tr.select(
        "day_idx",
        "day_val",
        "trend",
        ((F.col("day_idx") + 4) % 7).cast("long").alias("dow"),
        (F.col("day_val") - F.col("trend")).alias("detrended"),
    )
    seas = det.groupBy("dow").agg(F.avg("detrended").alias("seasonal"))
    return det.join(F.broadcast(seas), "dow").select(
        "day_idx",
        "day_val",
        F.round(F.col("trend"), 4).alias("trend_r"),
        F.round(F.col("seasonal"), 4).alias("seasonal_r"),
        F.round(
            F.col("day_val") - F.col("trend") - F.col("seasonal"), 4
        ).alias("residual_r"),
    )


@register(
    "analytics_graph_modularity",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    lab AS (
        SELECT e.u, e.v, pu.p_brand AS bu, pv.p_brand AS bv
        FROM edges e
        JOIN part pu ON pu.p_partkey = e.u
        JOIN part pv ON pv.p_partkey = e.v
    ),
    m AS (SELECT count(*) AS m FROM lab),
    ends AS (
        SELECT u AS node, bu AS brand FROM lab
        UNION ALL SELECT v AS node, bv AS brand FROM lab
    ),
    dc AS (
        SELECT brand, count(*) AS deg_sum, count(DISTINCT node) AS n_nodes
        FROM ends GROUP BY brand
    ),
    ec AS (
        SELECT bu AS brand, count(*) AS e_within
        FROM lab WHERE bu = bv GROUP BY bu
    )
    SELECT dc.brand                                    AS brand,
           CAST(dc.n_nodes AS BIGINT)                  AS n_nodes,
           CAST(dc.deg_sum AS BIGINT)                  AS deg_sum,
           CAST(coalesce(ec.e_within, 0) AS BIGINT)    AS e_within,
           floor((coalesce(ec.e_within, 0) / (1.0 * m.m)
                  - (dc.deg_sum / (2.0 * m.m)) * (dc.deg_sum / (2.0 * m.m)))
                 * 1e6 + 0.5) / 1e6                    AS q_contrib_r
    FROM dc LEFT JOIN ec ON ec.brand = dc.brand CROSS JOIN m
    """,
)
def analytics_graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the brand partition over the co-purchase
    graph (parts sharing an order — the same degree-bounded edge
    derivation as analytics_kcore; TPC-H orders carry <= 7 lines, so
    the self-join blowup is capped by data shape): per community c,
    Q_c = e_c/m - (d_c/2m)^2 where e_c = within-community edges,
    d_c = degree mass; total Q = sum of contributions.  The partition-
    quality score you compute AFTER label propagation / k-core to
    decide whether the communities are real.

    Scale shape: modularity needs NO iteration, and (r17, guide §2.3/
    §2.4) the heavy statistics never touch the raw edge list twice:
    degree mass AND node count per community come from the NODE-grain
    degree table (|V| rows) joined once against part — not from a
    2|E|-row endpoint union with a countDistinct Expand, which the
    pre-r17 form shuffled (measured 3.0 s -> 1.6 s). Only e_within
    labels edges (two part joins); m is a count of the checkpointed
    edge list (no shuffle). Contributions are ratios of exact
    integers (identical IEEE division on both engines),
    floor-canonicalized at 1e-6. The part joins are left to AQE on
    purpose: part scales with SF (the kcore keep-set lesson), and AQE
    broadcasts the part side at toy SF anyway — the conservative
    checkpoint stats (plans.checkpoints) mean the EDGE side is never
    the broadcast candidate."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # Checkpointed: three linear passes reference the edge list (the
    # degree aggregate, the e_within labeling, and the m count).
    edges = _copurchase_edges(li)
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    m = edges.agg(F.count(F.lit(1)).alias("m"))
    deg = (
        edges.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dc = (
        deg.join(
            part.select(
                F.col("p_partkey").alias("node"), F.col("p_brand").alias("brand")
            ),
            "node",
        )
        .groupBy("brand")
        .agg(
            F.sum("d").alias("deg_sum"),
            F.count(F.lit(1)).alias("n_nodes"),
        )
    )
    ec = (
        edges.join(
            part.select(F.col("p_partkey").alias("u"), F.col("p_brand").alias("bu")),
            "u",
        )
        .join(
            part.select(F.col("p_partkey").alias("v"), F.col("p_brand").alias("bv")),
            "v",
        )
        .filter(F.col("bu") == F.col("bv"))
        .groupBy(F.col("bu").alias("brand"))
        .agg(F.count(F.lit(1)).alias("e_within"))
    )
    ew = F.coalesce(F.col("e_within"), F.lit(0))
    q = (
        ew / (F.lit(1.0) * F.col("m"))
        - (F.col("deg_sum") / (F.lit(2.0) * F.col("m")))
        * (F.col("deg_sum") / (F.lit(2.0) * F.col("m")))
    )
    return (
        dc.join(ec, "brand", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "brand",
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("deg_sum").cast("long").alias("deg_sum"),
            ew.cast("long").alias("e_within"),
            (F.floor(q * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
                "q_contrib_r"
            ),
        )
    )


@register(
    "analytics_louvain_one_level",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    und AS (
        SELECT u AS i, v AS j FROM edges
        UNION ALL SELECT v AS i, u AS j FROM edges
    ),
    deg AS (SELECT i AS node, count(*) AS k FROM und GROUP BY i),
    m AS (SELECT count(*) AS m FROM edges),
    gains AS (
        SELECT und.i, und.j,
               1.0 / m.m - (di.k * dj.k) / (2.0 * m.m * m.m) AS gain
        FROM und
        JOIN deg di ON di.node = und.i
        JOIN deg dj ON dj.node = und.j
        CROSS JOIN m
    ),
    best AS (
        SELECT i, j AS new_com
        FROM (SELECT i, j, gain, row_number() OVER (
                  PARTITION BY i ORDER BY gain DESC, j) AS rk
              FROM gains WHERE gain > 0)
        WHERE rk = 1
    ),
    lab AS (
        SELECT d.node, coalesce(b.new_com, d.node) AS com
        FROM deg d LEFT JOIN best b ON b.i = d.node
    ),
    rel AS (
        SELECT lu.com AS cu, lv.com AS cv
        FROM edges e
        JOIN lab lu ON lu.node = e.u
        JOIN lab lv ON lv.node = e.v
    ),
    ends AS (
        SELECT cu AS com FROM rel UNION ALL SELECT cv AS com FROM rel
    ),
    dc AS (SELECT com, count(*) AS deg_sum FROM ends GROUP BY com),
    nn AS (SELECT com, count(*) AS n_nodes FROM lab GROUP BY com),
    ec AS (SELECT cu AS com, count(*) AS e_within FROM rel
           WHERE cu = cv GROUP BY cu)
    SELECT CAST(dc.com AS BIGINT)                     AS community_id,
           CAST(nn.n_nodes AS BIGINT)                 AS n_nodes,
           CAST(dc.deg_sum AS BIGINT)                 AS deg_sum,
           CAST(coalesce(ec.e_within, 0) AS BIGINT)   AS e_within,
           floor((coalesce(ec.e_within, 0) / (1.0 * m.m)
                  - (dc.deg_sum / (2.0 * m.m)) * (dc.deg_sum / (2.0 * m.m)))
                 * 1e6 + 0.5) / 1e6                   AS q_contrib_r
    FROM dc
    JOIN nn ON nn.com = dc.com
    LEFT JOIN ec ON ec.com = dc.com
    CROSS JOIN m
    """,
)
def analytics_louvain_one_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synchronous Louvain sweep (Blondel et al. 2008, phase 1,
    single round from singleton communities) on the co-purchase graph:
    every node simultaneously evaluates moving into each neighbor's
    community with the standard gain dQ = A_ij/m - k_i*k_j/(2m^2) and
    takes the best strictly-positive move (ranking reduces to integer
    order — min k_j, then min j — so the float never decides a tie);
    the report scores the RESULTING partition with the same
    per-community modularity contributions as
    analytics_graph_modularity, so the pair shows Q before/after one
    optimization step.

    Scale shape: the synchronous round is exactly the BSP formulation
    distributed Louvain uses (no sequential node order — the classic
    parallelization of the inherently-sequential original): gains are
    one edge-list pass joined twice against the degree table, the
    argmax is one window on i, relabeling is two joins against the
    (node, com) map, then the same two aggregates as the modularity
    scorer. Nothing iterates on the driver; repeated rounds would
    localCheckpoint between sweeps like kcore. r17 (guide §2.4): the
    degree table materializes via the conservative checkpoint — three
    plan references (ki join, kj join, relabel) each re-aggregated the
    2.4M-row endpoint union before; and the gains joins run kj-first
    so the i-join's output partitioning is REUSED by the argmax window
    (one 2.4M-row exchange removed). Degree sides carry the kcore
    shuffle_hash hint — node-universe scaled, never broadcast
    (VERDICT r5)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = _copurchase_edges(li)
    und = edges.select(F.col("u").alias("i"), F.col("v").alias("j")).unionAll(
        edges.select(F.col("v").alias("i"), F.col("u").alias("j"))
    )
    deg = _checkpoint_conservative(
        und.groupBy(F.col("i").alias("node")).agg(F.count(F.lit(1)).alias("k"))
    )
    m = edges.agg(F.count(F.lit(1)).alias("m"))
    gains = (
        und.join(
            deg.select(F.col("node").alias("j"), F.col("k").alias("kj")).hint(
                "shuffle_hash"
            ),
            "j",
        )
        .join(
            deg.select(F.col("node").alias("i"), F.col("k").alias("ki")).hint(
                "shuffle_hash"
            ),
            "i",
        )
        .crossJoin(F.broadcast(m))
        .select(
            "i",
            "j",
            (
                F.lit(1.0) / F.col("m")
                - (F.col("ki") * F.col("kj"))
                / (F.lit(2.0) * F.col("m") * F.col("m"))
            ).alias("gain"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("i").orderBy(F.col("gain").desc(), "j")
    best = (
        gains.filter(F.col("gain") > 0)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("i", F.col("j").alias("new_com"))
    )
    lab = (
        deg.join(best.withColumnRenamed("i", "node"), "node", "left")
        .select(
            "node", F.coalesce(F.col("new_com"), F.col("node")).alias("com")
        )
        .localCheckpoint()
    )
    rel = (
        edges.join(
            lab.select(F.col("node").alias("u"), F.col("com").alias("cu")), "u"
        )
        .join(lab.select(F.col("node").alias("v"), F.col("com").alias("cv")), "v")
        .select("cu", "cv")
        .localCheckpoint()
    )
    dc = (
        rel.select(F.col("cu").alias("com"))
        .unionAll(rel.select(F.col("cv").alias("com")))
        .groupBy("com")
        .agg(F.count(F.lit(1)).alias("deg_sum"))
    )
    nn = lab.groupBy("com").agg(F.count(F.lit(1)).alias("n_nodes"))
    ec = (
        rel.filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("com"))
        .agg(F.count(F.lit(1)).alias("e_within"))
    )
    ew = F.coalesce(F.col("e_within"), F.lit(0))
    q = (
        ew / (F.lit(1.0) * F.col("m"))
        - (F.col("deg_sum") / (F.lit(2.0) * F.col("m")))
        * (F.col("deg_sum") / (F.lit(2.0) * F.col("m")))
    )
    return (
        dc.join(nn, "com")
        .join(ec, "com", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.col("com").cast("long").alias("community_id"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.col("deg_sum").cast("long").alias("deg_sum"),
            ew.cast("long").alias("e_within"),
            (F.floor(q * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
                "q_contrib_r"
            ),
        )
    )


@register(
    "analytics_jaccard_link_prediction",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    und AS (
        SELECT u AS i, v AS j FROM edges
        UNION ALL SELECT v AS i, u AS j FROM edges
    ),
    deg AS (SELECT i AS node, count(*) AS k FROM und GROUP BY i),
    common AS (
        SELECT a.i AS u, b.i AS v, count(*) AS n_common
        FROM und a JOIN und b ON a.j = b.j AND a.i <> b.i
        WHERE a.i % 199 = 0
        GROUP BY a.i, b.i
    ),
    cand AS (
        SELECT c.u, c.v, c.n_common
        FROM common c
        LEFT JOIN und e ON e.i = c.u AND e.j = c.v
        WHERE e.i IS NULL
    )
    SELECT cand.u, cand.v,
           CAST(cand.n_common AS BIGINT) AS n_common,
           floor(cand.n_common
                 / (1.0 * (du.k + dv.k - cand.n_common))
                 * 1e6 + 0.5) / 1e6      AS jaccard_r
    FROM cand
    JOIN deg du ON du.node = cand.u
    JOIN deg dv ON dv.node = cand.v
    ORDER BY jaccard_r DESC, cand.u, cand.v
    LIMIT 20
    """,
)
def analytics_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by common-neighbor Jaccard (Liben-Nowell &
    Kleinberg 2003) on the co-purchase graph, for a QUERY COHORT of
    focus parts (partkey % 199 == 0 — the deterministic stand-in for
    'new items / active campaign items'): for each focus node and
    every non-adjacent node at distance 2, score = |N(u) n N(v)| /
    |N(u) u N(v)|; the top-20 predicted links are the 'parts that
    should co-occur but don't yet'.

    Scale shape — and why the cohort is load-bearing: the ALL-PAIRS
    wedge join is sum(deg^2) over shared neighbors, which measured
    298M rows at sf0.1 on this graph (avg co-purchase degree ~120 is
    SF-invariant, so the blowup is x120 the edge list at every
    scale) — the all-nodes variant OOMed a default local JVM and is
    the wrong plan at any SF. Anchoring one wedge end to the cohort
    makes the join |und_focus| x deg ~ (0.5% of nodes) x 120 x 120 —
    linear in the edge list with a small constant — while scores stay
    EXACT w.r.t. the full graph (the other wedge end and the degree
    table are unrestricted). This is the production shape: link
    prediction is computed for a query cohort, not all pairs.
    Existing edges drop via one anti-join on the directed stub list;
    union sizes come from the degree table (k_u + k_v - common).
    Jaccard is an exact integer ratio, floor-canonicalized; top-20
    compiles to per-partition heaps (TakeOrderedAndProject)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = _copurchase_edges(li)
    und = edges.select(F.col("u").alias("i"), F.col("v").alias("j")).unionAll(
        edges.select(F.col("v").alias("i"), F.col("u").alias("j"))
    )
    # r18: deg feeds both the ku and kv joins — conservative checkpoint
    # computes the 2|E|-row degree aggregation once instead of twice.
    deg = _checkpoint_conservative(
        und.groupBy(F.col("i").alias("node")).agg(F.count(F.lit(1)).alias("k"))
    )
    wa = und.filter(F.col("i") % 199 == 0).alias("wa")
    wb = und.alias("wb")
    common = (
        wa.join(
            wb,
            (F.col("wa.j") == F.col("wb.j")) & (F.col("wa.i") != F.col("wb.i")),
        )
        .groupBy(F.col("wa.i").alias("u"), F.col("wb.i").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    cand = common.join(
        und.select(F.col("i").alias("u"), F.col("j").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    jac = F.col("n_common") / (
        F.lit(1.0) * (F.col("ku") + F.col("kv") - F.col("n_common"))
    )
    return (
        cand.join(deg.select(F.col("node").alias("u"), F.col("k").alias("ku")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("k").alias("kv")), "v")
        .select(
            "u",
            "v",
            F.col("n_common").cast("long").alias("n_common"),
            (F.floor(jac * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("jaccard_r"),
        )
        .orderBy(F.col("jaccard_r").desc(), "u", "v")
        .limit(20)
    )


def _canon6(c):
    """Cross-engine float canonicalization at the 1e-6 grain: identical
    IEEE ops (mul, add, floor, div) on both engines, no engine round()."""
    return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


@register(
    "analytics_partial_correlation",
    oracle="""
    WITH r AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT)                       AS n,
               corr(CAST(l_quantity AS DOUBLE),
                    CAST(l_extendedprice AS DOUBLE))          AS rxy,
               corr(CAST(l_quantity AS DOUBLE),
                    CAST(l_discount AS DOUBLE))               AS rxz,
               corr(CAST(l_extendedprice AS DOUBLE),
                    CAST(l_discount AS DOUBLE))               AS ryz
        FROM lineitem GROUP BY l_returnflag
    ),
    c AS (
        SELECT l_returnflag, n,
               floor(rxy * 1e6 + 0.5) / 1e6 AS rxy_c,
               floor(rxz * 1e6 + 0.5) / 1e6 AS rxz_c,
               floor(ryz * 1e6 + 0.5) / 1e6 AS ryz_c
        FROM r
    )
    SELECT l_returnflag, n,
           rxy_c AS r_xy_r, rxz_c AS r_xz_r, ryz_c AS r_yz_r,
           floor((rxy_c - rxz_c * ryz_c)
                 / sqrt((1 - rxz_c * rxz_c) * (1 - ryz_c * ryz_c))
                 * 1e6 + 0.5) / 1e6 AS partial_r
    FROM c
    ORDER BY l_returnflag
    """,
)
def analytics_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order partial correlation r_xy.z per return-flag segment:
    quantity vs extended price, controlling for discount — the
    'does the raw association survive removing the confounder' check
    every experimentation/causal readout runs before trusting a corr.
    r_xy.z = (r_xy - r_xz*r_yz) / sqrt((1-r_xz^2)(1-r_yz^2)).

    Determinism: the three Pearson r's are canonicalized at the 1e-6
    grain FIRST (each engine's partial-aggregation order yields ulp
    noise), then the partial formula runs on identical doubles on
    both engines — mul/sub/sqrt/div are correctly-rounded IEEE ops,
    so the derived value is bit-equal before its own canon.

    Scale shape: one map-side-combinable agg pass (corr is an
    algebraic aggregate: sums/products accumulate per partition,
    merge at 3 groups); no second pass, no join."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_extendedprice").cast("double").alias("y"),
        F.col("l_discount").cast("double").alias("z"),
    )
    r = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _canon6(F.corr("x", "y")).alias("rxy_c"),
        _canon6(F.corr("x", "z")).alias("rxz_c"),
        _canon6(F.corr("y", "z")).alias("ryz_c"),
    )
    partial = (F.col("rxy_c") - F.col("rxz_c") * F.col("ryz_c")) / F.sqrt(
        (F.lit(1) - F.col("rxz_c") * F.col("rxz_c"))
        * (F.lit(1) - F.col("ryz_c") * F.col("ryz_c"))
    )
    return r.select(
        "l_returnflag",
        "n",
        F.col("rxy_c").alias("r_xy_r"),
        F.col("rxz_c").alias("r_xz_r"),
        F.col("ryz_c").alias("r_yz_r"),
        _canon6(partial).alias("partial_r"),
    ).orderBy("l_returnflag")


_CRAMER_PAIRS = [
    ("l_returnflag", "l_linestatus"),
    ("l_returnflag", "l_linenumber"),
    ("l_linestatus", "l_linenumber"),
]


def _cramer_pair_sql(a: str, b: str) -> str:
    """One UNION-ALL branch of the Cramér's V oracle: chi-square from
    the integer contingency table, canon at 1e-6, then the (exactly
    reproducible) Cramér / Bergsma-bias-corrected transforms."""
    return f"""
    SELECT '{a}~{b}' AS pair, n, r, c,
           chi2_c AS chi2_r,
           floor(sqrt(chi2_c / (n * least(r - 1, c - 1))) * 1e6 + 0.5) / 1e6
               AS cramers_v_r,
           floor(sqrt(
               greatest(0, chi2_c / n - (r - 1) * (c - 1) * 1.0 / (n - 1))
               / least(r - (r - 1) * (r - 1) * 1.0 / (n - 1) - 1,
                       c - (c - 1) * (c - 1) * 1.0 / (n - 1) - 1)
           ) * 1e6 + 0.5) / 1e6 AS v_corrected_r
    FROM (
        SELECT CAST(any_value(n) AS BIGINT) AS n,
               CAST(any_value(r) AS BIGINT) AS r,
               CAST(any_value(c) AS BIGINT) AS c,
               floor(sum((cnt - rt * ct * 1.0 / n) * (cnt - rt * ct * 1.0 / n)
                         / (rt * ct * 1.0 / n)) * 1e6 + 0.5) / 1e6 AS chi2_c
        FROM (
            SELECT cnt,
                   sum(cnt) OVER (PARTITION BY av) AS rt,
                   sum(cnt) OVER (PARTITION BY bv) AS ct,
                   sum(cnt) OVER ()                AS n,
                   count(DISTINCT av) OVER ()      AS r,
                   count(DISTINCT bv) OVER ()      AS c
            FROM (
                SELECT {a} AS av, {b} AS bv, count(*) AS cnt
                FROM lineitem GROUP BY {a}, {b}
            )
        )
    )"""


@register(
    "analytics_cramers_v",
    oracle=" UNION ALL ".join(
        _cramer_pair_sql(a, b) for a, b in _CRAMER_PAIRS
    )
    + " ORDER BY pair",
)
def analytics_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical-association matrix: chi-square, Cramér's V, and the
    Bergsma (2013) bias-corrected V for three lineitem attribute
    pairs (return flag, line status, line number) — the standard
    'which categorical columns are redundant / leaking' screen run
    before feature selection or stratification.

    Determinism: the contingency table is pure integer counts; the
    chi-square sum (<=28 cells, each engine's own aggregation order)
    is canonicalized at 1e-6, after which every downstream transform
    (sqrt/div on exact-int-derived doubles) is a correctly-rounded
    IEEE op — bit-equal on both engines before its own canon.

    Scale shape: per pair ONE map-side-combinable count aggregate at
    (a,b) grain (cells bounded by |dom(a)|x|dom(b)|, never data-sized)
    feeds window totals over the tiny cell table; the three pairs
    union. At 100 TB the only data-sized pass is the grouped count."""
    li = load(spark, sf_dir, "lineitem")
    outs = []
    for a, b in _CRAMER_PAIRS:
        cells = li.groupBy(
            F.col(a).alias("av"), F.col(b).alias("bv")
        ).agg(F.count(F.lit(1)).alias("cnt"))
        w_all = Window.partitionBy()
        t = cells.select(
            "cnt",
            F.sum("cnt").over(Window.partitionBy("av")).alias("rt"),
            F.sum("cnt").over(Window.partitionBy("bv")).alias("ct"),
            F.sum("cnt").over(w_all).alias("n"),
            F.size(F.collect_set("av").over(w_all)).alias("r"),
            F.size(F.collect_set("bv").over(w_all)).alias("c"),
        )
        e = F.col("rt") * F.col("ct") * F.lit(1.0) / F.col("n")
        agg = t.agg(
            F.first("n").cast("long").alias("n"),
            F.first("r").cast("long").alias("r"),
            F.first("c").cast("long").alias("c"),
            _canon6(
                F.sum((F.col("cnt") - e) * (F.col("cnt") - e) / e)
            ).alias("chi2_c"),
        )
        nn, rr, cc = F.col("n"), F.col("r"), F.col("c")
        phi2corr = F.greatest(
            F.lit(0),
            F.col("chi2_c") / nn - (rr - 1) * (cc - 1) * F.lit(1.0) / (nn - 1),
        )
        kcorr = F.least(
            rr - (rr - 1) * (rr - 1) * F.lit(1.0) / (nn - 1) - 1,
            cc - (cc - 1) * (cc - 1) * F.lit(1.0) / (nn - 1) - 1,
        )
        outs.append(
            agg.select(
                F.lit(f"{a}~{b}").alias("pair"),
                "n",
                "r",
                "c",
                F.col("chi2_c").alias("chi2_r"),
                _canon6(
                    F.sqrt(
                        F.col("chi2_c") / (nn * F.least(rr - 1, cc - 1))
                    )
                ).alias("cramers_v_r"),
                _canon6(F.sqrt(phi2corr / kcorr)).alias("v_corrected_r"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("pair")


@register(
    "analytics_levene_test",
    oracle="""
    WITH z AS (
        SELECT o.o_orderpriority AS grp,
               abs(CAST(o.o_totalprice AS DOUBLE) - m.med) AS z
        FROM orders o
        JOIN (
            SELECT o_orderpriority,
                   median(CAST(o_totalprice AS DOUBLE)) AS med
            FROM orders GROUP BY o_orderpriority
        ) m ON m.o_orderpriority = o.o_orderpriority
    ),
    g AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n_j,
               sum(z) AS s1, sum(z * z) AS s2
        FROM z GROUP BY grp
    ),
    tot AS (
        SELECT CAST(sum(n_j) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT)  AS k,
               sum(s1) / sum(n_j)        AS zbar,
               sum(s2 - s1 * s1 / n_j)   AS den
        FROM g
    ),
    w AS (
        SELECT any_value(t.n) AS n, any_value(t.k) AS k,
               floor((any_value(t.n) - any_value(t.k)) * 1.0
                     / (any_value(t.k) - 1)
                     * sum(g.n_j * (g.s1 / g.n_j - t.zbar)
                                 * (g.s1 / g.n_j - t.zbar))
                     / any_value(t.den) * 1e6 + 0.5) / 1e6 AS w_stat_r
        FROM g, tot t
    )
    SELECT g.grp, g.n_j,
           floor(m.med * 1e6 + 0.5) / 1e6        AS med_r,
           floor(g.s1 / g.n_j * 1e6 + 0.5) / 1e6 AS zbar_j_r,
           w.n, w.k, w.w_stat_r
    FROM g
    JOIN (
        SELECT o_orderpriority AS grp,
               median(CAST(o_totalprice AS DOUBLE)) AS med
        FROM orders GROUP BY o_orderpriority
    ) m ON m.grp = g.grp
    CROSS JOIN w
    ORDER BY g.grp
    """,
)
def analytics_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe robust variance-homogeneity test (Levene with
    median centering, the scipy default): are order totals equally
    dispersed across the five order priorities?  W =
    (N-k)/(k-1) * sum n_j (zbar_j - zbar)^2 / sum (z_ij - zbar_j)^2
    with z = |x - group median| — the assumption check run before
    any pooled-variance ANOVA / t-test readout.

    Determinism: group medians interpolate the same two middle
    doubles on both engines (exact); the order-dependent double sums
    (s1, s2) feed ratio statistics whose relative noise is ~1e-13,
    then every emitted float is canonicalized at 1e-6.

    Scale shape: exact median needs a per-group sort — at 100 TB swap
    in approx_percentile(0.5) (same algebra downstream); everything
    after is two map-side-combinable aggregates over (group) grain
    and a 5-row broadcast join back."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").cast("double").alias("x"),
    )
    med = o.groupBy("grp").agg(F.median("x").alias("med"))
    z = o.join(F.broadcast(med), "grp").select(
        "grp", F.abs(F.col("x") - F.col("med")).alias("z")
    )
    g = z.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_j"),
        F.sum("z").alias("s1"),
        F.sum(F.col("z") * F.col("z")).alias("s2"),
    )
    tot = g.agg(
        F.sum("n_j").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        (F.sum("s1") / F.sum("n_j")).alias("zbar"),
        F.sum(F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_j")).alias(
            "den"
        ),
    )
    dev = F.col("s1") / F.col("n_j") - F.col("zbar")
    w = (
        g.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n").alias("n"),
            F.first("k").alias("k"),
            _canon6(
                (F.first("n") - F.first("k"))
                * F.lit(1.0)
                / (F.first("k") - 1)
                * F.sum(F.col("n_j") * dev * dev)
                / F.first("den")
            ).alias("w_stat_r"),
        )
    )
    return (
        g.join(F.broadcast(med), "grp")
        .crossJoin(F.broadcast(w))
        .select(
            "grp",
            "n_j",
            _canon6(F.col("med")).alias("med_r"),
            _canon6(F.col("s1") / F.col("n_j")).alias("zbar_j_r"),
            "n",
            "k",
            "w_stat_r",
        )
        .orderBy("grp")
    )


@register(
    "analytics_tukey_fences",
    oracle="""
    WITH q AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT)                       AS n,
           floor(any_value(q.q1) * 1e6 + 0.5) / 1e6       AS q1_r,
           floor(any_value(q.q3) * 1e6 + 0.5) / 1e6       AS q3_r,
           floor((any_value(q.q3) - any_value(q.q1)) * 1e6 + 0.5) / 1e6
                                                          AS iqr_r,
           CAST(sum(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT)    AS n_low,
           CAST(sum(CASE WHEN e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT)    AS n_high
    FROM events e JOIN q ON q.event_type = e.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
)
def analytics_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey boxplot outlier screen per event type: fences at
    Q1 - 1.5*IQR and Q3 + 1.5*IQR, counting values beyond each —
    the third member of the outlier-family (z-score and MAD siblings
    exist) and the one robust to BOTH non-normality and the 50%
    breakdown point of the quartiles.

    Determinism: exact interpolated quartiles are the same two-middle
    interpolation on both engines (identical input doubles), fence
    arithmetic is fixed-order IEEE on those values, and the outlier
    counts are strict comparisons of identical doubles — integers
    cross the edge; the displayed quartiles are canonicalized.

    Scale shape: at 100 TB swap quantile_cont for approx_percentile
    (same downstream algebra, documented like the sibling exact
    medians); the count pass is one map-side-combinable conditional
    aggregate against a groups-sized broadcast."""
    e = load(spark, sf_dir, "events").select("event_type", "value")
    q = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    lo, hi = F.col("q1") - 1.5 * iqr, F.col("q3") + 1.5 * iqr
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            _canon6(F.first("q1")).alias("q1_r"),
            _canon6(F.first("q3")).alias("q3_r"),
            _canon6(F.first("q3") - F.first("q1")).alias("iqr_r"),
            F.sum(F.when(F.col("value") < lo, 1).otherwise(0))
            .cast("long")
            .alias("n_low"),
            F.sum(F.when(F.col("value") > hi, 1).otherwise(0))
            .cast("long")
            .alias("n_high"),
        )
        .orderBy("event_type")
    )


@register(
    "analytics_cohens_kappa",
    oracle="""
    WITH med AS (SELECT median(o_totalprice) AS m FROM orders),
    r AS (
        SELECT CASE WHEN o.o_totalprice > med.m THEN 1 ELSE 0 END AS a,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS b
        FROM orders o, med
    ),
    c AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a * b) AS BIGINT)                 AS n11,
               CAST(sum(a * (1 - b)) AS BIGINT)           AS n10,
               CAST(sum((1 - a) * b) AS BIGINT)           AS n01,
               CAST(sum((1 - a) * (1 - b)) AS BIGINT)     AS n00
        FROM r
    )
    SELECT n, n11, n10, n01, n00,
           floor((n11 + n00) * 1.0 / n * 1e6 + 0.5) / 1e6 AS po_r,
           floor(((n11 + n10) * 1.0 / n * ((n11 + n01) * 1.0 / n)
                  + (n01 + n00) * 1.0 / n * ((n10 + n00) * 1.0 / n))
                 * 1e6 + 0.5) / 1e6                       AS pe_r,
           floor(((n11 + n00) * 1.0 / n
                  - ((n11 + n10) * 1.0 / n * ((n11 + n01) * 1.0 / n)
                     + (n01 + n00) * 1.0 / n * ((n10 + n00) * 1.0 / n)))
                 / (1 - ((n11 + n10) * 1.0 / n * ((n11 + n01) * 1.0 / n)
                         + (n01 + n00) * 1.0 / n * ((n10 + n00) * 1.0 / n)))
                 * 1e6 + 0.5) / 1e6                       AS kappa_r
    FROM c
    """,
)
def analytics_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa inter-rater agreement between two binary labelers
    derived from orders — rater A: 'high-value' (total above the
    corpus median), rater B: 'urgent' (priority 1-2) — the
    chance-corrected agreement score every labeling/annotation
    pipeline reports before trusting a silver label.
    kappa = (p_o - p_e) / (1 - p_e).

    Determinism: the 2x2 contingency is exact integers; p_o/p_e/kappa
    are FIXED-order rational expressions evaluated identically by
    both engines, canonicalized at 1e-6.

    Scale shape: one median (exact here; approx_percentile at 100 TB)
    broadcast into one conditional-aggregate pass — the whole
    statistic is a 1-row reduction."""
    o = load(spark, sf_dir, "orders")
    med = o.agg(F.median("o_totalprice").alias("m"))
    r = o.crossJoin(F.broadcast(med)).select(
        F.when(F.col("o_totalprice") > F.col("m"), 1).otherwise(0).alias("a"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("b"),
    )
    c = r.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"),
    )
    nn = F.col("n")
    po = (F.col("n11") + F.col("n00")) * F.lit(1.0) / nn
    pa1 = (F.col("n11") + F.col("n10")) * F.lit(1.0) / nn
    pb1 = (F.col("n11") + F.col("n01")) * F.lit(1.0) / nn
    pa0 = (F.col("n01") + F.col("n00")) * F.lit(1.0) / nn
    pb0 = (F.col("n10") + F.col("n00")) * F.lit(1.0) / nn
    pe = pa1 * pb1 + pa0 * pb0
    return c.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        _canon6(po).alias("po_r"),
        _canon6(pe).alias("pe_r"),
        _canon6((po - pe) / (F.lit(1) - pe)).alias("kappa_r"),
    )


@register(
    "analytics_degree_assortativity",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    und AS (
        SELECT u AS i, v AS j FROM edges
        UNION ALL SELECT v AS i, u AS j FROM edges
    ),
    deg AS (SELECT i AS node, count(*) AS d FROM und GROUP BY i)
    SELECT CAST((SELECT count(*) FROM edges) AS BIGINT)  AS n_edges,
           CAST((SELECT count(*) FROM deg) AS BIGINT)    AS n_nodes,
           floor(corr(CAST(di.d AS DOUBLE), CAST(dj.d AS DOUBLE))
                 * 1e6 + 0.5) / 1e6                      AS assortativity_r
    FROM und
    JOIN deg di ON di.node = und.i
    JOIN deg dj ON dj.node = und.j
    """,
)
def analytics_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the co-purchase graph:
    the Pearson correlation of endpoint degrees over all directed
    edge stubs — negative means hubs attach to leaves (the typical
    retail/dependency shape), positive means hub-hub cliques; the
    one-number summary that predicts whether degree-based
    partitioning will skew.

    Determinism: degrees are exact integers; corr carries each
    engine's partial-aggregation order noise, canonicalized at 1e-6.

    Scale shape: the same degree-bounded wedge geometry as kcore /
    link prediction (<=7 lines per order caps the self-join blowup);
    degrees are one count aggregate joined back to the stub list, and
    corr is a single map-side-combinable algebraic aggregate."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = _copurchase_edges(li)
    und = edges.select(F.col("u").alias("i"), F.col("v").alias("j")).unionAll(
        edges.select(F.col("v").alias("i"), F.col("u").alias("j"))
    )
    # r18 (guide §2.3, measured 2.77 -> 2.22 s full invocation): deg is
    # referenced three times (two joins + count) — conservative
    # checkpoint computes the 2|E|-row aggregation once; and the
    # degree joins run at EDGE grain (|E|) with the directed stubs
    # exploded AFTER the joins, halving both join shuffles vs joining
    # the 2|E| stub list. The corr input multiset is identical (each
    # undirected edge still contributes both (du,dv) and (dv,du));
    # partial-agg order noise stays ~1e-12 under the 1e-6 canon.
    deg = _checkpoint_conservative(
        und.groupBy(F.col("i").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    )
    n_edges = edges.count()
    n_nodes = deg.count()
    paired = (
        edges.join(
            deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u"
        )
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("du").alias("di"), F.col("dv").alias("dj")),
                    F.struct(F.col("dv").alias("di"), F.col("du").alias("dj")),
                )
            ).alias("s")
        )
        .select("s.di", "s.dj")
    )
    return paired.agg(
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        _canon6(
            F.corr(F.col("di").cast("double"), F.col("dj").cast("double"))
        ).alias("assortativity_r"),
    )


@register(
    "analytics_cochran_armitage",
    oracle="""
    WITH g AS (
        SELECT CAST(month(o_orderdate) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT)           AS n_k,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS r_k
        FROM orders GROUP BY 1
    ),
    s AS (
        SELECT CAST(sum(n_k) AS BIGINT) AS n,
               CAST(sum(r_k) AS BIGINT) AS r,
               CAST(sum(t * r_k) AS BIGINT)     AS str_,
               CAST(sum(t * n_k) AS BIGINT)     AS stn,
               CAST(sum(t * t * n_k) AS BIGINT) AS sttn
        FROM g
    )
    SELECT n, r,
           floor((str_ - r * 1.0 / n * stn) * 1e6 + 0.5) / 1e6 AS t_stat_r,
           floor((str_ - r * 1.0 / n * stn)
                 / sqrt(r * 1.0 / n * (1 - r * 1.0 / n)
                        * (sttn - stn * 1.0 * stn / n))
                 * 1e6 + 0.5) / 1e6                            AS z_r
    FROM s
    """,
)
def analytics_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend test: is the urgent-order share trending
    across the ordered month buckets (scores t = 1..12)?
    T = sum t_k (r_k - n_k R/N), z = T / sqrt(p(1-p)(sum t^2 n -
    (sum t n)^2 / N)) — the dose-response test behind 'is this rate
    drifting with the ordered exposure' readouts.

    Determinism: every aggregate (n_k, r_k, t*r_k, t^2*n_k) is an
    exact integer sum; T and z are fixed-order rational expressions
    over those integers, identical on both engines before the 1e-6
    canon.

    Scale shape: one month-grain conditional aggregate (12 cells)
    then a 1-row reduction — fully map-side combinable."""
    o = load(spark, sf_dir, "orders")
    g = o.groupBy(F.month("o_orderdate").cast("long").alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("n_k"),
        F.sum(
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("r_k"),
    )
    s = g.agg(
        F.sum("n_k").cast("long").alias("n"),
        F.sum("r_k").cast("long").alias("r"),
        F.sum(F.col("t") * F.col("r_k")).cast("long").alias("str_"),
        F.sum(F.col("t") * F.col("n_k")).cast("long").alias("stn"),
        F.sum(F.col("t") * F.col("t") * F.col("n_k")).cast("long").alias("sttn"),
    )
    p = F.col("r") * F.lit(1.0) / F.col("n")
    t_stat = F.col("str_") - p * F.col("stn")
    var = p * (F.lit(1) - p) * (
        F.col("sttn") - F.col("stn") * F.lit(1.0) * F.col("stn") / F.col("n")
    )
    return s.select(
        "n",
        "r",
        _canon6(t_stat).alias("t_stat_r"),
        _canon6(t_stat / F.sqrt(var)).alias("z_r"),
    )


@register(
    "analytics_sax_symbols",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               count(*) AS cnt
        FROM events GROUP BY 1
    ),
    base AS (
        SELECT day_idx - (SELECT min(day_idx) FROM daily) AS d, cnt
        FROM daily
    ),
    stats AS (
        SELECT sum(cnt) * 1.0 / count(*) AS mu,
               sqrt((sum(cnt * cnt) - sum(cnt) * 1.0 * sum(cnt) / count(*))
                    / (count(*) - 1)) AS sigma
        FROM base
    ),
    paa AS (
        SELECT d // 7 AS seg,
               CAST(count(*) AS BIGINT) AS n_days,
               sum(cnt) * 1.0 / count(*) AS m
        FROM base GROUP BY d // 7
    )
    SELECT paa.seg, paa.n_days,
           floor(paa.m * 1e6 + 0.5) / 1e6 AS paa_r,
           CASE WHEN (paa.m - s.mu) / s.sigma < -0.6745 THEN 'a'
                WHEN (paa.m - s.mu) / s.sigma < 0       THEN 'b'
                WHEN (paa.m - s.mu) / s.sigma < 0.6745  THEN 'c'
                ELSE 'd' END AS symbol
    FROM paa, stats s
    ORDER BY paa.seg
    """,
)
def analytics_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin/Keogh 2003) of the daily event-count
    series: Piecewise Aggregate Approximation over 7-day segments,
    z-normalization, then Gaussian-equiprobable breakpoints
    (+-0.6745, 0) map each segment to one of 4 symbols — the
    time-series-to-string transform that makes motif discovery and
    similarity indexable (iSAX) at scale.

    Determinism: daily counts are integers, so every sum (s1, s2,
    per-segment means) is EXACT in doubles; mu/sigma come from a
    fixed-order closed form over those exact sums, z-scores are
    identical doubles on both engines, and breakpoint comparisons are
    strict — the symbol column is deterministic without tolerance.

    Scale shape: one day-grain count aggregate, a broadcast 1-row
    stats reduction, one segment-grain aggregate — each map-side
    combinable; symbols per series are |days|/7, a 50x reduction
    before any motif join."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    mind = daily.agg(F.min("day_idx").alias("d0"))
    base = daily.crossJoin(F.broadcast(mind)).select(
        (F.col("day_idx") - F.col("d0")).alias("d"), "cnt"
    )
    stats = base.agg(
        (F.sum("cnt") * F.lit(1.0) / F.count(F.lit(1))).alias("mu"),
        F.sqrt(
            (
                F.sum(F.col("cnt") * F.col("cnt"))
                - F.sum("cnt") * F.lit(1.0) * F.sum("cnt") / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("sigma"),
    )
    paa = base.groupBy(F.floor(F.col("d") / 7).cast("long").alias("seg")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        (F.sum("cnt") * F.lit(1.0) / F.count(F.lit(1))).alias("m"),
    )
    z = (F.col("m") - F.col("mu")) / F.col("sigma")
    return (
        paa.crossJoin(F.broadcast(stats))
        .select(
            "seg",
            "n_days",
            _canon6(F.col("m")).alias("paa_r"),
            F.when(z < -0.6745, "a")
            .when(z < 0, "b")
            .when(z < 0.6745, "c")
            .otherwise("d")
            .alias("symbol"),
        )
        .orderBy("seg")
    )


@register(
    "analytics_mann_kendall",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    s AS (
        SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
                             WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
               AS s_stat
        FROM daily a JOIN daily b ON a.day_idx < b.day_idx
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
    ties AS (
        SELECT COALESCE(CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
               AS tie_term
        FROM (SELECT count(*) AS t FROM daily GROUP BY x HAVING count(*) > 1)
    )
    SELECT nn.n, s.s_stat,
           floor((nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term)
                 / 18.0 * 1e6 + 0.5) / 1e6 AS var_s_r,
           floor((CASE WHEN s.s_stat > 0 THEN s.s_stat - 1
                       WHEN s.s_stat < 0 THEN s.s_stat + 1
                       ELSE 0 END)
                 / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term)
                        / 18.0) * 1e6 + 0.5) / 1e6 AS z_r,
           CASE WHEN s.s_stat > 0 THEN 'increasing'
                WHEN s.s_stat < 0 THEN 'decreasing'
                ELSE 'no trend' END AS direction
    FROM s, nn, ties
    """,
)
def analytics_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall non-parametric trend test on the daily event-count
    series: S = sum over ordered day pairs of sign(x_j - x_i),
    tie-corrected variance, and the continuity-corrected z — the
    distribution-free 'is this metric drifting' test monitoring
    stacks run where OLS slopes are invalid.

    Determinism: S and the tie term are exact integers; var and z are
    fixed-order rationals over them (sqrt is correctly-rounded IEEE),
    canonicalized at 1e-6.

    Scale shape: the all-pairs S is quadratic in the SERIES length
    (days, not events — bounded by the calendar, ~365 rows/year), so
    the self-join is model-sized; daily aggregation is the only
    data-sized pass. For multi-year spans at 100 TB, compute S per
    year-segment and merge (S is additive over disjoint pair sets
    within segments plus a cross-segment term of the same form)."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(b, F.col("a.day_idx") < F.col("b.day_idx"))
        .agg(
            F.sum(
                F.when(F.col("b.x") > F.col("a.x"), 1)
                .when(F.col("b.x") < F.col("a.x"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat")
        )
    )
    nn = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    j = s.crossJoin(F.broadcast(nn)).crossJoin(F.broadcast(ties))
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / F.lit(18.0)
    s_adj = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
    )
    return j.select(
        "n",
        "s_stat",
        _canon6(var_s).alias("var_s_r"),
        _canon6(s_adj / F.sqrt(var_s)).alias("z_r"),
        F.when(F.col("s_stat") > 0, "increasing")
        .when(F.col("s_stat") < 0, "decreasing")
        .otherwise("no trend")
        .alias("direction"),
    )


@register(
    "analytics_gumbel_block_maxima",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    blocks AS (
        SELECT day_idx // 30 AS blk, max(cnt) AS mx
        FROM daily GROUP BY day_idx // 30
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS n_blocks,
               sum(mx) * 1.0 / count(*) AS mean_mx,
               sqrt((sum(mx * mx) - sum(mx) * 1.0 * sum(mx) / count(*))
                    / (count(*) - 1)) AS sd_mx
        FROM blocks
    )
    SELECT n_blocks,
           floor(mean_mx * 1e6 + 0.5) / 1e6 AS mean_max_r,
           floor(sd_mx * 1e6 + 0.5) / 1e6   AS sd_max_r,
           floor((sd_mx * sqrt(6) / pi()) * 1e6 + 0.5) / 1e6 AS sigma_r,
           floor((mean_mx - 0.5772156649015329 * sd_mx * sqrt(6) / pi())
                 * 1e6 + 0.5) / 1e6         AS mu_r,
           floor((mean_mx - 0.5772156649015329 * sd_mx * sqrt(6) / pi()
                  - sd_mx * sqrt(6) / pi() * ln(-ln(1 - 1.0 / 12)))
                 * 1e6 + 0.5) / 1e6         AS return_level_12_r
    FROM mom
    """,
)
def analytics_gumbel_block_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value capacity planning: fit a Gumbel distribution to
    30-day block maxima of the daily event count by method of moments
    (sigma = sd*sqrt(6)/pi, mu = mean - gamma*sigma) and report the
    12-block return level mu - sigma*ln(-ln(1 - 1/12)) — 'the daily
    peak you should expect once a year', the standard EVT answer to
    provisioning questions that percentiles underestimate.

    Determinism: block maxima are exact integers, so the moment sums
    are exact; pi() and the Euler-Mascheroni literal are the same
    doubles on both engines; the one ln(-ln(.)) of a shared rational
    carries only libm-vs-StrictMath ulp, absorbed by the 1e-6 canon.

    Scale shape: day-grain count, block-grain max, 1-row moment
    reduction — all map-side combinable."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    blocks = daily.groupBy(
        F.floor(F.col("day_idx") / 30).cast("long").alias("blk")
    ).agg(F.max("cnt").alias("mx"))
    mom = blocks.agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        (F.sum("mx") * F.lit(1.0) / F.count(F.lit(1))).alias("mean_mx"),
        F.sqrt(
            (
                F.sum(F.col("mx") * F.col("mx"))
                - F.sum("mx") * F.lit(1.0) * F.sum("mx") / F.count(F.lit(1))
            )
            / (F.count(F.lit(1)) - 1)
        ).alias("sd_mx"),
    )
    sigma = F.col("sd_mx") * F.sqrt(F.lit(6.0)) / F.lit(3.141592653589793)
    mu = F.col("mean_mx") - F.lit(0.5772156649015329) * sigma
    rl = mu - sigma * F.log(-F.log(F.lit(1) - F.lit(1.0) / 12))
    return mom.select(
        "n_blocks",
        _canon6(F.col("mean_mx")).alias("mean_max_r"),
        _canon6(F.col("sd_mx")).alias("sd_max_r"),
        _canon6(sigma).alias("sigma_r"),
        _canon6(mu).alias("mu_r"),
        _canon6(rl).alias("return_level_12_r"),
    )


_SHAPLEY_SETS = [
    "",
    "click",
    "signup",
    "view",
    "click|signup",
    "click|view",
    "signup|view",
    "click|signup|view",
]


def _shapley_v_sql() -> str:
    """Per-coalition conversion rates v(S) as one conditional-agg row
    (columns v_0..v_7 in _SHAPLEY_SETS order), from per-user exposure
    sets — shared structure between the two engines' plans."""
    cols = []
    for i, s in enumerate(_SHAPLEY_SETS):
        cols.append(
            f"COALESCE(sum(CASE WHEN cset = '{s}' AND conv THEN 1 ELSE 0 END)"
            f" * 1.0 / nullif(sum(CASE WHEN cset = '{s}' THEN 1 ELSE 0 END),"
            f" 0), 0.0) AS v_{i}"
        )
    return ", ".join(cols)


@register(
    "analytics_shapley_attribution",
    oracle=f"""
    WITH w AS (
        SELECT user_id, min(ts) AS t0 FROM events GROUP BY user_id
    ),
    u AS (
        SELECT e.user_id,
               COALESCE(array_to_string(list_sort(list_distinct(
                   list(e.event_type) FILTER (WHERE
                       e.event_type IN ('view', 'click', 'signup')
                       AND e.ts < w.t0 + INTERVAL 2 DAY))), '|'), '')
                   AS cset,
               bool_or(e.event_type = 'purchase'
                       AND e.ts < w.t0 + INTERVAL 2 DAY) AS conv
        FROM events e JOIN w USING (user_id) GROUP BY e.user_id
    ),
    v AS (SELECT {{V_COLS}} FROM u)
    SELECT channel,
           floor(shap * 1e6 + 0.5) / 1e6 AS shapley_r
    FROM (
        SELECT 'click' AS channel,
               (v_1 - v_0) / 3 + ((v_4 - v_2) + (v_5 - v_3)) / 6
               + (v_7 - v_6) / 3 AS shap
        FROM v
        UNION ALL
        SELECT 'signup',
               (v_2 - v_0) / 3 + ((v_4 - v_1) + (v_6 - v_3)) / 6
               + (v_7 - v_5) / 3
        FROM v
        UNION ALL
        SELECT 'view',
               (v_3 - v_0) / 3 + ((v_5 - v_1) + (v_6 - v_2)) / 6
               + (v_7 - v_4) / 3
        FROM v
    )
    ORDER BY channel
    """.replace("{V_COLS}", _shapley_v_sql()),
)
def analytics_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-value marketing attribution (Shapley 1953 as applied by
    Zhao et al. 2018): with channels C = {{view, click, signup}} and
    the empirical characteristic function v(S) = conversion rate
    (within each user's first-2-day onboarding window) of users whose
    exposure set over that window is exactly S, each channel's credit is
    phi_c = sum over S not containing c of |S|!(|C|-|S|-1)!/|C|! *
    (v(S+c) - v(S)) — the coalition-fair alternative to the
    first/last/linear heuristics in `analytics_attribution_models`.

    Determinism: the 8 coalition rates are exact integer ratios from
    one conditional aggregate; phi is a fixed-order rational
    expression over them (weights 1/3, 1/6, 1/3 for |S| = 0, 1, 2),
    identical on both engines before the 1e-6 canon.

    Scale shape: one user-grain aggregate builds exposure sets (set
    size bounded by |C|, the collect is per-user tiny), one 1-row
    conditional aggregate over the 8 coalitions, then constant-size
    arithmetic — the heavy pass is user-grain, exactly once."""
    ev = load(spark, sf_dir, "events")
    w = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
    in_win = F.col("ts") < F.col("t0") + F.expr("INTERVAL 2 DAYS")
    u = (
        ev.join(w, "user_id")
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "|",
                F.sort_array(
                    F.collect_set(
                        F.when(
                            F.col("event_type").isin(
                                "view", "click", "signup"
                            )
                            & in_win,
                            F.col("event_type"),
                        )
                    )
                ),
            ).alias("cset"),
            F.max(
                (F.col("event_type") == "purchase") & in_win
            ).alias("conv"),
        )
    )
    v_aggs = []
    for i, s in enumerate(_SHAPLEY_SETS):
        in_set = F.col("cset") == s
        v_aggs.append(
            F.coalesce(
                F.sum(F.when(in_set & F.col("conv"), 1).otherwise(0))
                * F.lit(1.0)
                / F.nullif(
                    F.sum(F.when(in_set, 1).otherwise(0)), F.lit(0)
                ),
                F.lit(0.0),
            ).alias(f"v_{i}")
        )
    v = u.agg(*v_aggs)
    vc = {i: F.col(f"v_{i}") for i in range(8)}
    phi = {
        "click": (vc[1] - vc[0]) / 3
        + ((vc[4] - vc[2]) + (vc[5] - vc[3])) / 6
        + (vc[7] - vc[6]) / 3,
        "signup": (vc[2] - vc[0]) / 3
        + ((vc[4] - vc[1]) + (vc[6] - vc[3])) / 6
        + (vc[7] - vc[5]) / 3,
        "view": (vc[3] - vc[0]) / 3
        + ((vc[5] - vc[1]) + (vc[6] - vc[2])) / 6
        + (vc[7] - vc[4]) / 3,
    }
    outs = [
        v.select(
            F.lit(ch).alias("channel"), _canon6(expr).alias("shapley_r")
        )
        for ch, expr in phi.items()
    ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("channel")


def _hurst_scale_sql(size: int) -> str:
    """One rescaled-range scale: partition the daily series into
    complete blocks of `size` days, compute R/S per block (range of
    cumulative mean-deviations over the in-block stddev), and average
    over blocks."""
    return f"""
        SELECT {size} AS scale, avg(r / s) AS rs
        FROM (
            SELECT blk,
                   max(cdev) - min(cdev) AS r,
                   sqrt((any_value(s2) - any_value(s1) * 1.0 * any_value(s1)
                         / {size}) / {size}) AS s
            FROM (
                SELECT blk, cnt,
                       sum(cnt - mu) OVER (
                           PARTITION BY blk ORDER BY d
                           ROWS UNBOUNDED PRECEDING) AS cdev,
                       s1, s2
                FROM (
                    SELECT d, cnt, d // {size} AS blk,
                           sum(cnt) OVER (PARTITION BY d // {size}) AS s1,
                           sum(cnt * cnt) OVER (PARTITION BY d // {size})
                               AS s2,
                           sum(cnt) OVER (PARTITION BY d // {size}) * 1.0
                               / {size} AS mu,
                           count(*) OVER (PARTITION BY d // {size}) AS bn
                    FROM base
                ) WHERE bn = {size}
            ) GROUP BY blk
        ) WHERE s > 0
    """


@register(
    "analytics_hurst_exponent",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1
    ),
    base AS (
        SELECT day_idx - (SELECT min(day_idx) FROM daily) AS d, cnt
        FROM daily
    ),
    scales AS ({_hurst_scale_sql(7)} UNION ALL {_hurst_scale_sql(14)})
    SELECT CAST(max(CASE WHEN scale = 7 THEN scale END) AS BIGINT)
               AS scale_lo,
           CAST(max(CASE WHEN scale = 14 THEN scale END) AS BIGINT)
               AS scale_hi,
           floor(max(CASE WHEN scale = 7 THEN rs END) * 1e6 + 0.5) / 1e6
               AS rs_lo_r,
           floor(max(CASE WHEN scale = 14 THEN rs END) * 1e6 + 0.5) / 1e6
               AS rs_hi_r,
           floor((ln(max(CASE WHEN scale = 14 THEN rs END))
                  - ln(max(CASE WHEN scale = 7 THEN rs END)))
                 / (ln(14) - ln(7)) * 1e6 + 0.5) / 1e6 AS hurst_r
    FROM scales
    """,
)
def analytics_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range (R/S) analysis over the daily
    event-count series at two dyadic scales (7- and 14-day blocks):
    H = dln(R/S)/dln(scale) — H around 0.5 means the load series is
    memoryless, H > 0.5 long-range dependent (bursts cluster, so
    capacity planning can't assume Poisson).

    Determinism: daily counts are integers (block moment sums exact),
    cumulative deviations are identical doubles on both engines, the
    per-scale block average carries only tiny order noise, and the
    two ln() calls land on shared doubles — canon at 1e-6.

    Scale shape: one day-grain aggregate, then per-scale window work
    over the SERIES (calendar-bounded, never event-sized); scales are
    a 2-branch union of block-grain reductions."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    mind = daily.agg(F.min("day_idx").alias("d0"))
    base = daily.crossJoin(F.broadcast(mind)).select(
        (F.col("day_idx") - F.col("d0")).alias("d"), "cnt"
    )

    def scale_rs(size: int) -> DataFrame:
        blk = F.floor(F.col("d") / size).cast("long")
        wb = Window.partitionBy("blk")
        wo = (
            Window.partitionBy("blk")
            .orderBy("d")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        t = base.select(
            "d",
            "cnt",
            blk.alias("blk"),
            F.sum("cnt").over(Window.partitionBy(blk)).alias("s1"),
            F.sum(F.col("cnt") * F.col("cnt"))
            .over(Window.partitionBy(blk))
            .alias("s2"),
            (F.sum("cnt").over(Window.partitionBy(blk)) * F.lit(1.0) / size).alias(
                "mu"
            ),
            F.count(F.lit(1)).over(Window.partitionBy(blk)).alias("bn"),
        ).filter(F.col("bn") == size)
        t = t.withColumn(
            "cdev", F.sum(F.col("cnt") - F.col("mu")).over(wo)
        )
        per_blk = t.groupBy("blk").agg(
            (F.max("cdev") - F.min("cdev")).alias("r"),
            F.sqrt(
                (
                    F.first("s2")
                    - F.first("s1") * F.lit(1.0) * F.first("s1") / size
                )
                / size
            ).alias("s"),
        )
        return per_blk.filter(F.col("s") > 0).agg(
            F.lit(size).alias("scale"),
            F.avg(F.col("r") / F.col("s")).alias("rs"),
        )

    scales = scale_rs(7).unionByName(scale_rs(14))
    agg = scales.agg(
        F.max(F.when(F.col("scale") == 7, F.col("scale")))
        .cast("long")
        .alias("scale_lo"),
        F.max(F.when(F.col("scale") == 14, F.col("scale")))
        .cast("long")
        .alias("scale_hi"),
        F.max(F.when(F.col("scale") == 7, F.col("rs"))).alias("rs_lo"),
        F.max(F.when(F.col("scale") == 14, F.col("rs"))).alias("rs_hi"),
    )
    return agg.select(
        "scale_lo",
        "scale_hi",
        _canon6(F.col("rs_lo")).alias("rs_lo_r"),
        _canon6(F.col("rs_hi")).alias("rs_hi_r"),
        _canon6(
            (F.log(F.col("rs_hi")) - F.log(F.col("rs_lo")))
            / (F.log(F.lit(14.0)) - F.log(F.lit(7.0)))
        ).alias("hurst_r"),
    )


@register(
    "analytics_regression_influence",
    oracle="""
    WITH s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               sum(CAST(l_quantity AS DOUBLE))   AS sx,
               sum(CAST(l_quantity AS DOUBLE)
                   * CAST(l_quantity AS DOUBLE)) AS sxx_raw,
               sum(CAST(l_extendedprice AS DOUBLE)) AS sy,
               sum(CAST(l_quantity AS DOUBLE)
                   * CAST(l_extendedprice AS DOUBLE)) AS sxy
        FROM lineitem
    ),
    beta AS (
        SELECT n, sx, sxx_raw,
               floor((sxy - sx * sy / n) / (sxx_raw - sx * sx / n)
                     * 100 + 0.5) / 100 AS b1,
               floor((sy / n
                      - (floor((sxy - sx * sy / n) / (sxx_raw - sx * sx / n)
                               * 100 + 0.5) / 100) * sx / n)
                     * 100 + 0.5) / 100 AS b0
        FROM s
    )
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS BIGINT) AS x,
           l_extendedprice            AS y,
           floor((l_extendedprice - (b.b0 + b.b1 * l_quantity)) * 1e2 + 0.5)
               / 1e2 AS resid_r,
           floor((1.0 / b.n
                  + (l_quantity - b.sx / b.n) * (l_quantity - b.sx / b.n)
                    / (b.sxx_raw - b.sx * b.sx / b.n)) * 1e9 + 0.5) / 1e9
               AS leverage_r,
           CAST(floor(pow(l_extendedprice - (b.b0 + b.b1 * l_quantity), 2)
                 * (1.0 / b.n
                    + (l_quantity - b.sx / b.n) * (l_quantity - b.sx / b.n)
                      / (b.sxx_raw - b.sx * b.sx / b.n))
                 / pow(1 - (1.0 / b.n
                            + (l_quantity - b.sx / b.n)
                              * (l_quantity - b.sx / b.n)
                              / (b.sxx_raw - b.sx * b.sx / b.n)), 2)
                 + 0.5) AS BIGINT) AS influence_r
    FROM lineitem, beta b
    ORDER BY influence_r DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def analytics_regression_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression influence diagnostics (Cook's-distance numerator
    e_i^2 h_i / (1-h_i)^2, the per-point part of Cook's D — the s^2
    scaling is a global constant that cannot change the ranking): the
    20 lineitems that most distort the price-on-quantity OLS fit, the
    screen run before trusting any fitted slope on raw data.

    Determinism: x = quantity is integer, so x-side moments and every
    leverage h_i are EXACT; the slope/intercept from the noisy y-side
    sums are canonicalized at 1e-2 FIRST (coarse is fine — beta canon
    defines the reference line, exactly reproducibly), after which
    residuals and influences are identical doubles; the influence
    edge rounds to integer units (values O(1e9), where 1e-6 grain
    would be below the doubles' resolution anyway).

    Scale shape: one 5-sum moment aggregate (map-side combinable),
    broadcast back for a per-row projection, global top-20 via
    per-partition heaps."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_extendedprice").cast("double").alias("y"),
    )
    s = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_raw"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    c2 = lambda col: F.floor(col * F.lit(100) + F.lit(0.5)) / F.lit(100)
    b1 = c2(
        (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
        / (F.col("sxx_raw") - F.col("sx") * F.col("sx") / F.col("n"))
    )
    beta = s.select(
        "n",
        "sx",
        "sxx_raw",
        b1.alias("b1"),
        c2(F.col("sy") / F.col("n") - b1 * F.col("sx") / F.col("n")).alias(
            "b0"
        ),
    )
    j = li.crossJoin(F.broadcast(beta))
    resid = F.col("y") - (F.col("b0") + F.col("b1") * F.col("x"))
    lev = F.lit(1.0) / F.col("n") + (
        F.col("x") - F.col("sx") / F.col("n")
    ) * (F.col("x") - F.col("sx") / F.col("n")) / (
        F.col("sxx_raw") - F.col("sx") * F.col("sx") / F.col("n")
    )
    infl = F.floor(
        F.pow(resid, 2) * lev / F.pow(F.lit(1) - lev, 2) + F.lit(0.5)
    ).cast("long")
    return (
        j.select(
            "l_orderkey",
            "l_linenumber",
            F.col("x").cast("long").alias("x"),
            F.col("y").alias("y"),
            (F.floor(resid * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).alias(
                "resid_r"
            ),
            (F.floor(lev * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)).alias(
                "leverage_r"
            ),
            infl.alias("influence_r"),
        )
        .orderBy(F.col("influence_r").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


@register(
    "analytics_var_cvar",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               round(sum(value), 2) AS day_value
        FROM events GROUP BY 1
    ),
    q AS (
        SELECT quantile_cont(day_value, 0.95) AS var95,
               quantile_cont(day_value, 0.99) AS var99
        FROM daily
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_days,
           floor(any_value(q.var95) * 1e6 + 0.5) / 1e6    AS var95_r,
           floor(any_value(q.var99) * 1e6 + 0.5) / 1e6    AS var99_r,
           CAST(sum(CASE WHEN d.day_value > q.var95 THEN 1 ELSE 0 END)
                AS BIGINT)                                AS n_tail95,
           floor(COALESCE(sum(CASE WHEN d.day_value > q.var95
                                   THEN d.day_value END)
                          / nullif(sum(CASE WHEN d.day_value > q.var95
                                            THEN 1 ELSE 0 END), 0), 0)
                 * 1e6 + 0.5) / 1e6                       AS cvar95_r
    FROM daily d, q
    """,
)
def analytics_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk and conditional VaR (expected shortfall) of the
    daily aggregate event value: VaR95/99 are the exact interpolated
    quantiles of the daily series, CVaR95 is the mean of days beyond
    VaR95 — the tail-risk pair used for capacity and exposure
    planning where a single percentile hides the tail's weight.

    Determinism: daily sums are money-rounded to 2dp first (exact
    decimal grain), quantile interpolation picks the same middle
    doubles on both engines, the tail comparison is strict on
    identical doubles, and the tail mean over <=few terms is
    canonicalized at 1e-6.

    Scale shape: day-grain rollup (calendar-bounded series), exact
    quantile on the series (approx_percentile is the documented
    swap at multi-year scale), one conditional aggregate."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx")
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    q = daily.agg(
        F.percentile("day_value", F.lit(0.95)).alias("var95"),
        F.percentile("day_value", F.lit(0.99)).alias("var99"),
    )
    tail = F.col("day_value") > F.col("var95")
    return (
        daily.crossJoin(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            _canon6(F.first("var95")).alias("var95_r"),
            _canon6(F.first("var99")).alias("var99_r"),
            F.sum(F.when(tail, 1).otherwise(0)).cast("long").alias("n_tail95"),
            _canon6(
                F.coalesce(
                    F.sum(F.when(tail, F.col("day_value")))
                    / F.nullif(
                        F.sum(F.when(tail, 1).otherwise(0)), F.lit(0)
                    ),
                    F.lit(0.0),
                )
            ).alias("cvar95_r"),
        )
    )


@register(
    "analytics_entropy_rate_markov",
    oracle="""
    WITH seq AS (
        SELECT event_type AS s,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS t
        FROM events
    ),
    trans AS (
        SELECT s, t, count(*) AS n FROM seq WHERE t IS NOT NULL GROUP BY s, t
    ),
    row_tot AS (SELECT s, sum(n) AS ns FROM trans GROUP BY s),
    tot AS (SELECT sum(n) AS total FROM trans),
    cell AS (
        SELECT tr.s, tr.t,
               tr.n * 1.0 / rt.ns                           AS p_cond,
               rt.ns * 1.0 / tt.total                       AS pi_s,
               floor(-(rt.ns * 1.0 / tt.total)
                     * (tr.n * 1.0 / rt.ns)
                     * ln(tr.n * 1.0 / rt.ns) / ln(2)
                     * 1e9 + 0.5) / 1e9                     AS term
        FROM trans tr JOIN row_tot rt ON rt.s = tr.s CROSS JOIN tot tt
    )
    SELECT CAST(count(*) AS BIGINT)               AS n_cells,
           floor(sum(term) * 1e6 + 0.5) / 1e6     AS entropy_rate_bits_r
    FROM cell
    """,
)
def analytics_entropy_rate_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user-behavior Markov chain: H = -sum_s
    pi(s) sum_t p(t|s) log2 p(t|s) with pi the empirical state
    occupancy — 'how many bits does the next action carry given the
    current one', the sequence-predictability number that bounds any
    next-event model's achievable log-loss (companion to
    `analytics_markov_transitions`, which emits the matrix itself).

    Determinism: transition counts are exact integers; each cell's
    -pi p log2 p term is canonicalized at 1e-9 (killing ln ulp
    divergence at the cell, where it's cheap — |cells| <=
    |event_types|^2), then the cell sum re-canonicalizes at 1e-6.

    Scale shape: one lead() window per user (the same single shuffle
    as the sibling Markov op), then state-grain aggregates bounded by
    the event-type universe."""
    ev = load(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("s"),
        F.lead("event_type").over(win).alias("t"),
    ).filter(F.col("t").isNotNull())
    trans = seq.groupBy("s", "t").agg(F.count(F.lit(1)).alias("n"))
    row_tot = trans.groupBy("s").agg(F.sum("n").alias("ns"))
    tot = trans.agg(F.sum("n").alias("total"))
    p_cond = F.col("n") * F.lit(1.0) / F.col("ns")
    pi_s = F.col("ns") * F.lit(1.0) / F.col("total")
    term = (
        F.floor(
            -pi_s * p_cond * F.log(p_cond) / F.log(F.lit(2.0)) * F.lit(1e9)
            + F.lit(0.5)
        )
        / F.lit(1e9)
    )
    cell = (
        trans.join(F.broadcast(row_tot), "s")
        .crossJoin(F.broadcast(tot))
        .select(term.alias("term"))
    )
    return cell.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        _canon6(F.sum("term")).alias("entropy_rate_bits_r"),
    )


@register(
    "analytics_tukey_hsd",
    oracle="""
    WITH g AS (
        SELECT o_orderpriority AS grp,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(o_totalprice AS DOUBLE)) AS s1,
               sum(CAST(o_totalprice AS DOUBLE)
                   * CAST(o_totalprice AS DOUBLE)) AS s2
        FROM orders GROUP BY o_orderpriority
    ),
    mse AS (
        SELECT sum(s2 - s1 * s1 / n) / (sum(n) - count(*)) AS mse
        FROM g
    )
    SELECT a.grp AS grp_a, b.grp AS grp_b,
           floor((a.s1 / a.n - b.s1 / b.n) * 1e4 + 0.5) / 1e4 AS mean_diff_r,
           floor(3.858 * sqrt(m.mse / 2 * (1.0 / a.n + 1.0 / b.n))
                 * 1e4 + 0.5) / 1e4                           AS hsd_crit_r,
           abs(floor((a.s1 / a.n - b.s1 / b.n) * 1e4 + 0.5) / 1e4)
               > floor(3.858 * sqrt(m.mse / 2 * (1.0 / a.n + 1.0 / b.n))
                       * 1e4 + 0.5) / 1e4                     AS significant
    FROM g a JOIN g b ON a.grp < b.grp CROSS JOIN mse m
    ORDER BY grp_a, grp_b
    """,
)
def analytics_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey HSD post-hoc pairwise comparison after ANOVA: for every
    pair of order priorities, the mean-total difference vs the HSD
    critical value q * sqrt(MSE/2 * (1/n_a + 1/n_b)) with the
    studentized-range q(k=5, df=inf, alpha=.05) = 3.858 literal —
    the 'WHICH groups differ' readout the omnibus F-test
    (`analytics_anova_f`) can't give, with the family-wise error
    control that repeated t-tests lose.

    Determinism: group moment sums carry order noise; mean diffs and
    the critical value are canonicalized at 1e-4 (both O(1e3-1e5)),
    and significance compares the two canonical values.

    Scale shape: one group-grain moment aggregate, a k^2 pair join of
    the 5-row group table, a broadcast 1-row MSE."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").cast("double").alias("x"),
    )
    g = o.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    mse = g.agg(
        (
            F.sum(F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("mse")
    )
    a = g.select(
        F.col("grp").alias("grp_a"),
        F.col("n").alias("na"),
        F.col("s1").alias("sa"),
    )
    b = g.select(
        F.col("grp").alias("grp_b"),
        F.col("n").alias("nb"),
        F.col("s1").alias("sb"),
    )
    c4 = lambda col: F.floor(col * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)
    diff = c4(F.col("sa") / F.col("na") - F.col("sb") / F.col("nb"))
    crit = c4(
        F.lit(3.858)
        * F.sqrt(
            F.col("mse")
            / 2
            * (F.lit(1.0) / F.col("na") + F.lit(1.0) / F.col("nb"))
        )
    )
    return (
        a.join(b, F.col("grp_a") < F.col("grp_b"))
        .crossJoin(F.broadcast(mse))
        .select(
            "grp_a",
            "grp_b",
            diff.alias("mean_diff_r"),
            crit.alias("hsd_crit_r"),
            (F.abs(diff) > crit).alias("significant"),
        )
        .orderBy("grp_a", "grp_b")
    )


@register(
    "analytics_friedman_test",
    oracle="""
    WITH cell AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS blk,
               event_type AS trt,
               avg(value) AS v
        FROM events GROUP BY 1, 2
    ),
    full_blocks AS (
        SELECT blk FROM cell GROUP BY blk
        HAVING count(*) = (SELECT count(DISTINCT event_type) FROM events)
    ),
    ranked AS (
        SELECT c.blk, c.trt,
               rank() OVER (PARTITION BY c.blk ORDER BY c.v) AS r
        FROM cell c JOIN full_blocks f ON f.blk = c.blk
    ),
    sums AS (
        SELECT trt, CAST(sum(r) AS BIGINT) AS rsum,
               CAST(count(*) AS BIGINT) AS n_blk
        FROM ranked GROUP BY trt
    ),
    stat AS (
        SELECT CAST(any_value(n_blk) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT)         AS k,
               floor((12.0 / (any_value(n_blk) * count(*) * (count(*) + 1))
                      * sum(rsum * rsum)
                      - 3 * any_value(n_blk) * (count(*) + 1))
                     * 1e6 + 0.5) / 1e6         AS chi2_r
        FROM sums
    )
    SELECT s.trt, s.rsum, st.n, st.k, st.chi2_r
    FROM sums s CROSS JOIN stat st
    ORDER BY s.trt
    """,
)
def analytics_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test: do the event types maintain a consistent
    value ordering across day blocks?  Within each complete day, the
    per-type mean values are ranked (a PARTITIONED window — never a
    global sort); chi2_F = 12/(n k (k+1)) * sum R_j^2 - 3 n (k+1) —
    the repeated-measures companion to Kruskal-Wallis, for when the
    same treatments are observed in every block.

    Determinism: per-cell means are identical doubles on both engines
    (same sums of the same values within a (day, type) cell — the
    cell aggregate is the grain, not a sample), ranks are integers
    with dense tie semantics shared by both engines, rank sums are
    exact integers, and the statistic is a fixed-order rational over
    them.

    Scale shape: one (day, type) cell aggregate, day-partitioned
    windows over a calendar-bounded cell table, type-grain rank sums."""
    ev = load(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("blk"),
        F.col("event_type").alias("trt"),
    ).agg(F.avg("value").alias("v"))
    k_types = ev.select("event_type").distinct().count()
    full_blocks = (
        cell.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == k_types)
        .select("blk")
    )
    ranked = cell.join(F.broadcast(full_blocks), "blk").withColumn(
        "r", F.rank().over(Window.partitionBy("blk").orderBy("v"))
    )
    sums = ranked.groupBy("trt").agg(
        F.sum("r").cast("long").alias("rsum"),
        F.count(F.lit(1)).cast("long").alias("n_blk"),
    )
    stat = sums.agg(
        F.first("n_blk").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        _canon6(
            F.lit(12.0)
            / (F.first("n_blk") * F.count(F.lit(1)) * (F.count(F.lit(1)) + 1))
            * F.sum(F.col("rsum") * F.col("rsum"))
            - 3 * F.first("n_blk") * (F.count(F.lit(1)) + 1)
        ).alias("chi2_r"),
    )
    return (
        sums.select("trt", "rsum")
        .crossJoin(F.broadcast(stat))
        .orderBy("trt")
    )


@register(
    "analytics_decision_stump",
    oracle="""
    WITH lab AS (
        SELECT CAST(o_totalprice AS DOUBLE) AS x,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    qs AS (
        SELECT quantile_cont(x, [0.1, 0.2, 0.3, 0.4, 0.5,
                                 0.6, 0.7, 0.8, 0.9]) AS q
        FROM lab
    ),
    th AS (
        SELECT k, q[k] AS t FROM qs, unnest(range(1, 10)) AS r(k)
    ),
    split AS (
        SELECT th.k, any_value(th.t) AS t,
               CAST(count(*) AS BIGINT)                         AS n,
               CAST(sum(CASE WHEN lab.x <= th.t THEN 1 ELSE 0 END)
                    AS BIGINT)                                  AS n_left,
               CAST(sum(CASE WHEN lab.x <= th.t THEN lab.y ELSE 0 END)
                    AS BIGINT)                                  AS pos_left,
               CAST(sum(lab.y) AS BIGINT)                       AS pos
        FROM lab CROSS JOIN th
        GROUP BY th.k
    ),
    scored AS (
        SELECT k, floor(t * 1e2 + 0.5) / 1e2 AS threshold_r, n_left,
               floor((
                   (n_left * 1.0 / n)
                   * (1 - pow(pos_left * 1.0 / n_left, 2)
                        - pow(1 - pos_left * 1.0 / n_left, 2))
                   + ((n - n_left) * 1.0 / n)
                   * (1 - pow((pos - pos_left) * 1.0 / (n - n_left), 2)
                        - pow(1 - (pos - pos_left) * 1.0 / (n - n_left), 2))
               ) * 1e6 + 0.5) / 1e6 AS gini_r
        FROM split
        WHERE n_left > 0 AND n_left < n
    )
    SELECT CAST(k AS BIGINT) AS k, threshold_r, n_left, gini_r,
           gini_r = min(gini_r) OVER () AS is_best
    FROM scored
    ORDER BY k
    """,
)
def analytics_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump training (the depth-1 CART step): sweep the
    nine decile thresholds of order total, score each split by
    weighted Gini impurity against the urgent-priority label, flag
    the argmin — the primitive inside every tree ensemble's split
    finder, and on its own the fastest 'is this feature predictive
    at all' probe.

    Determinism: thresholds are exact interpolated deciles (identical
    doubles both engines), split counts are exact integers, Gini is a
    fixed-order rational per threshold under the 1e-6 canon; is_best
    compares canonical values.

    Scale shape: the threshold table is 9 rows (broadcast); the sweep
    is ONE conditional-aggregate pass over the fact table (each row
    evaluates all thresholds map-side — histogram-style split
    finding, exactly how distributed GBDTs do it), never a per-
    threshold rescan."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("double").alias("x"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    ks = list(range(1, 10))
    th = o.agg(
        F.percentile("x", F.array(*[F.lit(k / 10.0) for k in ks])).alias(
            "ts"
        )
    ).select(F.posexplode("ts").alias("k0", "t")).select(
        (F.col("k0") + 1).alias("k"), "t"
    )
    split = (
        o.crossJoin(F.broadcast(th))
        .groupBy("k")
        .agg(
            F.first("t").alias("t"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("x") <= F.col("t"), 1).otherwise(0))
            .cast("long")
            .alias("n_left"),
            F.sum(F.when(F.col("x") <= F.col("t"), F.col("y")).otherwise(0))
            .cast("long")
            .alias("pos_left"),
            F.sum("y").cast("long").alias("pos"),
        )
        .filter((F.col("n_left") > 0) & (F.col("n_left") < F.col("n")))
    )
    pl = F.col("pos_left") * F.lit(1.0) / F.col("n_left")
    pr = (F.col("pos") - F.col("pos_left")) * F.lit(1.0) / (
        F.col("n") - F.col("n_left")
    )
    gini = (F.col("n_left") * F.lit(1.0) / F.col("n")) * (
        F.lit(1) - F.pow(pl, 2) - F.pow(F.lit(1) - pl, 2)
    ) + ((F.col("n") - F.col("n_left")) * F.lit(1.0) / F.col("n")) * (
        F.lit(1) - F.pow(pr, 2) - F.pow(F.lit(1) - pr, 2)
    )
    scored = split.select(
        F.col("k").cast("long").alias("k"),
        (F.floor(F.col("t") * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)).alias(
            "threshold_r"
        ),
        "n_left",
        _canon6(gini).alias("gini_r"),
    )
    wall = Window.partitionBy()
    return scored.select(
        "k",
        "threshold_r",
        "n_left",
        "gini_r",
        (F.col("gini_r") == F.min("gini_r").over(wall)).alias("is_best"),
    ).orderBy("k")


@register(
    "analytics_newsvendor_quantile",
    oracle="""
    WITH d AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day_idx,
               event_type,
               CAST(count(*) AS BIGINT) AS demand
        FROM events GROUP BY 1, 2
    ),
    q AS (
        SELECT event_type,
               quantile_cont(demand, 0.75) AS stock
        FROM d GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT)                      AS n_days,
           floor(any_value(q.stock) * 1e6 + 0.5) / 1e6   AS stock_r,
           CAST(sum(CASE WHEN d.demand > q.stock THEN 1 ELSE 0 END)
                AS BIGINT)                               AS n_stockout_days,
           floor(avg(greatest(d.demand - q.stock, 0)) * 1e6 + 0.5) / 1e6
                                                         AS avg_lost_r,
           floor(avg(greatest(q.stock - d.demand, 0)) * 1e6 + 0.5) / 1e6
                                                         AS avg_excess_r
    FROM d JOIN q ON q.event_type = d.event_type
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def analytics_newsvendor_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking by critical fractile: with underage cost 3x
    overage, the optimal stock is the 3/(3+1) = 0.75 demand quantile
    per event type; the report shows the resulting stockout-day count
    and the average lost/excess units — the quantile-not-mean
    provisioning answer (a mean-based stock is systematically wrong
    under asymmetric costs).

    Determinism: daily demands are integers, the exact interpolated
    quantile picks identical middle doubles, and the over/under
    averages are rationals over exact integer-derived values, canon
    at 1e-6.

    Scale shape: day-grain count, per-type quantile (broadcast back),
    one conditional aggregate — all map-side combinable except the
    series-sized exact quantile (approx_percentile at multi-year
    scale, as documented for the sibling exact quantiles)."""
    ev = load(spark, sf_dir, "events")
    d = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day_idx"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("demand"))
    q = d.groupBy("event_type").agg(
        F.percentile("demand", F.lit(0.75)).alias("stock")
    )
    return (
        d.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            _canon6(F.first("stock")).alias("stock_r"),
            F.sum(F.when(F.col("demand") > F.col("stock"), 1).otherwise(0))
            .cast("long")
            .alias("n_stockout_days"),
            _canon6(
                F.avg(F.greatest(F.col("demand") - F.col("stock"), F.lit(0.0)))
            ).alias("avg_lost_r"),
            _canon6(
                F.avg(F.greatest(F.col("stock") - F.col("demand"), F.lit(0.0)))
            ).alias("avg_excess_r"),
        )
        .orderBy("event_type")
    )


@register(
    "analytics_queueing_mm1",
    oracle="""
    WITH hourly AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
               event_type,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    lam AS (
        SELECT event_type,
               sum(n) * 1.0 / count(*) AS lam
        FROM hourly GROUP BY event_type
    )
    SELECT event_type,
           floor(lam * 1e6 + 0.5) / 1e6                   AS lambda_r,
           floor(lam / 12.0 * 1e6 + 0.5) / 1e6            AS rho_r,
           floor(lam / 12.0 * lam / 12.0 / (1 - lam / 12.0)
                 * 1e6 + 0.5) / 1e6                       AS lq_r,
           floor((lam / 12.0 * lam / 12.0 / (1 - lam / 12.0)) / lam
                 * 3600 * 1e6 + 0.5) / 1e6                AS wq_seconds_r
    FROM lam
    ORDER BY event_type
    """,
)
def analytics_queueing_mm1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M/M/1 queueing metrics from the measured arrival process: per
    event type, the observed hourly arrival rate lambda, utilization
    rho = lambda/mu against a mu = 12/hour service-rate assumption,
    the Pollaczek-style queue length Lq = rho^2/(1-rho), and the
    waiting time Wq = Lq/lambda (Little's law) in seconds — the
    back-of-envelope capacity model that turns a measured rate into
    'how much headroom is left before the queue explodes'.

    Determinism: lambda is a ratio of exact integers (mean of hourly
    counts over observed hours); every downstream transform is a
    fixed-order rational, canon at 1e-6.

    Scale shape: one hour-grain count plus a type-grain mean —
    map-side combinable end to end."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hr"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    lam_df = hourly.groupBy("event_type").agg(
        (F.sum("n") * F.lit(1.0) / F.count(F.lit(1))).alias("lam")
    )
    rho = F.col("lam") / F.lit(12.0)
    lq = rho * rho / (F.lit(1) - rho)
    return lam_df.select(
        "event_type",
        _canon6(F.col("lam")).alias("lambda_r"),
        _canon6(rho).alias("rho_r"),
        _canon6(lq).alias("lq_r"),
        _canon6(lq / F.col("lam") * F.lit(3600)).alias("wq_seconds_r"),
    ).orderBy("event_type")


@register(
    "analytics_weibull_lead_time",
    oracle="""
    WITH per_order AS (
        SELECT o.o_orderkey,
               CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                             CAST(min(l.l_shipdate) AS DATE)) AS BIGINT)
                   AS lead_days
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderdate
    ),
    bins AS (
        SELECT lead_days, CAST(count(*) AS BIGINT) AS n_d
        FROM per_order WHERE lead_days > 0 GROUP BY lead_days
    ),
    ecdf AS (
        SELECT lead_days, n_d,
               sum(n_d) OVER (ORDER BY lead_days
                              ROWS UNBOUNDED PRECEDING) AS cum,
               sum(n_d) OVER () AS n
        FROM bins
    ),
    pts AS (
        SELECT n_d,
               ln(CAST(lead_days AS DOUBLE))                    AS x,
               ln(-ln(1 - (cum - 0.5 * n_d) / (n + 0.25)))      AS y
        FROM ecdf
    ),
    fit AS (
        SELECT CAST(sum(n_d) AS BIGINT)  AS n,
               CAST(count(*) AS BIGINT)  AS n_bins,
               (sum(n_d * x * y) - sum(n_d * x) * sum(n_d * y) / sum(n_d))
               / (sum(n_d * x * x) - sum(n_d * x) * sum(n_d * x) / sum(n_d))
                   AS k
        FROM pts
    ),
    icept AS (
        SELECT f.n, f.n_bins, f.k,
               (sum(p.n_d * p.y) - f.k * sum(p.n_d * p.x)) / sum(p.n_d) AS b
        FROM pts p CROSS JOIN fit f
        GROUP BY f.n, f.n_bins, f.k
    )
    SELECT n, n_bins,
           floor(k * 1e6 + 0.5) / 1e6            AS shape_r,
           floor(exp(-b / k) * 1e6 + 0.5) / 1e6  AS scale_days_r
    FROM icept
    """,
)
def analytics_weibull_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull fit of order lead times (order date -> first ship) by
    median-rank regression over the BINNED ECDF: ln(-ln(1-F)) =
    k*ln(t) - k*ln(lambda), weighted least squares over integer-day
    bins with the half-bin continuity correction — shape k < 1 means
    infant-mortality-style lead times (most orders ship fast, a long
    tail doesn't), k > 1 wear-out-style; lambda is the 63.2%
    characteristic lead time. The reliability-engineering summary a
    fulfillment SLA is written against.

    Determinism: day bins and cumulative counts are exact integers;
    ln/exp land on shared rationals (canon absorbs ulp); the weighted
    OLS is a fixed-order rational over bin sums.

    Scale shape — why binned: per-order ranks would be a data-sized
    global sort; the ECDF over integer-day bins is CALENDAR-bounded
    (a few hundred rows at any SF), so after the order-grain
    aggregate everything is model-sized. This is the binned-fit
    pattern production reliability pipelines use."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("od")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("sd")
    )
    per_order = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "od")
        .agg(F.min("sd").alias("first_ship"))
        .select(
            F.datediff("first_ship", "od").cast("long").alias("lead_days")
        )
        .filter(F.col("lead_days") > 0)
    )
    bins = per_order.groupBy("lead_days").agg(
        F.count(F.lit(1)).cast("long").alias("n_d")
    )
    w_cum = Window.orderBy("lead_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    ecdf = bins.select(
        "lead_days",
        "n_d",
        F.sum("n_d").over(w_cum).alias("cum"),
        F.sum("n_d").over(w_all).alias("n"),
    )
    pts = ecdf.select(
        "n_d",
        F.log(F.col("lead_days").cast("double")).alias("x"),
        F.log(
            -F.log(
                F.lit(1)
                - (F.col("cum") - 0.5 * F.col("n_d"))
                / (F.col("n") + F.lit(0.25))
            )
        ).alias("y"),
    )
    fit = pts.agg(
        F.sum("n_d").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        (
            (
                F.sum(F.col("n_d") * F.col("x") * F.col("y"))
                - F.sum(F.col("n_d") * F.col("x"))
                * F.sum(F.col("n_d") * F.col("y"))
                / F.sum("n_d")
            )
            / (
                F.sum(F.col("n_d") * F.col("x") * F.col("x"))
                - F.sum(F.col("n_d") * F.col("x"))
                * F.sum(F.col("n_d") * F.col("x"))
                / F.sum("n_d")
            )
        ).alias("k"),
    )
    icept = (
        pts.crossJoin(F.broadcast(fit))
        .groupBy("n", "n_bins", "k")
        .agg(
            (
                (
                    F.sum(F.col("n_d") * F.col("y"))
                    - F.col("k") * F.sum(F.col("n_d") * F.col("x"))
                )
                / F.sum("n_d")
            ).alias("b")
        )
    )
    return icept.select(
        "n",
        "n_bins",
        _canon6(F.col("k")).alias("shape_r"),
        _canon6(F.exp(-F.col("b") / F.col("k"))).alias("scale_days_r"),
    )


@register(
    "analytics_segment_migration_matrix",
    oracle="""
    WITH bounds AS (
        SELECT min(o_orderdate) AS d0,
               min(o_orderdate) + (max(o_orderdate) - min(o_orderdate)) / 2
                   AS mid
        FROM orders
    ),
    halves AS (
        SELECT o.o_custkey,
               CASE WHEN o.o_orderdate < b.mid THEN 1 ELSE 2 END AS half,
               sum(o.o_totalprice) AS spend
        FROM orders o, bounds b
        GROUP BY o.o_custkey, CASE WHEN o.o_orderdate < b.mid
                                   THEN 1 ELSE 2 END
    ),
    cuts AS (
        SELECT half,
               quantile_cont(spend, 1.0 / 3) AS c1,
               quantile_cont(spend, 2.0 / 3) AS c2
        FROM halves GROUP BY half
    ),
    seg AS (
        SELECT h.o_custkey, h.half,
               CASE WHEN h.spend <= c.c1 THEN 'BRONZE'
                    WHEN h.spend <= c.c2 THEN 'SILVER'
                    ELSE 'GOLD' END AS segment
        FROM halves h JOIN cuts c ON c.half = h.half
    ),
    m AS (
        SELECT COALESCE(a.segment, 'ABSENT') AS seg_h1,
               COALESCE(b.segment, 'ABSENT') AS seg_h2,
               COALESCE(a.o_custkey, b.o_custkey) AS ck
        FROM (SELECT * FROM seg WHERE half = 1) a
        FULL OUTER JOIN (SELECT * FROM seg WHERE half = 2) b
          ON a.o_custkey = b.o_custkey
    )
    SELECT seg_h1, seg_h2,
           CAST(count(*) AS BIGINT) AS n_customers,
           floor(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY seg_h1)
                 * 1e6 + 0.5) / 1e6 AS row_share_r
    FROM m
    GROUP BY seg_h1, seg_h2
    ORDER BY seg_h1, seg_h2
    """,
)
def analytics_segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-segment migration matrix: tercile spend segments
    (BRONZE/SILVER/GOLD, cut per half so the segmentation is
    relative) computed independently for the first and second half of
    the observed period, then the H1->H2 transition counts with
    row-normalized shares — the churn/upgrade diagonal every
    retention review starts from; ABSENT rows capture acquisition
    and full churn.

    Determinism: the half split uses pure timestamp-interval midpoint
    arithmetic (identical instants both engines); spend sums are
    money; tercile cuts are exact interpolated quantiles; strict <=
    comparisons on identical doubles; counts exact, shares canon 1e-6.

    Scale shape: one (customer, half) aggregate, per-half quantile
    cuts broadcast back, one self-FULL-OUTER join co-keyed on
    customer (bucketable), and a 16-cell rollup."""
    o = load(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_orderdate").alias("d0"), F.max("o_orderdate").alias("d1")
    ).select(
        F.col("d0"),
        (
            F.col("d0")
            + F.make_dt_interval(
                days=F.datediff(F.col("d1"), F.col("d0")) / 2
            )
        ).alias("mid"),
    )
    halves = (
        o.crossJoin(F.broadcast(bounds))
        .select(
            "o_custkey",
            F.when(F.col("o_orderdate") < F.col("mid"), 1)
            .otherwise(2)
            .alias("half"),
            "o_totalprice",
        )
        .groupBy("o_custkey", "half")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    cuts = halves.groupBy("half").agg(
        F.percentile("spend", F.lit(1.0 / 3)).alias("c1"),
        F.percentile("spend", F.lit(2.0 / 3)).alias("c2"),
    )
    seg = halves.join(F.broadcast(cuts), "half").select(
        "o_custkey",
        "half",
        F.when(F.col("spend") <= F.col("c1"), "BRONZE")
        .when(F.col("spend") <= F.col("c2"), "SILVER")
        .otherwise("GOLD")
        .alias("segment"),
    )
    a = seg.filter(F.col("half") == 1).select(
        F.col("o_custkey").alias("ck_a"), F.col("segment").alias("sa")
    )
    b = seg.filter(F.col("half") == 2).select(
        F.col("o_custkey").alias("ck_b"), F.col("segment").alias("sb")
    )
    m = a.join(b, a["ck_a"] == b["ck_b"], "full_outer").select(
        F.coalesce(F.col("sa"), F.lit("ABSENT")).alias("seg_h1"),
        F.coalesce(F.col("sb"), F.lit("ABSENT")).alias("seg_h2"),
    )
    w_row = Window.partitionBy("seg_h1")
    return (
        m.groupBy("seg_h1", "seg_h2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .select(
            "seg_h1",
            "seg_h2",
            "n_customers",
            (
                F.floor(
                    F.col("n_customers")
                    * F.lit(1.0)
                    / F.sum("n_customers").over(w_row)
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("row_share_r"),
        )
        .orderBy("seg_h1", "seg_h2")
    )


@register(
    "analytics_abc_xyz_matrix",
    oracle="""
    WITH weekly AS (
        SELECT l_partkey,
               CAST(datediff('day', DATE '1969-12-29',
                             CAST(l_shipdate AS DATE)) // 7 AS BIGINT) AS wk,
               sum(l_quantity) AS qty,
               sum(l_extendedprice) AS rev
        FROM lineitem GROUP BY 1, 2
    ),
    per_part AS (
        SELECT l_partkey,
               round(sum(rev), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_weeks,
               sum(qty) AS s1, sum(qty * qty) AS s2
        FROM weekly GROUP BY l_partkey
    ),
    xyz AS (
        SELECT l_partkey, revenue,
               CASE WHEN n_weeks < 2 THEN 'Z'
                    WHEN sqrt((s2 - s1 * s1 / n_weeks)
                              / (n_weeks - 1)) / (s1 / n_weeks) < 0.5
                        THEN 'X'
                    WHEN sqrt((s2 - s1 * s1 / n_weeks)
                              / (n_weeks - 1)) / (s1 / n_weeks) < 1.0
                        THEN 'Y'
                    ELSE 'Z' END AS xyz_class
        FROM per_part
    ),
    abc AS (
        SELECT l_partkey, xyz_class,
               CASE WHEN (sum(revenue) OVER (ORDER BY revenue DESC,
                                             l_partkey))
                         / (sum(revenue) OVER ()) <= 0.8 THEN 'A'
                    WHEN (sum(revenue) OVER (ORDER BY revenue DESC,
                                             l_partkey))
                         / (sum(revenue) OVER ()) <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM xyz
    )
    SELECT abc_class, xyz_class,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM abc
    GROUP BY abc_class, xyz_class
    ORDER BY abc_class, xyz_class
    """,
)
def analytics_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/XYZ inventory classification matrix: ABC by cumulative
    revenue contribution (80/95 Pareto cuts, as in
    `analytics_abc_classification`) crossed with XYZ by weekly-demand
    variability (coefficient of variation < 0.5 / < 1 / else, Z for
    single-week parts) — the 9-cell planning grid (AX = automate
    replenishment, CZ = make-to-order) every supply-chain review is
    organized around.

    Determinism: weekly demand sums use the same Monday-anchored
    date-native week index as `date_business_days_between`; CV comes
    from exact closed-form moments of integer quantities; the Pareto
    window orders by 2dp-rounded revenue with partkey tie-break —
    cell counts are exact integers, no float edge at all.

    Scale shape: two part-grain aggregates (weekly then per-part);
    the ABC scan is a window over the PART dimension, not the fact
    table (the bounded-window guard's Aggregate rule); the edge is a
    9-row matrix."""
    li = load(spark, sf_dir, "lineitem")
    weekly = li.groupBy(
        "l_partkey",
        F.expr(
            "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1969-12-29')"
            " DIV 7 AS BIGINT)"
        ).alias("wk"),
    ).agg(
        F.sum("l_quantity").alias("qty"),
        F.sum("l_extendedprice").alias("rev"),
    )
    per_part = weekly.groupBy("l_partkey").agg(
        F.round(F.sum("rev"), 2).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_weeks"),
        F.sum("qty").alias("s1"),
        F.sum(F.col("qty") * F.col("qty")).alias("s2"),
    )
    cv = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_weeks"))
        / (F.col("n_weeks") - 1)
    ) / (F.col("s1") / F.col("n_weeks"))
    xyz = per_part.select(
        "l_partkey",
        "revenue",
        F.when(F.col("n_weeks") < 2, "Z")
        .when(cv < 0.5, "X")
        .when(cv < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz_class"),
    )
    w_cum = Window.orderBy(F.col("revenue").desc(), "l_partkey")
    w_all = Window.partitionBy()
    share = F.sum("revenue").over(
        w_cum.rowsBetween(Window.unboundedPreceding, 0)
    ) / F.sum("revenue").over(w_all)
    abc = xyz.select(
        "xyz_class",
        F.when(share <= 0.8, "A")
        .when(share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    return (
        abc.groupBy("abc_class", "xyz_class")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
        .orderBy("abc_class", "xyz_class")
    )


@register(
    "analytics_two_way_anova",
    oracle="""
    WITH cell AS (
        SELECT l_returnflag AS fa, l_linestatus AS fb,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(l_extendedprice AS DOUBLE)) AS s1,
               sum(CAST(l_extendedprice AS DOUBLE)
                   * CAST(l_extendedprice AS DOUBLE)) AS s2
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    ),
    tot AS (
        SELECT sum(n) AS n, sum(s1) AS s1, sum(s2) AS s2,
               count(*) AS n_cells,
               count(DISTINCT fa) AS a, count(DISTINCT fb) AS b
        FROM cell
    ),
    ssa AS (
        SELECT sum(s1 * s1 / n) AS term
        FROM (SELECT fa, sum(n) AS n, sum(s1) AS s1 FROM cell GROUP BY fa)
    ),
    ssb AS (
        SELECT sum(s1 * s1 / n) AS term
        FROM (SELECT fb, sum(n) AS n, sum(s1) AS s1 FROM cell GROUP BY fb)
    ),
    sscell AS (SELECT sum(s1 * s1 / n) AS term FROM cell)
    SELECT CAST(t.n AS BIGINT)                               AS n,
           CAST(t.a AS BIGINT)                               AS a_levels,
           CAST(t.b AS BIGINT)                               AS b_levels,
           floor((sa.term - t.s1 * t.s1 / t.n) / (t.a - 1)
                 / ((t.s2 - sc.term) / (t.n - t.n_cells))
                 * 1e6 + 0.5) / 1e6                          AS f_a_r,
           floor((sb.term - t.s1 * t.s1 / t.n) / (t.b - 1)
                 / ((t.s2 - sc.term) / (t.n - t.n_cells))
                 * 1e6 + 0.5) / 1e6                          AS f_b_r,
           floor((sc.term - sa.term - sb.term + t.s1 * t.s1 / t.n)
                 / ((t.a - 1) * (t.b - 1))
                 / ((t.s2 - sc.term) / (t.n - t.n_cells))
                 * 1e6 + 0.5) / 1e6                          AS f_ab_r
    FROM tot t, ssa sa, ssb sb, sscell sc
    """,
)
def analytics_two_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way ANOVA with interaction (unbalanced Type-I on the cell
    sums): does extended price vary by return flag, by line status,
    and — the question one-way ANOVA can't ask — by their
    INTERACTION?  F_A, F_B, F_AB from the classic sum-of-squares
    identities (SS via the cell/margin/grand 'correction term'
    algebra), MS_error from within-cell variation.

    Determinism: everything reduces to per-cell (n, sum, sum-sq) —
    one map-side-combinable aggregate; margins and F's are fixed-
    order rationals over those sums, canonicalized at 1e-6.

    Scale shape: the only data-sized pass is the |A|x|B|-cell moment
    aggregate; every SS is arithmetic over the 6-cell table."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("fa"),
        F.col("l_linestatus").alias("fb"),
        F.col("l_extendedprice").cast("double").alias("x"),
    )
    cell = li.groupBy("fa", "fb").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    tot = cell.agg(
        F.sum("n").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
        F.count(F.lit(1)).alias("n_cells"),
        F.countDistinct("fa").alias("a"),
        F.countDistinct("fb").alias("b"),
    )
    ssa = (
        cell.groupBy("fa")
        .agg(F.sum("n").alias("n"), F.sum("s1").alias("s1"))
        .agg(F.sum(F.col("s1") * F.col("s1") / F.col("n")).alias("term_a"))
    )
    ssb = (
        cell.groupBy("fb")
        .agg(F.sum("n").alias("n"), F.sum("s1").alias("s1"))
        .agg(F.sum(F.col("s1") * F.col("s1") / F.col("n")).alias("term_b"))
    )
    sscell = cell.agg(
        F.sum(F.col("s1") * F.col("s1") / F.col("n")).alias("term_c")
    )
    j = (
        tot.crossJoin(F.broadcast(ssa))
        .crossJoin(F.broadcast(ssb))
        .crossJoin(F.broadcast(sscell))
    )
    corr = F.col("s1") * F.col("s1") / F.col("n")
    mse = (F.col("s2") - F.col("term_c")) / (F.col("n") - F.col("n_cells"))
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("a").cast("long").alias("a_levels"),
        F.col("b").cast("long").alias("b_levels"),
        _canon6((F.col("term_a") - corr) / (F.col("a") - 1) / mse).alias(
            "f_a_r"
        ),
        _canon6((F.col("term_b") - corr) / (F.col("b") - 1) / mse).alias(
            "f_b_r"
        ),
        _canon6(
            (F.col("term_c") - F.col("term_a") - F.col("term_b") + corr)
            / ((F.col("a") - 1) * (F.col("b") - 1))
            / mse
        ).alias("f_ab_r"),
    )


@register(
    "analytics_james_stein_shrinkage",
    oracle="""
    WITH seg AS (
        SELECT c_nationkey,
               CAST(count(*) AS BIGINT) AS n,
               sum(CAST(c_acctbal AS DOUBLE)) AS s1,
               sum(CAST(c_acctbal AS DOUBLE)
                   * CAST(c_acctbal AS DOUBLE)) AS s2
        FROM customer GROUP BY c_nationkey
    ),
    g AS (
        SELECT sum(s1) / sum(n) AS grand,
               sum(s2 - s1 * s1 / n) / (sum(n) - count(*)) AS var_within,
               count(*) AS k
        FROM seg
    ),
    tau AS (
        SELECT greatest(
                   sum(s.n * (s.s1 / s.n - g.grand)
                           * (s.s1 / s.n - g.grand))
                   / (any_value(g.k) - 1), 1e-9) AS tau2
        FROM seg s, g
    )
    SELECT seg.c_nationkey, seg.n,
           floor(seg.s1 / seg.n * 1e4 + 0.5) / 1e4 AS raw_mean_r,
           floor((g.grand
                  + (1 - (g.var_within / seg.n)
                         / ((g.var_within / seg.n) + tau.tau2))
                    * (seg.s1 / seg.n - g.grand))
                 * 1e4 + 0.5) / 1e4 AS shrunk_mean_r
    FROM seg, g, tau
    ORDER BY seg.c_nationkey
    """,
)
def analytics_james_stein_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes (James-Stein-style) shrinkage of per-nation mean
    account balances toward the grand mean: each segment's estimate
    moves by the reliability factor B = tau2 / (tau2 + var_within/n)
    with tau2 the weighted between-segment variance — small/noisy
    segments shrink hard, big ones barely move. The 'winner's curse'
    correction every segment-level league table needs before anyone
    acts on the top cell.

    Determinism: all moments are one conditional-aggregate pass;
    grand mean, within/between variances, and the shrunk means are
    fixed-order rationals canonicalized at 1e-4 (balance scale).

    Scale shape: one segment-grain moment aggregate + broadcast 1-row
    hyperparameters; the shrinkage is a per-segment projection."""
    c = load(spark, sf_dir, "customer").select(
        "c_nationkey", F.col("c_acctbal").cast("double").alias("x")
    )
    seg = c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    g = seg.agg(
        (F.sum("s1") / F.sum("n")).alias("grand"),
        (
            F.sum(F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.sum("n") - F.count(F.lit(1)))
        ).alias("var_within"),
        F.count(F.lit(1)).alias("k"),
    )
    tau = (
        seg.crossJoin(F.broadcast(g))
        .agg(
            F.greatest(
                F.sum(
                    F.col("n")
                    * (F.col("s1") / F.col("n") - F.col("grand"))
                    * (F.col("s1") / F.col("n") - F.col("grand"))
                )
                / (F.first("k") - 1),
                F.lit(1e-9),
            ).alias("tau2")
        )
    )
    c4 = lambda col: F.floor(col * F.lit(1e4) + F.lit(0.5)) / F.lit(1e4)
    m = F.col("s1") / F.col("n")
    b_rel = F.lit(1) - (F.col("var_within") / F.col("n")) / (
        F.col("var_within") / F.col("n") + F.col("tau2")
    )
    return (
        seg.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(tau))
        .select(
            "c_nationkey",
            "n",
            c4(m).alias("raw_mean_r"),
            c4(F.col("grand") + b_rel * (m - F.col("grand"))).alias(
                "shrunk_mean_r"
            ),
        )
        .orderBy("c_nationkey")
    )


@register(
    "analytics_effect_size_suite",
    oracle="""
    WITH g AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 'T' ELSE 'C' END AS grp,
               value AS x
        FROM events WHERE event_type IN ('purchase', 'view')
    ),
    m AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n,
               sum(x) AS s1, sum(x * x) AS s2
        FROM g GROUP BY grp
    ),
    w AS (
        SELECT max(CASE WHEN grp = 'T' THEN n END)  AS nt,
               max(CASE WHEN grp = 'C' THEN n END)  AS nc,
               max(CASE WHEN grp = 'T' THEN s1 END) AS st1,
               max(CASE WHEN grp = 'C' THEN s1 END) AS sc1,
               max(CASE WHEN grp = 'T' THEN s2 END) AS st2,
               max(CASE WHEN grp = 'C' THEN s2 END) AS sc2
        FROM m
    ),
    hist AS (
        SELECT x,
               sum(CASE WHEN grp = 'T' THEN 1 ELSE 0 END) AS t_cnt,
               sum(CASE WHEN grp = 'C' THEN 1 ELSE 0 END) AS c_cnt
        FROM g GROUP BY x
    ),
    cum AS (
        SELECT x, t_cnt, c_cnt,
               COALESCE(sum(c_cnt) OVER (ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS c_below
        FROM hist
    ),
    cliff AS (
        SELECT sum(t_cnt * (c_below + 0.5 * c_cnt)) AS u_stat
        FROM cum
    )
    SELECT w.nt, w.nc,
           floor((w.st1 / w.nt - w.sc1 / w.nc)
                 / sqrt(((w.st2 - w.st1 * w.st1 / w.nt)
                         + (w.sc2 - w.sc1 * w.sc1 / w.nc))
                        / (w.nt + w.nc - 2))
                 * 1e6 + 0.5) / 1e6 AS cohens_d_r,
           floor((w.st1 / w.nt - w.sc1 / w.nc)
                 / sqrt(((w.st2 - w.st1 * w.st1 / w.nt)
                         + (w.sc2 - w.sc1 * w.sc1 / w.nc))
                        / (w.nt + w.nc - 2))
                 * (1 - 3.0 / (4 * (w.nt + w.nc) - 9))
                 * 1e6 + 0.5) / 1e6 AS hedges_g_r,
           floor((w.st1 / w.nt - w.sc1 / w.nc)
                 / sqrt((w.sc2 - w.sc1 * w.sc1 / w.nc) / (w.nc - 1))
                 * 1e6 + 0.5) / 1e6 AS glass_delta_r,
           floor((2 * cliff.u_stat - w.nt * w.nc) / (1.0 * w.nt * w.nc)
                 * 1e6 + 0.5) / 1e6 AS cliffs_delta_r
    FROM w, cliff
    """,
)
def analytics_effect_size_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effect-size suite for the purchase-vs-view value comparison:
    Cohen's d (pooled SD), Hedges' g (small-sample bias correction),
    Glass's delta (control-SD denominator), and Cliff's delta (the
    distribution-free P(x>y) - P(x<y)) — the 'is it LARGE, not just
    significant' numbers that belong next to every p-value the t-test
    family emits.

    Determinism: moment statistics are fixed-order rationals over one
    conditional-aggregate pass; Cliff's delta is an exact integer
    ratio from the pair comparison; all canon at 1e-6.

    Scale shape: moments are map-side combinable; Cliff's delta is
    computed through the EXACT rank identity delta = 2U/(n_t n_c) - 1
    with midrank U accumulated from the value-grain histogram
    (U = sum over values of t_cnt * (C below + 0.5 * C at value)) —
    identical to the all-pairs definition including ties, but linear
    in the histogram instead of quadratic in rows (the direct
    cross-join measured 8.3 s at sf0.1 and was rejected per the
    sf0.1 spot-timing rule); the cumulative window runs over the
    Aggregate-bounded histogram."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    g = ev.select(
        F.when(F.col("event_type") == "purchase", "T")
        .otherwise("C")
        .alias("grp"),
        F.col("value").alias("x"),
    )
    m = g.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    w = m.agg(
        F.max(F.when(F.col("grp") == "T", F.col("n"))).alias("nt"),
        F.max(F.when(F.col("grp") == "C", F.col("n"))).alias("nc"),
        F.max(F.when(F.col("grp") == "T", F.col("s1"))).alias("st1"),
        F.max(F.when(F.col("grp") == "C", F.col("s1"))).alias("sc1"),
        F.max(F.when(F.col("grp") == "T", F.col("s2"))).alias("st2"),
        F.max(F.when(F.col("grp") == "C", F.col("s2"))).alias("sc2"),
    )
    hist = g.groupBy("x").agg(
        F.sum(F.when(F.col("grp") == "T", 1).otherwise(0)).alias("t_cnt"),
        F.sum(F.when(F.col("grp") == "C", 1).otherwise(0)).alias("c_cnt"),
    )
    w_cum = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.select(
        "t_cnt",
        "c_cnt",
        F.coalesce(F.sum("c_cnt").over(w_cum), F.lit(0)).alias("c_below"),
    )
    cliff = cum.agg(
        F.sum(
            F.col("t_cnt") * (F.col("c_below") + 0.5 * F.col("c_cnt"))
        ).alias("u_stat")
    )
    mean_diff = F.col("st1") / F.col("nt") - F.col("sc1") / F.col("nc")
    pooled_sd = F.sqrt(
        (
            (F.col("st2") - F.col("st1") * F.col("st1") / F.col("nt"))
            + (F.col("sc2") - F.col("sc1") * F.col("sc1") / F.col("nc"))
        )
        / (F.col("nt") + F.col("nc") - 2)
    )
    control_sd = F.sqrt(
        (F.col("sc2") - F.col("sc1") * F.col("sc1") / F.col("nc"))
        / (F.col("nc") - 1)
    )
    d = mean_diff / pooled_sd
    return (
        w.crossJoin(F.broadcast(cliff))
        .select(
            F.col("nt").cast("long").alias("nt"),
            F.col("nc").cast("long").alias("nc"),
            _canon6(d).alias("cohens_d_r"),
            _canon6(
                d * (F.lit(1) - F.lit(3.0) / (4 * (F.col("nt") + F.col("nc")) - 9))
            ).alias("hedges_g_r"),
            _canon6(mean_diff / control_sd).alias("glass_delta_r"),
            _canon6(
                (2 * F.col("u_stat") - F.col("nt") * F.col("nc"))
                / (F.lit(1.0) * F.col("nt") * F.col("nc"))
            ).alias("cliffs_delta_r"),
        )
    )


@register(
    "analytics_runs_test",
    oracle="""
    WITH daily AS (
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
               count(*) AS cnt
        FROM events GROUP BY 1
    ),
    moves AS (
        SELECT d,
               CASE WHEN cnt > lag(cnt) OVER (ORDER BY d) THEN 1
                    WHEN cnt < lag(cnt) OVER (ORDER BY d) THEN 0
               END AS up
        FROM daily
    ),
    runs AS (
        SELECT up,
               CASE WHEN lag(up) OVER (ORDER BY d) IS NULL
                         OR up <> lag(up) OVER (ORDER BY d)
                    THEN 1 ELSE 0 END AS new_run
        FROM (SELECT * FROM moves WHERE up IS NOT NULL) t
    ),
    s AS (
        SELECT CAST(sum(new_run) AS BIGINT)              AS r,
               CAST(sum(up) AS BIGINT)                   AS n_up,
               CAST(count(*) - sum(up) AS BIGINT)        AS n_down
        FROM runs
    )
    SELECT r, n_up, n_down,
           floor((2.0 * n_up * n_down / (n_up + n_down) + 1)
                 * 1e6 + 0.5) / 1e6 AS expected_r,
           floor((r - (2.0 * n_up * n_down / (n_up + n_down) + 1))
                 / sqrt(2.0 * n_up * n_down
                        * (2.0 * n_up * n_down - n_up - n_down)
                        / ((n_up + n_down) * (n_up + n_down)
                           * (n_up + n_down - 1)))
                 * 1e6 + 0.5) / 1e6 AS z_r
    FROM s
    """,
)
def analytics_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on the daily-count up/down move
    sequence: too FEW runs means trending (moves cluster), too MANY
    means oscillation/over-correction — the randomness check that
    catches both, complementary to Mann-Kendall (which only sees
    monotone trend). R observed vs E[R] = 2ab/(a+b) + 1 and the
    normal approximation z.

    Determinism: moves, runs, and the a/b counts are exact integers
    from partitioned-ordered lag logic (the day series is
    calendar-bounded, so the unpartitioned windows sit on an
    Aggregate-bounded input); E[R] and z are fixed-order rationals
    under the 1e-6 canon. Ties (equal consecutive counts) drop out —
    the standard ignore-zeros convention.

    Scale shape: one day-grain count then window work over the
    series — never event-sized."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("d")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("d")
    moves = daily.select(
        "d",
        F.when(F.col("cnt") > F.lag("cnt").over(w), 1)
        .when(F.col("cnt") < F.lag("cnt").over(w), 0)
        .alias("up"),
    ).filter(F.col("up").isNotNull())
    runs = moves.select(
        "up",
        F.when(
            F.lag("up").over(w).isNull()
            | (F.col("up") != F.lag("up").over(w)),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    )
    s = runs.agg(
        F.sum("new_run").cast("long").alias("r"),
        F.sum("up").cast("long").alias("n_up"),
        (F.count(F.lit(1)) - F.sum("up")).cast("long").alias("n_down"),
    )
    a, b = F.col("n_up"), F.col("n_down")
    er = F.lit(2.0) * a * b / (a + b) + 1
    var = (
        F.lit(2.0)
        * a
        * b
        * (F.lit(2.0) * a * b - a - b)
        / ((a + b) * (a + b) * (a + b - 1))
    )
    return s.select(
        "r",
        "n_up",
        "n_down",
        _canon6(er).alias("expected_r"),
        _canon6((F.col("r") - er) / F.sqrt(var)).alias("z_r"),
    )


@register(
    "analytics_slo_burn_rate",
    oracle="""
    WITH hourly AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS errs
        FROM events GROUP BY 1
    ),
    win AS (
        SELECT hr, n, errs,
               sum(errs) OVER (ORDER BY hr
                               ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
                   AS errs_6h,
               sum(n) OVER (ORDER BY hr
                            ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
                   AS n_6h
        FROM hourly
    )
    SELECT hr,
           n, errs,
           floor(errs * 1.0 / n / 0.02 * 1e6 + 0.5) / 1e6       AS burn_1h_r,
           floor(errs_6h * 1.0 / n_6h / 0.02 * 1e6 + 0.5) / 1e6 AS burn_6h_r,
           (floor(errs * 1.0 / n / 0.02 * 1e6 + 0.5) / 1e6 > 14.4)
               AND (floor(errs_6h * 1.0 / n_6h / 0.02 * 1e6 + 0.5) / 1e6
                    > 6.0) AS page_alert
    FROM win
    ORDER BY hr
    """,
)
def analytics_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn rate with multiwindow alerting (the
    Google SRE workbook policy): with a 2% error SLO, burn rate =
    observed error ratio / budget; the page fires only when BOTH the
    fast window (1h, threshold 14.4x) and the slow window (6h,
    threshold 6x) burn hot — the AND is what kills both
    flappy-spike pages and slow-leak blindness.

    Determinism: hourly error/total counts are exact integers; burn
    ratios are exact rationals canonicalized at 1e-6; the alert
    conjunction compares canonical values against the policy
    literals.

    Scale shape: one hour-grain conditional aggregate; the sliding
    6-hour sums are windows over the calendar-bounded hourly series
    (Aggregate-bounded input, per the plan guard)."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("errs"),
    )
    w6 = Window.orderBy("hr").rowsBetween(-5, 0)
    win = hourly.select(
        "hr",
        "n",
        "errs",
        F.sum("errs").over(w6).alias("errs_6h"),
        F.sum("n").over(w6).alias("n_6h"),
    )
    b1 = _canon6(F.col("errs") * F.lit(1.0) / F.col("n") / F.lit(0.02))
    b6 = _canon6(
        F.col("errs_6h") * F.lit(1.0) / F.col("n_6h") / F.lit(0.02)
    )
    return win.select(
        "hr",
        "n",
        "errs",
        b1.alias("burn_1h_r"),
        b6.alias("burn_6h_r"),
        ((b1 > F.lit(14.4)) & (b6 > F.lit(6.0))).alias("page_alert"),
    ).orderBy("hr")
