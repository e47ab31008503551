"""Geospatial-lite operators — haversine distance, grid-cell density,
and a grid-bucketed radius join (the spatial-binning pattern that
replaces O(n^2) distance joins at scale).

Points are synthesized deterministically from the TPC-H keys (no
geometry columns exist in the fixtures): latitudes in [-45, 45) and
longitudes in [-90, 90) via integer affine maps, so both engines
derive bit-identical coordinates and the fixtures stay the only
input. The restricted ranges keep the neighbor-cell stencil exact
(no antimeridian wrap, bounded lon-degree width of the search
radius).

Reference parity note: the reference (/root/reference, a Lisp STM
task-scheduling library) has no spatial layer; these are target-layer
operators (SURVEY.md §2B extension families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_task_spark.registry import register
from hive_task_spark.functions.exact import cents as _cents
from hive_task_spark.tables import load

# Affine point synthesis (shared by every geo query; SQL twins inline).
_CUST_LAT = "((c_custkey * 37) % 9000) / 100.0 - 45"
_CUST_LON = "((c_custkey * 73) % 18000) / 100.0 - 90"
_SUPP_LAT = "((s_suppkey * 53) % 9000) / 100.0 - 45"
_SUPP_LON = "((s_suppkey * 97) % 18000) / 100.0 - 90"

# Haversine great-circle distance in km (R = 6371.0).
_HAV = (
    "2 * 6371.0 * asin(sqrt("
    "pow(sin(radians({lat2} - {lat1}) / 2), 2)"
    " + cos(radians({lat1})) * cos(radians({lat2}))"
    " * pow(sin(radians({lon2} - {lon1}) / 2), 2)))"
)


@register(
    "geo_grid_density",
    oracle=f"""
    WITH pts AS (
        SELECT CAST(floor(({_CUST_LAT}) / 5) AS BIGINT) AS cell_lat,
               CAST(floor(({_CUST_LON}) / 5) AS BIGINT) AS cell_lon,
               c_acctbal
        FROM customer
    )
    SELECT cell_lat, cell_lon,
           CAST(count(*) AS BIGINT) AS n_points,
           floor(CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                      * 100 AS DOUBLE)
                 / count(*) + 0.5) / 1e4 AS avg_balance_r
    FROM pts GROUP BY cell_lat, cell_lon
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density aggregation: bucket synthesized customer points
    into 5-degree grid cells and aggregate count + average balance per
    cell. The cell key is a closed-form floor of the coordinates —
    a pure map expression, so the whole query is one hash aggregate
    on the cell key (map-side combinable); this is the zoom-level
    tile aggregation a geo dashboard runs, and it scales like any
    groupBy.

    Determinism (r16): the 4dp average is computed as an exact
    integer CENTS sum per cell (2dp money decodes to BIGINT cents
    loss-free) followed by one identical FP division —
    floor(sum_cents*100/n + 0.5)/1e4. A double avg + round(4) lost a
    cell at sf0.1 whose true average sat exactly on the .00005
    boundary (avg of 2dp values is a small-denominator rational, so
    boundary hits are common, and the engines' round algorithms
    disagree there); an integer sum has no summation order and the
    single division is bit-equal across engines."""
    c = load(spark, sf_dir, "customer")
    lat = F.expr(_CUST_LAT.replace("c_custkey", "c_custkey"))
    lon = F.expr(_CUST_LON)
    return (
        c.select(
            F.floor(lat / 5).cast("long").alias("cell_lat"),
            F.floor(lon / 5).cast("long").alias("cell_lon"),
            "c_acctbal",
        )
        .groupBy("cell_lat", "cell_lon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            (
                F.floor(
                    (
                        F.sum(
                            _cents(F.col("c_acctbal"))
                        )
                        * F.lit(100)
                    ).cast("double")
                    / F.count(F.lit(1))
                    + F.lit(0.5)
                )
                / F.lit(1e4)
            ).alias("avg_balance_r"),
        )
    )


@register(
    "geo_radius_join",
    oracle=f"""
    WITH c AS (
        SELECT c_custkey, {_CUST_LAT} AS clat, {_CUST_LON} AS clon
        FROM customer
    ),
    s AS (
        SELECT s_suppkey, {_SUPP_LAT} AS slat, {_SUPP_LON} AS slon
        FROM supplier
    )
    SELECT c_custkey, s_suppkey,
           round({_HAV.format(lat1="clat", lon1="clon",
                              lat2="slat", lon2="slon")}, 3) AS dist_km_r
    FROM c CROSS JOIN s
    WHERE {_HAV.format(lat1="clat", lon1="clon",
                       lat2="slat", lon2="slon")} < 500
    """,
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius join (all customer-supplier pairs within 500 km) via
    spatial binning: suppliers map to their home 5-degree cell;
    customers explode into the 3x5 neighbor stencil (lat +-1 cell =
    4.5-degree max lat separation at 500 km; lon +-2 cells = 6.35
    degrees at the |45-degree| latitude cap); the equi-join on the
    cell key replaces the cross join, and the exact haversine
    predicate filters candidates. Each qualifying pair matches
    exactly once (the supplier's home cell). This is THE pattern for
    distance joins at 100 TB: candidate count ~ density x stencil
    area, never |A| x |B|. The oracle is the brute-force cross-join
    twin — feasible at test SF, which is exactly why the binned
    rewrite is the product. Distance rounds at 3dp (km -> meter
    grain, masking libm ulp skew)."""
    cust = load(spark, sf_dir, "customer").selectExpr(
        "c_custkey", f"{_CUST_LAT} AS clat", f"{_CUST_LON} AS clon"
    )
    supp = load(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey", f"{_SUPP_LAT} AS slat", f"{_SUPP_LON} AS slon"
    )
    supp_cell = supp.select(
        "*",
        F.floor(F.col("slat") / 5).cast("long").alias("cell_lat"),
        F.floor(F.col("slon") / 5).cast("long").alias("cell_lon"),
    )
    offsets = spark.range(0, 15).select(
        (F.col("id") % 3 - 1).alias("dy"), (F.col("id") / 3).cast("long").alias("dxi")
    ).select("dy", (F.col("dxi") - 2).alias("dx"))
    cust_cells = cust.crossJoin(F.broadcast(offsets)).select(
        "c_custkey",
        "clat",
        "clon",
        (F.floor(F.col("clat") / 5).cast("long") + F.col("dy")).alias("cell_lat"),
        (F.floor(F.col("clon") / 5).cast("long") + F.col("dx")).alias("cell_lon"),
    )
    cand = cust_cells.join(supp_cell, ["cell_lat", "cell_lon"])
    hav = F.expr(
        _HAV.format(lat1="clat", lon1="clon", lat2="slat", lon2="slon")
    )
    return (
        cand.withColumn("dist_km", hav)
        .filter(F.col("dist_km") < 500)
        .select(
            "c_custkey",
            "s_suppkey",
            F.round("dist_km", 3).alias("dist_km_r"),
        )
    )


_EVT_LAT = "((event_id * 41) % 9000) / 100.0 - 45"
_EVT_LON = "((event_id * 89) % 18000) / 100.0 - 90"


@register(
    "geo_trajectory_stats",
    oracle=f"""
    WITH pts AS (
        SELECT user_id, ts, event_id,
               {_EVT_LAT} AS lat, {_EVT_LON} AS lon
        FROM events
    ),
    legs AS (
        SELECT user_id, lat, lon,
               lag(lat) OVER w AS plat, lag(lon) OVER w AS plon
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    d AS (
        SELECT user_id,
               {_HAV.format(lat1="plat", lon1="plon", lat2="lat", lon2="lon")}
                   AS leg_km
        FROM legs WHERE plat IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_legs,
           round(sum(leg_km), 3) AS total_km_r,
           round(max(leg_km), 3) AS max_leg_km_r,
           round(avg(leg_km), 3) AS avg_leg_km_r
    FROM d GROUP BY user_id
    """,
)
def geo_trajectory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity trajectory report — total/max/mean haversine leg
    length over each user's time-ordered point sequence (points
    synthesized from event ids, module header). The telemetry-mileage
    / GPS-track summarization pattern: ONE user-partitioned window
    provides the previous point (no self-join), then one groupBy —
    a single shuffle keyed on the entity, linear in track points at
    any fleet size. Distances round at 3dp (meter grain) so libm ulp
    skew in the trig never reaches the hash."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    pts = e.selectExpr(
        "user_id", "ts", "event_id", f"{_EVT_LAT} AS lat", f"{_EVT_LON} AS lon"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    legs = pts.select(
        "user_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    ).filter(F.col("plat").isNotNull())
    leg_km = F.expr(
        _HAV.format(lat1="plat", lon1="plon", lat2="lat", lon2="lon")
    )
    return (
        legs.select("user_id", leg_km.alias("leg_km"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_legs"),
            F.round(F.sum("leg_km"), 3).alias("total_km_r"),
            F.round(F.max("leg_km"), 3).alias("max_leg_km_r"),
            F.round(F.avg("leg_km"), 3).alias("avg_leg_km_r"),
        )
    )


@register(
    "geo_nearest_supplier",
    oracle=f"""
    WITH c AS (
        SELECT c_custkey, {_CUST_LAT} AS clat, {_CUST_LON} AS clon
        FROM customer
    ),
    s AS (
        SELECT s_suppkey, {_SUPP_LAT} AS slat, {_SUPP_LON} AS slon
        FROM supplier
    ),
    d AS (
        SELECT c_custkey, s_suppkey,
               {_HAV.format(lat1="clat", lon1="clon",
                            lat2="slat", lon2="slon")} AS km
        FROM c CROSS JOIN s
    ),
    best AS (
        SELECT c_custkey, s_suppkey, km,
               row_number() OVER (
                   PARTITION BY c_custkey ORDER BY km, s_suppkey) AS rn
        FROM d
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey,
           round(km, 3) AS dist_km_r
    FROM best WHERE rn = 1
    """,
)
def geo_nearest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-facility assignment (1-NN): each customer's closest
    supplier by haversine. The supplier side is TINY (a facility list
    is always dim-sized), so the right plan is broadcast-all +
    per-customer argmin — |customers|×|facilities| map-side rows, no
    shuffle of the big side and no stencil bookkeeping; the
    cell-stencil rewrite (geo_radius_join) takes over only when BOTH
    sides are large. Deterministic tie-break on supplier key; meter-
    grain rounding.

    r17 (guide §2.3 "aggregate before you shuffle"): the per-customer
    argmin is a map-side ``min(struct(km, s_suppkey))`` — struct
    ordering IS the (km ASC, s_suppkey ASC) tie-break, and min over a
    set is order-independent, so the chosen row is bit-identical to
    the previous row_number()-window form. The window SHUFFLED and
    SORTED all |cust|x|supp| scored rows (15M at sf0.1 — 24.3 s, the
    2nd-slowest query in the registry); the aggregate collapses them
    to |cust| partial states before the exchange (24.3 s -> ~1 s)."""
    cust = load(spark, sf_dir, "customer").selectExpr(
        "c_custkey", f"{_CUST_LAT} AS clat", f"{_CUST_LON} AS clon"
    )
    supp = load(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey", f"{_SUPP_LAT} AS slat", f"{_SUPP_LON} AS slon"
    )
    km = F.expr(_HAV.format(lat1="clat", lon1="clon", lat2="slat", lon2="slon"))
    # The customer side arrives as ONE scan split at bench scale, so the
    # |cust|x|supp| haversine expansion would run serially inside a
    # single BroadcastNestedLoopJoin task (and AQE cannot re-split a
    # broadcast join's stream side). Round-robin repartition to the
    # session's parallelism first — scale-adaptive (cores-derived, not a
    # constant), a 15k-row shuffle that buys 32-way trig (guide §2.5
    # input-skew remedy: "repartition immediately after the read").
    cust = cust.repartition(spark.sparkContext.defaultParallelism)
    d = cust.crossJoin(F.broadcast(supp)).select(
        "c_custkey", "s_suppkey", km.alias("km")
    )
    best = d.groupBy("c_custkey").agg(
        F.min(F.struct("km", "s_suppkey")).alias("best")
    )
    return best.select(
        "c_custkey",
        F.col("best.s_suppkey").alias("nearest_suppkey"),
        F.round("best.km", 3).alias("dist_km_r"),
    )


@register(
    "geo_trajectory_similarity",
    oracle=f"""
    WITH cells AS (
        SELECT DISTINCT user_id,
               CAST(floor(({_EVT_LAT}) / 10) AS BIGINT) AS cy,
               CAST(floor(({_EVT_LON}) / 10) AS BIGINT) AS cx
        FROM events
    ),
    sizes AS (SELECT user_id, count(*) AS n FROM cells GROUP BY user_id),
    inter AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b, count(*) AS n_common
        FROM cells a JOIN cells b
          ON a.cy = b.cy AND a.cx = b.cx AND a.user_id < b.user_id
        GROUP BY a.user_id, b.user_id
    ),
    scored AS (
        SELECT i.user_a, i.user_b,
               CAST(i.n_common AS BIGINT) AS n_common,
               round(i.n_common / (1.0 * (sa.n + sb.n - i.n_common)), 6)
                   AS footprint_jaccard_r
        FROM inter i
        JOIN sizes sa ON sa.user_id = i.user_a
        JOIN sizes sb ON sb.user_id = i.user_b
    )
    SELECT user_a, user_b, n_common, footprint_jaccard_r
    FROM (
        SELECT *, row_number() OVER (
            ORDER BY footprint_jaccard_r DESC, user_a, user_b) AS rk
        FROM scored
    ) WHERE rk <= 25
    """,
)
def geo_trajectory_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory similarity search by spatial footprint — the top-25
    most similar user pairs by Jaccard of visited 10-degree grid
    cells (the cell-set sketch that distributed trajectory-similarity
    systems use for candidate pruning, cf. REPOSE ICDE'21 reference-
    point tries — same idea: discretize, then set-intersect). The
    pairwise intersection comes from a posting-list join ON THE CELL
    (candidates ~ Σ per-cell-occupancy², never |users|²); footprints
    are bounded by the grid, so the shuffle carries (user, cell)
    pairs only. Global top-k compiles to per-partition heaps (r17:
    literally — orderBy+limit plans as TakeOrderedAndProject; the
    previous global row_number window moved every scored pair to ONE
    partition and sorted it there, 10.4 s -> ~2 s, identical rows and
    order keys)."""
    e = load(spark, sf_dir, "events")
    cells = e.selectExpr(
        "user_id",
        f"CAST(floor(({_EVT_LAT}) / 10) AS BIGINT) AS cy",
        f"CAST(floor(({_EVT_LON}) / 10) AS BIGINT) AS cx",
    ).distinct()
    sizes = cells.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    # The posting-list self-join EXPLODES (sum of per-cell occupancy²:
    # ~40M rows from 83k cell rows at sf0.1), but its INPUTS are tiny,
    # so AQE coalesces the join to ~1 partition and the explosion runs
    # serially. Pin an explicit cores-derived co-partitioning on the
    # join key (explicit-N repartitions are exempt from AQE coalescing;
    # both sides share N and keys, so the join adds no further
    # exchange) — the §2.5 "AQE can't see an exploding join" case.
    n_par = spark.sparkContext.defaultParallelism
    a = cells.select(F.col("user_id").alias("user_a"), "cy", "cx").repartition(
        n_par, "cy", "cx"
    )
    b = cells.select(F.col("user_id").alias("user_b"), "cy", "cx").repartition(
        n_par, "cy", "cx"
    )
    inter = (
        a.join(b, ["cy", "cx"])
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("user_id").alias("user_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("user_id").alias("user_b"), F.col("n").alias("nb"))
    jac = F.col("n_common") / (
        F.lit(1.0) * (F.col("na") + F.col("nb") - F.col("n_common"))
    )
    scored = (
        inter.join(F.broadcast(sa), "user_a")
        .join(F.broadcast(sb), "user_b")
        .select(
            "user_a",
            "user_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(jac, 6).alias("footprint_jaccard_r"),
        )
    )
    return scored.orderBy(
        F.col("footprint_jaccard_r").desc(), "user_a", "user_b"
    ).limit(25)


# --- round 6 additions -------------------------------------------------

# Grid-DBSCAN: cluster DENSE CELLS, not points.  The cell universe is
# bounded by grid geometry (9x18 at 10 degrees), independent of row
# count, so every per-cell structure here is broadcast-safe at any SF —
# the opposite situation from a data-scaled keep-set (cf. the
# analytics_kcore peel, where forcing broadcast would be wrong).
_DBSCAN_ROUNDS = 4


def _dbscan_cells_sql() -> str:
    return f"""
    cells AS (
        SELECT CAST(floor(({_CUST_LAT}) / 10) AS BIGINT) AS cy,
               CAST(floor(({_CUST_LON}) / 10) AS BIGINT) AS cx,
               count(*) AS n
        FROM customer
        GROUP BY 1, 2
    ),
    thr AS (SELECT avg(n) AS t FROM cells),
    dense AS (
        SELECT cy, cx, n, (cy + 10) * 1000 + (cx + 20) AS lbl0
        FROM cells CROSS JOIN thr WHERE n > t
    )"""


def _dbscan_round_sql(i: int) -> str:
    prev, cur = f"l{i - 1}", f"l{i}"
    src = "dense" if i == 1 else prev
    lbl = "lbl0" if i == 1 else "lbl"
    return f"""
    {cur} AS (
        SELECT a.cy, a.cx, a.n, min(b.{lbl}) AS lbl
        FROM {src} a JOIN {src} b
          ON b.cy BETWEEN a.cy - 1 AND a.cy + 1
         AND b.cx BETWEEN a.cx - 1 AND a.cx + 1
        GROUP BY a.cy, a.cx, a.n
    )"""


@register(
    "geo_dbscan_grid",
    oracle=(
        "WITH "
        + _dbscan_cells_sql()
        + ","
        + ",".join(_dbscan_round_sql(i) for i in range(1, _DBSCAN_ROUNDS + 1))
        + f"""
    SELECT CAST(lbl AS BIGINT)          AS cluster_id,
           CAST(count(*) AS BIGINT)     AS n_cells,
           CAST(sum(n) AS BIGINT)       AS n_points,
           min(cy)                      AS min_cy,
           max(cy)                      AS max_cy,
           min(cx)                      AS min_cx,
           max(cx)                      AS max_cx
    FROM l{_DBSCAN_ROUNDS} GROUP BY lbl
    """
    ),
)
def geo_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-based DBSCAN (DBSCAN's grid approximation, cf. GriDBSCAN /
    NG-DBSCAN): bucket points into 10-degree cells, keep cells denser
    than the average occupied-cell count (corpus-adaptive minPts), and
    merge 8-adjacent dense cells into clusters by {rounds} unrolled
    rounds of min-label propagation — the same bounded-round BSP
    discipline as analytics_pagerank_lite (no driver convergence
    loop; both engines run the identical rounds, so the labels agree
    by construction even for components wider than the round budget).

    Scale shape: points reduce to cells in ONE map-side-combinable
    aggregate; everything after operates on the CELL table, whose size
    is bounded by the grid resolution (<=162 cells here) independent
    of data volume — so the neighbor self-join and the label rounds
    cost O(grid), not O(rows), and at 100 TB the only full-data pass
    is the first aggregate. Cluster report: id, cell count, point
    count, bounding box.""".format(rounds=_DBSCAN_ROUNDS)
    c = load(spark, sf_dir, "customer")
    cells = (
        c.selectExpr(
            f"CAST(floor(({_CUST_LAT}) / 10) AS BIGINT) AS cy",
            f"CAST(floor(({_CUST_LON}) / 10) AS BIGINT) AS cx",
        )
        .groupBy("cy", "cx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    thr = cells.agg(F.avg("n").alias("t"))
    dense = (
        cells.crossJoin(F.broadcast(thr))
        .filter(F.col("n") > F.col("t"))
        .select(
            "cy", "cx", "n",
            ((F.col("cy") + 10) * 1000 + (F.col("cx") + 20)).alias("lbl"),
        )
    )
    cur = dense
    for _ in range(_DBSCAN_ROUNDS):
        a = cur.select("cy", "cx", "n")
        b = cur.select(
            F.col("cy").alias("bcy"), F.col("cx").alias("bcx"), F.col("lbl")
        )
        cur = (
            a.join(
                F.broadcast(b),
                (F.col("bcy") >= F.col("cy") - 1)
                & (F.col("bcy") <= F.col("cy") + 1)
                & (F.col("bcx") >= F.col("cx") - 1)
                & (F.col("bcx") <= F.col("cx") + 1),
            )
            .groupBy("cy", "cx", "n")
            .agg(F.min("lbl").alias("lbl"))
        )
    return cur.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("n").cast("long").alias("n_points"),
        F.min("cy").alias("min_cy"),
        F.max("cy").alias("max_cy"),
        F.min("cx").alias("min_cx"),
        F.max("cx").alias("max_cx"),
    ).select(
        F.col("lbl").cast("long").alias("cluster_id"),
        "n_cells", "n_points", "min_cy", "max_cy", "min_cx", "max_cx",
    )


# Geohash encoding: pure integer bit-interleave, generated once in
# Python and rendered into each dialect (Spark `shiftright`, DuckDB
# `>>`), so both engines evaluate the identical arithmetic.  The
# quantization floor acts on bit-identical doubles (same IEEE add/div/
# mul sequence on both engines), so the 15-bit lat/lon codes agree
# exactly.
_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_expr(lat: str, lon: str, shift: str) -> str:
    """30-bit geohash integer code from 15-bit lat/lon quantizations.

    shift: dialect right-shift — "shiftright({v}, {k})" for Spark SQL,
    "({v} >> {k})" for DuckDB.
    """
    latb = f"CAST(floor((({lat}) + 90.0) / 180.0 * 32768) AS BIGINT)"
    lonb = f"CAST(floor((({lon}) + 180.0) / 360.0 * 32768) AS BIGINT)"
    terms = []
    for i in range(15):
        terms.append(
            f"(({shift.format(v='lonc', k=i)}) & 1) * {1 << (2 * i + 1)}"
        )
        terms.append(
            f"(({shift.format(v='latc', k=i)}) & 1) * {1 << (2 * i)}"
        )
    return latb, lonb, " + ".join(terms)


def _geohash_chars(shift: str, n: int = 6) -> str:
    parts = []
    for j in range(n):
        k = 5 * (n - 1 - j)
        parts.append(
            f"substr('{_GEOHASH32}', "
            f"CAST((({shift.format(v='code', k=k)}) & 31) AS INT) + 1, 1)"
        )
    return " || ".join(parts)


def _geohash_oracle() -> str:
    shift = "({v} >> {k})"
    latb, lonb, code = _geohash_expr(_CUST_LAT, _CUST_LON, shift)
    chars = _geohash_chars(shift)
    return f"""
    WITH q AS (
        SELECT c_custkey, {latb} AS latc, {lonb} AS lonc FROM customer
    ),
    coded AS (SELECT c_custkey, {code} AS code FROM q),
    hashed AS (SELECT c_custkey, {chars} AS gh6 FROM coded)
    SELECT substr(gh6, 1, 4)            AS geohash4,
           CAST(count(*) AS BIGINT)     AS n_points,
           min(gh6)                     AS min_geohash6,
           max(gh6)                     AS max_geohash6,
           CAST(min(c_custkey) AS BIGINT) AS sample_custkey
    FROM hashed GROUP BY 1
    """


@register("geo_geohash_encode", oracle=_geohash_oracle())
def geo_geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding (public base32 geohash: 30-bit lon/lat bit
    interleave, lon first) of the synthesized customer points, rolled
    up by 4-char prefix — the spatial-key scheme whose shared-prefix
    property gives range-scannable locality (a geohash prefix IS a
    bounding box), so a partition/sort by geohash4 co-locates spatial
    neighbors for pruned scans.

    Scale shape: encoding is a pure per-row integer expression (one
    whole-stage-codegen map, no UDF — the interleave unrolls to 30
    masked shifts generated once in Python and shared textually with
    the DuckDB twin), then ONE map-side-combinable aggregate on the
    prefix. min/max geohash6 per prefix bound each tile's occupied
    sub-range — the zone-map a writer would record per file."""
    c = load(spark, sf_dir, "customer")
    shift = "shiftright({v}, {k})"
    latb, lonb, code = _geohash_expr(_CUST_LAT, _CUST_LON, shift)
    chars = _geohash_chars(shift)
    q = c.selectExpr("c_custkey", f"{latb} AS latc", f"{lonb} AS lonc")
    coded = q.selectExpr("c_custkey", f"{code} AS code")
    hashed = coded.selectExpr("c_custkey", f"{chars} AS gh6")
    return (
        hashed.groupBy(F.substring("gh6", 1, 4).alias("geohash4"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.min("gh6").alias("min_geohash6"),
            F.max("gh6").alias("max_geohash6"),
            F.min("c_custkey").cast("long").alias("sample_custkey"),
        )
    )


# Convex-ish hexagon in (lon, lat) space for the point-in-polygon op;
# fixed literal so both engines evaluate identical edge tests.
_POLY = [(-40.0, 0.0), (-10.0, 20.0), (30.0, 15.0), (45.0, -5.0),
         (20.0, -25.0), (-25.0, -20.0)]


def _ray_cast_sql(px: str, py: str) -> str:
    """Even-odd ray-casting crossing count as ONE fixed-order SQL
    expression shared verbatim by Spark SQL and DuckDB: for each
    polygon edge, does a ray going right from the point cross it?
    Inside = odd number of crossings."""
    terms = []
    n = len(_POLY)
    for k in range(n):
        x1, y1 = _POLY[k]
        x2, y2 = _POLY[(k + 1) % n]
        terms.append(
            f"(CASE WHEN (({y1} > {py}) <> ({y2} > {py}))"
            f" AND {px} < ({x2} - {x1}) * ({py} - {y1})"
            f" / ({y2} - {y1}) + {x1} THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ") % 2 = 1"


@register(
    "geo_point_in_polygon",
    oracle=f"""
    WITH pts AS (
        SELECT c_mktsegment,
               ({_CUST_LON}) AS lon,
               ({_CUST_LAT}) AS lat,
               c_acctbal
        FROM customer
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN {_ray_cast_sql('lon', 'lat')}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
           floor(sum(CASE WHEN {_ray_cast_sql('lon', 'lat')}
                          THEN 1 ELSE 0 END) * 1.0 / count(*)
                 * 1e6 + 0.5) / 1e6 AS share_r,
           round(sum(CASE WHEN {_ray_cast_sql('lon', 'lat')}
                          THEN c_acctbal ELSE 0 END), 2) AS inside_acctbal
    FROM pts
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon containment (even-odd ray casting) of the
    synthesized customer points against a fixed hexagonal region —
    the geofencing primitive behind territory assignment and
    region-scoped rollups.  The crossing test is generated as ONE
    fixed-order SQL expression from the polygon literal and shared
    verbatim by both engines, so every comparison runs on identical
    doubles (strict inequalities; boundary points resolve identically).

    Scale shape: a pure per-row predicate inside whole-stage codegen —
    no join, no shuffle beyond the 5-group rollup. For polygon SETS at
    100 TB, pair this per-edge test with the sibling grid-bucketed
    join (`geo_radius_join`) so candidates hit only their cell's
    polygons."""
    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.expr(_CUST_LON).alias("lon"),
        F.expr(_CUST_LAT).alias("lat"),
        "c_acctbal",
    )
    inside = F.expr(_ray_cast_sql("lon", "lat"))
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(F.when(inside, 1).otherwise(0)).cast("long").alias("n_inside"),
            (
                F.floor(
                    F.sum(F.when(inside, 1).otherwise(0))
                    * F.lit(1.0)
                    / F.count(F.lit(1))
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("share_r"),
            F.round(
                F.sum(F.when(inside, F.col("c_acctbal")).otherwise(0)), 2
            ).alias("inside_acctbal"),
        )
        .orderBy("c_mktsegment")
    )
