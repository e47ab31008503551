"""Similarity search over `embeddings` (array<float>, 64-dim).
SURVEY.md §2B LLM ops: brute-force cosine top-k (baseline, oracle-
checked) + random-hyperplane LSH bucketing (the scale path).

Dot products are pure JVM higher-order expressions
(``aggregate(zip_with(...))``) — no Python, no UDF, whole-stage
codegen. At 100 TB: broadcast the (small) query side, keep the corpus
partitioned; the LSH variant replaces the crossJoin with a bucket
equi-join exactly like MinHash banding replaces the pair join.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_task_spark.registry import register
from hive_task_spark.tables import load

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 are the query vectors

# Random hyperplanes for sign-LSH (seed fixed; embedded in the plan).
# Multi-table: L independent tables of k planes each. One k-bit table
# has recall p_match^k per neighbor; L tables + Hamming<=1 multi-probe
# push miss probability to (1 - p_probe)^L — the classic E2LSH recipe.
_DIM = 64
_N_TABLES = 8
_N_PLANES = 4  # bits per table
_rng = random.Random(7)
_PLANES = [
    [
        [round(_rng.gauss(0.0, 1.0), 6) for _ in range(_DIM)]
        for _ in range(_N_PLANES)
    ]
    for _ in range(_N_TABLES)
]


def _vec_d(col: str = "embedding"):
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _norm(vcol):
    return F.sqrt(F.aggregate(vcol, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


_ORACLE_TOPK = f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, vec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v
    ),
    scored AS (
        SELECT
            q.vec_id AS query_id,
            c.vec_id AS neighbor_id,
            list_sum(list_transform(list_zip(q.vec, c.vec), p -> p[1] * p[2]))
                / (q.nrm * c.nrm) AS cosine
        FROM n q JOIN n c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id,
           CAST(rnk AS BIGINT) AS rnk,
           round(cosine, 6)    AS cosine_r
    FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM scored
    )
    WHERE rnk <= {TOP_K}
"""


@register("similarity_topk_bruteforce", oracle=_ORACLE_TOPK)
def similarity_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast queries × corpus + window.

    The correctness baseline every ANN variant is measured against.
    Cosine is rounded to 6 dp at the edge (summation-order noise);
    ranking uses the raw value with neighbor_id tie-break.
    """
    e = load(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id", _vec_d().alias("vec")
    ).withColumn("nrm", _norm(F.col("vec")))
    q = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(vecs)
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", F.round("cosine", 6).alias("cosine_r"))
    )


_PLANES_SQL = (
    "CAST(["
    + ",".join(
        "["
        + ",".join(
            "[" + ",".join(str(x) for x in plane) + "]" for plane in table
        )
        + "]"
        for table in _PLANES
    )
    + "] AS DOUBLE[][][])"
)

_ORACLE_ANN_LSH = f"""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, vec, sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v
    ),
    b AS (
        SELECT vec_id, vec, nrm,
               list_transform({_PLANES_SQL}, tbl ->
                 list_sum(list_transform(range(1, {_N_PLANES} + 1), i ->
                   CASE WHEN list_sum(list_transform(list_zip(vec, tbl[i]),
                                                     p -> p[1] * p[2])) > 0
                        THEN CAST(pow(2, i - 1) AS INT) ELSE 0 END))) AS buckets
        FROM n
    ),
    corpus AS (
        SELECT vec_id, vec, nrm, t.i AS table_id,
               CAST(buckets[t.i + 1] AS INT) AS bucket
        FROM b, range({_N_TABLES}) t(i)
    ),
    probes AS (
        SELECT vec_id AS query_id, vec AS qvec, nrm AS qnrm, t.i AS table_id,
               CAST(unnest(list_distinct(list_prepend(buckets[t.i + 1],
                 list_transform(range(0, {_N_PLANES}), j ->
                   xor(buckets[t.i + 1], (1 << j)))))) AS INT) AS bucket
        FROM b, range({_N_TABLES}) t(i)
        WHERE vec_id < {N_QUERIES}
    ),
    cand AS (
        SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id,
               list_sum(list_transform(list_zip(p.qvec, c.vec), z -> z[1] * z[2]))
                   / (p.qnrm * c.nrm) AS cosine
        FROM probes p JOIN corpus c USING (table_id, bucket)
        WHERE p.query_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk,
           round(cosine, 6) AS cosine_r
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
          FROM cand)
    WHERE rnk <= {TOP_K}
"""


@register("similarity_ann_lsh", oracle=_ORACLE_ANN_LSH)
def similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via multi-table random-hyperplane sign-LSH: 8 tables × 4-bit
    buckets → candidates share (table, bucket) with a query → exact
    cosine over candidates only → top-k. Queries multi-probe all
    buckets at Hamming<=1 in every table.

    The 100 TB path: the crossJoin becomes an equi-join on a composite
    (table_id, bucket) key — shuffle volume O(corpus × L), candidate
    volume O(corpus × bucket-density), never O(n²). Recall vs exact
    brute force is asserted in tests/test_properties.py; the oracle is
    a full DuckDB twin of the deterministic LSH pipeline (fixed seed-7
    planes embedded in both plans, sequential-sum dot products), so the
    approximate path is hash-checked cross-engine, not just
    recall-bounded.
    """
    e = load(spark, sf_dir, "embeddings")
    planes_lit = (
        "array("
        + ",".join(
            "array("
            + ",".join(
                "array(" + ",".join(f"{x}D" for x in plane) + ")"
                for plane in table
            )
            + ")"
            for table in _PLANES
        )
        + ")"
    )
    vecs = e.select("vec_id", _vec_d().alias("vec")).withColumn(
        "nrm", _norm(F.col("vec"))
    )
    # per-table bucket ids: sign bit per plane, packed little-endian
    with_buckets = vecs.withColumn(
        "buckets",
        F.expr(
            f"""
            transform(sequence(0, {_N_TABLES - 1}), t ->
              aggregate(
                transform(sequence(0, {_N_PLANES - 1}), i ->
                  CASE WHEN aggregate(
                         zip_with(vec,
                                  element_at(element_at({planes_lit}, t + 1), i + 1),
                                  (x, p) -> x * p),
                         0D, (s, x) -> s + x) > 0
                       THEN CAST(pow(2, i) AS INT) ELSE 0 END),
                0, (acc, x) -> acc + x))
            """
        ),
    )
    corpus = with_buckets.select(
        "vec_id",
        "vec",
        "nrm",
        F.posexplode("buckets").alias("table_id", "bucket"),
    )
    # queries probe their own bucket + all Hamming-1 neighbors, per table
    q = (
        with_buckets.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("vec").alias("qvec"),
            F.col("nrm").alias("qnrm"),
            F.posexplode("buckets").alias("table_id", "bucket0"),
        )
        .select(
            "query_id",
            "qvec",
            "qnrm",
            "table_id",
            F.explode(
                F.expr(
                    f"""
                    array_union(
                      array(bucket0),
                      transform(sequence(0, {_N_PLANES - 1}),
                                i -> bucket0 ^ shiftleft(1, i)))
                    """
                )
            ).alias("bucket"),
        )
    )
    cand = (
        F.broadcast(q)
        .join(corpus, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (_dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm"))).alias(
                "cosine"
            ),
        )
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", F.round("cosine", 6).alias("cosine_r"))
    )


@register(
    "similarity_grouped_stats",
    oracle="""
    WITH v AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, label, vec,
               sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v
    ),
    pairs AS (
        SELECT
            (a.label = b.label)  AS same_label,
            list_sum(list_transform(list_zip(a.vec, b.vec), p -> p[1] * p[2]))
                / (a.nrm * b.nrm) AS cosine
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 100 AND b.vec_id < 100
    )
    SELECT
        same_label,
        CAST(count(*) AS BIGINT)  AS n_pairs,
        round(avg(cosine), 9)     AS avg_cosine,
        round(max(cosine), 9)     AS max_cosine
    FROM pairs
    GROUP BY same_label
    """,
)
def similarity_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-label vs cross-label cosine statistics (pairwise agg)."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    vecs = e.select("vec_id", "label", _vec_d().alias("vec")).withColumn(
        "nrm", _norm(F.col("vec"))
    )
    a = vecs.alias("a")
    b = vecs.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            (F.col("a.label") == F.col("b.label")).alias("same_label"),
            (
                _dot(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cosine"),
        )
        .groupBy("same_label")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("cosine"), 9).alias("avg_cosine"),
            F.round(F.max("cosine"), 9).alias("max_cosine"),
        )
    )


@register(
    "similarity_embedding_neardup",
    oracle="""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
        WHERE vec_id < 2000
    ),
    n AS (
        SELECT vec_id, vec, sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
        FROM v
    )
    SELECT
        a.vec_id                  AS vec_a,
        b.vec_id                  AS vec_b,
        round(list_sum(list_transform(list_zip(a.vec, b.vec), p -> p[1] * p[2]))
              / (a.nrm * b.nrm), 6) AS cosine_r
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(list_zip(a.vec, b.vec), p -> p[1] * p[2]))
          / (a.nrm * b.nrm) >= 0.45
    """,
)
def similarity_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.45 on this corpus;
    production text-dedup uses ~0.95 — the plan shape is identical).

    Bounded to a 2000-vector slice: the EXACT all-pairs formulation is
    O(n²) by definition and exists as the verification baseline; the
    unbounded scale paths are `similarity_ann_lsh` / `_ivf`.

    The pairwise dot runs over 64 UNPACKED scalar columns, not the
    array: higher-order array lambdas are interpreted per element,
    while a 64-term column expression is whole-stage codegen —
    ~20× faster on the O(n²) pair loop. Summation order matches the
    array fold (ascending dimension), so cosines are bit-identical."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 2000)
    vecs = e.select("vec_id", _vec_d().alias("vec")).withColumn(
        "nrm", _norm(F.col("vec"))
    )
    flat = vecs.select(
        "vec_id", "nrm", *[F.col("vec")[i].alias(f"v{i}") for i in range(_DIM)]
    )
    a = flat.alias("a")
    b = flat.alias("b")
    dot = None
    for i in range(_DIM):
        term = F.col(f"a.v{i}") * F.col(f"b.v{i}")
        dot = term if dot is None else dot + term
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.45)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine_r"))
    )


@register(
    "similarity_label_centroids",
    oracle="""
    WITH e AS (
        SELECT label, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
    ),
    per_dim AS (
        SELECT label, pos, avg(CAST(x AS DOUBLE)) AS mu
        FROM e GROUP BY label, pos
    )
    SELECT
        label,
        CAST(count(*) AS BIGINT)             AS dim,
        round(sqrt(sum(mu * mu)), 6)         AS centroid_norm_r,
        round(sum(mu) / count(*), 6)         AS centroid_mean_r
    FROM per_dim
    GROUP BY label
    """,
)
def similarity_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid (elementwise mean across rows) —
    the distributed vector reduction under k-means/classification.

    posexplode → groupBy (label, dimension) → avg: the shuffle carries
    (label, pos, partial-sum) — map-side combine makes the cost
    O(labels × dim), independent of corpus size. Summarized to norm /
    mean per centroid (rounded at the edge) for a stable oracle."""
    e = load(spark, sf_dir, "embeddings")
    per_dim = (
        e.select("label", F.posexplode(_vec_d()).alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("mu"))
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("dim"),
            F.round(F.sqrt(F.sum(F.col("mu") * F.col("mu"))), 6).alias(
                "centroid_norm_r"
            ),
            F.round(F.sum("mu") / F.count(F.lit(1)), 6).alias("centroid_mean_r"),
        )
    )


_IVF_K = 16       # coarse centroids
_IVF_NPROBE = 6   # centroids probed per query
_IVF_ITERS = 5    # Lloyd iterations


@register("similarity_ann_ivf")  # rows-only: recall asserted vs brute force in tests
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF (inverted-file) coarse quantization — the other
    standard scale path next to LSH (`similarity_ann_lsh`).

    Build: k-means-lite (seeded with the K lowest vec_ids, 5 Lloyd
    rounds, all DataFrame ops: assign = broadcast-join + argmin over
    centroid array; update = posexplode + groupBy(cluster, dim) avg —
    the same vector reduction as `similarity_label_centroids`).
    Search: each query probes its `nprobe` nearest centroid lists,
    exact cosine within the probed lists, window top-k.

    At 100 TB: the corpus shuffles ONCE on cluster id (the inverted
    file); centroids stay broadcast; each query touches nprobe/K of
    the corpus. Deterministic seeding keeps results reproducible —
    recall vs brute force is asserted in tests/test_properties.py."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", _vec_d().alias("vec")).withColumn(
        "nrm", _norm(F.col("vec"))
    )
    # --- build: k-means-lite on unit vectors (cosine == dot on unit) ---
    unit = vecs.select(
        "vec_id", F.expr("transform(vec, x -> x / nrm)").alias("uvec")
    ).localCheckpoint()
    centroids = (
        unit.orderBy("vec_id").limit(_IVF_K)
        .select(F.col("vec_id").alias("cid"), F.col("uvec").alias("cvec"))
        .localCheckpoint()
    )
    for _ in range(_IVF_ITERS):
        assigned = (
            unit.crossJoin(F.broadcast(centroids))
            .withColumn("dot", _dot(F.col("uvec"), F.col("cvec")))
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("vec_id").orderBy(
                        F.col("dot").desc(), F.col("cid")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select("vec_id", "uvec", "cid")
        )
        centroids = (
            assigned.select("cid", F.posexplode("uvec").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("mu"))
            .groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "mu"))
                ).alias("pm")
            )
            .select("cid", F.expr("transform(pm, p -> p.mu)").alias("cvec"))
            .localCheckpoint()
        )
    # --- inverted file: final assignment ---
    inv = (
        unit.crossJoin(F.broadcast(centroids))
        .withColumn("dot", _dot(F.col("uvec"), F.col("cvec")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("dot").desc(), F.col("cid"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", "uvec", "cid")
    )
    # --- search: queries probe their nprobe nearest centroids ---
    q_probes = (
        unit.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(centroids))
        .withColumn("dot", _dot(F.col("uvec"), F.col("cvec")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.col("dot").desc(), F.col("cid"))
            ),
        )
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("uvec").alias("qvec"),
            "cid",
        )
    )
    cand = (
        F.broadcast(q_probes)
        .join(inv, "cid")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _dot(F.col("qvec"), F.col("uvec")).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TOP_K)
        .select("query_id", "neighbor_id", "rnk", F.round("cosine", 6).alias("cosine_r"))
    )


@register(
    "similarity_quantize_int8",
    oracle="""
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, vec,
               127.0 / greatest(list_max(list_transform(vec, x -> abs(x))),
                                1e-30) AS scale
        FROM v
    )
    SELECT vec_id,
           round(scale, 6) AS scale_r,
           array_to_string(
               list_transform(vec, x -> CAST(CAST(round(x * scale) AS INT) AS VARCHAR)),
               '|') AS qvec
    FROM s
    """,
)
def similarity_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization (per-vector absmax scale,
    the faiss/GGML SQ8 recipe): 4× memory reduction for the ANN index
    side, computed entirely in JVM higher-order expressions. The
    scale is materialized in its own projection BEFORE the transform
    lambda references it (interpreted HOF lambdas re-evaluate every
    reference — the CollapseProject trap). Cross-engine exactness:
    both engines do the identical double-precision multiply then
    round-half-away-from-zero, so the int codes match bit-for-bit."""
    e = load(spark, sf_dir, "embeddings")
    v = e.select("vec_id", _vec_d().alias("vec"))
    s = v.select(
        "vec_id",
        "vec",
        (
            127.0
            / F.greatest(
                F.array_max(F.transform(F.col("vec"), F.abs)), F.lit(1e-30)
            )
        ).alias("scale"),
    )
    return s.select(
        "vec_id",
        F.round("scale", 6).alias("scale_r"),
        F.expr(
            "array_join(transform(vec, x -> "
            "CAST(CAST(round(x * scale) AS INT) AS STRING)), '|')"
        ).alias("qvec"),
    )
