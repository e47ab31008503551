"""Array function family incl. higher-order functions.
SURVEY.md §2B "Scalar functions / Array".

Arrays come from two real columns: `embeddings.embedding`
(array<float>) and tokenized `documents.text`. Higher-order transform/
filter/aggregate stay JVM-side (no UDF) — this is the pattern every
vector/token kernel in the LLM ops reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_task_spark.registry import register
from hive_task_spark.tables import load

# ---------------------------------------------------------------------------
# Edge discipline: NEVER emit ArrayType/MapType at a query edge — the
# driver's canonicalizer (pandas sort_values + value hash) cannot hash
# list cells.  Double arrays are serialized as '|'-joined fixed-scale
# decimal strings (round -> DECIMAL -> string is bit-identical across
# Spark and DuckDB; JSON float formatting is NOT).  String/int arrays
# are '|'-joined directly.
# ---------------------------------------------------------------------------


def _djoin(arr, nd: int = 4):
    """array<double> column -> '|'-joined string with `nd` fixed decimals."""
    return F.array_join(
        F.transform(
            arr, lambda x: F.round(x, nd).cast(f"decimal(24,{nd})").cast("string")
        ),
        "|",
    )


def _djoin_sql(expr: str, nd: int = 4) -> str:
    """DuckDB twin of _djoin for a list-of-double SQL expression."""
    return (
        f"array_to_string(list_transform({expr}, x -> "
        f"CAST(CAST(round(CAST(x AS DOUBLE), {nd}) AS DECIMAL(24,{nd})) AS VARCHAR)"
        f"), '|')"
    )


@register(
    "array_basic_suite",
    oracle=f"""
    SELECT
        vec_id,
        CAST(len(embedding) AS BIGINT)                                    AS dim,
        CAST(embedding[1] AS DOUBLE)                                      AS first_elem,
        {_djoin_sql('embedding[1:5]')}                                    AS head5,
        {_djoin_sql('list_sort(list_transform(embedding[1:3], x -> round(CAST(x AS DOUBLE), 3)))', 3)}
                                                                          AS sorted_head3
    FROM embeddings
    """,
)
def array_basic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element access/slice/sort_array over a real vector column."""
    e = load(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.col("embedding").getItem(0).cast("double").alias("first_elem"),
        _djoin(F.slice(emb_d, 1, 5)).alias("head5"),
        _djoin(
            F.sort_array(
                F.transform(F.slice(emb_d, 1, 3), lambda x: F.round(x, 3))
            ),
            3,
        ).alias("sorted_head3"),
    )


@register(
    "array_higher_order",
    oracle=f"""
    SELECT
        vec_id,
        CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE)
                                                                      AS vec_sum,
        CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)      AS n_positive,
        CAST(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE)
                                                                      AS vec_max,
        {_djoin_sql('list_transform(embedding[1:3], x -> CAST(x AS DOUBLE) * 2.0)')}
                                                                      AS doubled_head
    FROM embeddings
    """,
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform/filter/aggregate (fold) — JVM lambdas, zero Python."""
    e = load(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x).alias("vec_sum"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0))
        .cast("long")
        .alias("n_positive"),
        F.array_max(emb_d).alias("vec_max"),
        _djoin(F.transform(F.slice(emb_d, 1, 3), lambda x: x * 2.0)).alias(
            "doubled_head"
        ),
    )


@register(
    "array_explode_tokens",
    oracle="""
    SELECT
        token,
        CAST(count(*) AS BIGINT)           AS n
    FROM (
        SELECT unnest(string_split(text, ' ')) AS token
        FROM documents
    )
    WHERE token <> ''
    GROUP BY token
    """,
)
def array_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode over split — token frequency (generator → re-aggregation)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "array_posexplode",
    oracle="""
    SELECT
        vec_id,
        CAST(UNNEST(range(1, len(embedding[1:8]) + 1)) - 1 AS INT)  AS pos,
        CAST(UNNEST(embedding[1:8]) AS DOUBLE)                      AS val
    FROM embeddings
    WHERE vec_id < 10
    """,
)
def array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — position-preserving unnest (zipped in the oracle)."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    emb_d = F.transform(
        F.slice(F.col("embedding"), 1, 8), lambda x: x.cast("double")
    )
    return e.select("vec_id", F.posexplode(emb_d).alias("pos", "val"))


@register(
    "array_set_algebra",
    oracle="""
    WITH tok AS (
        SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    )
    SELECT
        a.doc_id                                            AS doc_a,
        b.doc_id                                            AS doc_b,
        CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_common
    FROM tok a JOIN tok b ON a.doc_id + 1 = b.doc_id
    """,
)
def array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_distinct + array_intersect between adjacent documents."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    a = tok.alias("a")
    b = tok.alias("b")
    return a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id")).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
        .cast("long")
        .alias("n_common"),
    )


@register(
    "array_zip_flatten",
    oracle=f"""
    SELECT
        vec_id,
        {_djoin_sql('embedding[1:3]')}                                    AS a3,
        {_djoin_sql('flatten([embedding[1:2], embedding[3:4]])')}         AS flat4_f,
        {_djoin_sql('''list_transform(
            list_zip(embedding[1:3], embedding[2:4]),
            p -> CAST(p[1] AS DOUBLE) + CAST(p[2] AS DOUBLE))''')}        AS pair_sums
    FROM embeddings
    WHERE vec_id < 20
    """,
)
def array_zip_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zip_with + flatten (nested array construction / pairing)."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    emb = F.col("embedding")
    emb_d = F.transform(emb, lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        _djoin(F.slice(emb_d, 1, 3)).alias("a3"),
        _djoin(
            F.transform(
                F.flatten(F.array(F.slice(emb, 1, 2), F.slice(emb, 3, 2))),
                lambda x: x.cast("double"),
            )
        ).alias("flat4_f"),
        _djoin(
            F.zip_with(
                F.slice(emb_d, 1, 3),
                F.slice(emb_d, 2, 3),
                lambda x, y: x + y,
            )
        ).alias("pair_sums"),
    )


@register(
    "array_explode_outer",
    oracle="""
    WITH t AS (
        SELECT n_nationkey,
               CASE WHEN n_nationkey % 3 = 0 THEN NULL
                    WHEN n_nationkey % 3 = 1 THEN []
                    ELSE [n_regionkey, n_regionkey + 100] END AS xs
        FROM nation
    )
    SELECT t.n_nationkey, CAST(u.x AS INT) AS x
    FROM t LEFT JOIN (
        SELECT n_nationkey, unnest(xs) AS x FROM t
    ) u USING (n_nationkey)
    """,
)
def array_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: NULL and empty arrays keep their parent row
    (emitting a NULL element) instead of silently dropping it — the
    semantics difference that loses rows in joins-after-explode when
    plain explode is used. DuckDB has no outer unnest, so the oracle
    reconstructs it with a LEFT JOIN against the inner unnest."""
    n = load(spark, sf_dir, "nation")
    t = n.select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 3 == 0, F.lit(None).cast("array<int>"))
        .when(F.col("n_nationkey") % 3 == 1, F.array().cast("array<int>"))
        .otherwise(
            F.array(F.col("n_regionkey"), F.col("n_regionkey") + 100)
        )
        .alias("xs"),
    )
    return t.select("n_nationkey", F.explode_outer("xs").alias("x"))


@register(
    "array_mutation_suite",
    oracle="""
    WITH b AS (
        SELECT l_orderkey, l_linenumber,
               [CAST(l_linenumber AS BIGINT),
                CAST(l_suppkey % 5 AS BIGINT),
                CASE WHEN l_discount > 0.05 THEN NULL
                     ELSE CAST(l_partkey % 7 AS BIGINT) END,
                CAST(l_partkey % 3 AS BIGINT)] AS base
        FROM lineitem WHERE l_orderkey <= 200
    ),
    m AS (
        SELECT l_orderkey, l_linenumber, base,
               list_append(base, 9)                          AS appended,
               list_prepend(0, base)                         AS prepended,
               base[1:1] || [CAST(5 AS BIGINT)] || base[2:]  AS inserted,
               list_filter(base, x -> x IS NOT NULL)         AS compacted,
               list_filter(base, x -> x IS DISTINCT FROM 1)  AS removed
        FROM b
    )
    SELECT l_orderkey, l_linenumber,
           array_to_string(list_transform(base,
               x -> coalesce(CAST(x AS VARCHAR), 'N')), '|') AS base_s,
           array_to_string(list_transform(appended,
               x -> coalesce(CAST(x AS VARCHAR), 'N')), '|') AS appended_s,
           array_to_string(list_transform(prepended,
               x -> coalesce(CAST(x AS VARCHAR), 'N')), '|') AS prepended_s,
           array_to_string(list_transform(inserted,
               x -> coalesce(CAST(x AS VARCHAR), 'N')), '|') AS inserted_s,
           array_to_string(list_transform(compacted,
               x -> CAST(x AS VARCHAR)), '|')                AS compacted_s,
           array_to_string(list_transform(removed,
               x -> coalesce(CAST(x AS VARCHAR), 'N')), '|') AS removed_s,
           array_to_string(list_transform(list_sort(list_distinct(compacted)),
               x -> CAST(x AS VARCHAR)), '|')                AS dedup_sorted_s
    FROM m
    """,
)
def array_mutation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array MUTATION builtins (Spark 3.4/3.5 additions the original
    array suites predate): array_append / array_prepend /
    array_insert (1-based, before-position) / array_compact
    (null-strip) / array_remove (all-equal strip, nulls survive) /
    array_distinct — each applied to a per-row constructed array with
    a deliberate NULL element, serialized with 'N' null markers.
    DuckDB spells insert as slice concatenation and remove as
    IS DISTINCT FROM filter — semantics identical. All row-local
    codegen expressions: scan speed at any scale."""
    b = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.array(
                F.col("l_linenumber").cast("long"),
                (F.col("l_suppkey") % 5).cast("long"),
                F.when(
                    F.col("l_discount") > 0.05, F.lit(None).cast("long")
                ).otherwise((F.col("l_partkey") % 7).cast("long")),
                (F.col("l_partkey") % 3).cast("long"),
            ).alias("base"),
        )
    )
    m = b.select(
        "l_orderkey",
        "l_linenumber",
        "base",
        F.expr("array_append(base, CAST(9 AS BIGINT))").alias("appended"),
        F.expr("array_prepend(base, CAST(0 AS BIGINT))").alias("prepended"),
        F.expr("array_insert(base, 2, CAST(5 AS BIGINT))").alias("inserted"),
        F.expr("array_compact(base)").alias("compacted"),
        F.expr("array_remove(base, CAST(1 AS BIGINT))").alias("removed"),
    )

    def _s(col: str):
        return F.expr(
            f"array_join(transform({col}, x -> coalesce(CAST(x AS STRING), 'N')), '|')"
        ).alias(f"{col}_s")

    return m.select(
        "l_orderkey",
        "l_linenumber",
        _s("base"),
        _s("appended"),
        _s("prepended"),
        _s("inserted"),
        _s("compacted"),
        _s("removed"),
        F.expr(
            "array_join(transform(array_sort(array_distinct(compacted)), "
            "x -> CAST(x AS STRING)), '|')"
        ).alias("dedup_sorted_s"),
    )


@register(
    "array_nested_struct_rollup",
    oracle="""
    WITH li AS (
        SELECT l_orderkey,
               CAST(l_linenumber AS BIGINT) AS ln,
               round(l_extendedprice * (1 - l_discount), 4) AS amt
        FROM lineitem WHERE l_orderkey < 500
    )
    SELECT l_orderkey,
           CAST(count(*) AS BIGINT) AS n_items,
           string_agg(ln || ':' ||
                      CAST(CAST(amt AS DECIMAL(24,4)) AS VARCHAR),
                      '|' ORDER BY ln, amt) AS items_s,
           round(sum(amt), 4) AS order_net_r
    FROM li GROUP BY l_orderkey
    """,
)
def array_nested_struct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-model round trip — the denormalized array<struct>
    pattern: each order's line items collect into a sorted
    array<struct<ln, amt>> (the shape a document store or a
    pre-joined gold table carries), then the ORDER TOTAL is computed
    by a higher-order `aggregate` fold OVER THE NESTED ARRAY — no
    re-explode, no second shuffle: once data is nested, per-parent
    math is row-local codegen. The fold runs in (ln, amt) order (sort_array sorts the full
    struct; linenumber alone is not unique in this fixture), so the
    float sum is sequence-deterministic; amounts are rounded at their true 4dp
    grain (2dp price x 2dp discount) before nesting. The struct
    array serializes at the edge per the complex-type rule; the
    oracle computes the same rollup flat. At 100 TB nest-once /
    fold-many is the access-pattern win for per-entity repeated
    reads — one groupBy builds the document, every later pass is
    scan-local."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 500)
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("long").alias("ln"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("amt"),
        )
    )
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct("ln", "amt"))).alias("items")
    )
    return nested.select(
        "l_orderkey",
        F.size("items").cast("long").alias("n_items"),
        F.array_join(
            F.expr(
                "transform(items, x -> concat(x.ln, ':',"
                " cast(cast(x.amt as decimal(24,4)) as string)))"
            ),
            "|",
        ).alias("items_s"),
        F.round(
            F.expr("aggregate(items, 0D, (acc, x) -> acc + x.amt)"), 4
        ).alias("order_net_r"),
    )
