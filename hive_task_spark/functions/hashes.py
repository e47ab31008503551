"""Hash/misc function family — SURVEY.md §2B "Scalar functions / Hash".

md5 and sha2-256 produce identical hex across engines (oracle-checked —
they anchor the exact-dedup operator). xxhash64 / hash /
monotonically_increasing_id values are engine-specific, so that family
is asserted through engine-invariant properties (determinism,
injectivity on the corpus, id uniqueness, bucket bounds) with a
literal-boolean DuckDB oracle — VERDICT r17 item 2 closed the old
rows-only gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_task_spark.registry import register
from hive_task_spark.tables import load


@register(
    "hash_md5_sha2",
    oracle="""
    SELECT
        doc_id,
        md5(text)      AS text_md5,
        sha256(text)   AS text_sha256
    FROM documents
    """,
)
def hash_md5_sha2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 + sha2(256) — cross-engine-stable content fingerprints."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register(
    "hash_engine_specific",
    oracle="""
    SELECT
        count(*)             AS n_docs,
        count(DISTINCT text) AS n_texts,
        TRUE AS xx64_deterministic,
        TRUE AS h32_deterministic,
        TRUE AS xx64_injective_on_texts,
        TRUE AS mono_ids_unique,
        TRUE AS buckets_in_range,
        TRUE AS bucket_count_bounded
    FROM documents
    """,
)
def hash_engine_specific(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 + hash + monotonically_increasing_id, asserted through
    engine-invariant properties (VERDICT r17 item 2).

    The raw hash values are Spark-internal (xxhash64 seed, Murmur3 h32,
    partition-encoded mono ids), so a value edge can never be
    oracle-confirmed — r16 scored the old rows-only form red
    (err no_oracle). The edge is therefore the PROPERTIES the functions
    guarantee, each reduced to a boolean DuckDB can state literally:
    determinism per input (max per-key distinct-hash count == 1),
    injectivity on this corpus (distinct xx64 == distinct text — a
    64-bit collision over ≤5k deterministic texts would be a data
    regression worth failing on), uniqueness of
    monotonically_increasing_id, and pmod bucket-spread bounds
    (range [0, 64) and distinct buckets ≤ min(64, n_texts) — a theorem,
    so scale-safe at every SF).
    """
    d = load(spark, sf_dir, "documents")
    hashed = d.select(
        "text",
        "lang",
        F.xxhash64("text").alias("xx64"),
        F.hash("text", "lang").alias("h32"),
        F.monotonically_increasing_id().alias("mono_id"),
        F.pmod(F.xxhash64("text"), F.lit(64)).alias("bucket"),
    )
    # determinism grains: xx64 is a function of text; h32 of (text, lang)
    per_text = hashed.groupBy("text").agg(
        F.countDistinct("xx64").alias("nxx")
    )
    per_text_lang = hashed.groupBy("text", "lang").agg(
        F.countDistinct("h32").alias("nh")
    )
    g = hashed.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_texts"),
        F.countDistinct("xx64").alias("n_xx"),
        F.countDistinct("mono_id").alias("n_mono"),
        F.countDistinct("bucket").alias("n_buckets"),
        F.min("bucket").alias("min_b"),
        F.max("bucket").alias("max_b"),
    )
    det_x = per_text.agg(F.max("nxx").alias("max_nxx"))
    det_h = per_text_lang.agg(F.max("nh").alias("max_nh"))
    return (
        g.crossJoin(det_x)
        .crossJoin(det_h)
        .select(
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_texts").cast("bigint").alias("n_texts"),
            (F.col("max_nxx") == 1).alias("xx64_deterministic"),
            (F.col("max_nh") == 1).alias("h32_deterministic"),
            (F.col("n_xx") == F.col("n_texts")).alias(
                "xx64_injective_on_texts"
            ),
            (F.col("n_mono") == F.col("n_docs")).alias("mono_ids_unique"),
            ((F.col("min_b") >= 0) & (F.col("max_b") <= 63)).alias(
                "buckets_in_range"
            ),
            (
                (F.col("n_buckets") >= 1)
                & (F.col("n_buckets") <= F.least(F.lit(64), F.col("n_texts")))
            ).alias("bucket_count_bounded"),
        )
    )
