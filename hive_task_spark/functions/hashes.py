"""Hash/misc function family — SURVEY.md §2B "Scalar functions / Hash".

md5 and sha2-256 produce identical hex across engines (oracle-checked —
they anchor the exact-dedup operator). xxhash64 and
monotonically_increasing_id are engine-specific → rows-only.
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


@register("hash_engine_specific")  # rows-only: xxhash64/hash are Spark-internal
def hash_engine_specific(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 + hash + monotonically_increasing_id — partition-aware
    ids and shuffle-grade hashes (exact values engine-specific)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.xxhash64("text").alias("xx64"),
        F.hash("text", "lang").alias("h32"),
        F.monotonically_increasing_id().alias("mono_id"),
    )
