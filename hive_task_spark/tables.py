"""Test-table loaders for /root/testdata/sf*/ (schemas: FIXTURES.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hive_task_spark.plans.session import apply_runtime_conf

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always be broadcast in joins at any scale.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; pins runtime conf (UTC) on first touch."""
    apply_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts arrives as raw nanos (legacy.parquet.nanosAsLong) — convert
        # to a real timestamp at µs precision (lossless: data µs-aligned).
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view for SQL-phrased queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
