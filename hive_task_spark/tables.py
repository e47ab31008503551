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


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Coerce events.ts to TIMESTAMP regardless of how the parquet file
    encodes it. The testdata has shipped with two encodings so far:

      * TIMESTAMP(NANOS) → Spark reads a raw BIGINT of nanoseconds when
        ``spark.sql.legacy.parquet.nanosAsLong`` is set (data µs-aligned,
        so div-1000 is lossless);
      * TIMESTAMP_MICROS (isAdjustedToUTC=0) → Spark reads TIMESTAMP_NTZ;
        the session is pinned UTC so casting NTZ→TIMESTAMP is a no-op.

    Branch on the ACTUAL scan dtype — never assume the encoding (a
    testdata regeneration between rounds silently flipped it once).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampType):
        return df
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table; pins runtime conf (UTC) on first touch."""
    apply_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a temp view for SQL-phrased queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
