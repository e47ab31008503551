"""Session factory — the engine's "physical design" lives in conf.

The reference's entire bring-up path (make-scheduler → start-scheduler →
start-workers, /root/reference/src/scheduler.lisp:52-140) maps to this
one factory: Spark's driver + cluster manager ARE the scheduler, pool,
transport and supervision (SURVEY.md §3.1). Our job is only to pick the
right configuration posture.

100 TB posture notes (local[N] here, but every knob scales):
  * AQE on — runtime partition coalescing, skew-join splitting, and
    join-strategy switching replace any hand-scheduling.
  * Arrow on — every Python-side kernel (pandas UDFs) moves columnar
    batches, never rows.
  * UTC session timezone — deterministic timestamp semantics (and
    agreement with the DuckDB oracle, which is UTC-naive).
  * shuffle.partitions defaults to cores locally; on a real cluster the
    AQE coalescer makes the static number mostly irrelevant — set the
    initial number high (e.g. 2000+) and let AQE shrink it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Worker sizing — the analog of the reference's CPU-count probe
    (/root/reference/src/scheduler.lisp:16-22), delegated to the OS."""
    try:
        return max(2, int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 4))
    except ValueError:
        return os.cpu_count() or 4


def get_session(
    app_name: str = "hive_task_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Equivalent of the reference's ``make-scheduler`` + ``start-scheduler``
    (/root/reference/src/scheduler.lisp:52-103): idempotent bring-up of
    the execution substrate, sized to the machine.
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # FAIR mode so the scheduler shim's pool tag (scheduler.put_work
        # sets spark.scheduler.pool) actually shares the cluster across
        # concurrent submissions; under default FIFO the tag is inert.
        .config("spark.scheduler.mode", "FAIR")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Pin runtime-mutable conf on a session we did not create.

    The driver hands our queries an externally-built session; correctness
    must not depend on how it was constructed. Only runtime-settable keys
    belong here (timezone, Arrow, AQE).
    """
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.adaptive.enabled", "true"),
        # Legacy support: if events.parquet ever ships TIMESTAMP(NANOS)
        # again (it did in rounds 1-2), read it as a BIGINT of nanos and
        # let tables.normalize_events_ts convert. Harmless for the
        # current TIMESTAMP_MICROS encoding (conf only affects NANOS).
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # Python DataSource filter pushdown (Spark 4.1): a reader that
        # overrides pushFilters RAISES when this is off (the engine
        # refuses to silently ignore it), so it must be pinned on any
        # externally-built session before source_python_datasource_
        # pushdown plans. Only affects Python data sources.
        ("spark.sql.python.filterPushdown.enabled", "true"),
        # TIME data type (Spark 4.1): literals parse without it, but
        # make_time / EXTRACT / casts raise UNSUPPORTED_TIME_TYPE until
        # enabled. Runtime-settable; only affects queries that mention
        # TIME (date_time_type_suite).
        ("spark.sql.timeType.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on some builds — keep going
    # Scale knob, OFF by default (r18): the bench SFs put every base
    # table in ONE parquet split (maxPartitionBytes default 128 MB ≫
    # file size), so scans never parallelize locally — at 100 TB the
    # same default yields full parallelism, i.e. the local bench was
    # structurally serial at the scan. With every money edge now an
    # exact integer sum (order-independent), a smaller split size is
    # value-neutral; it stays an explicit env opt-in so the driver's
    # default bench remains comparable round-over-round (the r18
    # scaling demonstration sets it; see OPTIMIZATION_r18.md).
    split = os.environ.get("SPARK_GRAFT_MAX_SPLIT_BYTES", "")
    if split:
        try:
            spark.conf.set("spark.sql.files.maxPartitionBytes", split)
            spark.conf.set("spark.sql.files.openCostInBytes", "65536")
        except Exception:
            pass
    return spark
