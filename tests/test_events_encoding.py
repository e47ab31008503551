"""Regression tests for the events.ts parquet encoding.

The driver's testdata has shipped events.ts under two different parquet
logical types across rounds: TIMESTAMP(NANOS) (rounds 1-2, read by Spark
as a BIGINT of nanos under ``legacy.parquet.nanosAsLong``) and
TIMESTAMP_MICROS / isAdjustedToUTC=0 (round 3+, read as TIMESTAMP_NTZ).
A hardcoded assumption either crashes (batch: BINARY_OP_DIFF_TYPES) or —
far worse — is silently 1000x off (streaming LongType schema over a
MICROS file). These tests pin ``tables.normalize_events_ts`` to handle
BOTH encodings and assert the decoded values land in the fixture's real
date range, so a future testdata regeneration cannot pass silently.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_task_spark.tables import load, normalize_events_ts

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "_scratch")

# The fixture generator writes one month of 2024 events; anything outside
# a generous bracket means a unit error (1000x off lands in 1970 or 56941).
_LO = datetime.datetime(2020, 1, 1)
_HI = datetime.datetime(2035, 1, 1)


def test_actual_testdata_footer_is_a_known_encoding(sf_dir):
    """Probe the real parquet footer: we only claim support for the two
    encodings normalize_events_ts handles. A third encoding should fail
    loudly here, not deep inside 27 queries."""
    f = pq.read_schema(f"{sf_dir}/events.parquet").field("ts")
    assert f.type in (
        pa.timestamp("us"),
        pa.timestamp("us", tz="UTC"),
        pa.timestamp("ns"),
        pa.timestamp("ns", tz="UTC"),
        pa.int64(),
    ), f"unrecognized events.ts encoding: {f.type}"


def test_load_decodes_current_testdata_into_real_range(spark, sf_dir):
    df = load(spark, sf_dir, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    row = df.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    assert _LO <= row["lo"] <= row["hi"] <= _HI, (row["lo"], row["hi"])


@pytest.fixture(scope="module")
def nanos_events_dir(spark, sf_dir):
    """Synthesize a legacy TIMESTAMP(NANOS) events.parquet in _scratch
    from the real fixture, to exercise the nanos branch."""
    out = os.path.join(_SCRATCH, "events_nanos_fixture")
    os.makedirs(out, exist_ok=True)
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    ts_ns = tbl.column("ts").cast(pa.timestamp("ns"))
    tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts_ns)
    # store_schema=False drops the Arrow schema hint so readers see the
    # raw parquet logical type TIMESTAMP(NANOS), like the r1-2 testdata.
    pq.write_table(tbl, os.path.join(out, "events.parquet"),
                   version="2.6", store_schema=False)
    return out


def test_load_handles_legacy_nanos_encoding(spark, sf_dir, nanos_events_dir):
    f = pq.read_schema(f"{nanos_events_dir}/events.parquet").field("ts")
    assert f.type == pa.timestamp("ns"), f.type
    legacy = load(spark, nanos_events_dir, "events")
    assert isinstance(legacy.schema["ts"].dataType, T.TimestampType)
    current = load(spark, sf_dir, "events")
    lrow = legacy.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    crow = current.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    assert (lrow["lo"], lrow["hi"]) == (crow["lo"], crow["hi"])


def test_normalize_is_noop_on_already_timestamp(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 5, 12, 0, 0))], "event_id long, ts timestamp"
    )
    out = normalize_events_ts(df)
    assert isinstance(out.schema["ts"].dataType, T.TimestampType)
    assert out.collect()[0]["ts"] == datetime.datetime(2024, 1, 5, 12, 0, 0)


def test_stream_windows_land_in_real_date_range(spark, sf_dir):
    """The r2 bug class: a wrong streaming schema read MICROS as raw
    longs and produced 1000x-off event times — green rows, wrong windows.
    Pin every ts-sensitive stream's window starts to the fixture range."""
    from hive_task_spark.streaming.stream_queries import stream_tumbling_window

    out = stream_tumbling_window(spark, sf_dir)
    row = out.agg(
        F.min("window_start_s").alias("lo"), F.max("window_start_s").alias("hi")
    ).collect()[0]
    lo_s = int(_LO.replace(tzinfo=datetime.timezone.utc).timestamp())
    hi_s = int(_HI.replace(tzinfo=datetime.timezone.utc).timestamp())
    assert lo_s <= row["lo"] <= row["hi"] <= hi_s, (row["lo"], row["hi"])
