"""Two-phase-commit behavior of the custom Python DataSource writer
(sources/readers.py _JsonLinesSink): commit publishes the manifest
only when every partition succeeded; a failing partition aborts the
job and the manifest must NOT exist — readers never observe a partial
write as committed.
"""

from __future__ import annotations

import json
import os

import pytest

from hive_task_spark.scratch import scratch_path
from hive_task_spark.sources.readers import _JsonLinesSink, _JsonLinesWriter


class _FailingSink(_JsonLinesSink):
    """Same sink, but every write() raises — models a partition-level
    egress failure (remote endpoint down, quota hit)."""

    @classmethod
    def name(cls):
        return "pyjsonlsink_failing"

    def writer(self, schema, overwrite):
        return _FailingWriter(self.options, schema)


class _FailingWriter(_JsonLinesWriter):
    def write(self, iterator):
        raise RuntimeError("simulated partition egress failure")


def test_successful_write_publishes_manifest(spark):
    path = scratch_path("pysink_commit_ok")
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    spark.dataSource.register(_JsonLinesSink)
    df = spark.range(100).selectExpr("id", "id * 3 AS trip")
    df.repartition(4).write.format("pyjsonlsink").option("path", path).mode(
        "append"
    ).save()
    with open(os.path.join(path, "_MANIFEST")) as fh:
        manifest = json.load(fh)
    assert manifest["rows"] == 100
    assert manifest["parts"] == [0, 1, 2, 3]


def test_failed_partition_aborts_without_manifest(spark):
    path = scratch_path("pysink_abort")
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    spark.dataSource.register(_FailingSink)
    df = spark.range(100).selectExpr("id", "id * 3 AS trip")
    with pytest.raises(Exception, match="simulated partition egress failure"):
        df.repartition(4).write.format("pyjsonlsink_failing").option(
            "path", path
        ).mode("append").save()
    # the two-phase contract: no commit manifest after an aborted job
    assert not os.path.exists(os.path.join(path, "_MANIFEST"))
