"""Memory-envelope guards: the graph ops must complete at sf0.1 under
a deliberately SMALL (1 GiB) driver.

This is the end-to-end twin of
test_plans.test_copurchase_edge_stats_stay_above_broadcast_threshold:
during the round-7 kernel experiment, understated checkpoint stats made
AQE broadcast the 1.2M-row edge list and exactly these two operators
OOMed the default driver at sf0.1. A plan-stats test can miss a future
regression that arrives through a different mechanism; actually running
the ops in a memory-capped subprocess cannot.

Subprocess because driver memory is fixed at JVM launch — the pytest
session's context can't be resized.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
import __spark_entry__ as E
spark = (SparkSession.builder.master("local[8]")
    .config("spark.driver.memory", "1g")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
n = len(E.queries()[{name!r}](spark, {sf!r}).collect())
print("ROWS:" + str(n))
spark.stop()
"""


@pytest.mark.skipif(not os.path.isdir(SF01), reason="sf0.1 testdata absent")
@pytest.mark.parametrize(
    # kcore/louvain: the two r7 broadcast-OOM casualties; minhash: the
    # heaviest bench row (banded LSH, 5 exchanges) — its corpus shuffle
    # carries flat 64-long signatures, which this pins end-to-end.
    "name",
    ["analytics_kcore", "analytics_louvain_one_level", "dedup_minhash_lsh"],
)
def test_graph_ops_fit_small_driver(name):
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO, name=name, sf=SF01)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [ln for ln in proc.stdout.splitlines() if ln.startswith("ROWS:")]
    assert rows and int(rows[-1][5:]) > 0
