"""Hive-metastore persistence — the property the in-memory catalog
cannot have: tables created by one process are visible and queryable
from a LATER process through the shared (derby-backed) metastore.

Runs each phase in a fresh subprocess because catalogImplementation is
frozen at SparkContext creation and the pytest session fixture already
holds the in-memory-catalog context for this process.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_WRITER = """
import json, sys
sys.path.insert(0, {repo!r})
from hive_task_spark.sources.hive_catalog import hive_session, create_tables
spark = hive_session({base!r})
spark.sparkContext.setLogLevel("ERROR")
print("RESULT:" + json.dumps(create_tables(spark, {sf!r})))
spark.stop()
"""

_READER = """
import json, sys
sys.path.insert(0, {repo!r})
from hive_task_spark.sources.hive_catalog import hive_session, read_tables
spark = hive_session({base!r})
spark.sparkContext.setLogLevel("ERROR")
out = read_tables(spark)
out["tables"] = sorted(out["tables"])
print("RESULT:" + json.dumps(out))
spark.stop()
"""


def _run(script: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT:")][-1]
    return json.loads(line[len("RESULT:") :])


_MSCK = """
import json, sys
sys.path.insert(0, {repo!r})
from hive_task_spark.sources.hive_catalog import hive_session, external_table_msck
spark = hive_session({base!r})
spark.sparkContext.setLogLevel("ERROR")
print("RESULT:" + json.dumps(external_table_msck(spark, {sf!r}, {data!r})))
spark.stop()
"""


def test_msck_repair_discovers_backfilled_partitions(tmp_path):
    """External table + files landed out-of-band + MSCK REPAIR: the
    catalog must see zero partitions before the repair and every
    backfilled year after, with the full row count readable."""
    base = str(tmp_path / "hive_cat_msck")
    data = str(tmp_path / "orders_ext_data")
    out = _run(_MSCK.format(repo=REPO, base=base, sf=SF_DIR, data=data))
    assert out["before"] == 0
    assert out["after"] > 1
    assert out["rows"] == out["src_rows"]


_TRANSFORM = """
import json, sys
sys.path.insert(0, {repo!r})
from hive_task_spark.sources.hive_catalog import hive_session, hiveql_transform
spark = hive_session({base!r})
spark.sparkContext.setLogLevel("ERROR")
rows = hiveql_transform(spark, {sf!r})
print("RESULT:" + json.dumps(rows))
spark.stop()
"""


def test_hiveql_transform_roundtrips_identity(tmp_path):
    """SELECT TRANSFORM ... USING '/bin/cat' must round-trip nation
    exactly through the external-script serde."""
    base = str(tmp_path / "hive_cat_tf")
    rows = _run(_TRANSFORM.format(repo=REPO, base=base, sf=SF_DIR))
    assert len(rows) == 25
    assert rows[0][0] == 0 and rows[-1][0] == 24
    assert all(isinstance(k, int) and name for k, name in rows)


def test_hive_metastore_persists_across_processes(tmp_path):
    base = str(tmp_path / "hive_cat")
    written = _run(_WRITER.format(repo=REPO, base=base, sf=SF_DIR))
    assert written["nation"] == 25
    assert written["orders"] > 0

    seen = _run(_READER.format(repo=REPO, base=base))
    # the second process saw the first process's catalog entries
    assert "hive_nation" in seen["tables"]
    assert "hive_orders_by_year" in seen["tables"]
    assert seen["nation_rows"] == written["nation"]
    assert seen["orders_rows"] == written["orders"]
    # the partitioned table kept real Hive partitions, and pruning works
    assert seen["n_partitions"] > 1
    assert 0 < seen["pruned_n"] < seen["orders_rows"]
