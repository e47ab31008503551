#!/usr/bin/env python3
"""Time EVERY registered query once (noop sink) at $SPARK_GRAFT_SF_DIR.

Single run per query (not best-of-3): this is the outlier finder for
the r18 optimization round's full-registry audit, not a benchmark.
Prints one JSON line {name: sec} sorted by descending cost.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hive_task_spark import registry  # noqa: E402
from hive_task_spark.plans.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    registry.load_all()
    spark = get_session(app_name="r18_time_all", cpus=cpus)
    registry.QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    out: dict[str, float] = {}
    for name, fn in registry.QUERIES.items():
        spark.sparkContext.setJobDescription(f"r18:time_all:{name}")
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            out[name] = -1.0
            print(f"ERROR {name}: {str(exc)[:200]}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    for sq in spark.streams.active:
        sq.stop()
    spark.stop()
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    print(json.dumps(ranked))


if __name__ == "__main__":
    main()
