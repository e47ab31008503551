#!/usr/bin/env python3
"""Round-18 optimization harness: time + explain a subset of queries.

Usage:
    python tools/r18_measure.py <tag> <name> [<name> ...]
    python tools/r18_measure.py <tag> --headline

For each query: 3x noop-sink runs (best kept, guide §1.4), and the
`.explain("formatted")` text written to plans/r18/<name>_<tag>.txt
(tag = before|after|probe...). Prints one JSON line with the timings.
Uses the same session/env contract as bench.py ($SPARK_GRAFT_SF_DIR,
$SPARK_GRAFT_CPUS) so numbers are comparable.
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
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    registry.load_all()
    if names == ["--headline"]:
        import bench

        names = [n for n in bench.HEADLINE if n in registry.QUERIES]
    spark = get_session(app_name="r18_measure", cpus=cpus)
    os.makedirs(os.path.join(REPO, "plans", "r18"), exist_ok=True)
    # Warm the JVM + parquet footers once (excluded from timings).
    registry.QUERIES["q1_pricing_summary"](spark, sf_dir).count()
    out: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r18:{tag}:{name}")
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = registry.QUERIES[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        plan = registry.QUERIES[name](spark, sf_dir)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(os.path.join(REPO, "plans", "r18", f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"tag": tag, "queries": out, "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
