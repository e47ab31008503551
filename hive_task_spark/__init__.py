"""hive_task_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities surveyed in SURVEY.md:
the reference (HiTECNOLOGYs/hive-task, /root/reference) is an STM-based
task-scheduling library whose entire execution machinery (scheduler,
worker pool, message transport, crash supervision — see
/root/reference/src/scheduler.lisp, worker-threads.lisp,
message-transport.lisp) is subsumed by the Spark driver/executor model.
What this package adds on top of Spark is the target-layer capability
inventory (SURVEY.md §2B): batch relational operators, scalar function
families, LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing), structured-streaming operators, and a
thin task-parallel parity shim mirroring the reference's six-symbol
public API (/root/reference/src/packages.lisp:74-82).

Every declared operator registers a named query plus (where
SQL-expressible) a DuckDB oracle; see ``hive_task_spark.registry``.
"""

from hive_task_spark.plans.session import get_session
from hive_task_spark.registry import ORACLES, QUERIES

__all__ = ["get_session", "QUERIES", "ORACLES"]
