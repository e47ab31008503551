"""Parity-shim behavior tests (SURVEY.md §2C): fire-and-forget
submission, crash tolerance, idempotent lifecycle — the observable
semantics of the reference's six-symbol API, driven through Spark."""

from __future__ import annotations

import time

from hive_task_spark.scheduler import (
    make_scheduler,
    make_work,
    put_work,
    start_scheduler,
    stop_scheduler,
)


def _wait(pred, timeout=10.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.01)
    return False


def test_lifecycle_idempotent():
    s = make_scheduler(pool_size=2)
    assert not s.running
    start_scheduler(s)
    start_scheduler(s)  # idempotent
    assert s.running
    stop_scheduler(s)
    stop_scheduler(s)  # idempotent
    assert not s.running


def test_fire_and_forget_and_crash_recovery():
    s = make_scheduler(pool_size=4)
    start_scheduler(s)
    hits = []
    put_work(s, make_work(hits.append, 1))
    put_work(s, make_work(lambda: 1 / 0))  # crashes; pool must survive
    put_work(s, make_work(hits.append, 2))
    assert _wait(lambda: s.done_count == 2 and s.crash_count == 1)
    assert sorted(hits) == [1, 2]
    assert isinstance(s.crashes[0], ZeroDivisionError)
    stop_scheduler(s)


def test_spark_job_through_shim(spark, sf_dir):
    """put_work submitting real Spark jobs concurrently (FAIR pool)."""
    from hive_task_spark.tables import load

    s = make_scheduler(pool_size=4)
    start_scheduler(s)
    counts = {}
    for name in ("nation", "region"):
        put_work(
            s,
            make_work(
                lambda n=name: counts.__setitem__(n, load(spark, sf_dir, n).count())
            ),
        )
    assert _wait(lambda: s.done_count == 2)
    assert counts["nation"] == 25 and counts["region"] == 5
    stop_scheduler(s)


def test_put_work_requires_running():
    s = make_scheduler()
    try:
        put_work(s, make_work(print))
        raise AssertionError("expected RuntimeError")
    except RuntimeError:
        pass
