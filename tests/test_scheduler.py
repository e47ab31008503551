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


def test_timer_relative_fires():
    """make_timer/start_timer: relative one-shot fires once
    (/root/reference/src/timers.lisp:12-27 semantics)."""
    import threading

    from hive_task_spark.scheduler import make_timer, start_timer

    fired = threading.Event()
    t = make_timer("t-rel", fired.set, 0.05)
    start_timer(t)
    assert fired.wait(timeout=2.0)


def test_timer_absolute_fires():
    """absolute? -> time is a POSIX timestamp, not a delay."""
    import threading
    import time

    from hive_task_spark.scheduler import make_timer, start_timer

    fired = threading.Event()
    t = make_timer("t-abs", fired.set, time.time() + 0.05, absolute=True)
    start_timer(t)
    assert fired.wait(timeout=2.0)


def test_timer_stop_unschedules():
    """stop_timer cancels a pending firing; idempotent on unstarted
    timers (/root/reference/src/timers.lisp:29-34)."""
    import threading
    import time

    from hive_task_spark.scheduler import make_timer, start_timer, stop_timer

    fired = threading.Event()
    t = make_timer("t-stop", fired.set, 0.3)
    start_timer(t)
    stop_timer(t)
    time.sleep(0.5)
    assert not fired.is_set()
    stop_timer(t)  # idempotent

    never = make_timer("t-never", fired.set, 0.1)
    stop_timer(never)  # safe on never-started


def test_timer_restart_reschedules():
    """Re-starting a scheduled timer replaces the pending firing."""
    import threading

    from hive_task_spark.scheduler import make_timer, start_timer

    count = {"n": 0}
    done = threading.Event()

    def bump():
        count["n"] += 1
        done.set()

    t = make_timer("t-re", bump, 0.2)
    start_timer(t)
    start_timer(t)  # reschedule before first firing
    assert done.wait(timeout=2.0)
    import time

    time.sleep(0.3)
    assert count["n"] == 1


def test_resize_scheduler_grow_and_shrink_error():
    """resize-pool parity (thread-pools.lisp:143-156): grow succeeds
    live (work submitted before AND after all completes); shrink below
    current size raises PoolShrinkingError."""
    import time

    import pytest

    from hive_task_spark.scheduler import (
        PoolShrinkingError,
        make_scheduler,
        make_work,
        put_work,
        resize_scheduler,
        start_scheduler,
        stop_scheduler,
    )

    s = make_scheduler(pool_size=2)
    start_scheduler(s)
    try:
        done = []
        put_work(s, make_work(lambda: done.append("a")))
        resize_scheduler(s, 4)
        assert s.pool_size == 4 and s.running
        put_work(s, make_work(lambda: done.append("b")))
        deadline = time.time() + 5
        while len(done) < 2 and time.time() < deadline:
            time.sleep(0.01)
        assert sorted(done) == ["a", "b"]
        with pytest.raises(PoolShrinkingError):
            resize_scheduler(s, 1)
        assert s.pool_size == 4
    finally:
        stop_scheduler(s)
