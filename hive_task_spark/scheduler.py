"""Reference-parity task façade — SURVEY.md §2C.

Mirrors the reference's entire public API (six symbols,
/root/reference/src/packages.lisp:74-82): ``make_scheduler``,
``start_scheduler``, ``stop_scheduler``, ``make_work``, ``put_work``
(+ the ``*scheduler*`` default instance as a module global).

Faithful semantics, Spark-native mechanics:

* submission is fire-and-forget with NO result handle — the reference
  discards the closure's return value
  (/root/reference/src/worker-threads.lisp:69-74) and never routes
  results back to the caller (scheduler.lisp:195-199);
* a crashed work item is recorded, not raised — the reference logs and
  keeps the pool alive (worker-threads.lisp:51-56, 59-67; restart loop
  scheduler.lisp:149-156). Here the pool thread survives and the
  failure count is observable (`crash_count`), which is strictly more
  than the reference exposes (its ``:crashed`` events are never read —
  SURVEY.md §2A #8);
* concurrency = CPU count, like the pool sizing probe
  (scheduler.lisp:16-22, 29-30);
* Spark jobs submitted through the shim run in a FAIR pool so many
  concurrent ``put_work`` submissions share the cluster — the Spark
  analog of the reference's random-worker dispatch
  (scheduler.lisp:168-173), done properly by the TaskScheduler.

~100 LoC by design: everything else the reference's 1,100-LoC
machinery does (queueing, transport, supervision, pacing) IS Spark's
driver (SURVEY.md §3, §7 step 0).
"""

from __future__ import annotations

import threading
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from hive_task_spark.plans.session import default_parallelism


@dataclass(frozen=True)
class Work:
    """A work unit: function + arguments (messages.lisp:3-9). The
    reference's `time_slices` budget is carried but, exactly like the
    reference (TODO scheduler.lisp:50), never enforced."""

    function: Callable
    arguments: tuple = ()
    time_slices: int = 10


@dataclass
class Scheduler:
    """Pool-backed scheduler (scheduler.lisp:28-43 analog)."""

    pool_size: int = field(default_factory=default_parallelism)
    fair_pool: str = "hive_task_shim"
    _executor: ThreadPoolExecutor | None = field(default=None, repr=False)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)
    crash_count: int = 0
    done_count: int = 0
    crashes: list = field(default_factory=list, repr=False)

    @property
    def running(self) -> bool:
        return self._executor is not None


def make_scheduler(pool_size: int | None = None) -> Scheduler:
    """Construct a scheduler sized to the machine (scheduler.lisp:52-95)."""
    return Scheduler(pool_size=pool_size or default_parallelism())


def start_scheduler(scheduler: Scheduler) -> None:
    """Idempotent start (scheduler.lisp:97-103)."""
    with scheduler._lock:
        if scheduler._executor is None:
            scheduler._executor = ThreadPoolExecutor(
                max_workers=scheduler.pool_size, thread_name_prefix="ht-worker"
            )


def stop_scheduler(scheduler: Scheduler) -> None:
    """Idempotent stop; drains in-flight work (scheduler.lisp:105-111 —
    minus its shutdown bug, SURVEY.md §2A #9)."""
    with scheduler._lock:
        ex, scheduler._executor = scheduler._executor, None
    if ex is not None:
        ex.shutdown(wait=True)


def make_work(function: Callable, *arguments, time_slices: int = 10) -> Work:
    """Wrap function+args as a work unit (scheduler.lisp:201-206)."""
    return Work(function=function, arguments=tuple(arguments), time_slices=time_slices)


def put_work(scheduler: Scheduler, work: Work) -> None:
    """Fire-and-forget submission (scheduler.lisp:195-199): no future,
    no result — crashes are recorded and the pool survives them."""
    if scheduler._executor is None:
        raise RuntimeError("scheduler is not running (call start_scheduler)")

    def _run() -> None:
        try:
            from pyspark.sql import SparkSession

            active = SparkSession.getActiveSession()
            if active is not None:
                # Share the cluster fairly across work items. Effective
                # when the hosting session runs spark.scheduler.mode=FAIR
                # (plans.session.get_session sets it); under FIFO the
                # pool tag is advisory and submissions run in order.
                active.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", scheduler.fair_pool
                )
            work.function(*work.arguments)
            with scheduler._lock:
                scheduler.done_count += 1
        except BaseException as exc:  # record-crash analog
            with scheduler._lock:
                scheduler.crash_count += 1
                scheduler.crashes.append(exc)

    scheduler._executor.submit(_run)


class PoolShrinkingError(ValueError):
    """Raised when a resize would shrink below the live worker count —
    the reference's `pool-shrinking-error` (thread-pools.lisp:147-150).
    Its `change-new-size` interactive restart becomes the obvious
    Python shape: catch, pick another size, call again."""


def resize_scheduler(scheduler: Scheduler, new_size: int) -> None:
    """Dynamic pool resize — `resize-pool` analog
    (/root/reference/src/thread-pools.lisp:143-156): growing updates
    the pool size (and, if running, swaps in a larger executor; the
    old one drains its in-flight work in the background, so no
    submitted work is lost — the supervision-tick grow path); shrinking
    below the current size signals `PoolShrinkingError` exactly like
    the reference. On a real cluster this knob is
    `spark.dynamicAllocation.*` (SCALE.md) — this facade resizes the
    driver-side submission pool only."""
    if new_size < scheduler.pool_size:
        raise PoolShrinkingError(
            f"cannot shrink pool from {scheduler.pool_size} to {new_size}"
        )
    with scheduler._lock:
        scheduler.pool_size = new_size
        if scheduler._executor is not None:
            old = scheduler._executor
            scheduler._executor = ThreadPoolExecutor(
                max_workers=new_size, thread_name_prefix="ht-worker"
            )
            old.shutdown(wait=False)


@dataclass
class Timer:
    """One-shot timer parity (/root/reference/src/timers.lisp:3-10):
    stores name, callback, duration and the relative/absolute flag so
    the timer can be (re)started when needed."""

    name: str
    function: Callable
    duration: float
    absolute: bool = False
    _handle: threading.Timer | None = field(default=None, repr=False)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)


def make_timer(
    name: str, function: Callable, time_s: float, absolute: bool = False
) -> Timer:
    """Construct (don't start) a one-shot timer
    (/root/reference/src/timers.lisp:12-19). ``time_s`` is seconds from
    now, or an absolute POSIX timestamp when ``absolute`` is true —
    the ``sb-ext:schedule-timer`` :absolute-p semantics."""
    return Timer(name=name, function=function, duration=time_s, absolute=absolute)


def start_timer(timer: Timer) -> None:
    """Schedule the timer (/root/reference/src/timers.lisp:21-27).
    Re-starting an already-scheduled timer re-schedules it (cancels the
    pending firing first), matching ``sb-ext:schedule-timer`` on an
    already-scheduled timer."""
    import time as _time

    delay = (
        max(0.0, timer.duration - _time.time()) if timer.absolute else timer.duration
    )
    with timer._lock:
        if timer._handle is not None:
            timer._handle.cancel()
        timer._handle = threading.Timer(delay, timer.function)
        timer._handle.daemon = True
        timer._handle.start()


def stop_timer(timer: Timer) -> None:
    """Unschedule without firing (/root/reference/src/timers.lisp:29-34);
    idempotent, safe on a never-started timer."""
    with timer._lock:
        if timer._handle is not None:
            timer._handle.cancel()
            timer._handle = None


#: default instance, the `*scheduler*` special variable (packages.lisp:75)
scheduler: Scheduler = make_scheduler()
