"""Per-process scratch root for queries that write local datasets.

Why per-process: the round-6 postmortem (VERDICT r6 item 4) — a
correctness sweep and pytest racing each other on the FIXED
``_scratch/cp_<name>`` streaming-checkpoint dirs abort with
CANNOT_WRITE_STATE_STORE / STREAM_FAILED, and the source round-trip
datasets (``nation_csv`` etc., rebuilt with mode=overwrite on every
call) can expose a half-written directory to a concurrent reader.
Keying every scratch path by PID makes harness runs disjoint: a sweep
and pytest can overlap safely.

Garbage control: on first use, directories belonging to dead PIDs are
removed (``/proc/<pid>`` probe — this sandbox is Linux-only), so
``_scratch/`` stays bounded across many harness runs.  ``_scratch``
itself is gitignored.
"""

from __future__ import annotations

import os
import shutil
import time

_BASE = os.path.join(os.path.dirname(os.path.dirname(__file__)), "_scratch")
_cleaned = False


_MAX_AGE_SECONDS = 6 * 3600


def _reap_stale_pid_dirs() -> None:
    """Best-effort removal of pid_* dirs whose owner process is gone.

    Second criterion: dirs older than _MAX_AGE_SECONDS by mtime are
    reaped even if /proc/<pid> exists — a recycled PID can belong to
    an unrelated long-lived process, which would otherwise keep a
    dead harness's scratch alive indefinitely. No harness run lives
    anywhere near 6h, so age is a safe liveness proxy.
    """
    try:
        entries = os.listdir(_BASE)
    except FileNotFoundError:
        return
    now = time.time()
    for entry in entries:
        if not entry.startswith("pid_"):
            continue
        try:
            pid = int(entry[4:])
        except ValueError:
            continue
        if pid == os.getpid():
            continue
        path = os.path.join(_BASE, entry)
        stale = not os.path.exists(f"/proc/{pid}")
        if not stale:
            try:
                stale = now - os.stat(path).st_mtime > _MAX_AGE_SECONDS
            except OSError:
                stale = False
        if stale:
            shutil.rmtree(path, ignore_errors=True)


def scratch_root() -> str:
    """This process's private scratch directory (created on demand)."""
    global _cleaned
    if not _cleaned:
        _reap_stale_pid_dirs()
        _cleaned = True
    root = os.path.join(_BASE, f"pid_{os.getpid()}")
    os.makedirs(root, exist_ok=True)
    return root


def scratch_path(name: str) -> str:
    """A named path under this process's private scratch root."""
    return os.path.join(scratch_root(), name)
