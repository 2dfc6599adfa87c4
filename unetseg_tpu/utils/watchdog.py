"""Wedged-backend watchdog for benchmark/driver entry points.

A wedged device tunnel passes device enumeration but hangs backend init or
the first execution indefinitely (observed 2026-08-18: a 6+ h
backend-UNAVAILABLE window).  A benchmark that hangs forever gives the
harness nothing; arming this watchdog BEFORE the first ``import jax``
(the backend-register hook itself can hang on a wedged relay) guarantees
one honest machine-readable error line and a non-zero exit instead.

This module must stay importable without jax (it is imported pre-jax by
design); single-sourced here so bench.py and benchmarks/run_all.py cannot
drift (round-4 review finding).
"""

import os
import threading
from typing import Callable


def arm_backend_watchdog(on_timeout: Callable[[float], None],
                         deadline_s: float = None) -> threading.Event:
    """Arm a daemon timer; call ``event.set()`` once the backend proved live.

    If the event is not set within the deadline (``BENCH_PROBE_TIMEOUT_S``
    env or 600 s), ``on_timeout(deadline_s)`` runs — it should print its
    report — and the PROCESS IS KILLED with ``os._exit(2)`` (a hung device
    call cannot be cancelled; exiting is the only way to unblock).
    """
    if deadline_s is None:
        deadline_s = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "600"))
    done = threading.Event()

    def _watch():
        if not done.wait(deadline_s):
            try:
                on_timeout(deadline_s)
            finally:
                os._exit(2)

    threading.Thread(target=_watch, daemon=True).start()
    return done
