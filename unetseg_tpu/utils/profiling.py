"""Tracing / profiling hooks (SURVEY §5: the reference has wall-clock-only
timing around inference and the whole image; we keep those — engine.py logs
"Inference time"/"Total processing time" lines and a structured JSONL — and
add stage-scoped timers plus an optional ``jax.profiler`` trace dump).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


class StageTimer:
    """Accumulating per-stage wall-clock timer.

    >>> t = StageTimer()
    >>> with t.stage("preprocess"): ...
    >>> t.summary()  # {"preprocess": {"calls": 1, "total_s": ...}}
    """

    def __init__(self) -> None:
        self._acc: Dict[str, list] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            entry = self._acc.setdefault(name, [0, 0.0])
            entry[0] += 1
            entry[1] += dt

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"calls": c, "total_s": s, "mean_s": s / max(c, 1)}
            for k, (c, s) in self._acc.items()
        }

    def reset(self) -> None:
        self._acc.clear()


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Optional XLA/TPU profiler trace (viewable in TensorBoard).

    No-op when log_dir is None or the profiler is unavailable (e.g. through
    tunneled backends, where trace collection can hang — see CLAUDE.md).
    """
    if not log_dir:
        yield
        return
    import jax

    # Only profiler START/STOP failures are swallowed ("profiling must never
    # break the pipeline").  The traced body's own exception must propagate:
    # wrapping the yield in a bare except made the generator yield twice,
    # so a body error surfaced as contextlib's "generator didn't stop after
    # throw()" RuntimeError instead of itself (round-4 review finding).
    prof = None
    try:
        prof = jax.profiler.trace(log_dir)
        prof.__enter__()
    except Exception:
        prof = None
    try:
        yield
    finally:
        if prof is not None:
            try:
                prof.__exit__(None, None, None)
            except Exception:
                pass
