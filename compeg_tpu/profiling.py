"""Timing / tracing instrumentation.

The reference instruments its host path with per-stage wall timers logged at
trace level (``t_preprocess``, ``t_enqueue_writes`` in ``enqueue``,
``t_poll`` in ``decode_blocking``; reference src/lib.rs:391-412,472-475,
516-522). This module provides the same facility for this engine plus
device-side tracing hooks:

    with stage_timer("preprocess"):
        ...
    log_stats()                     # dump accumulated stats at trace level

    with device_trace("/tmp/trace"):   # jax.profiler wrapper
        decoder.decode(...)
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from dataclasses import dataclass
from typing import Dict, Iterator, Optional

log = logging.getLogger("compeg_tpu.profiling")


@dataclass
class StageStats:
    count: int = 0
    total_s: float = 0.0
    max_s: float = 0.0

    @property
    def mean_ms(self) -> float:
        return self.total_s / self.count * 1e3 if self.count else 0.0


_stats: Dict[str, StageStats] = defaultdict(StageStats)


@contextlib.contextmanager
def stage_timer(name: str) -> Iterator[None]:
    """Accumulate wall time for a named pipeline stage; logs at trace level
    (DEBUG-5) like the reference's ``time()`` helper (src/lib.rs:532-536)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        s = _stats[name]
        s.count += 1
        s.total_s += dt
        s.max_s = max(s.max_s, dt)
        log.debug("t_%s: %.3f ms", name, dt * 1e3)


def get_stats() -> Dict[str, StageStats]:
    return dict(_stats)


def reset_stats() -> None:
    _stats.clear()


def log_stats(level: int = logging.INFO) -> None:
    for name, s in sorted(_stats.items()):
        log.log(
            level,
            "%s: n=%d mean=%.3f ms max=%.3f ms",
            name,
            s.count,
            s.mean_ms,
            s.max_s * 1e3,
        )


def hard_sync(x) -> None:
    """Force *real* completion of a device array.

    On some remoted backends (the axon tunnel), ``block_until_ready`` can
    return at enqueue-ACK rather than execution completion, which silently
    breaks every wall-clock measurement. Reducing the array to a scalar and
    reading the 4 bytes back cannot complete before the producing computation
    has, so this is the reliable fence (cost: one link round trip).
    """
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.max(jnp.ravel(x)[:1]))


@contextlib.contextmanager
def device_trace(logdir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace wrapper (XLA device timeline -> TensorBoard format);
    no-op when no logdir is given."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
