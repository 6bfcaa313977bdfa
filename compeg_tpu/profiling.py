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

    if isinstance(x, (tuple, list)):
        # Outputs of one executable complete together; fence the last.
        x = x[-1]
    np.asarray(jnp.max(jnp.ravel(x)[:1]))


def trace_device_ms(run_frame, frames: int = 5):
    """Device time per frame from a jax.profiler trace: sum of the XLA Ops
    lane over `frames` calls of ``run_frame()`` (dispatch the frame, return
    the output array).

    This is the rig's only trustworthy per-frame device number: wall clock
    through the tunnel drifts 2x between processes, and summing only the
    top-N trace ops undercounts the epilogue tail. Returns
    ``(total_ms_per_frame, rows)`` with rows = [(ms_per_frame, count, op)].
    """
    import collections
    import glob
    import gzip
    import json
    import os
    import tempfile

    import jax

    import shutil

    out = run_frame()
    hard_sync(out)
    logdir = tempfile.mkdtemp(prefix="compeg_trace_")
    try:
        jax.profiler.start_trace(logdir)
        for _ in range(frames):
            out = run_frame()
        hard_sync(out)
        jax.profiler.stop_trace()
        fs = sorted(glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                              recursive=True))
        if not fs:
            raise RuntimeError(
                "jax.profiler produced no trace file (non-TPU backend or "
                "profiler hiccup)"
            )
        d = json.load(gzip.open(fs[-1]))
    finally:
        shutil.rmtree(logdir, ignore_errors=True)
    pnames, tnames = {}, {}
    for e in d["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    agg = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    total = 0.0
    for e in d["traceEvents"]:
        if e.get("ph") != "X" or "TPU" not in pnames.get(e.get("pid"), ""):
            continue
        if tnames.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        agg[e.get("name", "")] += e.get("dur", 0)
        cnt[e.get("name", "")] += 1
        total += e.get("dur", 0)
    if total == 0.0:
        raise RuntimeError("trace contains no XLA-Ops-lane events")
    rows = sorted(
        ((v / frames / 1e3, cnt[k] // frames, k) for k, v in agg.items()),
        reverse=True,
    )
    return total / frames / 1e3, rows


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
