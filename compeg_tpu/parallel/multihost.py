"""Multi-host initialization and scaling measurement.

The reference is single-device; this engine scales batched decode over TPU
pod slices. The recipe:

 * each host calls :func:`init_distributed` (jax.distributed) once,
 * a global ``(hosts*chips_data, chips_seq)`` mesh is built over all
   devices (``global_mesh``) — DP shards ride DCN across hosts, band (seq)
   shards stay on ICI within a host,
 * every host feeds its local shard of the frame batch
   (``jax.make_array_from_process_local_data``) into the same
   ``decode_batch_sharded`` program.

On a single-process rig the same program runs on a virtual CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``), which is how
``bench_scaling.py`` measures scaling efficiency of the sharded program
structure without pod hardware.
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

import jax

from ..errors import bail
from .sharding import make_mesh


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed for a multi-host pod slice. No-op when
    single-process (the common dev case)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(n_seq: int = 1):
    """Mesh over every device in the job: data axis spans hosts (DCN) and
    chips, seq axis stays within a host (ICI)."""
    n = len(jax.devices())
    if n % n_seq:
        bail(f"{n} devices not divisible by seq={n_seq}")
    return make_mesh(n // n_seq, n_seq)


def measure_scaling(
    decode_fn,
    batch_for,
    device_counts: List[int],
    iters: int = 3,
) -> List[Tuple[int, float, float]]:
    """Weak-scaling measurement: for each n in ``device_counts`` decode a
    batch proportional to n on an n-device mesh. Returns
    ``[(n, frames_per_s, efficiency_vs_smallest)]``."""
    results = []
    base_rate = None
    for n in device_counts:
        args = batch_for(n)
        out = decode_fn(n, *args)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = decode_fn(n, *args)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        frames = args[0].shape[0]
        rate = frames / dt
        if base_rate is None:
            base_rate = rate / n
        results.append((n, rate, rate / (n * base_rate)))
    return results
