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


def dryrun_multiprocess(
    process_id: int,
    num_processes: int = 2,
    coordinator_address: str = "localhost:12355",
    local_devices: int = 4,
) -> None:
    """One worker of a multi-process (multi-controller) dryrun.

    Exercises the real multi-host code path — ``jax.distributed.initialize``,
    a global mesh spanning processes, ``make_array_from_process_local_data``
    feeding per-process shards, and a cross-process ``shard_map`` decode —
    on ``local_devices`` virtual CPU devices per process. The launcher
    (``tools/dryrun_multiproc.py``) spawns ``num_processes`` of these; the
    same topology with real chips is a TPU pod slice with DP over DCN.

    Must run in a fresh process: caller sets
    ``XLA_FLAGS=--xla_force_host_platform_device_count=<local_devices>``
    before importing jax.
    """
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    init_distributed(coordinator_address, num_processes, process_id)
    n_global = num_processes * local_devices
    assert jax.device_count() == n_global, jax.device_count()
    assert len(jax.local_devices()) == local_devices

    from ..encoder import encode
    from ..metadata import analyze
    from ..pipeline import FrameGeometry
    from . import sharding as SH

    n_seq = 2
    mesh = global_mesh(n_seq=n_seq)
    n_data = n_global // n_seq

    h, w = 32, 32
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 7 % 256, yy * 5 % 256, (xx + yy) % 256], axis=-1
    ).astype(np.uint8)
    data = encode(img, sampling="422", quality=85, restart_interval_mcus=1)
    meta = analyze(data)
    bf = SH.prepare_banded(meta, n_seq)

    # Global batch of n_data identical frames, each process materializing
    # only the frames its local data-slots own.
    local_frames = n_data // num_processes
    words_l, seg_l = SH.stack_banded([bf] * local_frames)
    spec = P("data", "seq")
    words_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), words_l
    )
    seg_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), seg_l
    )

    out = SH.decode_batch_sharded(
        words_g,
        seg_g,
        jnp.asarray(bf.qz_by_slot),
        bf.plan,
        mesh=mesh,
        geom=FrameGeometry.from_image(meta),
        band_rows=bf.band_rows,
        tiling=bf.tiling,
        interpret=True,
    )
    out.block_until_ready()
    assert out.shape == (n_data, h, w), out.shape  # packed RGBA u32

    # Each process checks the frames it holds against the CPU oracle.
    from .. import golden
    from ..ops.fused import rgba_to_rgb_array

    want = golden.decode_rgb(data)
    for shard in out.addressable_shards:
        got = rgba_to_rgb_array(np.asarray(shard.data))  # [f_l, rows_l, W, 3]
        ref = want[shard.index[1]]  # same rows of the (identical) frame
        assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1, (
            process_id,
            shard.index,
        )
    jax.distributed.shutdown()


def bench_multiprocess(
    process_id: int,
    num_processes: int = 2,
    coordinator_address: str = "localhost:12356",
    local_devices: int = 2,
    frames_per_device: int = 2,
    iters: int = 8,
) -> float:
    """Timed multi-process decode step (real work, the jax.distributed
    path): every process feeds its local shard of a global data-parallel
    batch and times ``iters`` decode steps between global barriers.
    Returns this process's frames/s for the GLOBAL batch (the slowest
    process defines the job rate; the launcher takes the min).

    ``num_processes=1`` is the single-process baseline of the
    process-to-process weak-scaling comparison (tools/dryrun_multiproc.py
    --bench)."""
    import time as _time

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    init_distributed(coordinator_address, num_processes, process_id)
    n_global = num_processes * local_devices
    assert jax.device_count() == n_global

    from ..encoder import encode
    from ..metadata import analyze
    from ..pipeline import FrameGeometry
    from . import sharding as SH

    mesh = global_mesh(n_seq=1)
    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 3 % 256, yy * 5 % 256, (xx + yy) % 256], axis=-1
    ).astype(np.uint8)
    data = encode(img, sampling="422", quality=85, restart_interval_mcus=1)
    meta = analyze(data)
    bf = SH.prepare_banded(meta, 1)
    geom = FrameGeometry.from_image(meta)

    n_frames_local = local_devices * frames_per_device
    words_l, seg_l = SH.stack_banded([bf] * n_frames_local)
    spec = P("data", "seq")
    words_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), words_l
    )
    seg_g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), seg_l
    )
    qz = jnp.asarray(bf.qz_by_slot)

    def step():
        return SH.decode_batch_sharded(
            words_g, seg_g, qz, bf.plan, mesh=mesh, geom=geom,
            band_rows=bf.band_rows, tiling=bf.tiling, interpret=True,
        )

    step().block_until_ready()
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("bench_start")
    t0 = _time.perf_counter()
    out = None
    for _ in range(iters):
        out = step()
    out.block_until_ready()
    multihost_utils.sync_global_devices("bench_end")
    dt = (_time.perf_counter() - t0) / iters
    if num_processes > 1:
        jax.distributed.shutdown()
    return num_processes * n_frames_local / dt


def measure_scaling(
    decode_fn,
    batch_for,
    device_counts: List[int],
    iters: int = 3,
    trials: int = 1,
) -> List[Tuple[int, float, float]]:
    """Weak-scaling measurement: for each n in ``device_counts`` decode a
    batch proportional to n on an n-device mesh. Returns
    ``[(n, frames_per_s, efficiency_vs_smallest)]``. ``trials`` repeats the
    timed loop and keeps the MEDIAN (time-shared vCPUs steal cycles; a min
    would let the 1-device baseline harvest its single uncontended core
    moment while larger n — needing all cores quiet at once — cannot,
    biasing efficiency down)."""
    results = []
    base_rate = None
    for n in device_counts:
        args = batch_for(n)
        out = decode_fn(n, *args)
        out.block_until_ready()
        times = []
        for _ in range(max(1, trials)):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = decode_fn(n, *args)
            out.block_until_ready()
            times.append((time.perf_counter() - t0) / iters)
        import statistics

        med = statistics.median(times)
        frames = args[0].shape[0]
        rate = frames / med
        if base_rate is None:
            base_rate = rate / n
        results.append((n, rate, rate / (n * base_rate)))
    return results
