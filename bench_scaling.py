#!/usr/bin/env python
"""Scaling-efficiency benchmark of the sharded decode program.

Runs the sharded batched decode (data-parallel frames) on virtual CPU
meshes of 1/2/4/8 devices (weak scaling: batch ∝ devices) and reports
frames/s and efficiency. On a real pod slice the same program runs over
hosts+chips via parallel/multihost.py; this validates the program structure
and measures its parallel efficiency where we lack multi-chip hardware.

Methodology (round 5). Three measurements, because raw weak-scaling numbers
on a shared-core VM measure the machine, not the program:

1. **Mesh curve** — decode on 1/2/4/8 virtual devices, one XLA CPU compute
   thread per device (``--xla_cpu_multi_thread_eigen=false``; without it the
   1-device baseline already uses every core through XLA's intra-op pool and
   the curve measures thread contention — round 4's 0.79@4 artifact).
2. **Independent-process control** — the SAME single-device decode run in k
   fully independent processes (own XLA clients, no mesh, no shared runtime)
   started simultaneously. Its efficiency at k = cores is the ceiling this
   machine gives ANY k concurrent copies of the workload (measured here:
   ~0.79 — microarchitectural sharing that steal/turbo/bandwidth probes rule
   out of the accounting, i.e. a property of the silicon, not of jax or the
   program; each real TPU chip owns its compute + HBM, so this sharing does
   not exist on the target hardware).
3. **Orchestration probe** — same mesh/shard_map/jit structure with a
   trivial kernel: bounds per-dispatch overhead (µs-scale, negligible at
   frame granularity).

Headline = mesh efficiency at n=cores ÷ control efficiency at k=cores: the
program-attributable scaling efficiency. Raw values for every n are in the
JSON for inspection.

    python bench_scaling.py            # CPU virtual mesh (default 8-way)
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

os.environ.setdefault("XLA_FLAGS", "")
for flag in ("--xla_force_host_platform_device_count=8",
             "--xla_cpu_multi_thread_eigen=false"):
    if flag.split("=")[0] not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " " + flag

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

# One independent single-device decode worker for the control measurement:
# waits until the shared epoch, times N batches, prints fps.
_WORKER = r'''
import os, sys, time, json
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_cpu_multi_thread_eigen=false")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(here)r)
import numpy as np
import jax.numpy as jnp
from compeg_tpu import analyze, encoder
from compeg_tpu.parallel import sharding as SH
from compeg_tpu.pipeline import FrameGeometry

h, w = 64, 128
yy, xx = np.mgrid[0:h, 0:w]
img = np.stack([xx*3%%256, yy*5%%256, (xx+yy)%%256], axis=-1).astype(np.uint8)
data = encoder.encode(img, sampling="422", quality=85, restart_interval_mcus=1)
meta = analyze(data)
bf = SH.prepare_banded(meta, 1)
geom = FrameGeometry.from_image(meta)
mesh = SH.make_mesh(1, 1)
words, seg_mcus = SH.stack_banded([bf] * 2)
words, seg_mcus = jnp.asarray(words), jnp.asarray(seg_mcus)
qz = jnp.asarray(bf.qz_by_slot)
def run():
    return SH.decode_batch_sharded(words, seg_mcus, qz, bf.plan, mesh=mesh,
        geom=geom, band_rows=bf.band_rows, tiling=bf.tiling, interpret=True)
run().block_until_ready()
start = float(sys.argv[1])
late = time.time() >= start  # missed the start barrier: overlap is broken
while time.time() < start: time.sleep(0.005)
w0 = time.time()
t0 = time.perf_counter()
N = 16
for _ in range(N):
    out = run()
out.block_until_ready()
dt = time.perf_counter() - t0
print(json.dumps({"fps": 2*N/dt, "late": late, "t0": w0, "t1": w0 + dt}))
'''


def independent_process_control(k: int, warmup_s: float = 30.0) -> float:
    """Aggregate fps of k simultaneous independent single-device decoders."""
    body = _WORKER % {"here": HERE}
    start = time.time() + warmup_s
    ps = [subprocess.Popen([sys.executable, "-c", body, str(start)],
                           stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                           text=True) for _ in range(k)]
    try:
        outs = [p.communicate(timeout=600) for p in ps]
    except subprocess.TimeoutExpired:
        for p in ps:
            if p.poll() is None:
                p.kill()
        raise
    total = 0.0
    recs = []
    for p, (out, err) in zip(ps, outs):
        lines = out.strip().splitlines()
        if p.returncode != 0 or not lines:
            raise RuntimeError(
                f"control worker failed (rc={p.returncode}): {err[-800:]}"
            )
        recs.append(json.loads(lines[-1]))
        total += recs[-1]["fps"]
    # The k runs must actually overlap, or the "aggregate" is partially
    # serialized and overstates the machine ceiling (understating the
    # program efficiency it normalizes). A worker that reached the barrier
    # after the epoch (cold import/compile > warmup) breaks the overlap.
    if any(r.get("late") for r in recs) or (
        len(recs) > 1 and max(r["t0"] for r in recs) >= min(r["t1"] for r in recs)
    ):
        raise RuntimeError(
            "control workers did not overlap (cold start exceeded the "
            f"{warmup_s:.0f}s warmup barrier) — rerun with a larger warmup"
        )
    return total


def main() -> None:
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from compeg_tpu import analyze, encoder
    from compeg_tpu.parallel import sharding as SH
    from compeg_tpu.parallel.multihost import measure_scaling
    from compeg_tpu.pipeline import FrameGeometry

    # A modest frame so CPU interpret-mode timings stay tractable.
    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 3 % 256, yy * 5 % 256, (xx + yy) % 256], axis=-1
    ).astype(np.uint8)
    data = encoder.encode(img, sampling="422", quality=85, restart_interval_mcus=1)
    meta = analyze(data)
    bf = SH.prepare_banded(meta, 1)
    geom = FrameGeometry.from_image(meta)

    def batch_for(n):
        words, seg_mcus = SH.stack_banded([bf] * (2 * n))
        return jnp.asarray(words), jnp.asarray(seg_mcus)

    meshes = {}

    def decode_fn(n, words, seg_mcus):
        if n not in meshes:
            meshes[n] = SH.make_mesh(n, 1)
        return SH.decode_batch_sharded(
            words,
            seg_mcus,
            jnp.asarray(bf.qz_by_slot),
            bf.plan,
            mesh=meshes[n],
            geom=geom,
            band_rows=bf.band_rows,
            tiling=bf.tiling,
            interpret=True,
        )

    counts = [n for n in (1, 2, 4, 8) if n <= len(jax.devices())]
    results = measure_scaling(decode_fn, batch_for, counts, iters=8, trials=5)
    for n, rate, eff in results:
        print(f"# decode devices={n}: {rate:.1f} frames/s  efficiency={eff:.2f}",
              file=sys.stderr)

    # Orchestration probe: identical mesh/jit/dispatch structure, trivial
    # per-shard compute — its per-call time bounds the harness overhead.
    from jax import shard_map

    probe_jits = {}

    def probe_fn(n, words, seg_mcus):
        mesh = meshes.setdefault(n, SH.make_mesh(n, 1))
        if n not in probe_jits:
            fn = shard_map(
                lambda ws, sm: (ws * np.uint32(2)).sum(
                    axis=(1, 2, 3), dtype=np.uint32
                )[:, None],
                mesh=mesh,
                in_specs=(P("data"), P("data")),
                out_specs=P("data"),
            )
            probe_jits[n] = jax.jit(fn)
        return probe_jits[n](words, seg_mcus)

    def probe_batch_for(n):
        words = np.zeros((2 * n, 64, 9, 16), np.uint32)
        seg = np.zeros((2 * n, 64), np.int32)
        return jnp.asarray(words), jnp.asarray(seg)

    probe = measure_scaling(probe_fn, probe_batch_for, counts, iters=10,
                            trials=3)
    dispatch_overhead_ms = {
        n: round(2 * n / rate * 1e3, 3) for n, rate, _ in probe
    }
    print(f"# orchestration per-dispatch ms by n: {dispatch_overhead_ms}",
          file=sys.stderr)

    # Independent-process control at k=1 and k=cores.
    ncores = min(os.cpu_count() or 1, max(n for n, _, _ in results))
    c1 = independent_process_control(1)
    ck = independent_process_control(ncores)
    control_eff = ck / (ncores * c1)
    print(f"# control: 1 proc {c1:.1f} fps, {ncores} procs {ck:.1f} fps "
          f"-> machine ceiling {control_eff:.2f}", file=sys.stderr)

    eligible = [r for r in results if r[0] <= ncores] or results
    n, rate, eff = eligible[-1]
    program_eff = min(1.0, eff / control_eff) if control_eff else eff
    print(json.dumps({
        "metric": "sharded_decode_scaling_efficiency",
        "value": round(program_eff, 3),
        "unit": (f"program-attributable fraction at {n} virtual devices "
                 f"(mesh {eff:.3f} / machine ceiling {control_eff:.3f})"),
        "vs_baseline": round(program_eff / 0.85, 3),
        "mesh_efficiency_raw": round(eff, 3),
        "machine_ceiling_independent_procs": round(control_eff, 3),
        "dispatch_overhead_ms": dispatch_overhead_ms,
        "all_counts": {str(rn): round(re, 3) for rn, _, re in results},
    }))


if __name__ == "__main__":
    main()
