#!/usr/bin/env python
"""Launch a real 2-process jax.distributed CPU dryrun.

Spawns ``--nproc`` worker processes (4 virtual CPU devices each) that
together form one multi-controller JAX job: a global (data, seq) mesh over
8 devices spanning both processes, per-process shards fed through
``jax.make_array_from_process_local_data``, one cross-process ``shard_map``
decode step, per-process oracle check. This is the multi-host path that a
TPU pod slice would run (DP over DCN, bands over ICI) exercised without pod
hardware — VERDICT r1 item 10.

Usage: python tools/dryrun_multiproc.py [--nproc 2] [--port 12355]
Exit code 0 iff every worker passed.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(pid: int, nproc: int, port: int, bench: bool) -> None:
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    if bench:
        from compeg_tpu.parallel.multihost import bench_multiprocess

        fps = bench_multiprocess(pid, nproc, f"localhost:{port}")
        print(f"worker {pid}: fps={fps:.2f}", flush=True)
        return
    from compeg_tpu.parallel.multihost import dryrun_multiprocess

    dryrun_multiprocess(pid, nproc, f"localhost:{port}")
    print(f"worker {pid}: ok", flush=True)


def _launch(nproc: int, port: int, bench: bool):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count="
        + ("2 --xla_cpu_multi_thread_eigen=false" if bench else "4")
    )
    cmd = [sys.executable, os.path.abspath(__file__), "--nproc", str(nproc),
           "--port", str(port)]
    if bench:
        cmd.append("--bench")
    procs = [
        subprocess.Popen(cmd + ["--worker", str(pid)], env=env,
                         stdout=subprocess.PIPE, text=True)
        for pid in range(nproc)
    ]
    rc, outs = 0, []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
            if p.returncode != 0:
                rc = 1
        except subprocess.TimeoutExpired:
            p.kill()
            rc = 1
    return rc, outs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", type=int, default=12355)
    ap.add_argument(
        "--bench", action="store_true",
        help="time the real-work decode step: 1-process baseline vs "
        "--nproc processes (process-to-process weak scaling, one "
        "single-threaded XLA device per 'chip')",
    )
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.nproc, args.port, args.bench)
        return 0

    if args.bench:
        import re

        def fps_of(outs):
            vals = [float(m.group(1)) for o in outs
                    for m in [re.search(r"fps=([\d.]+)", o)] if m]
            return min(vals) if vals else 0.0  # slowest process = job rate

        rc1, o1 = _launch(1, args.port + 1, bench=True)
        rcn, on = _launch(args.nproc, args.port, bench=True)
        if rc1 or rcn:
            print("multiproc bench: FAILED", flush=True)
            return 1
        f1, fn = fps_of(o1), fps_of(on)
        eff = fn / (args.nproc * f1) if f1 else 0.0
        print(f"multiproc bench: 1 proc {f1:.1f} fps, {args.nproc} procs "
              f"{fn:.1f} fps -> process-to-process efficiency {eff:.2f}",
              flush=True)
        return 0

    rc, _ = _launch(args.nproc, args.port, bench=False)
    print("multiproc dryrun:", "OK" if rc == 0 else "FAILED", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
