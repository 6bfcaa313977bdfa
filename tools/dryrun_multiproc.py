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


def worker(pid: int, nproc: int, port: int) -> None:
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from compeg_tpu.parallel.multihost import dryrun_multiprocess

    dryrun_multiprocess(pid, nproc, f"localhost:{port}")
    print(f"worker {pid}: ok", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--port", type=int, default=12355)
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.nproc, args.port)
        return 0

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--nproc", str(args.nproc),
             "--port", str(args.port), "--worker", str(pid)],
            env=env,
        )
        for pid in range(args.nproc)
    ]
    rc = 0
    for p in procs:
        try:
            if p.wait(timeout=600) != 0:
                rc = 1
        except subprocess.TimeoutExpired:
            p.kill()
            rc = 1
    print("multiproc dryrun:", "OK" if rc == 0 else "FAILED", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
