#!/usr/bin/env python
"""Steady-state streaming measurement: can the host feed one chip?

The chip decodes a 4K frame in ~0.82 ms (1224 fps). One prepare thread
takes ~1.7 ms/frame on this 4-vCPU VM, so a stream needs concurrent
prepares. This tool measures what the extrapolation claimed:

 1. AGGREGATE prepare throughput with T in-flight prepare threads on one
    shared Decoder (the StreamDecoder configuration) — the host-side feed
    rate. host_fps(T) >= chip_fps for some T <= cores is the "host can
    feed the chip" criterion.
 2. A full on-chip StreamDecoder run with a profiler trace, reporting the
    device-busy fraction between first and last kernel. On this rig the
    tunnel link (~10-35 MB/s h2d) dominates, so the device-idle number
    measures the LINK, not the host — reported for honesty, judged by (1).
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from compeg_tpu.pipeline import Decoder

HERE = os.path.dirname(os.path.abspath(__file__))
data = open(os.path.join(HERE, "..", "bench_assets", "bench4k.jpg"), "rb").read()

print(f"cores={os.cpu_count()}", flush=True)
REPS = 40
results = {}
for pack_threads, label in ((None, "pooled pack"), (1, "1-thread pack")):
    dec = Decoder(pack_threads=pack_threads)
    dec.prepare(data)  # warm: width cache, native build, tile map, hdr cache
    for T in (1, 2, 4, 6):
        with ThreadPoolExecutor(T) as ex:
            t0 = time.perf_counter()
            list(ex.map(lambda _: dec.prepare(data), range(REPS)))
            dt = time.perf_counter() - t0
        fps = REPS / dt
        results[(pack_threads, T)] = fps
        print(f"prepare x{T} threads ({label}): {fps:7.1f} frames/s aggregate "
              f"({1e3/fps:.2f} ms/frame effective)", flush=True)

chip_fps = 1224.0  # trace-verified device rate (RESULTS.md, r4)
best = max(results.values())
print(f"host feed rate {best:.0f} fps vs chip {chip_fps:.0f} fps -> "
      f"{'HOST CAN FEED THE CHIP' if best >= chip_fps else 'HOST-BOUND'}",
      flush=True)

if "--device" in sys.argv:
    import collections
    import glob
    import gzip
    import json

    import jax

    from compeg_tpu.batch import StreamDecoder
    from compeg_tpu.profiling import hard_sync

    sd = StreamDecoder(depth=3, prepare_threads=4)
    # Warm compile.
    out = None
    for out in sd.decode_iter([data] * 2):
        pass
    hard_sync(out)
    N = 12
    logdir = f"/tmp/tr_stream_{int(time.time())}"
    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    for out in sd.decode_iter([data] * N):
        pass
    hard_sync(out)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    fs = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    d = json.load(gzip.open(fs[-1]))
    pids = {e["pid"]: e["args"].get("name", "") for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    busy = 0.0
    lo, hi = float("inf"), 0.0
    for e in d["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            if e.get("name", "").startswith("jit_"):
                continue
            busy += e.get("dur", 0)
            lo = min(lo, e["ts"])
            hi = max(hi, e["ts"] + e.get("dur", 0))
    span = hi - lo
    print(f"stream {N} frames: wall {wall:.2f}s ({N/wall:.1f} fps e2e, "
          f"link-bound on this rig)")
    print(f"device busy {busy/1e3:.1f} ms over span {span/1e3:.1f} ms -> "
          f"idle {(1 - busy/span)*100:.1f}% (measures the tunnel link here)")
