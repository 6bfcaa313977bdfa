#!/usr/bin/env python
"""Device-profiler phase budget of the fused kernel (trace-based A/B).

Wall-clock timing through the tunnel is unreliable (CLAUDE.md); this probe
uses jax.profiler device traces instead. For each variant it profiles 5
dispatches and prints the Pallas kernel's device time per frame.

Variants: the planes (default-path) kernel, the composite kernel, and the
composite kernel under the _ablate knobs (unpairidct = round-1 per-sublane
IDCT; densestore = no 64-row masked AC store; noidct = phases 1+3;
nop23 = entropy only).
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

from compeg_tpu.pipeline import Decoder
from compeg_tpu.profiling import hard_sync
from compeg_tpu.ops import fused as F
from compeg_tpu.ops.luts import idct_dequant_matrices

_T0 = time.perf_counter()


def p(msg):
    print(f"[{time.perf_counter()-_T0:7.1f}s] {msg}", flush=True)


data = open(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 "bench_assets", "bench4k.jpg"), "rb"
).read()
dec = Decoder()
pf = dec.prepare(data)
paired = dec._stream_consts(pf)
unpaired = jax.device_put(idct_dequant_matrices(pf.qz_by_slot, 64))
pf.words = jax.device_put(pf.words)
hard_sync(pf.words)
p(f"prepared backend={jax.default_backend()}")


def kernel_time(tag, fn):
    out = fn()
    hard_sync(out if not isinstance(out, tuple) else out[-1])
    logdir = f"/tmp/tr_ablate_{tag}_{int(time.time())}"
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        out = fn()
    hard_sync(out if not isinstance(out, tuple) else out[-1])
    jax.profiler.stop_trace()
    fs = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    d = json.load(gzip.open(fs[-1]))
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in d["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.defaultdict(float)
    for e in d["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            name = e.get("name", "")
            if name.startswith("fused_decode"):
                agg[name] += e.get("dur", 0)
    t = sum(agg.values()) / 5e3
    p(f"{tag:>12s}: {t:.3f} ms/frame (kernel device time)")
    return t


kernel_time("planes", lambda: F.fused_decode_planes(
    pf.words, pf.seg_mcus, paired, pf.plan, pf.geom.samplings,
    pf.geom.tiling))
kernel_time("paired", lambda: F.fused_decode_blocks(
    pf.words, pf.seg_mcus, paired, pf.plan, pf.geom.samplings, tiled=True))
kernel_time("unpaired", lambda: F.fused_decode_blocks(
    pf.words, pf.seg_mcus, unpaired, pf.plan, pf.geom.samplings, tiled=True,
    _ablate="unpairidct"))
kernel_time("densestore", lambda: F.fused_decode_blocks(
    pf.words, pf.seg_mcus, paired, pf.plan, pf.geom.samplings, tiled=True,
    _ablate="densestore"))
kernel_time("noidct", lambda: F.fused_decode_blocks(
    pf.words, pf.seg_mcus, paired, pf.plan, pf.geom.samplings, tiled=True,
    _ablate="noidct"))
kernel_time("nop23", lambda: F.fused_decode_blocks(
    pf.words, pf.seg_mcus, paired, pf.plan, pf.geom.samplings, tiled=True,
    _ablate="nop23"))
