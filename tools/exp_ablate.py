#!/usr/bin/env python
"""On-chip ablation probe of the fused kernel's phase budget.

Times fused_decode_blocks (tiled composite path) under the _ablate knobs:
  ""           full kernel
  densestore   AC commit = dense row-0 store (removes the 64-row masked
               store, keeps identical control flow) -> masked-store share
  noidct       phases 1+3 only -> IDCT share
  nop23        phase 1 only    -> entropy share

Each timing is a 30-dispatch async window fenced by hard_sync with the
link RTT subtracted (see bench.py for why block_until_ready is not
enough on this rig).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

from compeg_tpu.pipeline import Decoder
from compeg_tpu.profiling import hard_sync
from compeg_tpu.ops import fused as F

_T0 = time.perf_counter()


def p(msg):
    print(f"[{time.perf_counter()-_T0:7.1f}s] {msg}", flush=True)


data = open(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 "bench_assets", "bench4k.jpg"), "rb"
).read()
dec = Decoder()
pf = dec.prepare(data)
pf.words = jax.device_put(pf.words)
idct_l = dec._stream_consts(pf)
hard_sync(pf.words)
p(f"prepared, backend={jax.default_backend()}")

ready = jax.device_put(np.zeros(256, np.uint32))
hard_sync(ready)
t_rtt = min(
    (lambda t0: (hard_sync(ready), time.perf_counter() - t0)[1])(time.perf_counter())
    for _ in range(5)
)
p(f"rtt {t_rtt*1e3:.1f} ms")


def run(ablate):
    out = F.fused_decode_blocks(
        pf.words, pf.seg_mcus, idct_l, pf.plan, pf.geom.samplings,
        tiled=True, _ablate=ablate,
    )
    hard_sync(out)
    p(f"{ablate or 'full':>12s}: compiled")
    n = 30
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        window = []
        for _ in range(n):
            window.append(
                F.fused_decode_blocks(
                    pf.words, pf.seg_mcus, idct_l, pf.plan,
                    pf.geom.samplings, tiled=True, _ablate=ablate,
                )
            )
            if len(window) > 4:
                window.pop(0)
        hard_sync(window[-1])
        best = min(best, (time.perf_counter() - t0 - t_rtt) / n)
    p(f"{ablate or 'full':>12s}: {best*1e3:.3f} ms/frame")
    return best


t_full = run("")
t_dense = run("densestore")
t_noidct = run("noidct")
t_nop23 = run("nop23")
p(
    f"masked-store share {1e3*(t_full-t_dense):.3f} ms | "
    f"idct share {1e3*(t_full-t_noidct):.3f} ms | "
    f"entropy-only {1e3*t_nop23:.3f} ms | "
    f"phase3 share {1e3*(t_noidct-t_nop23):.3f} ms"
)
