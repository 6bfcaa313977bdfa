#!/usr/bin/env python
"""B=64 batch regression attack (VERDICT r4 #4).

Current: one jit, per-frame unrolled assembly -> XLA fuses the 64 per-frame
swap copies into wide slow copies (+19%/frame at B=64). Variants:

  base      shipped decode_batch_fused (tuple outputs)
  scan      one jit, lax.map over frames: dynamic-slice the frame's slab
            rows, assemble, write into [B, H, W] — copies run per frame,
            same shapes as the single-frame path (no horizontal widening)
  split     kernel-only jit + ONE per-frame assembly jit reused B times
            (dynamic row offset), outputs list of [H, W]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import compeg_tpu.batch as BM
import compeg_tpu.ops.fused as F
from compeg_tpu.batch import BatchDecoder
from compeg_tpu.pipeline import Decoder, _as_blocks
from compeg_tpu.profiling import hard_sync, trace_device_ms

LANES = F.LANES
data = open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "bench_assets", "bench4k.jpg"), "rb").read()

dec = Decoder()
pf = dec.prepare(data)
pf.words = jax.device_put(pf.words)
hard_sync(pf.words)
out = dec.decode_prepared(pf)
hard_sync(out)
single, _ = trace_device_ms(lambda: dec.decode_prepared(pf), 5)
print(f"single-frame device: {single:.3f} ms/frame", flush=True)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
bdec = BatchDecoder()
pfs = bdec.prepare_batch([data] * B)
words = jax.device_put(np.concatenate([p.words for p in pfs], axis=0))
hard_sync(words)
one = np.asarray(pfs[0].seg_mcus)
seg_mcus = jax.device_put(np.tile(one, (B, 1, 1)))
plan = bdec._batch_plan(pfs[0].plan, B)
geom = pfs[0].geom
idct_l = bdec._dec._stream_consts(pfs[0])
n_tr1, n_tc = geom.tiling
H, W = geom.height, geom.width


def run_variant(name, make_fn, reps=2):
    fn = make_fn()
    t0 = time.time()
    out = fn()
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    first = np.asarray(out[0] if isinstance(out, (tuple, list)) else out[0])
    ok = np.array_equal(first, ref0)
    total, _ = trace_device_ms(fn, reps)
    print(f"{name}: compile+first {compile_s:.1f}s, device {total:.2f} "
          f"ms/batch = {total/B:.3f} ms/frame  identical={ok}", flush=True)


# base
base_fn = lambda: BM.decode_batch_fused(
    words, seg_mcus, idct_l, plan, geom, B, 64, False, False, False)
out0 = base_fn()
jax.block_until_ready(out0)
ref0 = np.asarray(out0[0])
total, _ = trace_device_ms(base_fn, 2)
print(f"base: device {total:.2f} ms/batch = {total/B:.3f} ms/frame", flush=True)


def make_scan():
    @jax.jit
    def fn():
        blocks = F.fused_decode_blocks(
            _as_blocks(words), seg_mcus, idct_l, plan, geom.samplings,
            64, False, False, tiled=True, tiling=(B * n_tr1, n_tc),
            rgb=geom.rgb,
        )
        _, RT, M = blocks.shape
        rimw = M // (n_tc * LANES)

        def body(i):
            sl = jax.lax.dynamic_slice(
                blocks, (i * n_tr1, 0, 0), (n_tr1, RT, M))
            z = sl.reshape(n_tr1 * RT, n_tc, rimw, LANES)
            img = z.swapaxes(2, 3).reshape(n_tr1 * RT, M)
            return img[:H, :W]

        return jax.lax.map(body, jnp.arange(B))
    return fn


def make_split():
    kern = jax.jit(lambda: F.fused_decode_blocks(
        _as_blocks(words), seg_mcus, idct_l, plan, geom.samplings,
        64, False, False, tiled=True, tiling=(B * n_tr1, n_tc),
        rgb=geom.rgb,
    ))

    @jax.jit
    def asm(blocks, i):
        _, RT, M = blocks.shape
        rimw = M // (n_tc * LANES)
        sl = jax.lax.dynamic_slice(blocks, (i * n_tr1, 0, 0), (n_tr1, RT, M))
        z = sl.reshape(n_tr1 * RT, n_tc, rimw, LANES)
        img = z.swapaxes(2, 3).reshape(n_tr1 * RT, M)
        return img[:H, :W]

    def fn():
        blocks = kern()
        return [asm(blocks, i) for i in range(B)]
    return fn


run_variant("scan", make_scan)
run_variant("split", make_split)
