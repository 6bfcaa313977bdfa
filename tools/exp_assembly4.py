#!/usr/bin/env python
"""A/B: assembly formulations for the composite path's minor swap + crop.

trace_ops shows the shipped assembly costs ~0.166 ms: 3 layout copies +
reshape + slice around one logical (rimw, L) swap of a 35 MB slab. Each
copy runs at HBM speed, so the win is fewer copies. Variants reformulate
the swap/crop so XLA can fuse the crop into the transpose copy:

  base       shipped: reshape4 -> swapaxes -> reshape2 -> slice2d
  crop3d     swapaxes -> view [rows, n_tc*L, rimw] -> slice3d -> reshape2
             (the W crop is rectangular in that view when mw | W)
  crop4d     row-crop on 4d before swap + col-crop via 3d view
  t5d        single lax.transpose on 5d incl. rows
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import compeg_tpu.ops.fused as F
from compeg_tpu.pipeline import Decoder
from compeg_tpu.profiling import hard_sync, trace_device_ms

LANES = F.LANES


def main():
    data = open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "bench_assets", "bench4k.jpg"), "rb").read()
    dec = Decoder()
    pf = dec.prepare(data)
    geom = pf.geom
    idct_l = dec._stream_consts(pf)
    n_tr, n_tc = geom.tiling
    H, W = geom.height, geom.width

    def blocks(words, seg_mcus, l):
        return F.fused_decode_blocks(
            words, seg_mcus, l, pf.plan, geom.samplings, 64, False, False,
            tiled=True, tiling=geom.tiling, rgb=geom.rgb,
        )

    def asm_base(slabs):
        n_tr_, RT, M = slabs.shape
        rimw = M // (n_tc * LANES)
        z = slabs.reshape(n_tr_ * RT, n_tc, rimw, LANES)
        img = z.swapaxes(2, 3).reshape(n_tr_ * RT, M)
        return img[:H, :W]

    def asm_crop3d(slabs):
        n_tr_, RT, M = slabs.shape
        rimw = M // (n_tc * LANES)
        z = slabs.reshape(n_tr_ * RT, n_tc, rimw, LANES)
        y = z.swapaxes(2, 3).reshape(n_tr_ * RT, n_tc * LANES, rimw)
        return y[:H, : W // rimw, :].reshape(H, W)

    def asm_crop4d(slabs):
        n_tr_, RT, M = slabs.shape
        rimw = M // (n_tc * LANES)
        z = slabs.reshape(n_tr_ * RT, n_tc, rimw, LANES)[:H]
        y = z.swapaxes(2, 3).reshape(H, n_tc * LANES, rimw)
        return y[:, : W // rimw, :].reshape(H, W)

    def asm_t5d(slabs):
        n_tr_, RT, M = slabs.shape
        rimw = M // (n_tc * LANES)
        z = slabs.reshape(n_tr_, RT, n_tc, rimw, LANES)
        y = jax.lax.transpose(z, (0, 1, 2, 4, 3))
        return y.reshape(n_tr_ * RT, M)[:H, :W]

    variants = [("base", asm_base), ("crop3d", asm_crop3d),
                ("crop4d", asm_crop4d), ("t5d", asm_t5d)]
    ref = None
    for name, asm in variants:
        @jax.jit
        def full(words, seg_mcus, l, asm=asm):
            return asm(blocks(words, seg_mcus, l))

        try:
            out = full(pf.words, pf.seg_mcus, idct_l)
            hard_sync(out)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        a = np.asarray(out)
        if ref is None:
            ref = a
        ok = np.array_equal(a, ref)
        total, rows = trace_device_ms(
            lambda: full(pf.words, pf.seg_mcus, idct_l), 5)
        top = " | ".join(f"{ms:.3f} {n[:20]}" for ms, c, n in rows[:6])
        print(f"{name}: {total:.3f} ms/frame identical={ok}  [{top}]",
              flush=True)


if __name__ == "__main__":
    main()
