#!/usr/bin/env python
"""A/B: replace the assembly's XLA copy chain with one Pallas swap+crop.

The composite path's assembly is a (RI*mw, lane) minor-pair swap + crop
that XLA lowers to ~0.166 ms of copies (copy.1/2/3 + reshape + slice,
tools/trace_ops.py). This experiment lowers the same permutation as a
single Pallas pass whose out_shape is exactly [H, W] (crop fused via
partial edge blocks), testing whether Mosaic's in-kernel (rimw, L) minor
transpose beats XLA's copy chain.

Variants:
  base        decode_frame_fused as shipped
  pallas-a    kernel slab -> pallas swap (reshape/swapaxes in-kernel)
  pallas-b    same, per-x strided-read formulation
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import compeg_tpu.ops.fused as F
from compeg_tpu.pipeline import Decoder, decode_frame_fused
from compeg_tpu.profiling import hard_sync, trace_device_ms

LANES = F.LANES


def make_swap(n_tr, RT, n_tc, rimw, H, W, variant):
    def kernel_a(in_ref, out_ref):
        z = in_ref[0]  # (RT, rimw*LANES)
        y = z.reshape(RT, rimw, LANES).swapaxes(1, 2).reshape(RT, LANES * rimw)
        out_ref[...] = y

    def kernel_b(in_ref, out_ref):
        z = in_ref[0]
        cols = [z[:, x * LANES:(x + 1) * LANES] for x in range(rimw)]
        y = jnp.stack(cols, axis=-1).reshape(RT, LANES * rimw)
        out_ref[...] = y

    kernel = kernel_a if variant == "a" else kernel_b

    @jax.jit
    def run(slab):
        return pl.pallas_call(
            kernel,
            grid=(n_tr, n_tc),
            in_specs=[
                pl.BlockSpec((1, RT, rimw * LANES), lambda r, c: (r, 0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((RT, LANES * rimw), lambda r, c: (r, c),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(slab)

    return run


def main():
    data = open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "bench_assets", "bench4k.jpg"), "rb").read()
    dec = Decoder()
    pf = dec.prepare(data)
    geom = pf.geom
    idct_l = dec._stream_consts(pf)

    args = (pf.words, pf.seg_mcus, idct_l, pf.plan, geom, 64, False, False)
    base = decode_frame_fused(*args)
    hard_sync(base)
    ref = np.asarray(base)
    total, rows = trace_device_ms(lambda: decode_frame_fused(*args), 5)
    print(f"base: {total:.3f} ms/frame", flush=True)

    n_tr, n_tc = geom.tiling
    mh, mw = F._mcu_shape(geom.samplings)
    RT = F.SUBLANES * mh
    rimw = pf.plan.ri * mw
    H, W = geom.height, geom.width

    @functools.partial(jax.jit, static_argnames=())
    def blocks_only(words, seg_mcus, l):
        return F.fused_decode_blocks(
            words, seg_mcus, l, pf.plan, geom.samplings, 64, False, False,
            tiled=True, tiling=geom.tiling, rgb=geom.rgb,
        )

    for variant in ("a", "b"):
        swap = make_swap(n_tr, RT, n_tc, rimw, H, W, variant)

        @jax.jit
        def full(words, seg_mcus, l):
            return swap(blocks_only(words, seg_mcus, l))

        try:
            out = full(pf.words, pf.seg_mcus, idct_l)
            hard_sync(out)
        except Exception as e:
            print(f"pallas-{variant}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        a = np.asarray(out)
        ok = np.array_equal(a, ref)
        total, rows = trace_device_ms(
            lambda: full(pf.words, pf.seg_mcus, idct_l), 5)
        top = " | ".join(f"{ms:.3f} {n[:24]}" for ms, c, n in rows[:4])
        print(f"pallas-{variant}: {total:.3f} ms/frame identical={ok}  [{top}]",
              flush=True)


if __name__ == "__main__":
    main()
