#!/usr/bin/env python
"""A/B: layout constraints in the planes epilogue.

The final interleave chain today is fusion -> [2160,960,4]{0,2,1} ->
copy.6 -> reshape.20 {0,1} -> copy.7 {1,0}: 0.11 ms/4K frame of pure
layout shuffling because XLA assigns col-major layouts through the
epilogue. Constraining the stacked [H, W/4, 4] interleave to row-major
should turn the reshape into a bitcast and kill the copies — if the
fusion can emit that layout directly.

Variants:
  base          current code
  stack-rm      constrain stack result to row-major (0,1,2)
  planes-rm     constrain assembled planes to row-major (0,1)
  both
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.layout import Format, Layout, with_layout_constraint

import compeg_tpu.ops.fused as F
from compeg_tpu.pipeline import Decoder, decode_frame_fused_planes
from compeg_tpu.profiling import hard_sync, trace_device_ms

CONSTRAIN_STACK = [False]
CONSTRAIN_PLANES = [False]

_orig_nearest = F._finalize_planes_nearest_packed


def patched_nearest(planes, samplings, width, height, rgb, max_h, max_v):
    if CONSTRAIN_PLANES[0]:
        planes = tuple(
            with_layout_constraint(p, Format(Layout((0, 1)))) for p in planes
        )
    ys = [
        (jax.lax.shift_right_logical(planes[0], F.U32(8 * b)) & F.U32(0xFF))
        .astype(jnp.int32)
        for b in range(4)
    ]
    Wy = ys[0].shape[1]

    def chroma_grid(plane, sh, sv):
        f = max_h // sh
        fy = max_v // sv
        H, Wc = plane.shape
        p = plane
        if f > 1 or fy > 1:
            p = jnp.broadcast_to(p[:, None, :, None], (H, fy, Wc, f)).reshape(
                H * fy, Wc * f
            )
        sh16 = ((jnp.arange(Wy, dtype=F.U32) & F.U32(1)) * F.U32(16))[None, :]
        return [
            (jax.lax.shift_right_logical(p, sh16 + F.U32(8 * (b // 2)))
             & F.U32(0xFF)).astype(jnp.int32)
            for b in range(4)
        ]

    cbs = chroma_grid(planes[1], *samplings[1])
    crs = chroma_grid(planes[2], *samplings[2])
    rgba_subs = []
    for y, cb, cr in zip(ys, cbs, crs):
        cb = cb - 128
        cr = cr - 128
        r = jnp.clip(y + ((45 * cr) >> 5), 0, 255)
        g = jnp.clip(y - ((11 * cb + 23 * cr) >> 5), 0, 255)
        b = jnp.clip(y + ((113 * cb) >> 6), 0, 255)
        rgba_subs.append(r | (g << 8) | (b << 16) | jnp.int32(-16777216))
    hq, wq = rgba_subs[0].shape
    img3 = jnp.stack(rgba_subs, axis=2)
    if CONSTRAIN_STACK[0]:
        img3 = with_layout_constraint(img3, Format(Layout((0, 1, 2))))
    img = img3.reshape(hq, wq * 4)
    return jax.lax.bitcast_convert_type(img[:height, :width], F.U32)


def main():
    data = open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "bench_assets", "bench4k.jpg"), "rb").read()
    F._finalize_planes_nearest_packed = patched_nearest
    dec = Decoder()
    pf = dec.prepare(data)
    ref = None
    for name, cs, cp in (("base", False, False), ("stack-rm", True, False),
                         ("planes-rm", False, True), ("both", True, True)):
        CONSTRAIN_STACK[0] = cs
        CONSTRAIN_PLANES[0] = cp
        # new jit wrapper each time so the static config isn't cached
        inner = decode_frame_fused_planes.__wrapped__
        fn = jax.jit(
            inner,
            static_argnames=("plan", "geom", "retained", "interpret",
                             "exact_idct", "fancy"),
        )
        args = (pf.words, pf.seg_mcus, dec._stream_consts(pf), pf.plan,
                pf.geom, 64, False, False, False)
        try:
            out = fn(*args)
            hard_sync(out)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        a = np.asarray(out)
        if ref is None:
            ref = a
        ok = np.array_equal(a, ref)
        total, rows = trace_device_ms(lambda: fn(*args), 5)
        top = " | ".join(f"{ms:.3f} {n[:28]}" for ms, c, n in rows[:4])
        print(f"{name}: {total:.3f} ms/frame identical={ok}  [{top}]",
              flush=True)


if __name__ == "__main__":
    main()
