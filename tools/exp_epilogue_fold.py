#!/usr/bin/env python
"""A/B the planes epilogue: separate minor-swap copies + fused finalize
(current) vs a slab-direct finalize whose output transpose is the fusion
root (VERDICT r2 item 7: fold the plane copies away).

Current epilogue (nearest, 4K 4:2:2): three assemble_plane_tiled minor-pair
swaps (~0.083 ms of pure copies) feeding one XLA-fused unpack/color pass
(~0.049 ms). The swap cannot ride the kernel's out_specs (the kernel's
vreg minor is the lane/segment axis; raster wants it above the in-segment
word index), but it CAN ride the epilogue itself: compute the whole
unpack + nearest-chroma + BT.601 + RGBA pack in the slab's own layout
(everything stays elementwise — y word q and chroma word q//fx of the same
(tile-column, mcu, lane) cover the same pixels), and let the one
raster-ordering transpose be the fusion ROOT of that pass. If XLA fuses
elementwise producers into the transpose emitter, the separate 33 MB r+w
of the plane copies disappears.

Usage: python tools/exp_epilogue_fold.py [--cpu]  (CPU: exactness only)
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

CPU = "--cpu" in sys.argv
if CPU:
    import jax

    jax.config.update("jax_platforms", "cpu")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from compeg_tpu.ops import fused as F
from compeg_tpu.pipeline import Decoder
from compeg_tpu.profiling import hard_sync
from compeg_tpu.scan import LANES

_T0 = time.perf_counter()


def p(msg):
    print(f"[{time.perf_counter()-_T0:7.1f}s] {msg}", flush=True)


def finalize_slab_nearest(slabs, geom, ri):
    """Nearest-sampling epilogue directly on raster-placed slabs; the final
    raster-ordering transpose is the pass's root. YCbCr 3-component only,
    chroma 1x1 (every supported subsampled mode)."""
    samplings = geom.samplings
    hy, vy = samplings[0]
    n_tc = geom.tiling[1]
    n_tr, RTy, My = slabs[0].shape
    rows = n_tr * RTy
    wqy = My // (n_tc * ri * LANES)
    mw = 4 * wqy
    y5 = slabs[0].reshape(rows, n_tc, ri, wqy, LANES)

    hc, vc = samplings[1]
    fx, fy = hy // hc, vy // vc
    nc_tr, RTc, Mc = slabs[1].shape
    rows_c = nc_tr * RTc
    wqc = Mc // (n_tc * ri * LANES)
    cb5 = slabs[1].reshape(rows_c, n_tc, ri, wqc, LANES)
    cr5 = slabs[2].reshape(rows_c, n_tc, ri, wqc, LANES)
    if fy > 1:
        # Nearest vertical: chroma row r feeds luma rows fy*r..fy*r+fy-1.
        cb5 = jnp.repeat(cb5, fy, axis=0)
        cr5 = jnp.repeat(cr5, fy, axis=0)

    outs = []
    for x in range(mw):
        q, b = divmod(x, 4)
        yv = ((y5[:, :, :, q, :] >> jnp.uint32(8 * b)) & jnp.uint32(255)).astype(jnp.int32)
        s = x // fx
        qc, bc = divmod(s, 4)
        cbv = ((cb5[:, :, :, qc, :] >> jnp.uint32(8 * bc)) & jnp.uint32(255)).astype(jnp.int32) - 128
        crv = ((cr5[:, :, :, qc, :] >> jnp.uint32(8 * bc)) & jnp.uint32(255)).astype(jnp.int32) - 128
        r = jnp.clip(yv + ((45 * crv) >> 5), 0, 255)
        g = jnp.clip(yv - ((11 * cbv + 23 * crv) >> 5), 0, 255)
        bb = jnp.clip(yv + ((113 * cbv) >> 6), 0, 255)
        outs.append(r | (g << 8) | (bb << 16) | jnp.int32(-16777216))
    out = jnp.stack(outs, axis=3)  # [rows, tc, m, x, lane]
    out = out.transpose(0, 1, 4, 2, 3)  # [rows, tc, lane, m, x]
    out = out.reshape(rows, n_tc * LANES * ri * mw)
    return jax.lax.bitcast_convert_type(
        out[: geom.height, : geom.width], jnp.uint32
    )


def main():
    data = open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "bench_assets", "bench4k.jpg"), "rb",
    ).read()
    if CPU:
        # Tiny 422 stream instead: interpret-mode 4K is too slow.
        import io

        from PIL import Image

        from compeg_tpu import encoder

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (48, 128, 3), dtype=np.uint8)
        data = encoder.encode(img, sampling="422", quality=90,
                              restart_interval_mcus=1)
    dec = Decoder(interpret=CPU)
    pf = dec.prepare(data)
    consts = dec._stream_consts(pf)
    words = jax.device_put(F._as_blocks(pf.words) if hasattr(F, "_as_blocks")
                           else pf.words)
    from compeg_tpu.pipeline import _as_blocks

    words = jax.device_put(_as_blocks(pf.words))
    hard_sync(words)
    geom, plan = pf.geom, pf.plan
    p(f"prepared backend={jax.default_backend()}")

    slabs = F.fused_decode_planes(
        words, pf.seg_mcus, consts, plan, geom.samplings, geom.tiling,
        interpret=CPU,
    )
    slabs = tuple(jax.device_put(np.asarray(s)) for s in slabs)
    hard_sync(slabs[-1])
    p("slabs ready")

    @functools.partial(jax.jit, static_argnames=())
    def current(slabs):
        planes = tuple(
            F.assemble_plane_tiled(s, geom, sh, sv)
            for s, (sh, sv) in zip(slabs, geom.samplings)
        )
        return F.finalize_planes(
            planes, geom.samplings, geom.width, geom.height, False,
            rgb=geom.rgb,
        )

    @functools.partial(jax.jit, static_argnames=())
    def folded(slabs):
        return finalize_slab_nearest(slabs, geom, plan.ri)

    a = np.asarray(current(slabs))
    b = np.asarray(folded(slabs))
    print("bit-identical:", np.array_equal(a, b), flush=True)
    if not np.array_equal(a, b):
        d = a != b
        print("mismatches:", d.sum(), "first:", np.argwhere(d)[:4], flush=True)
        return
    if CPU:
        return

    def trace_ms(fn, tag):
        out = fn(slabs)
        hard_sync(out)
        logdir = f"/tmp/tr_epi_{tag}_{int(time.time())}"
        jax.profiler.start_trace(logdir)
        for _ in range(5):
            out = fn(slabs)
        hard_sync(out)
        jax.profiler.stop_trace()
        fs = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
        d = json.load(gzip.open(fs[-1]))
        pids = {e["pid"]: e["args"].get("name", "") for e in d["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        agg = collections.defaultdict(float)
        for e in d["traceEvents"]:
            if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
                agg[e.get("name", "")[:48]] += e.get("dur", 0)
        tot = 0.0
        for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:8]:
            p(f"  {tag}: {dur/5e3:7.3f} ms {name}")
            if not name.startswith("jit_"):
                tot += dur
        p(f"  {tag}: SUM(non-jit) {tot/5e3:.3f} ms")
        return tot / 5e3

    t_cur = trace_ms(current, "current")
    t_fold = trace_ms(folded, "folded")
    p(f"current {t_cur:.3f} ms vs folded {t_fold:.3f} ms "
      f"({'FOLDED WINS' if t_fold < t_cur else 'current wins'})")


if __name__ == "__main__":
    main()
