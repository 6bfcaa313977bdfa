#!/usr/bin/env python
"""Measure the two pieces of the sublane-stack assembly design at 4K shapes:

 (a) fused-epilogue candidate kernel: per x, stack the mh per-row [S, L]
     vectors along sublanes (works on axon Mosaic) and store a [RT, L] slab
     -> out [G, mw, RT, L]
 (b) the one remaining XLA pass: [n_tr, n_tc, mw, RT, L] ->
     [n_tr, RT, n_tc, L, mw] (+ reshape/crop), vs the direct raster value

Grid/shape model: 4K 4:2:2, RI=1: G=68 tiles (34x2), mh=8, mw=16, RT=64.
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L, X, R = 8, 128, 16, 8  # sublanes, lanes, mw, mh
RT = S * R
N_TR, N_TC = 34, 2
G = N_TR * N_TC
U32 = jnp.uint32

rng = np.random.default_rng(0)
x_np = rng.integers(0, 1 << 24, (G, S, R, X, L), dtype=np.uint32)
x_dev = jax.device_put(x_np)


def stack_epilogue_kernel(in_ref, out_ref):
    for x in range(X):
        rows = [in_ref[0, :, r, x] for r in range(R)]  # mh x [S, L]
        out_ref[0, x] = jnp.stack(rows, axis=1).reshape(RT, L)


def copy_epilogue_kernel(in_ref, out_ref):
    # Store-bandwidth floor with the same out spec (no sublane interleave).
    for x in range(X):
        out_ref[0, x] = in_ref[0, :, :, x].reshape(RT, L)


def call_epi(kernel):
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, S, R, X, L), lambda g: (g, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, X, RT, L), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, X, RT, L), U32),
    )(x_dev)


@jax.jit
def xla_finish(y):  # y: [G, X, RT, L]
    z = y.reshape(N_TR, N_TC, X, RT, L)
    z = z.transpose(0, 3, 1, 4, 2)  # [n_tr, RT, n_tc, L, X]
    img = z.reshape(N_TR * RT, N_TC * L * X)
    return img[: N_TR * RT - 16, : 3840]


@jax.jit
def full_chain(v):
    return xla_finish(call_epi(stack_epilogue_kernel))


def timed(name, fn, check=None):
    try:
        out = fn()
        out.block_until_ready()
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    if check is not None:
        ok = np.array_equal(np.asarray(out), check)
        print(f"{name}: correct={ok}", flush=True)
    logdir = "/tmp/exp_as2_%s_%d" % (name, time.time())
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        out = fn()
    out.block_until_ready()
    jax.profiler.stop_trace()
    fs = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    d = json.load(gzip.open(fs[-1]))
    pids = {e["pid"]: e["args"].get("name", "") for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.defaultdict(float)
    for e in d["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            n = e.get("name", "")
            if not n.startswith("jit_"):
                agg[n[:40]] += e.get("dur", 0)
    tot = sum(agg.values()) / 5e3
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:4]
    print(f"{name}: {tot:.3f} ms/iter   " +
          " | ".join(f"{n}={v/5e3:.3f}" for n, v in top), flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    # Expected stacked value: out[g, x, s*R + r, l] = in[g, s, r, x, l]
    want_stack = x_np.transpose(0, 3, 1, 2, 4).reshape(G, X, RT, L)
    timed("a_stack_epilogue", lambda: call_epi(stack_epilogue_kernel),
          check=want_stack)
    timed("a_copy_floor", lambda: call_epi(copy_epilogue_kernel))
    y_dev = jax.device_put(want_stack)
    want_img = (
        want_stack.reshape(N_TR, N_TC, X, RT, L)
        .transpose(0, 3, 1, 4, 2)
        .reshape(N_TR * RT, N_TC * L * X)[: N_TR * RT - 16, :3840]
    )
    timed("b_xla_finish", lambda: xla_finish(y_dev), check=want_img)
    timed("c_full_chain", lambda: full_chain(x_dev), check=want_img)
