#!/usr/bin/env python
"""Experiments: fastest way to interleave (x, lane) -> raster on this TPU.

The fused kernel's composite produces, per MCU row r, 16 vectors V_x of
shape [8 sublane-strips, 128 lanes]; the raster wants lane-major runs
col' = lane*16 + x. This script measures the candidate relayout paths:

  A. XLA transpose [..., 16, 128] -> [..., 128, 16]  (strip-mode fallback)
  B. current assemble_image on the segment-major blocks (round-1 baseline)
  C. Pallas kernel: pltpu.repeat spread + iota-mask merge
  D. Pallas kernel: in-kernel jnp transpose (Mosaic relayout)
  E. Pallas no-op copy (store-bandwidth floor)

Run on the chip; times come from the jax.profiler trace.
"""
import sys, os, time, glob, gzip, json, collections

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, S, R, X, L = 64, 8, 8, 16, 128
U32 = jnp.uint32

rng = np.random.default_rng(0)
x_np = rng.integers(0, 1 << 24, (G, S, R, X, L), dtype=np.uint32)
x_dev = jax.device_put(x_np)

# ---- A: XLA minor transpose -------------------------------------------------
@jax.jit
def xla_interleave(v):
    return v.transpose(0, 1, 2, 4, 3).reshape(G, S, R, L * X)

# ---- C/D/E: Pallas kernels --------------------------------------------------
def repeat_mask_kernel(in_ref, out_ref):
    # jnp.repeat is elementwise: rep[k] = v[k // X] (a 16x lane spread).
    kk = jax.lax.broadcasted_iota(jnp.int32, (S, L * X), 1)
    for r in range(R):
        acc = jnp.zeros((S, L * X), U32)
        for x in range(X):
            v = in_ref[0, :, r, x]  # [S, L]
            rep = jnp.repeat(v, X, axis=1)
            acc = jnp.where((kk & (X - 1)) == x, rep, acc)
        out_ref[0, :, r] = acc


def mosaic_transpose_kernel(in_ref, out_ref):
    for r in range(R):
        v = in_ref[0, :, r]  # [S, X, L]
        out_ref[0, :, r] = v.transpose(0, 2, 1).reshape(S, L * X)


def copy_kernel(in_ref, out_ref):
    for r in range(R):
        v = in_ref[0, :, r]
        out_ref[0, :, r] = v.reshape(S, X * L)


def bcast_reshape_kernel(in_ref, out_ref):
    # Same merge as C but the 16x spread comes from broadcast_to + a
    # minor-dims reshape instead of jnp.repeat.
    kk = jax.lax.broadcasted_iota(jnp.int32, (S, L * X), 1)
    for r in range(R):
        acc = jnp.zeros((S, L * X), U32)
        for x in range(X):
            v = in_ref[0, :, r, x]  # [S, L]
            rep = jnp.broadcast_to(v[:, :, None], (S, L, X)).reshape(S, L * X)
            acc = jnp.where((kk & (X - 1)) == x, rep, acc)
        out_ref[0, :, r] = acc


def strided_store_kernel(in_ref, out_ref):
    # Lane-strided stores, if Mosaic supports pl.Slice with a stride.
    for r in range(R):
        for x in range(X):
            out_ref[0, :, r, pl.Slice(x, L, X)] = in_ref[0, :, r, x]


def tree_interleave_kernel(in_ref, out_ref):
    # log2(X) rounds of pairwise interleave: each round merges vector pairs
    # (A, B) -> C with C[2k] = A[k], C[2k+1] = B[k] via a broadcast-reshape
    # 2x spread + even/odd select.
    for r in range(R):
        vs = [in_ref[0, :, r, x] for x in range(X)]  # X vectors [S, L]
        width = L
        while len(vs) > 1:
            width *= 2
            kk = jax.lax.broadcasted_iota(jnp.int32, (S, width), 1)
            half = len(vs) // 2
            nxt = []
            for i in range(half):
                a = jnp.broadcast_to(vs[i][:, :, None], (S, width // 2, 2)
                                     ).reshape(S, width)
                b = jnp.broadcast_to(vs[i + half][:, :, None],
                                     (S, width // 2, 2)).reshape(S, width)
                nxt.append(jnp.where((kk & 1) == 0, a, b))
            vs = nxt
        out_ref[0, :, r] = vs[0]


def stack_rows_kernel(in_ref, out_ref):
    # The full tiled-epilogue candidate: select-merge the X vectors per r
    # (as C), then interleave the (segment-row s, pixel-row r) sublane dims
    # with one stack+reshape relayout and store the whole raster tile.
    kk = jax.lax.broadcasted_iota(jnp.int32, (S, L * X), 1)
    accs = []
    for r in range(R):
        acc = jnp.zeros((S, L * X), U32)
        for x in range(X):
            v = in_ref[0, :, r, x]  # [S, L]
            rep = jnp.broadcast_to(v[:, :, None], (S, L, X)).reshape(S, L * X)
            acc = jnp.where((kk & (X - 1)) == x, rep, acc)
        accs.append(acc)
    v = jnp.stack(accs, axis=1).reshape(S * R, L * X)  # rows = s*R + r
    out_ref[0] = v


def strided_sublane_store_kernel(in_ref, out_ref):
    # As stack_rows but let the STORE do the (s, r) interleave: each per-r
    # [S, TW] row set stores to sublanes r, r+R, ... (stride R).
    kk = jax.lax.broadcasted_iota(jnp.int32, (S, L * X), 1)
    for r in range(R):
        acc = jnp.zeros((S, L * X), U32)
        for x in range(X):
            v = in_ref[0, :, r, x]
            rep = jnp.broadcast_to(v[:, :, None], (S, L, X)).reshape(S, L * X)
            acc = jnp.where((kk & (X - 1)) == x, rep, acc)
        out_ref[0, pl.Slice(r, S, R), :] = acc


def pallas_call_raster(kernel):
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, S, R, X, L), lambda g: (g, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S * R, X * L), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, S * R, X * L), U32),
    )(x_dev)


def pallas_call_1(kernel):
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, S, R, X, L), lambda g: (g, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, R, X * L), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, S, R, X * L), U32),
    )(x_dev)


def ref_interleave(v):
    return v.transpose(0, 1, 2, 4, 3).reshape(G, S, R, L * X)


def timed(name, fn, check=None):
    try:
        out = fn(); out.block_until_ready()
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")
        return
    if check is not None:
        got = np.asarray(out)
        ok = np.array_equal(got, check)
        print(f"{name}: correct={ok}")
    logdir = "/tmp/exp_il_%s_%d" % (name, time.time())
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
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:3]
    print(f"{name}: {tot:.3f} ms/iter   " +
          " | ".join(f"{n}={v/5e3:.3f}" for n, v in top))


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    want = np.asarray(jax.jit(ref_interleave, backend="cpu")(x_np)) if False else \
        x_np.transpose(0, 1, 2, 4, 3).reshape(G, S, R, L * X)
    timed("A_xla_transpose", lambda: xla_interleave(x_dev), check=want)
    timed("E_copy_floor", lambda: pallas_call_1(copy_kernel))
    timed("C_repeat_mask", lambda: pallas_call_1(repeat_mask_kernel), check=want)
    timed("D_mosaic_transpose", lambda: pallas_call_1(mosaic_transpose_kernel), check=want)
    timed("F_bcast_reshape", lambda: pallas_call_1(bcast_reshape_kernel), check=want)
    timed("G_strided_store", lambda: pallas_call_1(strided_store_kernel), check=want)
    timed("H_tree_interleave", lambda: pallas_call_1(tree_interleave_kernel), check=want)
