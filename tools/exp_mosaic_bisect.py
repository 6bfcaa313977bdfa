#!/usr/bin/env python
"""Bisect which constructs the axon Mosaic compiler rejects (HTTP 500 with
no diagnostics): lane-spread via broadcast_to+reshape, jnp.repeat, iota+where
merge, stack+reshape sublane interleave, pl.Slice strided stores."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L, X, R = 8, 128, 16, 8
U32 = jnp.uint32
x_np = np.random.default_rng(0).integers(0, 1 << 24, (S, R, X, L), dtype=np.uint32)
x_dev = jax.device_put(x_np)


def run(name, kernel, out_shape, check=None):
    try:
        out = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, U32),
        )(x_dev)
        got = np.asarray(out)
        ok = "?" if check is None else np.array_equal(got, check)
        print(f"{name}: OK correct={ok}", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)


# 1. plain copy (sanity)
run("copy", lambda i, o: o.__setitem__(Ellipsis, i[:, 0, 0, :]), (S, L),
    x_np[:, 0, 0, :])

# 2. broadcast_to + reshape lane spread [S, L] -> [S, L*X]
def k_bcast(i, o):
    v = i[:, 0, 0, :]
    o[...] = jnp.broadcast_to(v[:, :, None], (S, L, X)).reshape(S, L * X)
run("bcast_reshape", k_bcast, (S, L * X),
    np.repeat(x_np[:, 0, 0, :], X, axis=1))

# 3. jnp.repeat lane spread
def k_repeat(i, o):
    v = i[:, 0, 0, :]
    o[...] = jnp.repeat(v, X, axis=1)
run("jnp_repeat", k_repeat, (S, L * X), np.repeat(x_np[:, 0, 0, :], X, axis=1))

# 4. pltpu.repeat
def k_ptpu_repeat(i, o):
    v = i[:, 0, 0, :]
    o[...] = pltpu.repeat(v, X, 1)
run("pltpu_repeat", k_ptpu_repeat, (S, L * X), None)

# 5. iota + where merge of two spreads
def k_where(i, o):
    kk = jax.lax.broadcasted_iota(jnp.int32, (S, L * X), 1)
    a = jnp.broadcast_to(i[:, 0, 0, :][:, :, None], (S, L, X)).reshape(S, L * X)
    b = jnp.broadcast_to(i[:, 0, 1, :][:, :, None], (S, L, X)).reshape(S, L * X)
    o[...] = jnp.where((kk & (X - 1)) == 0, a, b)
want = np.where(
    (np.arange(L * X)[None, :] & (X - 1)) == 0,
    np.repeat(x_np[:, 0, 0, :], X, axis=1),
    np.repeat(x_np[:, 0, 1, :], X, axis=1),
)
run("where_merge", k_where, (S, L * X), want)

# 6. stack + reshape sublane interleave [S, R, L] rows -> [S*R, L]
def k_stack(i, o):
    rows = [i[:, r, 0, :] for r in range(R)]
    o[...] = jnp.stack(rows, axis=1).reshape(S * R, L)
run("stack_sublanes", k_stack, (S * R, L),
    x_np[:, :, 0, :].reshape(S * R, L))

# 7. strided lane store via pl.Slice
def k_strided(i, o):
    for x in range(X):
        o[:, pl.Slice(x, L, X)] = i[:, 0, x, :]
want7 = np.zeros((S, L * X), np.uint32)
for x in range(X):
    want7[:, x::X] = x_np[:, 0, x, :]
run("strided_lane_store", k_strided, (S, L * X), want7)

# 8. full interleave via where-merge over all X
def k_full(i, o):
    kk = jax.lax.broadcasted_iota(jnp.int32, (S, L * X), 1)
    acc = jnp.zeros((S, L * X), U32)
    for x in range(X):
        v = i[:, 0, x, :]
        rep = jnp.broadcast_to(v[:, :, None], (S, L, X)).reshape(S, L * X)
        acc = jnp.where((kk & (X - 1)) == x, rep, acc)
    o[...] = acc
want8 = np.zeros((S, L * X), np.uint32)
for x in range(X):
    want8[:, x::X] = x_np[:, 0, x, :]
run("full_where_interleave", k_full, (S, L * X), want8)

print("done", flush=True)
