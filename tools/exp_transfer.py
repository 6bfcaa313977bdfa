"""Probe the tunnel's h2d transfer behavior: single-stream bandwidth,
concurrency scaling (threads), size scaling, and overlap with device compute.

The rig's ~1.1 GB/s tunnel sets the e2e decode ceiling; if concurrent
transfers aggregate beyond one stream's rate, megabatch uploads should be
issued from multiple threads.
"""
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
print("backend:", jax.default_backend(), dev)

MB = 1 << 20


def put(a):
    return jax.device_put(a, dev)


def bw(nbytes, seconds):
    return nbytes / seconds / 1e9


# warmup
put(np.zeros(1024, np.uint8)).block_until_ready()

for size_mb in (0.5, 2.4, 8, 32):
    n = int(size_mb * MB)
    a = np.random.randint(0, 255, n, dtype=np.uint8)
    # single stream
    t0 = time.perf_counter()
    reps = 6
    for _ in range(reps):
        put(a).block_until_ready()
    t1 = (time.perf_counter() - t0) / reps
    print(f"size={size_mb:5.1f} MB single: {t1*1e3:7.2f} ms  {bw(n, t1):.2f} GB/s")

a = np.random.randint(0, 255, int(2.4 * MB), dtype=np.uint8)
chunks = {k: np.array_split(a, k) for k in (2, 4, 8)}
for k, parts in chunks.items():
    ex = ThreadPoolExecutor(k)
    # warm the pool
    list(ex.map(lambda p: put(p).block_until_ready(), parts))
    t0 = time.perf_counter()
    reps = 6
    for _ in range(reps):
        futs = [ex.submit(lambda p=p: put(p).block_until_ready()) for p in parts]
        [f.result() for f in futs]
    t1 = (time.perf_counter() - t0) / reps
    print(f"2.4 MB in {k} threads: {t1*1e3:7.2f} ms  {bw(a.size, t1):.2f} GB/s")
    ex.shutdown()

# Overlap: dispatch a ~1.5 ms matmul chain, then transfer while it runs.
x = put(np.random.randn(4096, 4096).astype(np.float32))


@jax.jit
def burn(x):
    for _ in range(12):
        x = x @ x
        x = x / jnp.max(jnp.abs(x))
    return x


burn(x).block_until_ready()
t0 = time.perf_counter()
r = burn(x)
r.block_until_ready()
t_burn = time.perf_counter() - t0
print(f"burn kernel: {t_burn*1e3:.2f} ms")

t0 = time.perf_counter()
reps = 6
for _ in range(reps):
    r = burn(x)
    h = put(a)  # issued while burn runs
    h.block_until_ready()
    r.block_until_ready()
t_both = (time.perf_counter() - t0) / reps
t_xfer = a.size / 1.1e9
print(f"burn+transfer interleaved: {t_both*1e3:.2f} ms "
      f"(serial would be ~{(t_burn + t_xfer)*1e3:.2f} ms)")

# d2h: does readback contend with h2d?
img = put(np.zeros((2160, 3840), np.uint32))
img.block_until_ready()
t0 = time.perf_counter()
for _ in range(3):
    np.asarray(img)
t_d2h = (time.perf_counter() - t0) / 3
print(f"d2h 33 MB image: {t_d2h*1e3:.2f} ms  {bw(img.size*4, t_d2h):.2f} GB/s")
