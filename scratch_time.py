import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from compeg_tpu.pipeline import Decoder, decode_frame_device
from compeg_tpu.ops import entropy as E

data = open("bench_assets/bench4k.jpg","rb").read()
dec = Decoder()
pf = dec.prepare(data)
words = jax.device_put(pf.words); segm = jax.device_put(pf.seg_mcus)
qz = jax.device_put(pf.qz_by_slot)

def timed_loop(make_body, n):
    @jax.jit
    def f(w, s):
        def body(i, carry):
            acc, w_cur, s_cur = carry
            w_cur, s_cur = jax.lax.optimization_barrier((w_cur, s_cur))
            out = make_body(w_cur, s_cur)
            return acc + out, w_cur, s_cur
        acc, _, _ = jax.lax.fori_loop(0, n, body, (jnp.int32(0), w, s))
        return acc
    r = f(words, segm); r.block_until_ready()
    best = 1e9
    for _ in range(3):
        t0=time.perf_counter(); f(words, segm).block_until_ready(); best=min(best, time.perf_counter()-t0)
    return best

ent = lambda w, s: E.entropy_decode(w, s, pf.plan, interpret=False)[0,0,0,0,0,0]
t1 = timed_loop(ent, 1); t9 = timed_loop(ent, 9)
print(f"entropy per-exec: {(t9-t1)/8*1e3:.3f} ms   (t1={t1*1e3:.3f})")

full = lambda w, s: decode_frame_device(w, s, qz, pf.plan, pf.geom, 64, False)[0,0,0].astype(jnp.int32)
t1 = timed_loop(full, 1); t9 = timed_loop(full, 9)
print(f"full per-exec: {(t9-t1)/8*1e3:.3f} ms   (t1={t1*1e3:.3f})")
