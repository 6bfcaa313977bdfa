"""A/B: AC-loop unroll factor and IDCT matmul precision, on the chip.
Accuracy of lower precisions is checked on-device (max abs diff vs HIGHEST)
so no large d2h is needed on the degraded link."""
import sys, os, time, glob, gzip, json, collections
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, numpy as np
import jax.numpy as jnp
import compeg_tpu.ops.fused as F
import compeg_tpu.pipeline as P
from compeg_tpu.pipeline import Decoder
from compeg_tpu.profiling import hard_sync

t00 = time.perf_counter()
def t(m): print(f"[{time.perf_counter()-t00:7.1f}s] {m}", flush=True)

data = open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "bench_assets", "bench4k.jpg"), "rb").read()
dec = Decoder()
pf = dec.prepare(data)
idct_l = dec._stream_consts(pf)
words = jax.device_put(P._as_blocks(jax.numpy.asarray(pf.words)))
segm = jax.device_put(np.asarray(pf.seg_mcus))
hard_sync(words)
t("inputs on device")

def timed(fn, label):
    out = fn(); hard_sync(out)
    logdir = f"/tmp/tr_up_{label}_{int(time.time())}"
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        out = fn()
    hard_sync(out)
    jax.profiler.stop_trace()
    fs = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    d = json.load(gzip.open(fs[-1]))
    pids = {e["pid"]: e["args"].get("name","") for e in d["traceEvents"]
            if e.get("ph")=="M" and e.get("name")=="process_name"}
    agg = collections.defaultdict(float)
    for e in d["traceEvents"]:
        if e.get("ph")=="X" and "TPU" in pids.get(e.get("pid"),"") and "fused" in e.get("name",""):
            agg[e["name"]] += e["dur"]
    ms = max(agg.values(), default=0.0)/5e3
    t(f"{label:14s}: {ms:.3f} ms")
    return out

import compeg_tpu.ops.fused as fused_mod
orig_maker = fused_mod._make_fused_kernel

def with_unroll(u):
    def maker(plan, samplings, retained, unroll=4, **kw):
        return orig_maker(plan, samplings, retained, unroll=u, **kw)
    return maker

def run(tag=""):
    # tag busts fused_decode_blocks' jit cache via _ablate (unused string)
    return F.fused_decode_blocks(words, segm, idct_l, pf.plan,
                                 pf.geom.samplings, 64, False, False,
                                 tiled=True, _ablate=tag)

base = None
for u in (4, 2, 6, 8):
    fused_mod._make_fused_kernel = with_unroll(u)
    out = timed(lambda: run(f"u{u}"), f"unroll={u}")
    if base is None:
        base = out
    else:
        dmax = int(np.asarray(jnp.max(jnp.abs(out.astype(jnp.int64) - base.astype(jnp.int64)))))
        print(f"   vs base packed-diff max: {dmax}", flush=True)
fused_mod._make_fused_kernel = orig_maker

# IDCT precision: monkeypatch precision via a wrapper wouldn't reach inside
# the kernel; instead patch jax.lax.Precision lookup by rebuilding the maker.
import compeg_tpu.ops.entropy as E

def with_precision(prec):
    import jax as _jax
    real_dot = _jax.numpy.dot
    def maker(plan, samplings, retained, **kw):
        import unittest.mock as um
        k = orig_maker(plan, samplings, retained, **kw)
        def wrapped(*refs):
            with um.patch.object(_jax.lax, "Precision", _FakePrec(prec)):
                return k(*refs)
        return wrapped
    return maker

class _FakePrec:
    def __init__(self, p): self.HIGHEST = p
# jnp.dot precision arg: HIGHEST attribute fetched at trace time
import jax.lax as L
for prec, label in ((L.Precision.HIGH, "prec=HIGH"),
                    (L.Precision.DEFAULT, "prec=DEFAULT")):
    fused_mod._make_fused_kernel = with_precision(prec)
    out = timed(lambda: run(label), label)
    # pixel-channel diff vs HIGHEST base, computed on device
    a = jax.lax.bitcast_convert_type(out, jnp.uint8).astype(jnp.int32)
    b = jax.lax.bitcast_convert_type(base, jnp.uint8).astype(jnp.int32)
    dmax = int(np.asarray(jnp.max(jnp.abs(a - b))))
    nbad = int(np.asarray(jnp.sum((jnp.abs(a - b) > 1).astype(jnp.int32))))
    print(f"   vs HIGHEST: max u8 diff {dmax}, count>1 {nbad}", flush=True)
fused_mod._make_fused_kernel = orig_maker
