"""A/B assembly formulations for the tiled slab -> raster image step."""
import sys, os, time, glob, gzip, json, collections
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, numpy as np
import jax.numpy as jnp
from jax import lax
import compeg_tpu.pipeline as P
import compeg_tpu.ops.fused as F
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
slabs = F.fused_decode_blocks(words, segm, idct_l, pf.plan,
                              pf.geom.samplings, 64, False, False, True)
slabs = jax.device_put(np.asarray(slabs))  # materialize as plain input
hard_sync(slabs)
geom = pf.geom
t(f"slabs on device {slabs.shape}")

G, RI, mw, RT, L = slabs.shape
n_tr, n_tc = geom.tiling
H, W = geom.height, geom.width

@jax.jit
def a_current(s):
    return F.assemble_image_tiled(s, geom)

@jax.jit
def b_fused_reshape(s):
    z = s.reshape(n_tr, n_tc, RI, mw, RT, L)
    img = lax.reshape(z, (n_tr * RT, n_tc * L * RI * mw),
                      dimensions=(0, 4, 1, 5, 2, 3))
    return img[:H, :W]

@jax.jit
def c_slice_first(s):
    # crop columns at lane granularity before the transpose (3840 = 2048 +
    # 112 lanes of tc=1), rows after.
    z = s.reshape(n_tr, n_tc, RI, mw, RT, L)
    z0 = z[:, 0]
    z1 = z[:, 1, :, :, :, :112]
    def half(zz, l):
        return lax.reshape(zz, (n_tr * RT, l * RI * mw),
                           dimensions=(0, 3, 1, 4, 2) if False else (0, 3, 4, 1, 2))
    # [n_tr, RI, mw, RT, L] -> [n_tr, RT, L, RI, mw]
    i0 = lax.reshape(z0, (n_tr * RT, L * RI * mw), dimensions=(0, 3, 4, 1, 2))
    i1 = lax.reshape(z1, (n_tr * RT, 112 * RI * mw), dimensions=(0, 3, 4, 1, 2))
    return jnp.concatenate([i0, i1], axis=1)[:H]

def timed(fn, label, check=None):
    out = fn(slabs); hard_sync(out)
    if check is not None:
        eq = bool(np.asarray(jnp.all(out == check)))
        assert eq, f"{label} mismatch"
    logdir = f"/tmp/tr_asm_{label}_{int(time.time())}"
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        out = fn(slabs)
    hard_sync(out)
    jax.profiler.stop_trace()
    fs = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    d = json.load(gzip.open(fs[-1]))
    pids = {e["pid"]: e["args"].get("name","") for e in d["traceEvents"]
            if e.get("ph")=="M" and e.get("name")=="process_name"}
    agg = collections.defaultdict(float)
    for e in d["traceEvents"]:
        if e.get("ph")=="X" and "TPU" in pids.get(e.get("pid"),"") and not e.get("name","").startswith("jit_ravel"):
            if not e.get("name","").startswith("jit_dynamic"):
                agg[e["name"]] += e["dur"]
    tot = sum(v for k, v in agg.items() if not k.startswith("jit_"))
    tops = " | ".join(f"{k}={v/5e3:.3f}" for k, v in sorted(agg.items(), key=lambda kv:-kv[1])[:4])
    t(f"{label:16s}: {tot/5e3:.3f} ms   [{tops}]")
    return out

base = timed(a_current, "current")
timed(b_fused_reshape, "fused_reshape", base)
timed(c_slice_first, "slice_first", base)
