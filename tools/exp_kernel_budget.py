"""Map where the fused kernel's device time goes, by compiling ablated
variants (identical control flow, pieces removed) and slope probes
(value-tree doubled, refill mux doubled) on the real chip."""
import sys, os, time, glob, gzip, json, collections, dataclasses
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, numpy as np
import compeg_tpu.ops.fused as F
import compeg_tpu.ops.entropy as E
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
    logdir = f"/tmp/tr_bud_{label}_{int(time.time())}"
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
    t(f"{label:12s}: {ms:.3f} ms")
    return ms

def run(ablate="", plan=None, w=None, s=None):
    return F.fused_decode_blocks(
        w if w is not None else words, s if s is not None else segm, idct_l,
        plan or pf.plan, pf.geom.samplings, 64, False, False,
        tiled=True, _ablate=ablate)

full = timed(lambda: run(), "full")
timed(lambda: run("densestore"), "densestore")
timed(lambda: run("noidct"), "noidct")
timed(lambda: run("nop23"), "nop23")

# value-tree slope: double every table's packed value words
def pad_tables(tabs):
    return tuple(dataclasses.replace(tc, value_words=tc.value_words * 2)
                 for tc in tabs)
plan2 = dataclasses.replace(pf.plan, dc=pad_tables(pf.plan.dc),
                            ac=pad_tables(pf.plan.ac))
timed(lambda: run(plan=plan2), "valtree2x")

# refill-mux slope: repack at W=18 (linear layout; compare against its own
# W=9 linear baseline)
pf9 = P.prepare_frame(data)
pf18 = P.prepare_frame(data, words_per_segment=18)
w9 = jax.device_put(jax.numpy.asarray(pf9.words))
w18 = jax.device_put(jax.numpy.asarray(pf18.words))
s9 = jax.device_put(np.asarray(pf9.seg_mcus))
hard_sync(w18)
def run_lin(pfx, wx):
    return F.fused_decode_blocks(wx, s9, idct_l, pfx.plan,
                                 pfx.geom.samplings, 64, False, False, False)
timed(lambda: run_lin(pf9, w9), "linW9")
timed(lambda: run_lin(pf18, w18), "linW18")
