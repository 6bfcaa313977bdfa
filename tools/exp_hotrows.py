"""A/B the fused kernel's AC store split (hot_rows) on the real chip."""
import sys, os, time, glob, gzip, json, collections
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, numpy as np
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
segm = pf.seg_mcus
hard_sync(words)
t("inputs on device")

def run(hr):
    return F.fused_decode_blocks(words, segm, idct_l, pf.plan,
                                 pf.geom.samplings, 64, False, False,
                                 pf.geom.tiling is not None, hr)

for hr in (64, 16, 8):
    out = run(hr); hard_sync(out)
    t(f"hot_rows={hr} compiled")
    logdir = f"/tmp/tr_hr{hr}_{int(time.time())}"
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        out = run(hr)
    hard_sync(out)
    jax.profiler.stop_trace()
    fs = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    d = json.load(gzip.open(fs[-1]))
    pids = {e["pid"]: e["args"].get("name","") for e in d["traceEvents"]
            if e.get("ph")=="M" and e.get("name")=="process_name"}
    agg = collections.defaultdict(float)
    for e in d["traceEvents"]:
        if e.get("ph")=="X" and "TPU" in pids.get(e.get("pid"),""):
            agg[e.get("name","")[:44]] += e.get("dur",0)
    top = sorted(agg.items(), key=lambda kv:-kv[1])[:4]
    t(f"hot_rows={hr}: " + " | ".join(f"{n}={v/5e3:.3f}ms" for n,v in top))
