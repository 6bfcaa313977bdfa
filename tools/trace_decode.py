#!/usr/bin/env python
"""Capture an XLA device trace of the 4K decode and print per-op times."""
import sys, os, time, glob, gzip, json, collections
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, numpy as np
from compeg_tpu.pipeline import Decoder
from compeg_tpu.profiling import hard_sync

data = open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "bench_assets", "bench4k.jpg"), "rb").read()
dec = Decoder()
pf = dec.prepare(data)
out = dec.decode_prepared(pf); hard_sync(out)
logdir = "/tmp/tr_decode_%d" % time.time()
jax.profiler.start_trace(logdir)
for _ in range(5):
    out = dec.decode_prepared(pf)
hard_sync(out)  # block_until_ready can ACK early through the tunnel
jax.profiler.stop_trace()
fs = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
d = json.load(gzip.open(fs[-1]))
pids = {e["pid"]: e["args"].get("name","") for e in d["traceEvents"] if e.get("ph")=="M" and e.get("name")=="process_name"}
agg = collections.defaultdict(float); cnt = collections.defaultdict(int)
for e in d["traceEvents"]:
    if e.get("ph")=="X" and "TPU" in pids.get(e.get("pid"),""):
        agg[e.get("name","")[:56]] += e.get("dur",0); cnt[e.get("name","")[:56]] += 1
tot = 0.0
for name, dur in sorted(agg.items(), key=lambda kv:-kv[1])[:12]:
    print(f"{dur/5e3:8.3f} ms/frame x{cnt[name]//5} {name}")
    if not name.startswith("jit_"): tot += dur
print(f"SUM(non-jit): {tot/5e3:.3f} ms/frame")
