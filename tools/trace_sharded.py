#!/usr/bin/env python
"""Real-TPU validation of the sharded decode path on a mesh(1,1).

The sharded pipeline must be the SAME program as the single-chip fast path
(fused planes kernel + minor-swap assembly + fused epilogue) modulo the
shard_map wrapper — so on a 1x1 mesh its device time must be within ~10% of
the unsharded decode. Prints both traces and checks pixel exactness against
the unsharded output.
"""
import sys, os, time, glob, gzip, json, collections
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, numpy as np
import jax.numpy as jnp
from compeg_tpu.metadata import analyze
from compeg_tpu.pipeline import Decoder, FrameGeometry
from compeg_tpu.parallel import sharding as SH
from compeg_tpu.profiling import hard_sync

N_BANDS = int(sys.argv[1]) if len(sys.argv) > 1 else 1
REPS = 5

data = open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "bench_assets", "bench4k.jpg"), "rb").read()
meta = analyze(data)

# --- unsharded fast path (reference point) --------------------------------
dec = Decoder()
pf = dec.prepare(data)
out0 = dec.decode_prepared(pf); hard_sync(out0)

# --- sharded path on mesh(1, 1) -------------------------------------------
bf = SH.prepare_banded(meta, N_BANDS)
assert bf.tiling is not None, "4K bench stream must take the tiled path"
words, seg_mcus = SH.stack_banded([bf])
mesh = SH.make_mesh(1, 1)
geom = FrameGeometry.from_image(meta)
wd = jax.device_put(jnp.asarray(words))
sd = jax.device_put(jnp.asarray(seg_mcus))
qd = jax.device_put(jnp.asarray(bf.qz_by_slot))

def sharded():
    return SH.decode_batch_sharded(
        wd, sd, qd, bf.plan, mesh=mesh, geom=geom,
        band_rows=bf.band_rows, tiling=bf.tiling)

t0 = time.time()
outs = sharded(); hard_sync(outs)
print(f"sharded compile+run: {time.time()-t0:.1f}s", flush=True)

# Exactness: sharded == unsharded (both packed u32) on chip.
from compeg_tpu.ops.fused import rgba_to_rgb_array
ref = rgba_to_rgb_array(np.asarray(out0))
got = rgba_to_rgb_array(np.asarray(outs))[0]
print("sharded == unsharded:", np.array_equal(got, ref), flush=True)

def trace(fn, tag):
    logdir = f"/tmp/tr_shard_{tag}_{int(time.time())}"
    jax.profiler.start_trace(logdir)
    for _ in range(REPS):
        out = fn()
    hard_sync(out)
    jax.profiler.stop_trace()
    fs = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    d = json.load(gzip.open(fs[-1]))
    pids = {e["pid"]: e["args"].get("name", "") for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.defaultdict(float); cnt = collections.defaultdict(int)
    for e in d["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            agg[e.get("name", "")[:56]] += e.get("dur", 0)
            cnt[e.get("name", "")[:56]] += 1
    print(f"--- {tag} ---")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
        print(f"{dur/REPS/1e3:8.3f} ms/frame x{cnt[name]//REPS} {name}")
    # Per-frame program time: the largest jit entry that ran every rep
    # (one-shot fence reductions / input reshards are excluded — they run
    # once per trace, not per frame).
    prog = max(
        (dur for name, dur in agg.items()
         if name.startswith("jit_") and cnt[name] >= REPS),
        default=0.0,
    )
    print(f"PROGRAM {tag}: {prog/REPS/1e3:.3f} ms/frame", flush=True)
    return prog / REPS / 1e3

un = trace(lambda: dec.decode_prepared(pf), "unsharded")
sh = trace(sharded, f"sharded_1x1_b{N_BANDS}")
print(f"RATIO sharded/unsharded (jit program): {sh/un:.3f} (target <= 1.10)")
