#!/usr/bin/env python
"""BASELINE-scale batching: compile time + per-frame device time at B=64
vs B=8 vs single-frame (VERDICT r2 weak item 4: the batched epilogue
unrolls per frame inside one jit; is that still fine at B=64?)."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax, numpy as np
from compeg_tpu.batch import BatchDecoder
from compeg_tpu.pipeline import Decoder
from compeg_tpu.profiling import hard_sync, trace_device_ms

data = open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "bench_assets", "bench4k.jpg"), "rb").read()

def trace_ms(fn, reps=3):
    total, _ = trace_device_ms(fn, reps)
    return total

# Single-frame reference.
dec = Decoder()
pf = dec.prepare(data)
pf.words = jax.device_put(pf.words); hard_sync(pf.words)
out = dec.decode_prepared(pf); hard_sync(out)
single = trace_ms(lambda: dec.decode_prepared(pf), 5)
print(f"single-frame device: {single:.3f} ms/frame", flush=True)

for B in (8, 64):
    bdec = BatchDecoder()
    pfs = bdec.prepare_batch([data] * B)
    # Device-resident input (rolls the one h2d out of the timing).
    words = jax.device_put(np.concatenate([p.words for p in pfs], axis=0))
    hard_sync(words)
    for p in pfs:
        p.words = None
    import compeg_tpu.batch as BM
    # decode via the internal path with pre-put words
    seg = bdec._segmcus_cache
    t0 = time.time()
    one = np.asarray(pfs[0].seg_mcus)
    seg_mcus = jax.device_put(np.tile(one, (B, 1, 1)))
    plan = bdec._batch_plan(pfs[0].plan, B)
    fn = lambda: BM.decode_batch_fused(
        words, seg_mcus, bdec._dec._stream_consts(pfs[0]), plan,
        pfs[0].geom, B, 64, bdec._dec.interpret, False, False)
    t0 = time.time()
    out = fn(); hard_sync(out)
    compile_s = time.time() - t0
    dev = trace_ms(fn, 2 if B == 64 else 3)
    print(f"B={B}: compile+first {compile_s:.1f}s, device {dev:.2f} ms/batch "
          f"= {dev/B:.3f} ms/frame (vs single {single:.3f})", flush=True)
