#!/usr/bin/env python
"""Host preprocessing micro-benchmark — the analogue of the reference's
divan bench of ScanBuffer::process (benches/bench.rs: bytes/s over the 4K
image's scan). Reports native parse and pack throughput."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from compeg_tpu import analyze, native
from compeg_tpu import scan as S


def _timeit(fn, reps):
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps

data = open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "bench_assets", "bench4k.jpg"), "rb").read()
img = analyze(data)
n = img.total_restart_intervals
_, mx = native.scan_info(img.scan_data)
w = S._words_per_segment(mx)
g = -(-n // S.SEGMENTS_PER_BLOCK)
sz = len(img.scan_data)

from compeg_tpu.pipeline import Decoder

dec = Decoder()
tile = dec._tile_map(img, g)
ntile = (tile.segs_per_row, tile.n_tc) if tile is not None else None
gt = tile.num_blocks if tile is not None else g

for name, fn, reps in [
    ("analyze (native parse)", lambda: analyze(data), 30),
    ("scan_info", lambda: native.scan_info(img.scan_data), 30),
    ("pack_rows (4 threads)", lambda: native.pack_rows(
        img.source, n, w, g, offset=img.scan_offset, length=sz), 30),
    ("pack_blocks tiled (4 threads, decode path)", lambda: native.pack_blocks(
        img.source, n, w, gt, offset=img.scan_offset, length=sz,
        tile=ntile), 30),
    ("prepare (parse+pack, steady state)", lambda: dec.prepare(data), 30),
]:
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.3f} ms  ({sz/dt/1e9:.2f} GB/s over {sz} scan bytes)")
print(f"(reference ScanBuffer::process: ~2 ms for a 496,464-byte scan "
      f"on a desktop CPU, README.md:5 — ours processes {sz} bytes)")

# --- the reference's OWN bench workload (benches/scan.dat) ---------------
# Its divan bench times ScanBuffer::process (destuff + RST split + word
# align + start positions) over this exact file. Our equivalent is the
# pack into the TPU block layout, which subsumes all of that work.
REF_SCAN = "/root/reference/benches/scan.dat"
if os.path.exists(REF_SCAN):
    ref = open(REF_SCAN, "rb").read()
    rn, rmx = native.scan_info(ref)
    rw = S._words_per_segment(rmx)
    rg = -(-rn // S.SEGMENTS_PER_BLOCK)
    for label, nt in (("pooled", 0), ("1 thread", 1)):
        fn = lambda: native.pack_blocks(ref, rn, rw, rg, n_threads=nt)
        fn()
        best = min(
            _timeit(fn, 20) for _ in range(4)
        )
        print(f"reference scan.dat ({rn} intervals, {len(ref)} B) "
              f"pack_blocks {label}: {best*1e3:.3f} ms "
              f"({len(ref)/best/1e9:.2f} GB/s)")
