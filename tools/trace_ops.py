#!/usr/bin/env python
"""Device-op trace of the 4K decode: FULL XLA-Ops-lane sum + top ops.

The old trace_decode.py printed the top-12 ops and summed only those —
undercounting the epilogue tail (dozens of small reshapes/broadcasts) by
~0.15 ms/frame. This sums the whole ops lane via
compeg_tpu.profiling.trace_device_ms, which equals the XLA-Modules lane
total (verified) and is the honest device time per frame.

Usage: python tools/trace_ops.py [--exact] [--fancy] [--frames N]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from compeg_tpu.pipeline import Decoder
from compeg_tpu.profiling import trace_device_ms


def main():
    exact = "--exact" in sys.argv
    fancy = "--fancy" in sys.argv
    frames = 5
    if "--frames" in sys.argv:
        frames = int(sys.argv[sys.argv.index("--frames") + 1])
    data = open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "bench_assets", "bench4k.jpg"), "rb").read()
    dec = Decoder(exact_idct=exact, fancy_upsampling=fancy)
    pf = dec.prepare(data)
    total, rows = trace_device_ms(lambda: dec.decode_prepared(pf), frames)
    mode = ("exact" if exact else "default") + (" fancy" if fancy else "")
    print(f"# {mode}: device total {total:.3f} ms/frame = {1e3/total:.0f} fps")
    shown = 0.0
    for ms, c, name in rows[:20]:
        print(f"{ms:8.4f} ms x{c} {name}")
        shown += ms
    print(f"# top-20 {shown:.3f} | tail {total-shown:.3f} ms in "
          f"{max(0, len(rows)-20)} ops")


if __name__ == "__main__":
    main()
