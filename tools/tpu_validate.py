#!/usr/bin/env python
"""On-chip validation sweep: decode a matrix of configurations on the real
TPU and compare against the golden CPU decoder. The CPU test suite covers
the same ground in interpret mode; this validates the actual Mosaic
lowering (run after kernel changes, before benching)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from compeg_tpu import encoder, golden
from compeg_tpu.pipeline import Decoder


def img_of(h, w, seed=0):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1), (xx * 3 + yy * 5) % 256],
        axis=-1,
    )
    return np.clip(base + r.integers(0, 24, base.shape), 0, 255).astype(np.uint8)


def main() -> None:
    configs = [
        ("422", 1, 90, (64, 128)),
        ("422", 3, 75, (72, 96)),
        ("422", 7, 85, (128, 256)),
        ("444", 1, 90, (64, 64)),
        ("444", 2, 60, (48, 80)),
        ("420", 1, 85, (64, 64)),
        ("420", 5, 85, (96, 128)),
        ("gray", 1, 85, (40, 72)),
        ("440", 1, 85, (64, 64)),
        ("440", 3, 75, (96, 80)),
        ("411", 1, 85, (64, 128)),
        ("411", 2, 90, (48, 192)),
        ("422", None, 80, (32, 32)),  # no DRI: single giant interval
    ]
    failures = 0
    for sampling, ri, q, (h, w) in configs:
        data = encoder.encode(
            img_of(h, w, seed=hash((sampling, ri)) & 0xFFFF),
            sampling=sampling,
            quality=q,
            restart_interval_mcus=ri,
        )
        dec = Decoder()
        got = dec.decode(data)
        want = golden.decode_rgb(data)
        diff = int(np.abs(got.astype(int) - want.astype(int)).max())
        n_over = int((np.abs(got.astype(int) - want.astype(int)) > 1).sum())
        ok = diff <= 2 and n_over <= got.size // 10000
        status = "OK " if ok else "FAIL"
        failures += not ok
        print(f"{status} {sampling} ri={ri} q={q} {h}x{w}: maxdiff={diff} (>1: {n_over})")
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
