#!/usr/bin/env python
"""End-to-end verification drive on the real TPU (see .claude/skills/verify)."""
import io
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

t00 = time.time()


def log(*a):
    print(f"[{time.time()-t00:7.1f}s]", *a, flush=True)


import jax

log("backend:", jax.default_backend(), jax.devices())

from PIL import Image

from compeg_tpu import golden
from compeg_tpu.batch import BatchDecoder
from compeg_tpu.errors import CompegError
from compeg_tpu.pipeline import Decoder

# --- small exact-parity probe first (cheap compile) ----------------------
img = np.random.default_rng(7).integers(0, 256, (64, 256, 3), dtype=np.uint8)
buf = io.BytesIO()
Image.fromarray(img).save(buf, "JPEG", quality=95, restart_marker_blocks=1)
small = buf.getvalue()

rgb_s = Decoder().decode(small)
ref_s = golden.decode_rgb(small)
d = np.abs(rgb_s.astype(int) - ref_s.astype(int))
log("small f32: maxdiff", d.max(), "frac>1", (d > 1).mean())
assert d.max() <= 2

# BatchDecoder fused path (NEW this commit) on the small stream, B=3.
bd = BatchDecoder()
out_b = bd.decode([small, small, small])
log("batch fused small: shape", out_b.shape)
assert out_b.shape == (3, 64, 256, 3)
for k in range(3):
    db = np.abs(out_b[k].astype(int) - ref_s.astype(int))
    assert db.max() <= 2, db.max()
log("batch fused small: parity ok (maxdiff", db.max(), ")")

# Corrupt-stream probe.
try:
    Decoder().decode(small[: len(small) // 2])
    raise SystemExit("corrupt stream did not raise")
except CompegError as e:
    log("corrupt probe ok:", e)

# --- 4K drive ------------------------------------------------------------
data = open("bench_assets/bench4k.jpg", "rb").read()
log("4K decode (f32 fused) ...")
rgb = Decoder().decode(data)
log("4K decoded", rgb.shape)
ref = golden.decode_rgb(data)
d = np.abs(rgb.astype(int) - ref.astype(int))
log("4K f32: maxdiff", d.max(), "frac>1", (d > 1).mean())
assert d.max() <= 2

log("4K exact_idct ...")
rgb_i = Decoder(exact_idct=True).decode(data)
ref_i = golden.decode_rgb(data, idct="int")
log("4K int: identical =", np.array_equal(rgb_i, ref_i))
assert np.array_equal(rgb_i, ref_i)

# Batched 4K (B=2) on the fused path vs single-frame decode.
log("4K batch fused (B=2) ...")
bd4 = BatchDecoder()
out4 = bd4.decode([data, data])
assert out4.shape[0] == 2
for k in range(2):
    dd = np.abs(out4[k].astype(int) - ref.astype(int))
    assert dd.max() <= 2, dd.max()
log("4K batch fused: parity ok")

log("ALL VERIFICATIONS PASSED")
