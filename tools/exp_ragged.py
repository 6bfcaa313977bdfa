"""Measure the transfer-volume win of ragged per-block/per-row scan packing.

For the bench 4K stream, computes packed bytes under:
  (a) today's layout: global max width over all segments
  (b) per-block (1024-segment raster tile) max width, rounded to classes
  (c) per-sublane-row (128-segment) max width, rounded to classes
vs the raw (destuffed) scan size.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

from compeg_tpu import scan as S
from compeg_tpu.metadata import analyze

ASSET = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench_assets", "bench4k.jpg")

data = open(ASSET, "rb").read()
img = analyze(data)
intervals = S.split_intervals(img.scan_data, img.total_restart_intervals)
lens = np.array([len(s) for s in intervals])
widths = (lens + 3) // 4  # words per segment (no guard)
raw = int(lens.sum())
print(f"segments={len(intervals)} raw_destuffed={raw/1e6:.3f} MB "
      f"len min/med/mean/max = {lens.min()}/{np.median(lens):.0f}/{lens.mean():.1f}/{lens.max()}")

tile = S.TileMap.for_geometry(img.height_mcus, img.width_mcus, img.restart_interval)
slot = tile.slot_of_segment(img.height_mcus)
G = tile.num_blocks
# slot -> width map (padding slots width 0)
wslot = np.zeros(G * 1024, dtype=np.int64)
wslot[slot] = widths
blocks = wslot.reshape(G, 8, 128)

wmax = int(widths.max())
print(f"tiles G={G} (n_tr={tile.n_tr}, n_tc={tile.n_tc}) global W={wmax} "
      f"uniform packed = {G*1024*wmax*4/1e6:.3f} MB")

for name, classes in [
    ("pow-ish", [2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 48, 64, 96, 128]),
    ("fine", list(range(1, 129))),
]:
    classes = np.array([c for c in classes if c <= wmax + 8])

    def roundup(w):
        idx = np.searchsorted(classes, w)
        return classes[np.minimum(idx, len(classes) - 1)]

    # (b) per-block
    bw = roundup(blocks.reshape(G, -1).max(axis=1))
    b_bytes = int((bw * 1024 * 4).sum())
    # (c) per sublane row (G*8 rows of 128 lanes)
    rw = roundup(blocks.reshape(G * 8, 128).max(axis=1))
    c_bytes = int((rw * 128 * 4).sum())
    print(f"[{name}] per-block: {b_bytes/1e6:.3f} MB ({b_bytes/raw:.2f}x raw) | "
          f"per-row: {c_bytes/1e6:.3f} MB ({c_bytes/raw:.2f}x raw)")

# distribution of per-block widths
bw = blocks.reshape(G, -1).max(axis=1)
print("per-block max widths:", np.sort(bw))
rw = blocks.reshape(G * 8, 128).max(axis=1)
print("per-row width hist:", np.bincount(rw, minlength=wmax + 1).tolist())

# ---- vertical-V column stacking -------------------------------------------
# Lane (s, l) of block (tr, tc) holds the V segments of raster column
# tc*128+l, MCU rows tr*8V + s*V + v, packed back-to-back word-aligned.
print("\n== vertical-V column stacking ==")
hm, spr = img.height_mcus, tile.segs_per_row
wseg = widths.reshape(hm, spr)  # [mcu_row, seg_col] words per segment
for V in (2, 4, 8, 16, 32):
    n_tr = -(-hm // (8 * V))
    n_tc = tile.n_tc
    padrows = n_tr * 8 * V - hm
    wpad = np.zeros((n_tr * 8 * V, n_tc * 128), dtype=np.int64)
    wpad[:hm, :spr] = wseg
    # column (tr, s, l-group) sums V consecutive rows
    w4 = wpad.reshape(n_tr, 8, V, n_tc * 128)
    colsum = w4.sum(axis=2)  # [n_tr, 8, cols]
    # per-block K = max column sum over the 8x128 block
    K = colsum.reshape(n_tr, 8, n_tc, 128).max(axis=(1, 3))  # [n_tr, n_tc]
    total = int((K * 1024 * 4).sum())
    # spread of base_v within a block: base_v = cumsum of first v widths
    base = np.cumsum(w4, axis=2) - w4  # [n_tr, 8, V, cols]
    b5 = base.reshape(n_tr, 8, V, n_tc, 128)
    spread = (b5.max(axis=(1, 4)) - b5.min(axis=(1, 4)))  # [n_tr, V, n_tc]
    print(f"V={V:3d}: n_tr={n_tr} G'={n_tr*n_tc} padrows={padrows} "
          f"packed={total/1e6:.3f} MB ({total/raw:.2f}x raw) "
          f"K max={int(K.max())} spread max={int(spread.max())} "
          f"p99={int(np.percentile(spread, 99))}")
