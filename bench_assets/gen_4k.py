"""Generate the 4K benchmark JPEG: 3840x2160 4:2:2, Ri=1, quality 85.

Encoded with libjpeg (via Pillow) with per-MCU restart markers — a
hardware-encoder-style stream, the analogue of the reference's bench image
(benches/scan.dat: 496,464-byte scan, 42,876 restart intervals).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def make_4k() -> np.ndarray:
    h, w = 2160, 3840
    r = np.random.default_rng(42)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            128 + 90 * np.sin(xx / 97.0) + 30 * np.cos(yy / 53.0),
            128 + 80 * np.cos(xx / 71.0 + yy / 131.0),
            128 + 70 * np.sin((xx + yy) / 157.0),
        ],
        axis=-1,
    )
    noise = r.normal(0, 6, base.shape)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


if __name__ == "__main__":
    from PIL import Image

    t0 = time.time()
    img = make_4k()
    Image.fromarray(img).save(
        "/root/repo/bench_assets/bench4k.jpg",
        "JPEG",
        quality=85,
        subsampling="4:2:2",
        restart_marker_blocks=1,
    )
    from compeg_tpu import analyze

    data = open("/root/repo/bench_assets/bench4k.jpg", "rb").read()
    m = analyze(data)
    print(
        f"encoded in {time.time()-t0:.1f}s, {len(data)} bytes, "
        f"{m.total_restart_intervals} restart intervals, scan {len(m.scan_data)} bytes"
    )
