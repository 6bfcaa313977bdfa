"""Randomized geometry soak: the fused pipeline vs the golden decoder over
a seeded sweep of (size, sampling, quality, restart interval) combinations.

The targeted tests pin each feature; this tier covers their INTERACTIONS
(odd dimensions x sampling factors x Ri tiling eligibility x quality-driven
table shapes) the way the reference's randomized reftest inputs do
(src/tests.rs uses fastrand-generated images). Seeded, so failures
reproduce; coefficient parity is exact by construction, pixels within the
f32 envelope (or byte-exact with exact_idct on a subset).
"""

import numpy as np
import pytest

from compeg_tpu import encoder, golden
from compeg_tpu.pipeline import Decoder

SAMPLINGS = ["422", "420", "444", "440", "411", "gray"]


def _configs(n=10, seed=20260820):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        h = int(rng.integers(9, 57))
        w = int(rng.integers(9, 73))
        sampling = SAMPLINGS[int(rng.integers(0, len(SAMPLINGS)))]
        quality = int(rng.integers(35, 98))
        ri = [None, 1, 2, 3, 5][int(rng.integers(0, 5))]
        out.append((h, w, sampling, quality, ri))
    return out


@pytest.mark.parametrize("h,w,sampling,quality,ri", _configs())
def test_soak_fused_vs_golden(h, w, sampling, quality, ri, test_image):
    img = test_image(h, w, "noise", seed=h * 1000 + w)
    data = encoder.encode(img, sampling=sampling, quality=quality,
                          restart_interval_mcus=ri)
    got = Decoder(interpret=True).decode(data)
    want = golden.decode_rgb(data)
    assert got.shape == want.shape == (h, w, 3)
    d = np.abs(got.astype(int) - want.astype(int))
    assert d.max() <= 1, (d.max(), (h, w, sampling, quality, ri))


@pytest.mark.parametrize("h,w,sampling,quality,ri", _configs(4, seed=7))
def test_soak_exact_idct_byte_identical(h, w, sampling, quality, ri,
                                        test_image):
    img = test_image(h, w, "noise", seed=h + w)
    data = encoder.encode(img, sampling=sampling, quality=quality,
                          restart_interval_mcus=ri)
    got = Decoder(interpret=True, exact_idct=True).decode(data)
    want = golden.decode_rgb(data, idct="int")
    assert np.array_equal(got, want), (h, w, sampling, quality, ri)
