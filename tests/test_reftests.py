"""Reference-shaped reftests: the same image shapes the reference's GPU
reftests use (64x8 at Ri=1 and Ri=2, plus the 4:4:4 variant it gates off;
reference src/tests.rs:131-142, src/refs/*), decoded end to end and compared
against the golden decoder and libjpeg."""

import io

import numpy as np
import pytest

from compeg_tpu import encoder, golden
from compeg_tpu.pipeline import decode_rgb


def ref_image():
    """A 64x8 gradient+detail image, like the reference's 64x8.png."""
    yy, xx = np.mgrid[0:8, 0:64]
    img = np.stack(
        [xx * 4, 255 - xx * 2 - yy * 8, (xx * 3 + yy * 11) % 256], axis=-1
    ).astype(np.uint8)
    img[3:5, 20:24] = [255, 0, 0]
    return img


@pytest.mark.parametrize("ri", [1, 2])
def test_reftest_64x8_422(ri):
    data = encoder.encode(ref_image(), sampling="422", quality=90, restart_interval_mcus=ri)
    got = decode_rgb(data)
    want = golden.decode_rgb(data)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    # vs libjpeg: nearest-vs-fancy chroma upsampling differs at the sharp
    # red edge, so compare by PSNR (the reference's tol-3 reftest uses
    # ground truth rendered with its own upsampling convention).
    PIL = pytest.importorskip("PIL.Image")
    theirs = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    mse = np.mean((got.astype(float) - theirs.astype(float)) ** 2)
    assert 10 * np.log10(255.0**2 / mse) > 28, mse


def test_reftest_64x8_444():
    """The reference nearly supports 4:4:4 (Hi1-Vi1 reftest is #[ignore]d);
    this engine decodes it."""
    data = encoder.encode(ref_image(), sampling="444", quality=90, restart_interval_mcus=1)
    got = decode_rgb(data)
    want = golden.decode_rgb(data)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    PIL = pytest.importorskip("PIL.Image")
    theirs = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    assert np.abs(got.astype(int) - theirs.astype(int)).max() <= 3
