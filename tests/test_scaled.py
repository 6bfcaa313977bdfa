"""Scaled (thumbnail) decode: the libjpeg ``scale_num/scale_denom`` feature
as a DCT-domain downsample (k-point scaled IDCT, k ∈ {1, 2, 4, 8}) — an
extension over the reference, which always decodes full-scale.
"""

import io

import numpy as np
import pytest

from compeg_tpu import encoder, golden
from compeg_tpu.errors import CompegError
from compeg_tpu.pipeline import Decoder


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 // max(w - 1, 1), yy * 255 // max(h - 1, 1),
         (xx + yy) * 128 // max(h + w - 2, 1) + 64],
        axis=-1,
    ).astype(np.uint8)


@pytest.mark.parametrize("sampling", ["422", "420", "444", "gray"])
@pytest.mark.parametrize("k", [1, 2, 4])
def test_device_scaled_matches_golden(sampling, k):
    data = encoder.encode(_gradient(64, 96), sampling=sampling, quality=92,
                          restart_interval_mcus=1)
    dec = Decoder(interpret=True)
    got = dec.decode_scaled(data, k)
    want = golden.decode_rgb(data, scale_blocks=k)
    assert got.shape == (64 * k // 8, 96 * k // 8, 3)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_scaled_k8_is_full_decode():
    data = encoder.encode(_gradient(32, 48), sampling="422", quality=90,
                          restart_interval_mcus=1)
    dec = Decoder(interpret=True)
    assert np.array_equal(dec.decode_scaled(data, 8), dec.decode(data))


def test_scaled_odd_dimensions_ceil_crop():
    """Non-multiple-of-8 sizes crop to ceil(dim*k/8), libjpeg's rounding."""
    data = encoder.encode(_gradient(17, 37), sampling="422", quality=90,
                          restart_interval_mcus=1)
    dec = Decoder(interpret=True)
    for k, hw in ((1, (3, 5)), (2, (5, 10)), (4, (9, 19))):
        out = dec.decode_scaled(data, k)
        assert out.shape == hw + (3,), (k, out.shape)


def test_scaled_flat_image_is_flat_at_every_scale():
    """The k-point operator preserves the DC level exactly: a flat frame
    decodes to (nearly) the same flat value at every scale."""
    img = np.full((32, 64, 3), 128, np.uint8)
    data = encoder.encode(img, sampling="422", quality=90,
                          restart_interval_mcus=1)
    dec = Decoder(interpret=True)
    for k in (1, 2, 4, 8):
        out = dec.decode_scaled(data, k)
        assert np.abs(out.astype(int) - 128).max() <= 2, k


def test_scaled_vs_pillow_draft():
    """Cross-validate against libjpeg's own scaled decode (PIL draft mode).
    The two scaled-IDCT definitions differ in filter detail (jidctred's
    rotations vs the truncated-cosine operator), so compare loosely: high
    PSNR on a smooth image."""
    PIL = pytest.importorskip("PIL.Image")
    img = _gradient(64, 128)
    data = encoder.encode(img, sampling="422", quality=95,
                          restart_interval_mcus=1)
    dec = Decoder(interpret=True)
    for k in (1, 2, 4):
        pim = PIL.open(io.BytesIO(data))
        pim.draft("RGB", (128 * k // 8, 64 * k // 8))
        theirs = np.asarray(pim.convert("RGB"))
        ours = dec.decode_scaled(data, k)
        if theirs.shape != ours.shape:
            continue  # draft may pick a different scale; nothing to compare
        mse = np.mean(
            (ours.astype(np.float64) - theirs.astype(np.float64)) ** 2
        )
        psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
        assert psnr > 30, (k, psnr)


def test_scaled_invalid_k_raises():
    data = encoder.encode(_gradient(16, 16), sampling="422", quality=90,
                          restart_interval_mcus=1)
    with pytest.raises(CompegError, match="scale_blocks"):
        Decoder(interpret=True).decode_scaled(data, 3)


def test_golden_scaled_rejects_non_float_idct():
    data = encoder.encode(_gradient(16, 16), sampling="422", quality=90,
                          restart_interval_mcus=1)
    with pytest.raises(CompegError):
        golden.decode_rgb(data, scale_blocks=4, idct="int")


def test_viewer_scaled_preview(tmp_path):
    """examples/viewer.py --scale 1 decodes 1/8-scale thumbnails end to end
    (the preview use case)."""
    import os
    import subprocess
    import sys

    from compeg_tpu import encoder

    frame = encoder.encode(_gradient(32, 64), sampling="422", quality=90,
                           restart_interval_mcus=1)
    src = tmp_path / "f.jpg"
    src.write_bytes(frame)
    outdir = tmp_path / "out"
    root = os.path.join(os.path.dirname(__file__), "..")
    r = subprocess.run(
        [sys.executable, "examples/viewer.py", str(src), "--scale", "1",
         "--save-dir", str(outdir), "--platform", "cpu"],
        capture_output=True, timeout=300, cwd=root,
        env=dict(os.environ, COMPEG_PLATFORM="cpu"),
    )
    assert r.returncode == 0, (r.stdout, r.stderr)
    from PIL import Image

    pngs = sorted(outdir.glob("*.png"))
    assert len(pngs) == 1
    assert Image.open(pngs[0]).size == (8, 4)  # ceil(64/8) x ceil(32/8)


def test_scaled_staged_fallback_untiled_geometry():
    """A restart interval that doesn't divide the MCU-row width packs
    linearly (no tiling) — scaled decode falls back to the staged path and
    must still match the golden oracle."""
    data = encoder.encode(_gradient(40, 56), sampling="422", quality=90,
                          restart_interval_mcus=3)
    dec = Decoder(interpret=True)
    pf = dec.prepare(data)
    assert pf.geom.tiling is None  # precondition for the fallback
    for k in (1, 4):
        got = dec.decode_scaled(data, k)
        want = golden.decode_rgb(data, scale_blocks=k)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, k
