"""End-to-end device pipeline tests (CPU interpret mode): full decode vs the
golden CPU decoder — the e2e parity tier of SURVEY.md §4."""

import numpy as np
import pytest

from compeg_tpu import encoder, golden
from compeg_tpu.pipeline import Decoder, decode_rgb


def assert_close_pixels(got, want, tol=1):
    """Integer stages must match exactly; the f32 IDCT may differ by 1 gray
    level between MXU/XLA and numpy accumulation order."""
    assert got.shape == want.shape
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= tol, (diff.max(), np.argwhere(diff > tol)[:5])


@pytest.mark.parametrize("sampling", ["422", "444", "420", "440", "411", "gray"])
def test_e2e_matches_golden(sampling, test_image):
    img = test_image(24, 40, "gradient")
    data = encoder.encode(img, sampling=sampling, quality=85, restart_interval_mcus=1)
    got = decode_rgb(data)
    want = golden.decode_rgb(data)
    assert_close_pixels(got, want)


@pytest.mark.parametrize("ri", [2, 5, None])
def test_e2e_restart_intervals(ri, test_image):
    img = test_image(16, 48, "edges")
    data = encoder.encode(img, sampling="422", quality=80, restart_interval_mcus=ri)
    got = decode_rgb(data)
    want = golden.decode_rgb(data)
    assert_close_pixels(got, want)


def test_e2e_odd_dimensions(test_image):
    """Non-MCU-aligned sizes exercise padding + crop."""
    img = test_image(17, 37, "gradient")
    data = encoder.encode(img, sampling="422", quality=90, restart_interval_mcus=1)
    got = decode_rgb(data)
    want = golden.decode_rgb(data)
    assert got.shape == (17, 37, 3)
    assert_close_pixels(got, want)


def test_e2e_retained_32(test_image):
    """The reference's quality knob reproduced end to end."""
    img = test_image(16, 32, "gradient")
    data = encoder.encode(img, sampling="422", quality=85)
    got = decode_rgb(data, retained_coefficients=32)
    want = golden.decode_rgb(data, retained_coefficients=32)
    assert_close_pixels(got, want)


def test_decoder_reuse_across_frames(test_image):
    """Same-geometry frames reuse the compiled pipeline (streaming case)."""
    dec = Decoder()
    for seed in range(3):
        img = test_image(16, 32, "noise", seed=seed)
        data = encoder.encode(img, sampling="422", quality=80, restart_interval_mcus=1)
        got = dec.decode(data)
        want = golden.decode_rgb(data)
        assert_close_pixels(got, want)


def test_vs_pillow_e2e(test_image):
    import io
    PIL = pytest.importorskip("PIL.Image")
    img = test_image(32, 48, "gradient")
    data = encoder.encode(img, sampling="422", quality=95, restart_interval_mcus=2)
    ours = decode_rgb(data)
    theirs = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    mse = np.mean((ours.astype(float) - theirs.astype(float)) ** 2)
    assert mse < 20.0, mse


@pytest.mark.parametrize("sampling", ["422", "420", "gray"])
@pytest.mark.parametrize("fused", [True, False])
def test_decode_ycbcr_matches_golden(sampling, fused, test_image):
    """Raw per-component plane output (no upsampling / color conversion)
    must be byte-identical to the golden decoder's planes on the exact
    integer path, on both the fused and the staged formulation."""
    from compeg_tpu.metadata import analyze

    img = test_image(24, 40, "gradient")
    data = encoder.encode(img, sampling=sampling, quality=85,
                          restart_interval_mcus=1)
    dec = Decoder(interpret=True, exact_idct=True, fused=fused)
    got = dec.decode_ycbcr(data)
    meta = analyze(data)
    coeffs = golden.decode_coefficients(meta, dequant=False)
    # exact_idct rides the fused kernel; the staged formulation keeps the
    # float IDCT, so its oracle is the float golden with the usual ±1.
    if fused:
        pixels = golden.idct_pixels_int(coeffs, meta, 64)
    else:
        pixels = golden.idct_pixels_raw(coeffs, meta, 64)
    want = golden.assemble_planes(meta, pixels)
    max_h = max(c.h_sample for c in meta.components)
    max_v = max(c.v_sample for c in meta.components)
    assert len(got) == len(meta.components)
    for p, w, c in zip(got, want, meta.components):
        hc = -(-meta.height * c.v_sample // max_v)
        wc = -(-meta.width * c.h_sample // max_h)
        assert p.shape == (hc, wc)
        if fused:
            assert np.array_equal(p, w[:hc, :wc])
        else:
            assert_close_pixels(p, w[:hc, :wc])


@pytest.mark.parametrize("sampling", ["440", "411"])
def test_extended_samplings_vs_pillow(sampling, test_image):
    """4:4:0 and 4:1:1 (beyond the reference's 4:2:2-only envelope) against
    libjpeg as the independent oracle — Pillow decodes both even though it
    cannot encode them, so the stream comes from our encoder."""
    import io
    PIL = pytest.importorskip("PIL.Image")
    img = test_image(32, 48, "gradient")
    data = encoder.encode(img, sampling=sampling, quality=95,
                          restart_interval_mcus=2)
    ours = decode_rgb(data)
    theirs = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    mse = np.mean((ours.astype(float) - theirs.astype(float)) ** 2)
    assert mse < 20.0, mse


def test_decode_op_async(test_image):
    """start_decode returns an async handle; geometry_changed flags frame
    size changes (the reference's texture_changed contract)."""
    from compeg_tpu.pipeline import Decoder

    dec = Decoder(interpret=True)
    a = encoder.encode(test_image(16, 32), sampling="422", restart_interval_mcus=1)
    b = encoder.encode(test_image(16, 48), sampling="422", restart_interval_mcus=1)
    op1 = dec.start_decode(a)
    assert op1.geometry_changed
    out1 = op1.block_until_ready().rgb()
    assert out1.shape == (16, 32, 3)
    op2 = dec.start_decode(a)
    assert not op2.geometry_changed
    op3 = dec.start_decode(b)
    assert op3.geometry_changed
    assert op3.rgb().shape == (16, 48, 3)


def test_fancy_upsampling_vs_libjpeg(test_image):
    """Fancy (triangle) chroma upsampling should land closer to libjpeg's
    default output than nearest-neighbor does."""
    import io
    PIL = pytest.importorskip("PIL.Image")
    from compeg_tpu.pipeline import Decoder

    img = test_image(32, 48, "edges")
    data = encoder.encode(img, sampling="422", quality=90, restart_interval_mcus=1)
    theirs = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB")).astype(float)
    near = Decoder(interpret=True).decode(data).astype(float)
    fancy = Decoder(interpret=True, fancy_upsampling=True).decode(data).astype(float)
    assert np.mean((fancy - theirs) ** 2) < np.mean((near - theirs) ** 2)


@pytest.mark.parametrize("sampling", ["422", "420", "444", "440", "411"])
def test_fancy_fused_matches_staged(sampling, test_image):
    """The fused per-component-plane fancy path (decode_frame_fused_fancy)
    must be bit-identical to the staged fancy path (ops/color), which is
    itself validated against libjpeg weighting above."""
    from compeg_tpu.pipeline import Decoder

    img = test_image(24, 48, "edges")
    data = encoder.encode(img, sampling=sampling, quality=90,
                          restart_interval_mcus=1)
    fused = Decoder(interpret=True, fancy_upsampling=True)
    staged = Decoder(interpret=True, fancy_upsampling=True, fused=False)
    a = fused.decode(data)
    assert fused.prepare(data).geom.tiling is not None  # rode the fused path
    b = staged.decode(data)
    assert np.array_equal(a, b)


def test_width_rebucket_across_frames(test_image):
    """A stream whose segment sizes grow must transparently re-measure the
    scan width (the grow-only-buffer behavior of the reference)."""
    from compeg_tpu.pipeline import Decoder

    dec = Decoder(interpret=True)
    small = encoder.encode(test_image(8, 16, "flat"), sampling="422",
                           quality=30, restart_interval_mcus=1)
    big = encoder.encode(test_image(8, 16, "noise"), sampling="422",
                         quality=95, restart_interval_mcus=1)
    o1 = dec.decode(small)
    o2 = dec.decode(big)  # overflows the cached width; must re-bucket
    o3 = dec.decode(small)
    for d, o in ((small, o1), (big, o2), (small, o3)):
        want = golden.decode_rgb(d)
        assert np.abs(o.astype(int) - want.astype(int)).max() <= 1


@pytest.mark.parametrize("sampling", ["422", "444"])
def test_exact_idct_bit_identical(sampling, test_image):
    """exact_idct mode must match golden's integer IDCT byte-for-byte."""
    from compeg_tpu.pipeline import Decoder

    img = test_image(24, 40, "noise")
    data = encoder.encode(img, sampling=sampling, quality=85, restart_interval_mcus=1)
    got = Decoder(interpret=True, exact_idct=True).decode(data)
    want = golden.decode_rgb(data, idct="int")
    assert np.array_equal(got, want)


def test_reference_parity_mode(test_image):
    """The reference-equivalent configuration: retained_coefficients=32 with
    the exact integer IDCT — fully deterministic, truncation matching the
    reference's quality envelope (src/metadata.rs:43)."""
    from compeg_tpu.pipeline import Decoder

    # Noise has energy in the high zigzag indices, so retained=32 truncation
    # actually changes pixels (a smooth gradient quantizes those to zero).
    img = test_image(16, 32, "noise")
    data = encoder.encode(img, sampling="422", quality=85, restart_interval_mcus=1)
    got = Decoder(interpret=True, exact_idct=True, retained_coefficients=32).decode(data)
    want = golden.decode_rgb(data, retained_coefficients=32, idct="int")
    assert np.array_equal(got, want)
    # Truncation must visibly differ from the full-quality decode (i.e.
    # retained=32 is actually in effect, not silently ignored).
    full = golden.decode_rgb(data, idct="int")
    assert not np.array_equal(want, full)


def test_tiled_vs_linear_layout_identical(test_image):
    """The raster-tiled slot assignment (fast assembly) and the linear
    layout must produce byte-identical pixels."""
    from compeg_tpu import scan as S

    img = test_image(24, 48, "noise")
    data = encoder.encode(img, sampling="420", quality=88, restart_interval_mcus=1)
    # Default (f32 MXU) IDCT: deterministic per DU regardless of slot
    # layout, so the comparison is still byte-exact — and ~20x cheaper to
    # interpret than exact_idct (which tests/test_pipeline.py covers on the
    # default path in test_exact_idct_bit_identical).
    dec_t = Decoder(interpret=True)
    out_t = dec_t.decode(data)
    pf = dec_t.prepare(data)
    assert pf.geom.tiling is not None  # tiled path actually engaged
    dec_l = Decoder(interpret=True)
    dec_l._tile_map = lambda *a, **k: None  # force linear
    out_l = dec_l.decode(data)
    assert pf_linear_tiling_is_none(dec_l, data)
    assert np.array_equal(out_t, out_l)


def pf_linear_tiling_is_none(dec, data):
    return dec.prepare(data).geom.tiling is None


def test_segmcus_cache_distinguishes_grid_shapes(test_image):
    """A shared Decoder must not reuse one MCU grid's active-slot mask for
    a different grid with the same MCU count (8x2 vs 2x8 MCUs collide on
    (ri, total_mcus, blocks, tiling) alone)."""
    dec = Decoder(interpret=True)
    a = encoder.encode(test_image(16, 64, "noise"), sampling="444",
                       quality=85, restart_interval_mcus=1)
    b = encoder.encode(test_image(64, 16, "noise"), sampling="444",
                       quality=85, restart_interval_mcus=1)
    assert np.array_equal(dec.decode(a), golden.decode_rgb(a))
    got = dec.decode(b)
    want = golden.decode_rgb(b)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 2


@pytest.mark.parametrize("sampling", ["422", "420", "444", "440", "411"])
def test_composite_matches_planes_epilogue(sampling, test_image):
    """The default in-kernel composite and the forced planes+XLA-epilogue
    formulation must be bit-identical for nearest upsampling on every
    sampling (they share phases 1-2; only the output packing differs —
    incl. the packed-chroma word-repeat + vector-shift extraction)."""
    img = test_image(24, 48, "noise")
    data = encoder.encode(img, sampling=sampling, quality=88,
                          restart_interval_mcus=1)
    a = Decoder(interpret=True).decode(data)
    b = Decoder(interpret=True, planes_epilogue=True).decode(data)
    assert np.array_equal(a, b)


def test_fancy_with_planes_epilogue_disabled(test_image):
    """fancy + planes_epilogue=False must still decode tiled-packed words
    correctly (the staged fallback cannot read the tiled slot permutation,
    so the planes path must win)."""
    img = test_image(24, 48, "noise")
    data = encoder.encode(img, sampling="422", quality=88,
                          restart_interval_mcus=1)
    dec = Decoder(interpret=True, fancy_upsampling=True,
                  planes_epilogue=False)
    pf = dec.prepare(data)
    assert pf.geom.tiling is not None
    want = Decoder(interpret=True, fancy_upsampling=True).decode(data)
    assert np.array_equal(dec.decode(data), want)


def test_decode_rgba_matches_rgb_with_alpha(test_image):
    """decode_rgba (the reference's rgba8unorm output format,
    src/lib.rs:48): RGB channels equal decode()'s, alpha is 255, on both
    the fused (packed u32) and staged paths."""
    data = encoder.encode(test_image(24, 48, "gradient"), sampling="422",
                          quality=85, restart_interval_mcus=1)
    for fused in (True, False):
        dec = Decoder(interpret=True, fused=fused)
        rgba = dec.decode_rgba(data)
        rgb = Decoder(interpret=True, fused=fused).decode(data)
        assert rgba.shape == rgb.shape[:2] + (4,)
        assert np.array_equal(rgba[..., :3], rgb)
        assert (rgba[..., 3] == 255).all()


@pytest.mark.parametrize("sampling", ["422", "420"])
def test_fancy_exact_idct_fused_matches_staged(sampling, test_image):
    """fancy upsampling + exact integer IDCT: the fused planes path and the
    staged path share both the integer transform and the triangle filter,
    so their outputs must be byte-identical."""
    img = test_image(24, 48, "noise")
    data = encoder.encode(img, sampling=sampling, quality=90,
                          restart_interval_mcus=1)
    a = Decoder(interpret=True, fancy_upsampling=True, exact_idct=True
                ).decode(data)
    b = Decoder(interpret=True, fancy_upsampling=True, exact_idct=True,
                fused=False).decode(data)
    assert np.array_equal(a, b)


def test_e2e_vs_reference_aan_arithmetic(test_image):
    """The device float path against the reference's OWN arithmetic: the
    golden AAN oracle (op-for-op jidctflt model, golden.idct_pixels_aan).
    Default float pipeline must sit within ±2 (f32 rounding-order ulps of
    the same linear map); the compat config (zrl17 + retained=32) must sit
    within ±2 of the oracle evaluated at the same semantics. On the 4K
    stream the measured distributions are in PARITY.md."""
    img = test_image(32, 48, "noise")
    data = encoder.encode(img, sampling="422", quality=88,
                          restart_interval_mcus=1)
    got = decode_rgb(data)
    want = golden.decode_rgb(data, idct="aan")
    assert_close_pixels(got, want, tol=2)

    got_c = Decoder(interpret=True, zrl_compat=True,
                    retained_coefficients=32).decode(data)
    want_c = golden.decode_rgb(data, retained_coefficients=32, idct="aan",
                               zrl17=True)
    assert_close_pixels(got_c, want_c, tol=2)
