"""Compeg-compat mode: reproduce the reference's ZRL-advance-17 semantics
(src/huffman.wgsl:182-196) and verify the device kernels bit-exact against
the compat-mode golden decoder on ZRL-heavy streams (PARITY.md,
"Compeg-compat mode")."""

import numpy as np
import pytest

from compeg_tpu import encoder, golden
from compeg_tpu.metadata import analyze
from compeg_tpu.ops.luts import idct_matrix_zigzag
from compeg_tpu.pipeline import Decoder


@pytest.fixture(scope="module")
def zrl_stream():
    """A stream whose blocks carry isolated high-zigzag coefficients, so the
    encoder emits ZRL symbols (runs of >=16 zeros before a coefficient) —
    the only place spec (+16) and reference (+17) semantics diverge."""
    L = idct_matrix_zigzag(64)  # [64 pix, 64 zig]
    rng = np.random.RandomState(7)
    H, W = 32, 48
    img = np.zeros((H, W), np.uint8)
    for by in range(H // 8):
        for bx in range(W // 8):
            zc = np.zeros(64, np.float32)
            pos = rng.choice([20, 25, 35, 45, 55, 63])
            zc[pos] = rng.choice([300, -300, 500])
            if rng.rand() < 0.5:
                # A second coefficient after the ZRL run: exercises the
                # compat mode's shifted placement of retained coefficients.
                zc[min(63, pos + rng.randint(1, 17))] = 200
            pix = zc @ L.T + 128.0
            img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = np.clip(
                np.round(pix), 0, 255
            ).astype(np.uint8).reshape(8, 8)
    rgb = np.stack([img, img, img], -1)
    return encoder.encode(rgb, sampling="444", quality=97, restart_interval_mcus=1)


def test_zrl_actually_exercised(zrl_stream):
    """Spec and compat decodes must differ on this stream (otherwise the
    compat tests below prove nothing)."""
    m = analyze(zrl_stream)
    c_spec = golden.decode_coefficients(m, dequant=False)
    c_compat = golden.decode_coefficients(m, dequant=False, zrl17=True)
    assert (c_spec != c_compat).any()


def test_fused_compat_bit_exact(zrl_stream):
    got = Decoder(interpret=True, zrl_compat=True, exact_idct=True).decode(
        zrl_stream
    )
    want = golden.decode_rgb(zrl_stream, idct="int", zrl17=True)
    assert np.array_equal(got, want)


def test_planes_compat_bit_exact(zrl_stream):
    got = Decoder(
        interpret=True, zrl_compat=True, exact_idct=True, planes_epilogue=True
    ).decode(zrl_stream)
    want = golden.decode_rgb(zrl_stream, idct="int", zrl17=True)
    assert np.array_equal(got, want)


def test_staged_compat(zrl_stream):
    got = Decoder(interpret=True, zrl_compat=True, fused=False).decode(
        zrl_stream
    ).astype(int)
    want = golden.decode_rgb(zrl_stream, zrl17=True).astype(int)
    assert np.abs(got - want).max() <= 1


def test_reference_mode(zrl_stream):
    """The documented Compeg-compat configuration: zrl_compat +
    retained_coefficients=32 (the reference's default truncation,
    src/metadata.rs:43), bit-exact against the compat golden decoder."""
    got = Decoder(
        interpret=True,
        zrl_compat=True,
        retained_coefficients=32,
        exact_idct=True,
    ).decode(zrl_stream)
    want = golden.decode_rgb(
        zrl_stream, retained_coefficients=32, idct="int", zrl17=True
    )
    assert np.array_equal(got, want)


def test_spec_mode_unaffected(zrl_stream):
    """Default decode still follows spec semantics (the compat knob is
    opt-in): matches the spec golden decoder, not the compat one."""
    got = Decoder(interpret=True, exact_idct=True).decode(zrl_stream)
    assert np.array_equal(got, golden.decode_rgb(zrl_stream, idct="int"))
    assert not np.array_equal(
        got, golden.decode_rgb(zrl_stream, idct="int", zrl17=True)
    )
