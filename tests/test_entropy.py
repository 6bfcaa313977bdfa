"""Entropy kernel parity tests: Pallas kernel (interpret mode on CPU) vs the
golden CPU decoder — exact integer equality on raw coefficients.

This is the kernel-level parity tier of the test strategy (SURVEY.md §4:
"kernel-level parity tests comparing Pallas output against a CPU reference
decode").
"""

import numpy as np
import pytest

from compeg_tpu import analyze, encoder, golden
from compeg_tpu import scan as S
from compeg_tpu.ops import entropy as E


def kernel_coefficients(data: bytes):
    img = analyze(data)
    dscan = S.preprocess(img.scan_data, img.total_restart_intervals)
    plan = E.plan_from_image(img, dscan)
    from compeg_tpu.pipeline import seg_mcu_counts

    seg_mcus = seg_mcu_counts(dscan.active, img.restart_interval, img.total_mcus)
    out = E.entropy_decode(
        np.asarray(dscan.words, dtype=np.uint32),
        seg_mcus,
        plan,
        interpret=True,
    )
    return np.asarray(E.coefficients_natural_order(out, plan)), img


@pytest.mark.parametrize("sampling", ["422", "444", "420", "gray"])
def test_kernel_matches_golden(sampling, test_image):
    img = test_image(24, 40, "gradient")
    data = encoder.encode(img, sampling=sampling, quality=85, restart_interval_mcus=1)
    got, meta = kernel_coefficients(data)
    want = golden.decode_coefficients(meta, dequant=False)
    assert got.shape == want.shape
    assert np.array_equal(got, want), np.argwhere(got != want)[:10]


@pytest.mark.parametrize("ri", [1, 2, 3, 7])
def test_kernel_restart_intervals(ri, test_image):
    img = test_image(24, 48, "edges")
    data = encoder.encode(img, sampling="422", quality=75, restart_interval_mcus=ri)
    got, meta = kernel_coefficients(data)
    want = golden.decode_coefficients(meta, dequant=False)
    assert np.array_equal(got, want)


def test_kernel_noise_image(test_image):
    """Noise maximizes AC symbol count and code-length diversity."""
    img = test_image(16, 32, "noise")
    data = encoder.encode(img, sampling="422", quality=95, restart_interval_mcus=2)
    got, meta = kernel_coefficients(data)
    want = golden.decode_coefficients(meta, dequant=False)
    assert np.array_equal(got, want)


def test_kernel_zrl_case():
    """Isolated high-frequency content exercises ZRL runs."""
    img = np.full((8, 16, 3), 100, np.uint8)
    img[7, 7] = [250, 30, 200]
    img[0, 15] = [0, 255, 128]
    data = encoder.encode(img, sampling="422", quality=100, restart_interval_mcus=1)
    got, meta = kernel_coefficients(data)
    want = golden.decode_coefficients(meta, dequant=False)
    assert np.array_equal(got, want)


def test_kernel_multiblock(test_image):
    """More segments than one (8, 128) block exercises the grid dimension."""
    # 96x272 at 4:2:2 -> 17x12 = 204 MCUs... need >1024 segments: use Ri=1 on
    # a taller image: 16 MCU cols x 80 rows = 1280 segments.
    img = test_image(640, 256, "gradient")
    data = encoder.encode(img, sampling="422", quality=50, restart_interval_mcus=1)
    meta = analyze(data)
    assert meta.total_restart_intervals > S.SEGMENTS_PER_BLOCK
    got, _ = kernel_coefficients(data)
    want = golden.decode_coefficients(meta, dequant=False)
    assert np.array_equal(got, want)


def test_kernel_flat_image_eob_fastpath(test_image):
    """Flat image: every AC is EOB-immediately; exercises the early exit."""
    img = test_image(16, 32, "flat")
    data = encoder.encode(img, sampling="422", quality=50, restart_interval_mcus=1)
    got, meta = kernel_coefficients(data)
    want = golden.decode_coefficients(meta, dequant=False)
    assert np.array_equal(got, want)


def test_reserved_ac_symbol_matches_golden_and_reference():
    """A custom DHT may legally map codes to reserved (run, size=0) AC
    values (not EOB/ZRL). Golden and the reference's kernel treat them as
    'advance run+1 positions, commit nothing' and KEEP DECODING
    (src/huffman.wgsl:174-197); the r1-r4 kernels killed the lane instead,
    losing every later coefficient of the DU. Hand-built stream: gray 8x8,
    flat qtable, AC table {'00': 0x30 reserved, '01': (0,1), '10': EOB},
    scan = DC 0, reserved, +1 at position 5, EOB."""
    import numpy as np

    from compeg_tpu import analyze, golden
    from compeg_tpu.pipeline import Decoder

    dqt = bytes([0xFF, 0xDB, 0x00, 0x43, 0x00]) + bytes([1] * 64)
    sof = bytes([0xFF, 0xC0, 0x00, 0x0B, 0x08, 0x00, 0x08, 0x00, 0x08,
                 0x01, 0x01, 0x11, 0x00])
    dht_dc = bytes([0xFF, 0xC4, 0x00, 0x14, 0x00, 0x01] + [0] * 15 + [0x00])
    dht_ac = bytes([0xFF, 0xC4, 0x00, 0x16, 0x10, 0x00, 0x03] + [0] * 14
                   + [0x30, 0x01, 0x00])
    sos = bytes([0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3F, 0x00])
    scan = bytes([0b00001110])  # DC '0' | AC '00' '01' mag '1' '10'
    data = b"\xFF\xD8" + dqt + sof + dht_dc + dht_ac + sos + scan + b"\xFF\xD9"

    img = analyze(data)
    coeffs = golden.decode_coefficients(img, dequant=False)
    want = np.zeros(64, np.int32)
    want[5] = 1  # the coefficient AFTER the reserved symbol
    assert np.array_equal(coeffs[0], want), coeffs[0][:8]

    got = Decoder(interpret=True).decode(data)
    ref = golden.decode_rgb(data)
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
