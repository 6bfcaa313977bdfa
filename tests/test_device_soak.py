"""Device-path corruption soak (interpret-mode fused kernel).

The entropy kernel's AC loop argues termination from its position encoding
(pos >= 63 ends the lane, every commit advances pos — ops/fused.py); this
soak tests that argument end-to-end under adversarial bits: streams whose
headers parse but whose entropy-coded payload is pure garbage must decode
to a correct-shape, deterministic image (bounded garbage pixels) or raise
CompegError — never hang, crash, or emit out-of-contract output.

The reference's model is the same: restart intervals bound corruption
blast radius (src/file.rs:668-671) and any error means "fall back to a
software decoder" (src/lib.rs:589-592).
"""

import numpy as np
import pytest

from compeg_tpu import analyze, encoder
from compeg_tpu.errors import CompegError
from compeg_tpu.pipeline import Decoder


def _garbage_scan(data: bytes, img, rng, allow_markers: bool) -> bytes:
    """Replace the entropy payload with random bytes.

    ``allow_markers=False`` preserves every FF and its follower (stuffing
    and RST structure intact, so the interval count matches and the kernel
    always runs). ``allow_markers=True`` throws unconstrained bytes at the
    preprocessor as well — new phantom markers may change the interval
    count, which must surface as CompegError, not a crash."""
    scan = bytearray(img.scan_data)
    i = 0
    while i < len(scan):
        if not allow_markers and scan[i] == 0xFF:
            i += 2
            continue
        v = int(rng.integers(0, 256))
        if not allow_markers and v == 0xFF:
            v = 0x7F
        scan[i] = v
        i += 1
    off = data.find(img.scan_data)
    return data[:off] + bytes(scan) + data[off + len(img.scan_data):]


@pytest.mark.parametrize("sampling,exact", [("422", False), ("420", True)])
def test_soak_garbage_bits_terminate_and_are_deterministic(
    sampling, exact, test_image
):
    """~100 seeds of fully-random entropy bits through the fused kernel:
    every decode terminates with the right shape, and re-decoding the same
    garbage yields byte-identical output (no uninitialized reads, no
    data races in the masked stores)."""
    data = encoder.encode(
        test_image(16, 32), sampling=sampling, quality=80,
        restart_interval_mcus=2,
    )
    img = analyze(data)
    dec = Decoder(interpret=True, exact_idct=exact)
    baseline = dec.decode(data)
    assert baseline.shape == (16, 32, 3)
    for seed in range(50):
        rng = np.random.default_rng(seed)
        bad = _garbage_scan(data, img, rng, allow_markers=False)
        out = dec.decode(bad)
        assert out.shape == (16, 32, 3) and out.dtype == np.uint8
        if seed % 10 == 0:  # determinism probe (decode is the slow part)
            again = dec.decode(bad)
            assert np.array_equal(out, again)


def test_soak_unconstrained_bytes_error_or_decode(test_image):
    """Unconstrained garbage (phantom RST/EOI markers, stuffing damage)
    must hit the preprocessor's interval-count check or decode bounded —
    the corruption-detection path of the reference's ScanBuffer
    (src/scan.rs:58-63)."""
    data = encoder.encode(
        test_image(16, 32), sampling="422", quality=80,
        restart_interval_mcus=1,
    )
    img = analyze(data)
    dec = Decoder(interpret=True)
    outcomes = {"ok": 0, "err": 0}
    for seed in range(40):
        rng = np.random.default_rng(1000 + seed)
        bad = _garbage_scan(data, img, rng, allow_markers=True)
        try:
            out = dec.decode(bad)
            assert out.shape == (16, 32, 3)
            outcomes["ok"] += 1
        except CompegError:
            outcomes["err"] += 1
    # Unconstrained byte soup nearly always breaks the marker structure;
    # both outcomes are in-contract, and at least one error must occur
    # (proves the count check fires under this fuzz).
    assert outcomes["err"] > 0


def test_soak_rgba_alpha_is_opaque_under_garbage(test_image):
    """The packed-RGBA fused output must keep alpha == 255 even for
    garbage pixels (the kernel composites alpha constantly; a corrupt
    stream must not leak through the pack)."""
    data = encoder.encode(
        test_image(16, 32), sampling="422", quality=80,
        restart_interval_mcus=2,
    )
    img = analyze(data)
    dec = Decoder(interpret=True)
    for seed in (3, 17, 29):
        rng = np.random.default_rng(seed)
        bad = _garbage_scan(data, img, rng, allow_markers=False)
        rgba = dec.decode_rgba(bad)
        assert rgba.shape == (16, 32, 4)
        assert (rgba[:, :, 3] == 255).all()
