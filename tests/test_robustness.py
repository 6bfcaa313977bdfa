"""Corrupt-input robustness: garbage scan data must neither hang nor crash
the kernels — the error contract is bounded garbage output or CompegError
(the reference's model: restart intervals bound corruption blast radius,
src/file.rs:668-671)."""

import numpy as np
import pytest

from compeg_tpu import analyze, encoder
from compeg_tpu.errors import CompegError
from compeg_tpu.pipeline import Decoder


def corrupt_scan(data: bytes, rng) -> bytes:
    """Replace entropy-coded bytes with random garbage, preserving the RST
    markers (so the interval count matches)."""
    img = analyze(data)
    scan = bytearray(img.scan_data)
    i = 0
    while i < len(scan):
        if scan[i] == 0xFF:
            i += 2
            continue
        scan[i] = int(rng.integers(0, 255))
        if scan[i] == 0xFF:
            scan[i] = 0x7F  # don't create new markers
        i += 1
    off = data.find(bytes(img.scan_data))
    return data[:off] + bytes(scan) + data[off + len(scan):]


def test_garbage_scan_decodes_bounded(test_image, rng):
    data = encoder.encode(
        test_image(16, 32), sampling="422", quality=80, restart_interval_mcus=1
    )
    bad = corrupt_scan(data, rng)
    dec = Decoder(interpret=True)
    try:
        out = dec.decode(bad)
        assert out.shape == (16, 32, 3)  # garbage pixels, correct shape
    except CompegError:
        pass  # also acceptable (e.g. interval count mismatch)


def test_truncated_scan_raises(test_image):
    data = encoder.encode(
        test_image(16, 32), sampling="422", quality=80, restart_interval_mcus=1
    )
    img = analyze(data)
    # Drop the last restart interval's worth of scan bytes entirely.
    cut = data.find(img.scan_data) + len(img.scan_data) // 2
    truncated = data[:cut] + b"\xFF\xD9"
    dec = Decoder(interpret=True)
    with pytest.raises(CompegError):
        dec.decode(truncated)


def test_not_a_jpeg():
    dec = Decoder(interpret=True)
    with pytest.raises(CompegError):
        dec.decode(b"not a jpeg at all")
    with pytest.raises(CompegError):
        dec.decode(b"\xFF\xD8\xFF\xD9")
