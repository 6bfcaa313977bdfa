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


def test_scan_component_order_mismatch_rejected(test_image):
    """Scan components out of frame order must be rejected on BOTH analyzer
    paths (reference: src/lib.rs:742-745). The native analyzer previously
    matched by id and silently ignored order."""
    from compeg_tpu.metadata import analyze as _an

    data = encoder.encode(
        test_image(16, 32), sampling="422", quality=80, restart_interval_mcus=1
    )
    # Swap the first two scan-component entries in the SOS header.
    i = data.find(b"\xff\xda")
    assert i > 0
    ns = data[i + 4]
    assert ns == 3
    b = bytearray(data)
    p = i + 5
    b[p : p + 2], b[p + 2 : p + 4] = data[p + 2 : p + 4], data[p : p + 2]
    for use_native in (True, False):
        with pytest.raises(CompegError, match="order"):
            _an(bytes(b), use_native=use_native)


def test_scan_component_count_mismatch_rejected(test_image):
    from compeg_tpu.metadata import analyze as _an

    data = encoder.encode(
        test_image(16, 32), sampling="422", quality=80, restart_interval_mcus=1
    )
    i = data.find(b"\xff\xda")
    ln = (data[i + 2] << 8) | data[i + 3]
    # Drop the last scan component: Ns 3 -> 2, length -= 2.
    nl = ln - 2
    b = (
        data[: i + 2]
        + bytes([nl >> 8, nl & 0xFF, 2])
        + data[i + 5 : i + 9]  # first two component entries
        + data[i + 2 + ln - 3 : ]  # Ss/Se/AhAl onward
    )
    for use_native in (True, False):
        with pytest.raises(CompegError, match="count"):
            _an(bytes(b), use_native=use_native)


def test_restart_interval_cap():
    """> 64*65535 restart intervals must bail like the reference
    (src/lib.rs:295-298)."""
    from compeg_tpu import metadata as M

    # 65500x65500 4:2:2 with Ri=1 would declare ~2.7e7 intervals.
    sof = bytes([0xFF, 0xC0, 0, 17, 8, 0xFF, 0xDC, 0xFF, 0xDC, 3,
                 1, 0x21, 0, 2, 0x11, 0, 3, 0x11, 0])
    dri = bytes([0xFF, 0xDD, 0, 4, 0, 1])
    dqt = bytes([0xFF, 0xDB, 0, 67, 0]) + bytes([1] * 64)
    sos = bytes([0xFF, 0xDA, 0, 12, 3, 1, 0, 2, 0x11, 3, 0x11, 0, 63, 0])
    data = b"\xff\xd8" + dqt + sof + dri + sos + b"\x00" + b"\xff\xd9"
    with pytest.raises(CompegError, match="restart intervals"):
        analyze(data)


def test_device_budget_cap(test_image):
    """A tiny per-frame device budget must produce a clean CompegError."""
    data = encoder.encode(
        test_image(16, 32), sampling="422", quality=80, restart_interval_mcus=1
    )
    with pytest.raises(CompegError, match="budget"):
        Decoder(interpret=True, max_device_bytes=1024).prepare(data)


def test_overlong_dqt_payload_warns_not_fails(test_image, caplog):
    """A DQT segment declaring one stray trailing byte decodes with a
    warning (reference: warn-and-skip, src/file.rs:79-90)."""
    data = encoder.encode(
        test_image(16, 32), sampling="422", quality=80, restart_interval_mcus=1
    )
    i = data.find(b"\xff\xdb")
    ln = (data[i + 2] << 8) | data[i + 3]
    nl = ln + 1
    b = data[: i + 2] + bytes([nl >> 8, nl & 0xFF]) + data[i + 4 : i + 2 + ln] + b"\x00" + data[i + 2 + ln :]
    out = Decoder(interpret=True).decode(bytes(b))
    assert out.shape == (16, 32, 3)


def test_ff00_marker_outside_scan_rejected(test_image):
    """`FF 00` in marker position is malformed (PARITY.md; the reference
    errors identically, src/file.rs:43-45)."""
    data = encoder.encode(
        test_image(16, 32), sampling="422", quality=80, restart_interval_mcus=1
    )
    b = data[:2] + b"\xff\x00" + data[2:]
    with pytest.raises(CompegError, match="0x00"):
        analyze(bytes(b), use_native=False)


def test_fuzz_header_single_byte_mutations(test_image, rng):
    """Parser fuzz: any single-byte mutation of the header region must
    either parse (mutations in qtable values etc.) or raise CompegError —
    never crash or hang. Decode is not attempted (a mutated table changes
    the compile key; the kernel's robustness is covered by the scan fuzz)."""
    data = encoder.encode(
        test_image(16, 32), sampling="422", quality=80, restart_interval_mcus=1
    )
    hdr_len = analyze(data).scan_offset
    for _ in range(200):
        pos = int(rng.integers(0, hdr_len))
        val = int(rng.integers(0, 256))
        bad = data[:pos] + bytes([val]) + data[pos + 1:]
        try:
            analyze(bad)
        except CompegError:
            pass


def test_fuzz_scan_byte_mutations(test_image, rng):
    """Decode fuzz: random scan-byte mutations must yield a correct-shape
    image (garbage pixels are fine — invalid symbols terminate the lane) or
    a CompegError (interval count / width mismatch). The header is
    untouched, so the compiled pipeline is reused across iterations."""
    data = encoder.encode(
        test_image(16, 32), sampling="422", quality=80, restart_interval_mcus=2
    )
    img = analyze(data)
    off = data.find(img.scan_data)
    dec = Decoder(interpret=True)
    for _ in range(25):
        scan = bytearray(img.scan_data)
        for _ in range(int(rng.integers(1, 6))):
            scan[int(rng.integers(0, len(scan)))] = int(rng.integers(0, 256))
        bad = data[:off] + bytes(scan) + data[off + len(img.scan_data):]
        try:
            out = dec.decode(bad)
            assert out.shape == (16, 32, 3)
        except CompegError:
            pass
