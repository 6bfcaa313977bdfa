"""ImageData analyzer tests (envelope checks + derived geometry; reference
behavior from src/lib.rs:576-851)."""

import numpy as np
import pytest

from compeg_tpu import analyze, encoder
from compeg_tpu.errors import CompegError


def test_422_geometry(test_image):
    data = encoder.encode(test_image(33, 50), sampling="422", restart_interval_mcus=2)
    img = analyze(data)
    assert (img.width, img.height) == (50, 33)
    assert (img.max_h, img.max_v) == (2, 1)
    assert img.width_mcus == -(-50 // 16) == 4
    assert img.height_mcus == -(-33 // 8) == 5
    assert img.total_mcus == 20
    assert img.restart_interval == 2
    assert img.total_restart_intervals == 10
    assert img.dus_per_mcu == 4
    assert img.du_to_comp == (0, 0, 1, 2)
    assert img.parallelism() == 10


def test_444_geometry(test_image):
    img = analyze(encoder.encode(test_image(24, 24), sampling="444"))
    assert img.dus_per_mcu == 3
    assert img.du_to_comp == (0, 1, 2)
    assert img.width_mcus == 3 and img.height_mcus == 3


def test_420_geometry(test_image):
    img = analyze(encoder.encode(test_image(32, 32), sampling="420"))
    assert img.dus_per_mcu == 6
    assert img.du_to_comp == (0, 0, 0, 0, 1, 2)
    assert img.width_mcus == 2 and img.height_mcus == 2


def test_gray_geometry(test_image):
    img = analyze(encoder.encode(test_image(16, 16), sampling="gray"))
    assert img.dus_per_mcu == 1
    assert len(img.components) == 1


def test_no_dri_is_one_interval(test_image):
    data = encoder.encode(test_image(32, 32), restart_interval_mcus=None)
    img = analyze(data)
    assert not img.had_dri
    assert img.restart_interval == img.total_mcus
    assert img.total_restart_intervals == 1
    assert img.parallelism() == 1


def test_short_last_interval(test_image):
    # 4x5=20 MCUs at Ri=3 -> 7 intervals, last has 2 MCUs.
    data = encoder.encode(test_image(33, 50), sampling="422", restart_interval_mcus=3)
    img = analyze(data)
    assert img.total_restart_intervals == 7


def test_default_tables_installed_when_no_dht(test_image):
    data = encoder.encode(test_image(16, 16), emit_dht=False)
    img = analyze(data)  # must not raise
    assert (0, 0) in img.htables and (1, 1) in img.htables


def test_rejects_progressive():
    import struct
    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload
    sof2 = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    dqt = bytes([0]) + bytes(range(1, 65))
    data = b"\xFF\xD8" + seg(0xDB, dqt) + seg(0xC2, sof2) + seg(0xDA, sos) + b"\x00" + b"\xFF\xD9"
    with pytest.raises(CompegError):
        analyze(data)


def test_rejects_missing_sof(test_image):
    with pytest.raises(CompegError):
        analyze(b"\xFF\xD8\xFF\xD9")


def test_rejects_unsupported_sampling():
    import struct
    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload
    # 3x1 luma sampling is outside the envelope (4x1 / 1x2 joined it in
    # round 2 as 4:1:1 / 4:4:0).
    sof = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([3]) \
        + bytes([1, 0x31, 0, 2, 0x11, 1, 3, 0x11, 1])
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    dqt0 = bytes([0]) + bytes(range(1, 65))
    dqt1 = bytes([1]) + bytes(range(1, 65))
    data = b"\xFF\xD8" + seg(0xDB, dqt0) + seg(0xDB, dqt1) + seg(0xC0, sof) \
        + seg(0xDA, sos) + b"\x00" + b"\xFF\xD9"
    with pytest.raises(CompegError):
        analyze(data)
