"""Parser golden-file snapshot tests.

The analogue of the reference's expect-test parser snapshots over a corpus
of deliberately-out-of-envelope files (src/file/tests.rs:69-99): every
corpus entry is rendered with ``dump_segments`` and compared against a
committed ``tests/snapshots/<name>.log``. The corpus is generated
deterministically in code (built-in encoder + handcrafted byte streams), so
only the logs are committed.

Regenerate with:  COMPEG_UPDATE_SNAPSHOTS=1 python -m pytest tests/test_snapshots.py
"""

import os
import struct

import numpy as np
import pytest

from compeg_tpu import encoder
from compeg_tpu.parser import dump_segments

SNAP_DIR = os.path.join(os.path.dirname(__file__), "snapshots")


def seg(marker, payload=b""):
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload


def img(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 11 + seed) % 256, (yy * 7) % 256, (xx + yy) % 256], axis=-1
    ).astype(np.uint8)


def _progressive3():
    """Minimal progressive (SOF2) stream: parses, never decodes."""
    dqt = seg(0xDB, bytes([0]) + bytes(range(1, 65)))
    sof2 = seg(0xC2, bytes([8]) + struct.pack(">HH", 16, 16) + bytes([3])
               + bytes([1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes([0, 1] + [0] * 14) + bytes([0]))
    sos1 = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 1])) + b"\x00\x7F"
    sos2 = seg(0xDA, bytes([1, 1, 0x00, 1, 5, 2])) + b"\x55"
    return b"\xFF\xD8" + dqt + sof2 + dht + sos1 + sos2 + b"\xFF\xD9"


def _qtables16():
    """Extended sequential (SOF1) with 16-bit quantization tables."""
    vals = b"".join(struct.pack(">H", 256 + k) for k in range(64))
    dqt = seg(0xDB, bytes([0x10]) + vals)
    sof1 = seg(0xC1, bytes([12]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])) + b"\x12\x34"
    return b"\xFF\xD8" + dqt + sof1 + sos + b"\xFF\xD9"


def _rgb_ids():
    """Component IDs 'R','G','B' instead of YCbCr numbering."""
    data = bytearray(encoder.encode(img(16, 16), sampling="444", quality=80))
    # Patch the three component ids in SOF0 and SOS (encoder emits 1,2,3).
    for old, new in zip(b"\x01\x02\x03", b"RGB"):
        pass
    # SOF ids live at fixed offsets after the SOF0 marker; find and patch.
    i = bytes(data).find(b"\xff\xc0")
    ln = struct.unpack_from(">H", data, i + 2)[0]
    base = i + 4 + 6  # skip precision + dims + ncomp
    for k, cid in enumerate(b"RGB"):
        data[base + 3 * k] = cid
    j = bytes(data).find(b"\xff\xda")
    sbase = j + 4 + 1
    for k, cid in enumerate(b"RGB"):
        data[sbase + 2 * k] = cid
    return bytes(data)


def _extraneous():
    return encoder.encode(img(8, 8), sampling="gray") + b"GARBAGE-TRAILER"


def _non_interleaved():
    """Baseline with per-component scans (Ns=1 each) — the non-interleaved
    MCU organization the reference's corpus covers (src/file/tests.rs:69-99);
    parses fully, rejected by the analyzer envelope."""
    dqt = seg(0xDB, bytes([0]) + bytes(range(1, 65)))
    sof0 = seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([3])
               + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes([0, 1] + [0] * 14) + bytes([0]))
    scans = b"".join(
        seg(0xDA, bytes([1, cid, 0x00, 0, 63, 0])) + b"\x3C" for cid in (1, 2, 3)
    )
    return b"\xFF\xD8" + dqt + sof0 + dht + scans + b"\xFF\xD9"


def _partial_progressive():
    """Progressive stream cut off after its first scan (the reference's
    partial_progressive.jpg case): parser must surface what exists."""
    full = _progressive3()
    cut = full.find(b"\xFF\xDA", full.find(b"\xFF\xDA") + 2)
    return full[:cut]


def _progressive_missing_dc():
    """Progressive with an AC scan but no prior DC scan (reference's
    progressive-missing-dc.jpg): structurally parseable."""
    dqt = seg(0xDB, bytes([0]) + bytes(range(1, 65)))
    sof2 = seg(0xC2, bytes([8]) + struct.pack(">HH", 16, 16) + bytes([1])
               + bytes([1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x10]) + bytes([0, 1] + [0] * 14) + bytes([1]))
    sos_ac = seg(0xDA, bytes([1, 1, 0x00, 1, 5, 0])) + b"\x2A"
    return b"\xFF\xD8" + dqt + sof2 + dht + sos_ac + b"\xFF\xD9"


def _progressive_missing_ac():
    """Progressive with DC scan only, AC band never coded (reference's
    progressive-missing-ac.jpg)."""
    dqt = seg(0xDB, bytes([0]) + bytes(range(1, 65)))
    sof2 = seg(0xC2, bytes([8]) + struct.pack(">HH", 16, 16) + bytes([1])
               + bytes([1, 0x11, 0]))
    dht = seg(0xC4, bytes([0x00]) + bytes([0, 1] + [0] * 14) + bytes([0]))
    sos_dc = seg(0xDA, bytes([1, 1, 0x00, 0, 0, 1])) + b"\x55"
    return b"\xFF\xD8" + dqt + sof2 + dht + sos_dc + b"\xFF\xD9"


CORPUS = {
    "gradient_422_ri2": lambda: encoder.encode(
        img(16, 32), sampling="422", quality=85, restart_interval_mcus=2
    ),
    "gradient_444": lambda: encoder.encode(img(16, 16), sampling="444", quality=85),
    "gradient_420_ri1": lambda: encoder.encode(
        img(16, 16), sampling="420", quality=85, restart_interval_mcus=1
    ),
    "grayscale_square": lambda: encoder.encode(img(16, 16), sampling="gray"),
    "grayscale_long": lambda: encoder.encode(img(8, 64), sampling="gray"),
    "mjpeg_no_dht": lambda: encoder.encode(
        img(16, 16), sampling="422", emit_dht=False, restart_interval_mcus=1
    ),
    "no_dri": lambda: encoder.encode(
        img(16, 16), sampling="422", restart_interval_mcus=None
    ),
    "restarts_ri5": lambda: encoder.encode(
        img(24, 48), sampling="422", restart_interval_mcus=5
    ),
    "no_app0": lambda: encoder.encode(img(8, 16), sampling="422", app0=False),
    "gradient_440_ri1": lambda: encoder.encode(
        img(32, 16), sampling="440", quality=85, restart_interval_mcus=1
    ),
    "gradient_411_ri2": lambda: encoder.encode(
        img(16, 64), sampling="411", quality=85, restart_interval_mcus=2
    ),
    "progressive3": _progressive3,
    "non_interleaved": _non_interleaved,
    "partial_progressive": _partial_progressive,
    "progressive_missing_dc": _progressive_missing_dc,
    "progressive_missing_ac": _progressive_missing_ac,
    "qtables_16bit": _qtables16,
    "rgb_ids": _rgb_ids,
    "extraneous_data": _extraneous,
    "empty_soi_eoi": lambda: b"\xFF\xD8\xFF\xD9",
    "truncated_dqt": lambda: b"\xFF\xD8\xFF\xDB\x00\x40",
}


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_snapshot(name):
    data = CORPUS[name]()
    dump = dump_segments(data)
    path = os.path.join(SNAP_DIR, f"{name}.log")
    if os.environ.get("COMPEG_UPDATE_SNAPSHOTS"):
        os.makedirs(SNAP_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(dump)
    assert os.path.exists(path), f"snapshot missing; set COMPEG_UPDATE_SNAPSHOTS=1"
    assert dump == open(path).read(), f"snapshot mismatch for {name}"
