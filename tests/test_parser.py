"""Container parser tests.

Port of the reference's parser test strategy (src/file/tests.rs): handwritten
byte-array cases for structural edge cases, plus parse coverage of files the
*decoder* rejects (progressive, grayscale, no-DHT MJPEG-style) — the parser
must parse beyond the decode envelope.
"""

import struct

import numpy as np
import pytest

from compeg_tpu import encoder, parser as P
from compeg_tpu.errors import CompegError


def seg(marker, payload=b""):
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload


def test_missing_soi():
    with pytest.raises(CompegError):
        P.parse_segments(b"\x00\x00")
    with pytest.raises(CompegError):
        P.parse_segments(b"")
    with pytest.raises(CompegError):
        P.parse_segments(b"\xFF\xD9")


def test_empty_soi_eoi():
    segs = P.parse_segments(b"\xFF\xD8\xFF\xD9")
    assert [s.name for s in segs] == ["EOI"]


def test_trailing_bytes():
    p = P.JpegParser(b"\xFF\xD8\xFF\xD9hello")
    list(p)
    assert p.remaining() == b"hello"


def test_fill_bytes_before_marker():
    segs = P.parse_segments(b"\xFF\xD8\xFF\xFF\xFF\xD9")
    assert [s.name for s in segs] == ["EOI"]


def test_app_and_com():
    data = b"\xFF\xD8" + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    data += seg(0xFE, b"a comment") + b"\xFF\xD9"
    segs = P.parse_segments(data)
    assert segs[0].name == "APP0"
    assert isinstance(segs[0].kind, P.AppSegment)
    assert segs[1].kind.text == b"a comment"


def test_truncated_segment():
    data = b"\xFF\xD8\xFF\xDB\x00\x40"  # declares 62 payload bytes, has none
    with pytest.raises(CompegError):
        P.parse_segments(data)


def test_invalid_length():
    data = b"\xFF\xD8\xFF\xDB\x00\x01"  # length < 2
    with pytest.raises(CompegError):
        P.parse_segments(data)


def test_dqt_8bit():
    payload = bytes([0x00]) + bytes(range(64))
    segs = P.parse_segments(b"\xFF\xD8" + seg(0xDB, payload) + b"\xFF\xD9")
    t = segs[0].kind.tables[0]
    assert t.precision == 0 and t.dest == 0
    assert t.values == tuple(range(64))


def test_dqt_16bit():
    vals = list(range(300, 364))
    payload = bytes([0x10]) + b"".join(struct.pack(">H", v) for v in vals)
    segs = P.parse_segments(b"\xFF\xD8" + seg(0xDB, payload) + b"\xFF\xD9")
    t = segs[0].kind.tables[0]
    assert t.precision == 1
    assert t.values == tuple(vals)


def test_dht_multi_table():
    counts1 = [0] * 16
    counts1[1] = 2  # two 2-bit codes
    counts2 = [0] * 16
    counts2[0] = 1
    payload = bytes([0x00]) + bytes(counts1) + bytes([5, 6])
    payload += bytes([0x11]) + bytes(counts2) + bytes([9])
    segs = P.parse_segments(b"\xFF\xD8" + seg(0xC4, payload) + b"\xFF\xD9")
    tabs = segs[0].kind.tables
    assert len(tabs) == 2
    assert tabs[0].table_class == 0 and tabs[0].values == (5, 6)
    assert tabs[1].table_class == 1 and tabs[1].dest == 1


def test_dri():
    segs = P.parse_segments(b"\xFF\xD8" + b"\xFF\xDD\x00\x04\x00\x0A" + b"\xFF\xD9")
    assert segs[0].kind.restart_interval == 10


def test_sof_parsing():
    payload = bytes([8]) + struct.pack(">HH", 16, 32) + bytes([3])
    payload += bytes([1, 0x21, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    segs = P.parse_segments(b"\xFF\xD8" + seg(0xC0, payload) + b"\xFF\xD9")
    sof = segs[0].kind
    assert sof.precision == 8 and sof.height == 16 and sof.width == 32
    assert sof.components[0].h_sample == 2 and sof.components[0].v_sample == 1
    assert sof.sof_index == 0


def test_scan_data_with_rst_and_stuffing():
    # SOS for 1 component, then scan data with a stuffed FF00 and an RST,
    # terminated by EOI.
    sos_payload = bytes([1, 1, 0x00, 0, 63, 0])
    scan = b"\x12\xFF\x00\x34" + b"\xFF\xD0" + b"\x56\x78"
    data = b"\xFF\xD8" + seg(0xDA, sos_payload) + scan + b"\xFF\xD9"
    p = P.JpegParser(data)
    segs = list(p)
    sos = segs[0].kind
    assert isinstance(sos, P.SosSegment)
    assert data[sos.data_offset : sos.data_offset + sos.data_len] == scan
    assert segs[-1].name == "EOI"


def test_progressive_sof2_parses():
    payload = bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    segs = P.parse_segments(b"\xFF\xD8" + seg(0xC2, payload) + b"\xFF\xD9")
    assert segs[0].name == "SOF2"
    assert segs[0].kind.sof_index == 2


@pytest.mark.parametrize("sampling", ["444", "422", "420", "gray"])
def test_encoder_output_parses(sampling, test_image):
    img = test_image(32, 48)
    data = encoder.encode(img, sampling=sampling, restart_interval_mcus=2)
    segs = P.parse_segments(data)
    names = [s.name for s in segs]
    assert "SOF0" in names and "SOS" in names and names[-1] == "EOI"
    sof = next(s.kind for s in segs if s.name == "SOF0")
    assert sof.width == 48 and sof.height == 32


def test_no_dht_stream_parses(test_image):
    data = encoder.encode(test_image(16, 16), emit_dht=False)
    segs = P.parse_segments(data)
    assert not any(s.name == "DHT" for s in segs)


def test_dump_segments_stable(test_image):
    data = encoder.encode(test_image(16, 16), restart_interval_mcus=1)
    d1 = P.dump_segments(data)
    d2 = P.dump_segments(data)
    assert d1 == d2
    assert "SOF0" in d1 and "SOS" in d1


def test_jfif_typed_view(test_image):
    data = encoder.encode(test_image(8, 8), sampling="422")
    segs = P.parse_segments(data)
    app0 = segs[0].kind
    assert isinstance(app0, P.AppSegment)
    j = app0.jfif()
    assert j is not None
    assert (j.major, j.minor) == (1, 1)
    assert j.x_density == 1 and j.y_density == 1
    assert j.thumb_width == 0 and j.thumb_height == 0
    # Non-JFIF APP payloads return None.
    assert P.AppSegment(1, b"Exif\x00\x00").jfif() is None
    assert P.AppSegment(0, b"notjfif").jfif() is None
