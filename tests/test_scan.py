"""Scan preprocessing tests (analogue of the reference's ScanBuffer golden
cases, src/scan.rs:130-181, adapted to the TPU block layout)."""

import numpy as np
import pytest

from compeg_tpu import scan as S
from compeg_tpu.errors import CompegError


def test_destuffing():
    raw = b"\x12\xFF\x00\x34\xFF\x00"
    segs = S.split_intervals(raw, 1)
    assert segs == [b"\x12\xFF\x34\xFF"]


def test_rst_split():
    raw = b"\x01\x02" + b"\xFF\xD0" + b"\x03" + b"\xFF\xD1" + b"\x04\x05\x06"
    segs = S.split_intervals(raw, 3)
    assert segs == [b"\x01\x02", b"\x03", b"\x04\x05\x06"]


def test_stuffing_then_rst():
    raw = b"\xFF\x00" + b"\xFF\xD0" + b"\xAA"
    segs = S.split_intervals(raw, 2)
    assert segs == [b"\xFF", b"\xAA"]


def test_wrong_interval_count():
    raw = b"\x01\xFF\xD0\x02"
    with pytest.raises(CompegError):
        S.split_intervals(raw, 3)
    with pytest.raises(CompegError):
        S.split_intervals(raw, 1)


def test_empty_scan():
    with pytest.raises(CompegError):
        S.split_intervals(b"", 1)


def test_pack_words_msb_first():
    w = S.pack_words(b"\x01\x02\x03\x04\x05", 3)
    assert w[0] == 0x01020304
    assert w[1] == 0x05000000
    assert w[2] == 0


def test_device_layout_roundtrip():
    rng = np.random.default_rng(7)
    nseg = 300
    segs = [rng.integers(0, 255, size=rng.integers(1, 40), dtype=np.uint8).tobytes()
            for _ in range(nseg)]
    # Avoid bytes that look like markers in this synthetic data -- not needed
    # for to_device_layout (it takes already-split segments), just realism.
    d = S.to_device_layout(segs)
    assert d.num_segments == nseg
    assert d.num_blocks == 1
    assert d.words.shape == (1, d.words_per_segment, 8, 8 * 16)
    assert d.words.shape[3] == S.LANES
    # Check a few segments stream down the right (sub, lane) column.
    for s in [0, 1, 127, 128, 200, 299]:
        sub, lane = s // S.LANES, s % S.LANES
        col = d.words[0, :, sub, lane]
        expect = S.pack_words(segs[s], d.words_per_segment)
        assert np.array_equal(col, expect), s
        assert d.active[0, sub, lane] == 1
    assert d.active.sum() == nseg


def test_device_layout_multi_block():
    segs = [b"\xAB"] * (S.SEGMENTS_PER_BLOCK + 5)
    d = S.to_device_layout(segs)
    assert d.num_blocks == 2
    assert d.active[1].sum() == 5
    assert d.words[1, 0, 0, 0] == 0xAB000000


def test_forced_width():
    segs = [b"\x01\x02\x03\x04\x05\x06"]
    d = S.to_device_layout(segs, words_per_segment=10)
    assert d.words_per_segment == 10
    with pytest.raises(CompegError):
        S.to_device_layout(segs, words_per_segment=1)


def test_exact_width_no_guard():
    segs = [b"\x01" * 8]  # exactly 2 words of payload
    d = S.to_device_layout(segs)
    assert d.words_per_segment == 2  # no guard words (refill clamps)


def test_tile_map_slot_math():
    """TileMap slot assignment: separable raster coordinates."""
    tm = S.TileMap.for_geometry(270, 240, 1)  # the 4K 4:2:2 geometry
    assert (tm.n_tr, tm.n_tc, tm.segs_per_row) == (34, 2, 240)
    slots = tm.slot_of_segment(270)
    assert slots.shape == (270 * 240,)
    assert len(np.unique(slots)) == slots.size  # injective
    # Segment at MCU (row 9, col 130): tr=1, s=1, tc=1, lane=2.
    seg = 9 * 240 + 130
    assert slots[seg] == (((1 * 2 + 1) * 8 + 1) * 128 + 2)
    act = tm.active_slots(270)
    assert act.shape == (68, 8, 128)
    assert act.sum() == 270 * 240
    # Active exactly at assigned slots.
    flat = np.zeros(68 * 1024, np.int32)
    flat[slots] = 1
    assert np.array_equal(act.reshape(-1), flat)


def test_tile_map_fallback_conditions():
    assert S.TileMap.for_geometry(10, 9, 2) is None  # 2 does not divide 9
    tm = S.TileMap.for_geometry(10, 8, 2)
    assert tm is not None and tm.segs_per_row == 4


def test_to_device_layout_tiled_permutation():
    tm = S.TileMap.for_geometry(16, 130, 1)
    nseg = 16 * 130
    rng = np.random.default_rng(3)
    segs = [rng.integers(0, 255, size=5, dtype=np.uint8).tobytes()
            for _ in range(nseg)]
    slots = tm.slot_of_segment(16)
    d = S.to_device_layout(segs, slot_of_segment=slots, num_blocks=tm.num_blocks)
    assert d.num_blocks == tm.num_blocks == 4  # 2 tile rows x 2 tile cols
    for seg_i in [0, 129, 130, 8 * 130 + 5, nseg - 1]:
        slot = slots[seg_i]
        g, s, lane = slot // 1024, (slot % 1024) // 128, slot % 128
        col = d.words[g, :, s, lane]
        assert np.array_equal(col, S.pack_words(segs[seg_i], d.words_per_segment)), seg_i
    assert np.array_equal(d.active, tm.active_slots(16))
