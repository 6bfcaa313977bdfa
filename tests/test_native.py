"""Native C++ host library vs the pure-Python oracle: exact equality."""

import numpy as np
import pytest

from compeg_tpu import analyze, encoder, native
from compeg_tpu import scan as S

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def scan_of(img_bytes):
    return analyze(img_bytes)


def test_scan_info_matches_python(test_image):
    data = encoder.encode(test_image(32, 64), sampling="422", restart_interval_mcus=1)
    img = scan_of(data)
    n, mx = native.scan_info(img.scan_data)
    segs = S.split_intervals(img.scan_data, img.total_restart_intervals)
    assert n == len(segs)
    assert mx == max(len(s) for s in segs)


@pytest.mark.parametrize("ri", [1, 3, None])
@pytest.mark.parametrize("kind", ["gradient", "noise"])
def test_pack_matches_python(ri, kind, test_image):
    data = encoder.encode(
        test_image(40, 64, kind), sampling="422", quality=90, restart_interval_mcus=ri
    )
    img = scan_of(data)
    expected = img.total_restart_intervals
    segs = S.split_intervals(img.scan_data, expected)
    w = S._words_per_segment(max(len(s) for s in segs))
    g = -(-expected // S.SEGMENTS_PER_BLOCK)
    py = S.to_device_layout(segs, w)
    words, active = native.pack(img.scan_data, expected, w, g)
    assert np.array_equal(words, py.words)
    assert np.array_equal(active, py.active)


def test_pack_multithreaded_matches(test_image):
    data = encoder.encode(
        test_image(320, 256, "noise"), sampling="422", quality=90, restart_interval_mcus=1
    )
    img = scan_of(data)
    expected = img.total_restart_intervals
    segs = S.split_intervals(img.scan_data, expected)
    w = S._words_per_segment(max(len(s) for s in segs))
    g = -(-expected // S.SEGMENTS_PER_BLOCK)
    w1, a1 = native.pack(img.scan_data, expected, w, g, n_threads=1)
    w4, a4 = native.pack(img.scan_data, expected, w, g, n_threads=4)
    assert np.array_equal(w1, w4)
    assert np.array_equal(a1, a4)
    py = S.to_device_layout(segs, w)
    assert np.array_equal(w1, py.words)


def test_pack_overflow_detected(test_image):
    data = encoder.encode(test_image(16, 32), sampling="422", restart_interval_mcus=1)
    img = scan_of(data)
    from compeg_tpu.errors import CompegError

    with pytest.raises(CompegError):
        native.pack(img.scan_data, img.total_restart_intervals, 2, 1)


def test_count_mismatch_detected(test_image):
    data = encoder.encode(test_image(16, 32), sampling="422", restart_interval_mcus=1)
    img = scan_of(data)
    from compeg_tpu.errors import CompegError

    with pytest.raises(CompegError):
        native.pack(img.scan_data, img.total_restart_intervals + 1, 16, 1)


@pytest.mark.parametrize("kind", ["gradient", "noise"])
def test_pack_rows_matches_python(kind, test_image):
    data = encoder.encode(
        test_image(40, 64, kind), sampling="422", quality=90, restart_interval_mcus=1
    )
    img = scan_of(data)
    expected = img.total_restart_intervals
    segs = S.split_intervals(img.scan_data, expected)
    w = S._words_per_segment(max(len(s) for s in segs))
    g = -(-expected // S.SEGMENTS_PER_BLOCK)
    rows, active = native.pack_rows(img.scan_data, expected, w, g)
    assert rows.shape == (g * 1024, w)
    for i, seg in enumerate(segs):
        assert np.array_equal(rows[i], S.pack_words(seg, w)), i
    assert rows[len(segs):].sum() == 0
    py = S.to_device_layout(segs, w)
    assert np.array_equal(active, py.active)
    # Row layout transposes into the block layout exactly.
    blocks = rows.reshape(g, 8, 128, w).transpose(0, 3, 1, 2)
    assert np.array_equal(blocks, py.words)


def test_pack_rows_tiled_matches_python(test_image):
    """The C++ tiled permutation must agree with TileMap.slot_of_segment."""
    data = encoder.encode(
        test_image(40, 64, "noise"), sampling="444", quality=92, restart_interval_mcus=1
    )
    img = scan_of(data)
    expected = img.total_restart_intervals
    tm = S.TileMap.for_geometry(img.height_mcus, img.width_mcus, img.restart_interval)
    segs = S.split_intervals(img.scan_data, expected)
    w = S._words_per_segment(max(len(s) for s in segs))
    rows, active = native.pack_rows(
        img.scan_data, expected, w, tm.num_blocks,
        tile=(tm.segs_per_row, tm.n_tc),
    )
    slots = tm.slot_of_segment(img.height_mcus)
    py = S.to_device_layout(segs, w, slot_of_segment=slots,
                            num_blocks=tm.num_blocks)
    assert np.array_equal(active, py.active)
    blocks = rows.reshape(tm.num_blocks, 8, 128, w).transpose(0, 3, 1, 2)
    assert np.array_equal(blocks, py.words)


@pytest.mark.parametrize("kind", ["gradient", "noise"])
def test_pack_blocks_matches_pack_rows(kind, test_image):
    """Host block-layout pack == rows pack + device-side transpose."""
    data = encoder.encode(
        test_image(40, 64, kind), sampling="422", quality=90, restart_interval_mcus=1
    )
    img = scan_of(data)
    expected = img.total_restart_intervals
    segs = S.split_intervals(img.scan_data, expected)
    w = S._words_per_segment(max(len(s) for s in segs))
    g = -(-expected // S.SEGMENTS_PER_BLOCK)
    rows, active_r = native.pack_rows(img.scan_data, expected, w, g)
    blocks, active_b = native.pack_blocks(img.scan_data, expected, w, g)
    assert blocks.shape == (g, w, 8, 128)
    ref = rows.reshape(g, 8, 128, w).transpose(0, 3, 1, 2)
    assert np.array_equal(blocks, ref)
    assert np.array_equal(active_b, active_r)


def test_pack_blocks_tiled_matches_pack_rows(test_image):
    data = encoder.encode(
        test_image(40, 64, "noise"), sampling="444", quality=92, restart_interval_mcus=1
    )
    img = scan_of(data)
    expected = img.total_restart_intervals
    tm = S.TileMap.for_geometry(img.height_mcus, img.width_mcus, img.restart_interval)
    segs = S.split_intervals(img.scan_data, expected)
    w = S._words_per_segment(max(len(s) for s in segs))
    tile = (tm.segs_per_row, tm.n_tc)
    rows, active_r = native.pack_rows(
        img.scan_data, expected, w, tm.num_blocks, tile=tile
    )
    blocks, active_b = native.pack_blocks(
        img.scan_data, expected, w, tm.num_blocks, tile=tile
    )
    ref = rows.reshape(tm.num_blocks, 8, 128, w).transpose(0, 3, 1, 2)
    assert np.array_equal(blocks, ref)
    assert np.array_equal(active_b, active_r)


def _synthetic_scan(seg_lens, stuff_positions=()):
    """Build scan bytes with segments of the given destuffed lengths joined
    by RST markers. ``stuff_positions`` maps segment index -> byte offsets at
    which to place a stuffed 0xFF (encoded as FF 00 in the raw stream)."""
    rng = np.random.default_rng(42)
    raw = []
    for i, ln in enumerate(seg_lens):
        body = rng.integers(0, 255, ln, dtype=np.uint8)  # 0..254: no bare FF
        for off in dict(stuff_positions).get(i, ()):
            if off < ln:
                body[off] = 0xFF
        stuffed = []
        for b in body.tolist():
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0x00)
        raw.append(bytes(stuffed))
        if i + 1 < len(seg_lens):
            raw.append(bytes([0xFF, 0xD0 + (i % 8)]))
    return b"".join(raw)


def test_pack_rows_fast_path_edges():
    """Per-segment AVX2 fast path: lengths around the 32-byte single-load
    boundary, stuffed-FF fallbacks, and the overread guard at the very end
    of the input buffer (the last segment ends flush with the data)."""
    seg_lens = [0, 1, 3, 4, 31, 32, 33, 36, 26, 30, 32, 31]
    stuffs = {8: (0,), 9: (29,), 10: (31,), 11: (30,)}
    scan = _synthetic_scan(seg_lens, stuffs)
    n = len(seg_lens)
    segs = S.split_intervals(scan, n)
    assert [len(s) for s in segs] == seg_lens
    w = S._words_per_segment(max(seg_lens))
    g = -(-n // S.SEGMENTS_PER_BLOCK)
    py = S.to_device_layout(segs, w)
    rows_py = np.ascontiguousarray(
        py.words.transpose(0, 2, 3, 1).reshape(-1, w)
    )
    for nt in (1, 4):
        rows, active = native.pack_rows(scan, n, w, g, n_threads=nt)
        assert np.array_equal(rows, rows_py)
        assert np.array_equal(active, py.active)
        words, active_b = native.pack_blocks(scan, n, w, g, n_threads=nt)
        assert np.array_equal(words, py.words)
        assert np.array_equal(active_b, py.active)


def test_pack_rows_narrow_width_no_fast_path():
    """W < 8 rows (max segment <= ~20 bytes) must not take the 32-byte
    store (it would overrun the row) — byte-exact vs the oracle."""
    seg_lens = [8, 12, 17, 20, 5, 20]
    scan = _synthetic_scan(seg_lens)
    n = len(seg_lens)
    segs = S.split_intervals(scan, n)
    w = S._words_per_segment(max(seg_lens))
    assert w < 8
    g = -(-n // S.SEGMENTS_PER_BLOCK)
    py = S.to_device_layout(segs, w)
    words, active = native.pack_blocks(scan, n, w, g, n_threads=1)
    assert np.array_equal(words, py.words)
    assert np.array_equal(active, py.active)


def test_pack_offset_window_overread_guard():
    """The fast path may read up to 31 bytes past a span but never past the
    whole data buffer: pack a scan whose window sits at the end of a larger
    buffer and at the exact buffer end."""
    seg_lens = [26, 32, 24]
    scan = _synthetic_scan(seg_lens)
    n = len(seg_lens)
    segs = S.split_intervals(scan, n)
    w = S._words_per_segment(max(seg_lens))
    g = -(-n // S.SEGMENTS_PER_BLOCK)
    py = S.to_device_layout(segs, w)
    prefix = b"\x11" * 97
    data = prefix + scan  # scan flush against the end of the buffer
    words, active = native.pack_blocks(
        data, n, w, g, offset=len(prefix), length=len(scan), n_threads=1
    )
    assert np.array_equal(words, py.words)
    assert np.array_equal(active, py.active)


def test_pack_blocks_banded_serial_matches_pooled(test_image):
    """The single-pass serial packer (n_threads=1, the streaming config)
    must produce the banded tiled layout byte-identically to the two-phase
    pooled path and the Python oracle — including band-internal padding
    rows and the per-band tile-row split."""
    data = encoder.encode(
        test_image(56, 64, "noise"), sampling="422", quality=90,
        restart_interval_mcus=1,
    )
    img = scan_of(data)
    expected = img.total_restart_intervals
    tm = S.TileMap.for_geometry(
        img.height_mcus, img.width_mcus, img.restart_interval, n_bands=2
    )
    segs = S.split_intervals(img.scan_data, expected)
    w = S._words_per_segment(max(len(s) for s in segs))
    tile = (tm.segs_per_row, tm.n_tc, tm.band_rows)
    b1, a1 = native.pack_blocks(
        img.scan_data, expected, w, tm.num_blocks, tile=tile, n_threads=1
    )
    b4, a4 = native.pack_blocks(
        img.scan_data, expected, w, tm.num_blocks, tile=tile, n_threads=4
    )
    assert np.array_equal(b1, b4)
    assert np.array_equal(a1, a4)
    py = S.to_device_layout(
        segs, w, slot_of_segment=tm.slot_of_segment(img.height_mcus),
        num_blocks=tm.num_blocks,
    )
    assert np.array_equal(b1, py.words)
    assert np.array_equal(a1, py.active)


@pytest.mark.parametrize("seed", range(8))
def test_pack_randomized_differential_fuzz(seed):
    """Randomized differential fuzz of the SIMD-classified RST walk
    (rst_walk, r5): random segment-length mixes with random stuffing
    density, FF fill bytes before RST markers, trailing garbage after a
    terminator, and lengths tuned so markers land at every 32-byte window
    phase — native pack (serial AND pooled, linear AND tiled) must equal
    the Python oracle byte-for-byte."""
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(20, 200))
    seg_lens = rng.integers(0, 40, n).tolist()
    # Stuffed FFs in ~1/4 of segments, including doubled FFs.
    stuffs = {}
    for i in range(0, n, int(rng.integers(3, 6))):
        k = int(rng.integers(1, 3))
        stuffs[i] = tuple(
            int(x) for x in rng.integers(0, max(seg_lens[i], 1), k)
        )
    scan = _synthetic_scan(seg_lens, stuffs)
    # FF fill bytes directly before a random RST marker (spec-legal
    # padding the classifier must treat as in-segment FF data).
    if n > 3:
        mark = scan.find(b"\xff\xd1")
        if mark > 0:
            scan = scan[:mark] + b"\xff\xff" + scan[mark:]
    segs = S.split_intervals(scan, n)
    w = S._words_per_segment(max(len(s) for s in segs))
    g = -(-n // S.SEGMENTS_PER_BLOCK)
    py = S.to_device_layout(segs, w)
    # Terminator + trailing garbage (incl. an RST lookalike past the end).
    data = scan + b"\xff\xd9" + b"\x00\xffgarbage\xff\xd3trailer"
    for nt in (1, 4):
        words, active = native.pack_blocks(
            data, n, w, g, length=len(data), n_threads=nt
        )
        assert np.array_equal(words, py.words), (seed, nt)
        assert np.array_equal(active, py.active), (seed, nt)
    ni, mx = native.scan_info(data)
    assert ni == n and mx == max(len(s) for s in segs)
