"""Canonical Huffman machinery tests (the gather-free analogue of the
reference's 2-level-LUT tests, src/huffman.rs:355-548)."""

import numpy as np
import pytest

from compeg_tpu import huffman as H
from compeg_tpu.errors import CompegError


def all_codes(table: H.CanonicalTable):
    """(value, code, length) for every symbol via the encode map."""
    return [(v, c, l) for v, (c, l) in table.encode_map().items()]


@pytest.mark.parametrize("key", [(0, 0), (0, 1), (1, 0), (1, 1)])
def test_roundtrip_default_tables(key):
    """decode(encode(v)) == v for every symbol of every Annex K table, for
    every possible bit suffix padding pattern."""
    t = H.default_tables()[key]
    for v, code, ln in all_codes(t):
        for pad in (0x0000, 0xFFFF):
            c16 = ((code << (16 - ln)) | (pad >> ln)) & 0xFFFF
            value, bits = t.decode(c16)
            assert bits == ln, (v, code, ln)
            assert value == v, (v, code, ln)


def test_code_length_via_limits():
    t = H.default_tables()[(1, 0)]  # AC luma: lengths 2..16
    for v, code, ln in all_codes(t):
        c16 = code << (16 - ln)
        assert t.code_length(c16) == ln


def test_annex_k_ac_luma_shape():
    t = H.build_table(H.AC_LUMA_COUNTS, H.AC_LUMA_VALUES)
    assert t.num_values == 162
    assert t.max_len == 16
    # EOB (0x00) must be a 4-bit code in the Annex K luma AC table.
    code, ln = t.encode_map()[0x00]
    assert ln == 4


def test_annex_k_dc_luma_shape():
    t = H.build_table(H.DC_LUMA_COUNTS, H.DC_LUMA_VALUES)
    assert t.num_values == 12
    assert t.max_len == 9


def test_value_words_packing():
    t = H.build_table(H.DC_LUMA_COUNTS, H.DC_LUMA_VALUES)
    words = t.value_words()
    for k, v in enumerate(t.values):
        assert (int(words[k >> 2]) >> ((k & 3) * 8)) & 0xFF == v


def test_single_code_table():
    # One 1-bit code: code '0' -> value 42; '1xxx...' is invalid.
    counts = [1] + [0] * 15
    t = H.build_table(counts, [42])
    assert t.decode(0x0000) == (42, 1)
    assert t.decode(0x7FFF) == (42, 1)
    with pytest.raises(CompegError):
        t.decode(0x8000)


def test_l2_depth_table():
    """A table with >8-bit codes (the case that forced the reference's
    2-level LUT split, src/huffman.rs:1-16)."""
    counts = [0] * 16
    counts[1] = 1  # one 2-bit code
    counts[11] = 150  # 150 12-bit codes
    values = [200] + list(range(150))
    t = H.build_table(counts, values)
    assert t.decode(0 << 14) == (200, 2)
    em = t.encode_map()
    for v in (0, 1, 77, 149):
        code, ln = em[v]
        assert ln == 12
        assert t.decode(code << 4) == (v, 12)


def test_oversubscribed_table_rejected():
    counts = [3] + [0] * 15  # three 1-bit codes is impossible
    with pytest.raises(CompegError):
        H.build_table(counts, [1, 2, 3])


def test_count_value_mismatch_rejected():
    counts = [0, 2] + [0] * 14
    with pytest.raises(CompegError):
        H.build_table(counts, [1])


def test_empty_table_rejected():
    with pytest.raises(CompegError):
        H.build_table([0] * 16, [])


def test_limits_monotone():
    for t in H.default_tables().values():
        lims = list(t.limits)
        assert all(b >= a for a, b in zip(lims, lims[1:]))
        assert lims[16] >= 1 << 16 or t.max_len == 16
