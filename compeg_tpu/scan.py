"""Entropy-coded scan preprocessing.

Turns the raw entropy-coded scan data into the device layout the Pallas
entropy kernel consumes. Same job as the reference's CPU hot loop
(src/scan.rs:33-128) — byte-destuffing (``FF 00`` -> ``FF``), restart-marker
removal, per-interval alignment — but the output layout is TPU-shaped:

 * the reference appends intervals into one u32 stream with a word-index
   side table (each interval word-aligned, src/scan.rs:1-12);
 * we give every restart segment its own fixed-width row of u32 words,
   arranged as ``[G, W, 8, 128]`` blocks so that vector lane ``(sub, lane)``
   of grid step ``g`` streams segment ``g*1024 + sub*128 + lane`` without any
   per-lane indexed addressing (TPU lanes cannot gather). Words hold bytes
   MSB-first, so the kernel's bit window needs no byte swap.

This module is the Python twin of the C++ implementation in
``native/compeg_host.cpp``; it is also the test oracle for it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from .errors import bail

# TPU vector geometry: one grid block decodes SUBLANES*LANES segments.
LANES = 128
SUBLANES = 8
SEGMENTS_PER_BLOCK = SUBLANES * LANES

# No guard words are needed past a segment's payload: the kernel's refill
# clamps its word index to the row end, so lookahead past the final byte
# re-reads the last word — bits a valid stream never consumes.
GUARD_WORDS = 0


@dataclass(frozen=True)
class TileMap:
    """Raster-tiled segment->(block, sublane, lane) assignment.

    Linear assignment (segment ``i`` -> slot ``i``) makes the raster MCU
    coordinate a non-separable function of (block, sublane, lane), forcing
    image assembly through a 64-byte-granularity XLA transpose (~80 GB/s).
    Tiling instead makes each 1024-segment block an 8-MCU-row x 128-segment
    raster rectangle:

        block g = (tr, tc)   covers MCU rows [tr*8, tr*8+8)
        sublane s            -> MCU row tr*8 + s
        lane l               -> segment column tc*128 + l
                                (MCU columns [(tc*128+l)*ri, +ri))

    so raster row is a function of (tr, s) alone and raster column of
    (tc, l) alone — and assembly becomes two near-bandwidth XLA copies plus
    a free reshape (ops/fused.assemble_image_tiled). Valid whenever ri
    divides the MCU-row width (segments never wrap a row boundary).

    The optional *banded* form (``band_rows > 0``) additionally splits the
    image into ``n_bands`` horizontal bands of ``band_rows`` MCU rows, each
    band getting its own contiguous run of ``n_tr * n_tc`` blocks — the
    layout of the sharded decode (parallel/sharding.py): shard ``b``'s
    blocks are exactly ``[b * n_tr * n_tc, (b+1) * n_tr * n_tc)``, each a
    raster-tiled sub-image, so every shard runs the same tiled fast path as
    the single-chip pipeline.
    """

    n_tr: int  # tile rows PER BAND: ceil(band_rows / 8) (or whole image)
    n_tc: int  # tile cols: ceil((width_mcus/ri) / 128)
    segs_per_row: int  # width_mcus // ri
    band_rows: int = 0  # MCU rows per band; 0 = unbanded
    n_bands: int = 1

    @property
    def num_blocks(self) -> int:
        return self.n_bands * self.n_tr * self.n_tc

    @staticmethod
    def for_geometry(
        height_mcus: int, width_mcus: int, ri: int, n_bands: int = 1
    ) -> Optional["TileMap"]:
        if ri <= 0 or width_mcus % ri != 0:
            return None  # segments wrap MCU rows: not separable
        spr = width_mcus // ri
        if n_bands <= 1:
            return TileMap(
                n_tr=-(-height_mcus // SUBLANES),
                n_tc=-(-spr // LANES),
                segs_per_row=spr,
            )
        band_rows = -(-height_mcus // n_bands)
        return TileMap(
            n_tr=-(-band_rows // SUBLANES),
            n_tc=-(-spr // LANES),
            segs_per_row=spr,
            band_rows=band_rows,
            n_bands=n_bands,
        )

    def slot_of_segment(self, height_mcus: int) -> np.ndarray:
        """[num_segments] -> packed row index (the host pack permutation)."""
        seg = np.arange(self.segs_per_row * height_mcus, dtype=np.int64)
        mr, sc = seg // self.segs_per_row, seg % self.segs_per_row
        if self.band_rows > 0:
            band, lmr = mr // self.band_rows, mr % self.band_rows
        else:
            band, lmr = np.zeros_like(mr), mr
        tr, s = lmr // SUBLANES, lmr % SUBLANES
        tc, lane = sc // LANES, sc % LANES
        bt = band * self.n_tr + tr
        return ((bt * self.n_tc + tc) * SUBLANES + s) * LANES + lane

    def active_slots(self, height_mcus: int) -> np.ndarray:
        """[G, 8, 128] int32 — 1 where the slot maps to a real segment."""
        g = np.arange(self.num_blocks)[:, None, None]
        s = np.arange(SUBLANES)[None, :, None]
        lane = np.arange(LANES)[None, None, :]
        bt = g // self.n_tc
        sc = (g % self.n_tc) * LANES + lane
        if self.band_rows > 0:
            band, ltr = bt // self.n_tr, bt % self.n_tr
            lmr = ltr * SUBLANES + s
            mr = band * self.band_rows + lmr
            ok = (lmr < self.band_rows) & (mr < height_mcus)
        else:
            mr = bt * SUBLANES + s
            ok = mr < height_mcus
        return (ok & (sc < self.segs_per_row)).astype(np.int32)


def split_intervals(scan: bytes, expected: int) -> List[bytes]:
    """Destuff and split the scan into per-restart-interval byte strings.

    Removes RST markers and ``FF 00`` stuffing (keeping the ``FF``); errors if
    the number of intervals found differs from ``expected`` (corruption
    detection, reference src/scan.rs:58-63).
    """
    arr = np.frombuffer(scan, dtype=np.uint8)
    n = arr.size
    if n == 0:
        bail("empty scan data")
    ff = arr == 0xFF
    nxt = np.empty_like(arr)
    nxt[:-1] = arr[1:]
    nxt[-1] = 0
    stuffed_ff = ff & (nxt == 0x00)  # FF 00 -> keep FF, drop 00
    marker_ff = ff & (nxt >= 0xD0) & (nxt <= 0xD7)  # RSTn -> drop both

    drop = np.zeros(n, dtype=bool)
    # Drop the 0x00 of each stuffing pair and both bytes of each RST marker.
    idx_stuff = np.nonzero(stuffed_ff)[0]
    drop[idx_stuff[idx_stuff + 1 < n] + 1] = True
    idx_rst = np.nonzero(marker_ff)[0]
    drop[idx_rst] = True
    drop[idx_rst[idx_rst + 1 < n] + 1] = True

    # An 0xFF that is dropped because it is both "stuffing FF" and "RST FF"
    # cannot happen (0x00 vs 0xD0-D7), but an RST's second byte could itself
    # be 0xFF-adjacent; RST bytes are 0xD0-0xD7 so no overlap either.

    kept = ~drop
    cleaned = arr[kept]
    # Interval k ends right before RST marker k; the last interval runs to the
    # end of the scan. Boundary positions in the cleaned stream:
    kept_cum = np.cumsum(kept) - kept  # cleaned index of each original byte
    bounds = kept_cum[idx_rst] if idx_rst.size else np.zeros(0, dtype=np.int64)
    starts = np.concatenate([[0], bounds + 0])
    ends = np.concatenate([bounds, [cleaned.size]])
    count = starts.size
    if count != expected:
        bail(f"scan contains {count} restart intervals, expected {expected}")
    out = [cleaned[s:e].tobytes() for s, e in zip(starts, ends)]
    return out


def _words_per_segment(max_bytes: int) -> int:
    return (max_bytes + 3) // 4 + GUARD_WORDS


def pack_words(segment: bytes, width: int) -> np.ndarray:
    """Pack one segment's bytes into ``width`` u32 words, MSB-first."""
    nb = len(segment)
    buf = np.zeros(width * 4, dtype=np.uint8)
    buf[:nb] = np.frombuffer(segment, dtype=np.uint8)
    return buf.reshape(width, 4).astype(np.uint32) @ np.array(
        [1 << 24, 1 << 16, 1 << 8, 1], dtype=np.uint32
    )


@dataclass
class DeviceScan:
    """Scan data in device layout.

    words:  ``[G, W, SUBLANES, LANES]`` uint32 — segment ``s`` of grid block
            ``g = s // 1024`` streams down ``words[g, :, (s%1024)//128, s%128]``.
    active: ``[G, SUBLANES, LANES]`` int32 — 1 for real segments, 0 padding.
    num_segments: real segment count before padding.
    words_per_segment: W.
    """

    words: np.ndarray
    active: np.ndarray
    num_segments: int
    words_per_segment: int

    @property
    def num_blocks(self) -> int:
        # Derived from the active mask ([G, 8, 128]) so it holds for both the
        # block layout ([G, W, 8, 128]) and the contiguous row layout
        # ([G*1024, W]) of `words`.
        return self.active.shape[0]


def to_device_layout(
    intervals: List[bytes],
    words_per_segment: Optional[int] = None,
    slot_of_segment: Optional[np.ndarray] = None,
    num_blocks: Optional[int] = None,
) -> DeviceScan:
    """Lay segments out as ``[G, W, 8, 128]`` blocks of MSB-first u32 words.

    ``words_per_segment`` can be forced (bucketed batching) as long as it
    covers the longest segment. ``slot_of_segment`` packs segment ``i`` into
    row ``slot_of_segment[i]`` instead of row ``i`` (the raster-tiled layout,
    :class:`TileMap`); ``num_blocks`` then gives the padded block count.
    """
    nseg = len(intervals)
    max_bytes = max(len(s) for s in intervals)
    w = _words_per_segment(max_bytes)
    if words_per_segment is not None:
        if words_per_segment < w:
            bail(
                f"words_per_segment={words_per_segment} too small for "
                f"longest segment ({w} words needed)"
            )
        w = words_per_segment
    if slot_of_segment is None:
        g = -(-nseg // SEGMENTS_PER_BLOCK)
        rows = range(nseg)
    else:
        assert num_blocks is not None and len(slot_of_segment) == nseg
        g = num_blocks
        rows = slot_of_segment
    byte_plane = np.zeros((g * SEGMENTS_PER_BLOCK, w * 4), dtype=np.uint8)
    for i, row in zip(range(nseg), rows):
        seg = intervals[i]
        byte_plane[row, : len(seg)] = np.frombuffer(seg, dtype=np.uint8)
    words = byte_plane.reshape(g * SEGMENTS_PER_BLOCK, w, 4).astype(np.uint32)
    words = (
        (words[..., 0] << 24) | (words[..., 1] << 16) | (words[..., 2] << 8) | words[..., 3]
    )
    words = words.reshape(g, SUBLANES, LANES, w).transpose(0, 3, 1, 2)
    active = np.zeros(g * SEGMENTS_PER_BLOCK, dtype=np.int32)
    if slot_of_segment is None:
        active[:nseg] = 1
    else:
        active[slot_of_segment] = 1
    active = active.reshape(g, SUBLANES, LANES)
    return DeviceScan(
        words=np.ascontiguousarray(words),
        active=active,
        num_segments=nseg,
        words_per_segment=w,
    )


def preprocess(scan: bytes, expected_intervals: int,
               words_per_segment: Optional[int] = None) -> DeviceScan:
    """Full host preprocessing: destuff + split + device layout."""
    return to_device_layout(split_intervals(scan, expected_intervals),
                            words_per_segment)
