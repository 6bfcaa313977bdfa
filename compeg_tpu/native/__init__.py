"""ctypes loader for the native host library, with lazy build and a clean
fallback to the pure-Python implementations in :mod:`compeg_tpu.scan`.

The native path implements the CPU hot loop (scan destuff/split/pack into the
TPU block layout). ``load()`` returns None when no compiler is available;
callers must handle both.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcompeg_host.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception as e:  # pragma: no cover - build env dependent
        log.warning("native build failed: %s", e)
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("COMPEG_TPU_NO_NATIVE"):
        return None
    src = os.path.join(_DIR, "compeg_host.cpp")
    if not os.path.exists(_SO) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(_SO)
    ):
        if not _build():
            return None
    lib = ctypes.CDLL(_SO)
    lib.compeg_scan_info.restype = ctypes.c_int
    lib.compeg_scan_info.argtypes = [
        ctypes.c_void_p,  # accepts bytes or a raw address (offset view)
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.compeg_parse.restype = ctypes.c_int
    lib.compeg_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.compeg_find_scan_end.restype = ctypes.c_int64
    lib.compeg_find_scan_end.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.compeg_pack_rows.restype = ctypes.c_int
    lib.compeg_pack_rows.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.compeg_pack_blocks.restype = ctypes.c_int
    lib.compeg_pack_blocks.argtypes = list(lib.compeg_pack_rows.argtypes)
    lib.compeg_pack.restype = ctypes.c_int
    lib.compeg_pack.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def scan_info(
    scan, offset: int = 0, length: Optional[int] = None
) -> Tuple[int, int]:
    """(num_intervals, max_destuffed_segment_bytes) — native fast path.

    ``scan`` may be the whole file with ``offset``/``length`` selecting the
    entropy-coded span (no slice copy — the scanner is terminator-aware)."""
    lib = load()
    assert lib is not None
    if not isinstance(scan, bytes):
        scan = bytes(scan)  # memoryview callers without an offset
    if length is None:
        length = len(scan) - offset
    base = ctypes.cast(ctypes.c_char_p(scan), ctypes.c_void_p).value + offset
    n = ctypes.c_int64()
    mx = ctypes.c_int64()
    rc = lib.compeg_scan_info(base, length, ctypes.byref(n), ctypes.byref(mx))
    if rc != 0:
        from ..errors import bail

        bail(f"native scan_info failed ({rc})")
    return n.value, mx.value


def pack(
    scan: bytes,
    expected: int,
    words_per_segment: int,
    num_blocks: int,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Destuff + split + pack into ``[G, W, 8, 128]`` words and ``[G, 8, 128]``
    active mask (native fast path)."""
    lib = load()
    assert lib is not None
    G, W = num_blocks, words_per_segment
    # The C++ side zero-fills both buffers; avoid doing it twice.
    words = np.empty((G, W, 8, 128), dtype=np.uint32)
    active = np.empty((G, 8, 128), dtype=np.int32)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    rc = lib.compeg_pack(
        scan,
        len(scan),
        expected,
        W,
        G,
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        active.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
    )
    if rc != 0:
        from ..errors import bail

        bail(f"native pack failed ({rc})")
    return words, active


class CompegImageInfo(ctypes.Structure):
    _fields_ = [
        ("status", ctypes.c_int32),
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("precision", ctypes.c_int32),
        ("sof_marker", ctypes.c_int32),
        ("ncomp", ctypes.c_int32),
        ("comp_id", ctypes.c_int32 * 4),
        ("comp_h", ctypes.c_int32 * 4),
        ("comp_v", ctypes.c_int32 * 4),
        ("comp_q", ctypes.c_int32 * 4),
        ("comp_dc", ctypes.c_int32 * 4),
        ("comp_ac", ctypes.c_int32 * 4),
        ("has_dri", ctypes.c_int32),
        ("restart_interval", ctypes.c_int32),
        ("scan_offset", ctypes.c_int64),
        ("scan_len", ctypes.c_int64),
        ("ss", ctypes.c_int32),
        ("se", ctypes.c_int32),
        ("ah", ctypes.c_int32),
        ("al", ctypes.c_int32),
        ("qtab_present", ctypes.c_int32 * 4),
        ("qtab", (ctypes.c_int32 * 64) * 4),
        ("n_huff", ctypes.c_int32),
        ("ht_class", ctypes.c_int32 * 8),
        ("ht_dest", ctypes.c_int32 * 8),
        ("ht_nvalues", ctypes.c_int32 * 8),
        ("ht_counts", (ctypes.c_uint8 * 16) * 8),
        ("ht_values", (ctypes.c_uint8 * 256) * 8),
        ("scan_ncomp", ctypes.c_int32),
        ("scan_comp_id", ctypes.c_int32 * 4),
    ]


def parse(data: bytes) -> CompegImageInfo:
    """Native one-pass container parse. Raises CompegError on failure."""
    lib = load()
    assert lib is not None
    info = CompegImageInfo()
    rc = lib.compeg_parse(data, len(data), ctypes.byref(info))
    if rc != 0:
        from ..errors import bail

        bail(f"native parse failed (status {rc})")
    return info


def _tile3(tile) -> Tuple[int, int, int]:
    """Normalize a tile spec to (segs_per_row, n_tc, band_rows)."""
    if tile is None:
        return 0, 0, 0
    if len(tile) == 2:
        return tile[0], tile[1], 0
    return tile[0], tile[1], tile[2]


def pack_rows(
    scan: bytes,
    expected: int,
    words_per_segment: int,
    num_blocks: int,
    n_threads: int = 0,
    offset: int = 0,
    length: Optional[int] = None,
    tile: Optional[Tuple[int, int]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Destuff + split + pack into contiguous per-segment rows
    ``[G*1024, W]`` (the device transposes into its block layout) and the
    ``[G, 8, 128]`` active mask. ``scan`` may be the whole file with
    ``offset``/``length`` selecting the entropy-coded span (no slice copy).
    ``tile=(segs_per_row, n_tc)`` applies the raster-tiled slot permutation
    (:class:`compeg_tpu.scan.TileMap`); a third element ``band_rows``
    selects the banded tiled layout (sharded decode)."""
    lib = load()
    assert lib is not None
    G, W = num_blocks, words_per_segment
    if length is None:
        length = len(scan) - offset
    words = np.empty((G * 1024, W), dtype=np.uint32)
    active = np.empty((G, 8, 128), dtype=np.int32)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    spr, ntc, band_rows = _tile3(tile)
    rc = lib.compeg_pack_rows(
        scan,
        len(scan),
        offset,
        length,
        expected,
        W,
        G,
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        active.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
        spr,
        ntc,
        band_rows,
    )
    if rc != 0:
        from ..errors import bail

        bail(f"native pack_rows failed ({rc})")
    return words, active


def pack_blocks(
    scan: bytes,
    expected: int,
    words_per_segment: int,
    num_blocks: int,
    n_threads: int = 0,
    offset: int = 0,
    length: Optional[int] = None,
    tile: Optional[Tuple[int, int]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Destuff + split + pack straight into the kernel's vector block layout
    ``[G, W, 8, 128]`` (per-block L1 transpose on the host) and the
    ``[G, 8, 128]`` active mask — removes the per-frame rows->blocks device
    transpose. Same contract as :func:`pack_rows` otherwise."""
    lib = load()
    assert lib is not None
    G, W = num_blocks, words_per_segment
    if length is None:
        length = len(scan) - offset
    words = np.empty((G, W, 8, 128), dtype=np.uint32)
    active = np.empty((G, 8, 128), dtype=np.int32)
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    spr, ntc, band_rows = _tile3(tile)
    rc = lib.compeg_pack_blocks(
        scan,
        len(scan),
        offset,
        length,
        expected,
        W,
        G,
        words.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        active.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_threads,
        spr,
        ntc,
        band_rows,
    )
    if rc != 0:
        from ..errors import bail

        bail(f"native pack_blocks failed ({rc})")
    return words, active


def find_scan_end(data: bytes, offset: int = 0) -> int:
    """Offset (into ``data``) of the marker terminating the scan that starts
    at ``offset``."""
    lib = load()
    assert lib is not None
    return int(lib.compeg_find_scan_end(data, len(data), offset))


def available() -> bool:
    return load() is not None
