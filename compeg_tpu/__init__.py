"""compeg_tpu — a TPU-native JPEG decode engine.

A from-scratch reimplementation of the capabilities of SludgePhD/Compeg
(a wgpu/WGSL GPU JPEG decoder) for TPUs: the host side (container parsing,
Huffman table construction, scan preprocessing) runs in C++/Python, and the
compute path (restart-segment-parallel Huffman entropy decode, dequant +
IDCT, chroma upsampling + YCbCr->RGB) runs as Pallas/XLA kernels, scaling
over device meshes with jax.sharding.

Public API (mirroring the reference's surface, src/lib.rs):

    ImageData / analyze   — parse + validate a JPEG (reference ImageData::new)
    Decoder               — per-stream decode state (reference Decoder)
    decode_rgb            — one-shot decode to an [H, W, 3] u8 array
    CompegError           — the single error type (reference Error)
"""

from .errors import CompegError
from .metadata import ImageData, analyze
from .huffman import CanonicalTable, build_table, default_tables
from . import parser, scan, golden, encoder, mjpeg

__version__ = "0.1.0"

__all__ = [
    "CompegError",
    "mjpeg",
    "ImageData",
    "analyze",
    "CanonicalTable",
    "build_table",
    "default_tables",
    "parser",
    "scan",
    "golden",
    "encoder",
    "__version__",
]


def __getattr__(name):
    # Lazy device-side exports so host-only users never pull in jax.
    if name == "Decoder":
        from .pipeline import Decoder

        return Decoder
    if name in ("BatchDecoder", "StreamDecoder"):
        from . import batch

        return getattr(batch, name)
    if name == "enable_compilation_cache":
        from .pipeline import enable_compilation_cache

        return enable_compilation_cache
    raise AttributeError(f"module 'compeg_tpu' has no attribute {name!r}")


def decode_rgb(data: bytes, **kw):
    """Decode a JPEG to an ``[H, W, 3]`` u8 RGB array on the default device.

    Lazy import so host-only users never pull in jax.
    """
    from .pipeline import decode_rgb as _decode

    return _decode(data, **kw)


def decode_rgba(data: bytes, **kw):
    """Decode to ``[H, W, 4]`` u8 RGBA (the reference's output format)."""
    from .pipeline import decode_rgba as _decode

    return _decode(data, **kw)


def decode_scaled(data: bytes, scale_blocks: int, **kw):
    """Thumbnail decode at ``scale_blocks/8`` scale (k ∈ {1, 2, 4, 8}) —
    the libjpeg ``scale_denom`` feature as a DCT-domain downsample."""
    from .pipeline import Decoder

    return Decoder(**kw).decode_scaled(data, scale_blocks)
