"""MJPEG stream utilities.

The reference's flagship integration is decoding an MJPG webcam stream
(examples/viewer.rs + linuxvideo). This module provides the stream plumbing
for the same use case without V4L2 bindings: splitting a raw MJPEG
byte stream (concatenated JPEG frames, the format V4L2 MJPG delivers and
.mjpeg files store) into frames suitable for :class:`compeg_tpu.batch.StreamDecoder`.
"""

from __future__ import annotations

from typing import Iterable, Iterator

SOI = b"\xFF\xD8"
EOI = b"\xFF\xD9"


def split_frames(stream: bytes) -> Iterator[bytes]:
    """Split a concatenated-JPEG (MJPEG) buffer into individual frames.

    Scans SOI..EOI spans; bytes between frames (padding, timestamps some
    encoders insert) are skipped. EOI detection accounts for byte stuffing
    and RST markers, so an embedded FFD9-looking byte pair inside entropy
    data cannot occur (FFD9 never appears inside a valid scan: FF is always
    stuffed or a marker).
    """
    pos = 0
    n = len(stream)
    while True:
        start = stream.find(SOI, pos)
        if start < 0:
            return
        end = stream.find(EOI, start + 2)
        if end < 0:
            return
        yield stream[start : end + 2]
        pos = end + 2


def frames_from_file(path: str, chunk_size: int = 1 << 20) -> Iterator[bytes]:
    """Stream frames from an .mjpeg file without loading it whole."""
    buf = b""
    with open(path, "rb") as f:
        while True:
            chunk = f.read(chunk_size)
            if not chunk:
                break
            buf += chunk
            pos = 0
            while True:
                start = buf.find(SOI, pos)
                if start < 0:
                    buf = b""
                    break
                end = buf.find(EOI, start + 2)
                if end < 0:
                    buf = buf[start:]
                    break
                yield buf[start : end + 2]
                pos = end + 2
    # Trailing complete frame (if the file ends exactly at EOI it was yielded).


def concat_frames(frames: Iterable[bytes]) -> bytes:
    """Inverse helper: build an MJPEG buffer from JPEG frames."""
    return b"".join(frames)
