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


def frames_from_stream(f, chunk_size: int = 1 << 20) -> Iterator[bytes]:
    """Stream frames from a binary file object (a pipe, a socket, stdin).

    This is the live-capture integration path: a camera daemon or
    ``ffmpeg -f v4l2 -i /dev/video0 -c copy -f mjpeg -`` writes the raw
    MJPG byte stream to a pipe and the viewer decodes frames as they
    arrive (the role linuxvideo's `Stream::dequeue` plays for the
    reference viewer, examples/viewer.rs:40-89). Blocks on ``f.read`` for
    more data; ends when the stream does.
    """
    buf = b""
    while True:
        chunk = f.read(chunk_size)
        if not chunk:
            return
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


def follow_frames(path: str, poll_s: float = 0.02,
                  idle_timeout_s: float | None = None,
                  chunk_size: int = 1 << 20) -> Iterator[bytes]:
    """Tail a GROWING .mjpeg file, yielding frames as they are appended
    (the file-based stand-in for a live capture feed). Polls every
    ``poll_s`` when no new bytes are available; stops after
    ``idle_timeout_s`` with no growth (None = follow forever).
    """
    import time

    buf = b""
    idle = 0.0
    with open(path, "rb") as f:
        while True:
            chunk = f.read(chunk_size)
            if not chunk:
                if idle_timeout_s is not None and idle >= idle_timeout_s:
                    return
                time.sleep(poll_s)
                idle += poll_s
                continue
            idle = 0.0
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


def concat_frames(frames: Iterable[bytes]) -> bytes:
    """Inverse helper: build an MJPEG buffer from JPEG frames."""
    return b"".join(frames)
