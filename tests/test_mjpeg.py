"""MJPEG stream splitting + end-to-end MJPEG (no-DHT) stream decode."""

import os
import tempfile

import numpy as np
import pytest

from compeg_tpu import encoder, golden, mjpeg
from compeg_tpu.batch import StreamDecoder


def make_stream(test_image, n=4):
    frames = [
        encoder.encode(
            test_image(16, 32, "noise", seed=s),
            sampling="422",
            emit_dht=False,  # MJPEG-style: relies on Annex K defaults
            restart_interval_mcus=1,
        )
        for s in range(n)
    ]
    return frames, mjpeg.concat_frames(frames)


def test_split_roundtrip(test_image):
    frames, stream = make_stream(test_image)
    got = list(mjpeg.split_frames(stream))
    assert got == frames


def test_split_with_junk_between_frames(test_image):
    frames, _ = make_stream(test_image, n=2)
    stream = b"junk" + frames[0] + b"\x00\x01pad" + frames[1] + b"tail"
    got = list(mjpeg.split_frames(stream))
    assert got == frames


def test_frames_from_file(test_image):
    frames, stream = make_stream(test_image, n=5)
    with tempfile.NamedTemporaryFile(suffix=".mjpeg", delete=False) as f:
        f.write(stream)
        path = f.name
    try:
        got = list(mjpeg.frames_from_file(path, chunk_size=700))
        assert got == frames
    finally:
        os.unlink(path)


def test_mjpeg_stream_decode(test_image):
    """The reference's headline use case: a DHT-less MJPEG stream decoded
    frame by frame with table defaults, one compile for the whole stream."""
    frames, stream = make_stream(test_image, n=3)
    dec = StreamDecoder(interpret=True)
    outs = list(dec.decode_iter_rgb(mjpeg.split_frames(stream)))
    assert len(outs) == 3
    for f, o in zip(frames, outs):
        want = golden.decode_rgb(f)
        assert np.abs(o.astype(int) - want.astype(int)).max() <= 1


def test_frames_from_stream_pipe(test_image):
    """Live-capture integration: frames arrive over a file object (pipe /
    stdin) in arbitrary chunk sizes, including frames split mid-chunk."""
    import io

    frames, stream = make_stream(test_image, n=4)
    got = list(mjpeg.frames_from_stream(io.BytesIO(stream), chunk_size=333))
    assert got == frames


def test_follow_frames_growing_file(test_image, tmp_path):
    """follow_frames tails a growing file: frames appended AFTER the reader
    starts are still yielded (the file-based live-feed stand-in)."""
    import threading
    import time

    frames, _ = make_stream(test_image, n=3)
    path = tmp_path / "live.mjpeg"
    path.write_bytes(frames[0])

    def writer():
        for f in frames[1:]:
            time.sleep(0.05)
            with open(path, "ab") as fh:
                fh.write(f)

    t = threading.Thread(target=writer)
    t.start()
    got = list(mjpeg.follow_frames(str(path), poll_s=0.01, idle_timeout_s=1.0))
    t.join()
    assert got == frames


def test_frames_from_stream_marker_split_across_chunks(test_image):
    """Regression: a chunk ending exactly on the 0xFF of the NEXT frame's
    SOI must not drop that frame (the assembler retains the trailing FF)."""
    import io

    frames, _ = make_stream(test_image, n=2)
    stream = frames[0] + frames[1]
    # Force a chunk boundary between the FF and D8 of frame 2's SOI.
    cut = len(frames[0]) + 1
    class TwoChunk(io.RawIOBase):
        def __init__(self):
            self.parts = [stream[:cut], stream[cut:]]
        def read(self, n=-1):
            return self.parts.pop(0) if self.parts else b""
    got = list(mjpeg.frames_from_stream(TwoChunk()))
    assert got == frames
    # And every possible split point, via the assembler directly.
    for cut in range(len(stream)):
        asm = mjpeg.FrameAssembler()
        got = list(asm.feed(stream[:cut])) + list(asm.feed(stream[cut:]))
        assert got == frames, cut
