"""V4L2 capture source: kernel-ABI pinning + (device-gated) live capture.

The struct layouts in ``compeg_tpu.v4l2`` must match the 64-bit kernel
UAPI byte-for-byte, because the ioctl request numbers encode
``sizeof(struct)`` — a layout mistake makes every ioctl fail with ENOTTY.
These tests pin each ``ctypes`` struct size and every derived request code
against the values published in ``linux/videodev2.h`` (as printed by a C
program on x86-64/aarch64), so the module is fully verified on rigs with
no camera. The live test runs only when a ``/dev/video*`` node exists.
"""

import ctypes
import glob
import os

import pytest

from compeg_tpu import v4l2


def test_struct_sizes_match_kernel_abi():
    assert ctypes.sizeof(v4l2.Capability) == 104
    assert ctypes.sizeof(v4l2.PixFormat) == 48
    assert ctypes.sizeof(v4l2.Format) == 208
    assert ctypes.sizeof(v4l2.RequestBuffers) == 20
    assert ctypes.sizeof(v4l2.Timecode) == 16
    assert ctypes.sizeof(v4l2.Buffer) == 88


def test_request_codes_match_kernel_headers():
    # Reference values from linux/videodev2.h on a 64-bit kernel.
    assert v4l2.VIDIOC_QUERYCAP == 0x80685600
    assert v4l2.VIDIOC_S_FMT == 0xC0D05604
    assert v4l2.VIDIOC_REQBUFS == 0xC0145608
    assert v4l2.VIDIOC_QUERYBUF == 0xC0585609
    assert v4l2.VIDIOC_QBUF == 0xC058560F
    assert v4l2.VIDIOC_DQBUF == 0xC0585611
    assert v4l2.VIDIOC_STREAMON == 0x40045612
    assert v4l2.VIDIOC_STREAMOFF == 0x40045613


def test_fourcc():
    assert v4l2.PIX_FMT_MJPEG == 0x47504A4D  # 'MJPG'
    assert v4l2.PIX_FMT_JPEG == 0x4745504A  # 'JPEG'


def test_missing_device_raises_oserror():
    with pytest.raises(OSError):
        v4l2.Camera("/dev/video999")


@pytest.mark.skipif(
    not glob.glob("/dev/video*"), reason="no V4L2 capture device on this rig"
)
def test_live_capture_decodes():
    """With a real camera: grab 3 MJPEG frames and decode them (no-DHT
    frames ride the Annex K default tables)."""
    from compeg_tpu.batch import StreamDecoder

    dev = sorted(glob.glob("/dev/video*"))[0]
    frames = list(v4l2.capture_frames(dev, max_frames=3))
    assert len(frames) == 3
    dec = StreamDecoder()
    outs = list(dec.decode_iter(frames))
    assert len(outs) == 3


class _FakeDriver:
    """Userspace stand-in for a V4L2 MJPG camera: answers the exact ioctl
    sequence Camera issues, so the negotiation + mmap-ring + DQBUF logic is
    exercised without a device (the live test above stays device-gated)."""

    FRAMES = [b"\xFF\xD8" + b"frame-a" + b"\xFF\xD9",
              b"junk-not-soi",  # starvation frame: must be skipped
              b"\xFF\xD8" + b"frame-b" + b"\xFF\xD9"]

    def __init__(self):
        self.buf_len = 64
        self.queued = []
        self.streaming = False
        self.served = 0
        self.maps = {i: bytearray(self.buf_len) for i in range(4)}

    def ioctl(self, fd, req, arg=0, mutate=True):
        if req == v4l2.VIDIOC_QUERYCAP:
            arg.capabilities = v4l2.CAP_VIDEO_CAPTURE | v4l2.CAP_STREAMING
            arg.device_caps = arg.capabilities
            card = b"fake-cam"
            arg.card[: len(card)] = card
        elif req == v4l2.VIDIOC_S_FMT:
            assert arg.fmt.pix.pixelformat == v4l2.PIX_FMT_MJPEG
            arg.fmt.pix.width, arg.fmt.pix.height = 320, 240
        elif req == v4l2.VIDIOC_REQBUFS:
            assert arg.memory == v4l2.MEMORY_MMAP
            arg.count = min(arg.count, 4)
        elif req == v4l2.VIDIOC_QUERYBUF:
            arg.length = self.buf_len
            arg.m.offset = arg.index * 4096
        elif req == v4l2.VIDIOC_QBUF:
            self.queued.append(arg.index)
        elif req == v4l2.VIDIOC_DQBUF:
            assert self.streaming and self.queued
            i = self.queued.pop(0)
            data = self.FRAMES[self.served % len(self.FRAMES)]
            self.served += 1
            self.maps[i][: len(data)] = data
            arg.index, arg.bytesused = i, len(data)
        elif req == v4l2.VIDIOC_STREAMON:
            self.streaming = True
        elif req == v4l2.VIDIOC_STREAMOFF:
            self.streaming = False
        else:
            raise AssertionError(f"unexpected ioctl {req:#x}")
        return 0


def test_camera_logic_with_fake_driver(monkeypatch):
    drv = _FakeDriver()
    monkeypatch.setattr(v4l2.os, "open", lambda *a: 42)
    monkeypatch.setattr(v4l2.os, "close", lambda fd: None)
    monkeypatch.setattr(v4l2.fcntl, "ioctl", drv.ioctl)

    class _FakeMmapModule:
        MAP_SHARED = PROT_READ = 0

        @staticmethod
        def mmap(fd, length, flags, prot, offset=0):
            assert length == drv.buf_len and offset % 4096 == 0

            class _M:
                def __getitem__(self, s):
                    return bytes(drv.maps[offset // 4096][s])

                def close(self):
                    pass

            return _M()

    monkeypatch.setattr(v4l2, "mmap", _FakeMmapModule)

    with v4l2.Camera("/dev/video0", size=(640, 480)) as cam:
        assert cam.size == (320, 240)  # driver-negotiated, not requested
        assert cam.card == "fake-cam"
        assert len(cam.maps) == 4 and len(drv.queued) == 4
        got = list(cam.frames(max_frames=2))
    # Two SOI-led frames delivered; the non-JPEG starvation frame skipped.
    assert got == [_FakeDriver.FRAMES[0], _FakeDriver.FRAMES[2]]
    assert drv.served == 3
    assert not drv.streaming  # close() issued STREAMOFF


def _fake_camera(monkeypatch, drv):
    monkeypatch.setattr(v4l2.os, "open", lambda *a: 42)
    monkeypatch.setattr(v4l2.os, "close", lambda fd: None)
    monkeypatch.setattr(v4l2.fcntl, "ioctl", drv.ioctl)

    class _FakeMmapModule:
        MAP_SHARED = PROT_READ = 0

        @staticmethod
        def mmap(fd, length, flags, prot, offset=0):
            class _M:
                def __getitem__(self, s):
                    return bytes(drv.maps[offset // 4096][s])

                def close(self):
                    pass

            return _M()

    monkeypatch.setattr(v4l2, "mmap", _FakeMmapModule)
    return v4l2.Camera("/dev/video0")


def test_camera_skips_error_flagged_frames(monkeypatch):
    """Frames the driver marks V4L2_BUF_FLAG_ERROR are dropped even when
    their payload happens to start with SOI (ADVICE r4)."""

    class _ErrDriver(_FakeDriver):
        def ioctl(self, fd, req, arg=0, mutate=True):
            rc = super().ioctl(fd, req, arg, mutate)
            if req == v4l2.VIDIOC_DQBUF and self.served % 2 == 1:
                arg.flags = v4l2.BUF_FLAG_ERROR  # every odd frame is bad
            return rc

    drv = _ErrDriver()
    drv.FRAMES = [b"\xFF\xD8ok\xFF\xD9"]  # all SOI-led; flags decide
    with _fake_camera(monkeypatch, drv) as cam:
        got = list(cam.frames(max_frames=3))
    assert got == [b"\xFF\xD8ok\xFF\xD9"] * 3
    assert drv.served == 6  # every other frame was error-flagged


def test_camera_bad_frame_run_raises_instead_of_hanging(monkeypatch):
    """A camera that only delivers error/garbage frames must raise after a
    bounded run, not spin forever inside frames(max_frames=N) (ADVICE r4)."""
    drv = _FakeDriver()
    drv.FRAMES = [b"garbage-no-soi"]
    with _fake_camera(monkeypatch, drv) as cam:
        with pytest.raises(OSError, match="consecutive"):
            list(cam.frames(max_frames=1, max_consecutive_bad=5))
    assert drv.served == 5
