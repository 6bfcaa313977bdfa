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
