"""Batched and streaming decode tests."""

import numpy as np
import pytest

from compeg_tpu import encoder, golden
from compeg_tpu.batch import BatchDecoder, StreamDecoder
from compeg_tpu.errors import CompegError


def frames_of(test_image, n=3, h=16, w=32, sampling="422"):
    return [
        encoder.encode(
            test_image(h, w, "noise", seed=s), sampling=sampling, quality=80,
            restart_interval_mcus=1,
        )
        for s in range(n)
    ]


def test_batch_matches_single(test_image):
    frames = frames_of(test_image)
    out = BatchDecoder(interpret=True).decode(frames)
    assert out.shape[0] == len(frames)
    for i, f in enumerate(frames):
        want = golden.decode_rgb(f)
        diff = np.abs(out[i].astype(int) - want.astype(int))
        assert diff.max() <= 1


def test_batch_staged_path_matches_single(test_image):
    """fused=False must propagate to prepare(): the staged batch decode
    assumes linear segment-major slots (no raster-tiled permutation)."""
    frames = frames_of(test_image, n=2, h=16, w=16)
    bdec = BatchDecoder(interpret=True, fused=False)
    pfs = bdec.prepare_batch(frames)
    assert all(pf.geom.tiling is None for pf in pfs)
    out = bdec.decode(frames)
    for i, f in enumerate(frames):
        want = golden.decode_rgb(f)
        assert np.abs(out[i].astype(int) - want.astype(int)).max() <= 1


def test_batch_rejects_mixed_geometry(test_image):
    a = encoder.encode(test_image(16, 32), sampling="422", restart_interval_mcus=1)
    b = encoder.encode(test_image(16, 48), sampling="422", restart_interval_mcus=1)
    with pytest.raises(CompegError):
        BatchDecoder(interpret=True).prepare_batch([a, b])


def test_stream_decoder(test_image):
    frames = frames_of(test_image, n=5)
    outs = list(StreamDecoder(interpret=True).decode_iter_rgb(frames))
    assert len(outs) == 5
    for f, o in zip(frames, outs):
        want = golden.decode_rgb(f)
        diff = np.abs(o.astype(int) - want.astype(int))
        assert diff.max() <= 1


def test_batch_fancy_matches_single(test_image):
    """Batched fancy (triangle) upsampling must be bit-identical to the
    per-frame fancy decode — including 4:2:0, where the vertical filter
    must not bleed across stacked frames in the batched epilogue."""
    from compeg_tpu.pipeline import Decoder

    for sampling in ("422", "420"):
        frames = frames_of(test_image, n=2, sampling=sampling)
        out = BatchDecoder(interpret=True, fancy_upsampling=True).decode(frames)
        dec = Decoder(interpret=True, fancy_upsampling=True)
        for i, f in enumerate(frames):
            assert np.array_equal(out[i], dec.decode(f)), sampling


def test_batch_fancy_untiled_falls_back_to_staged(test_image):
    """fancy + an untiled geometry (ri doesn't divide the MCU-row width)
    must not silently emit nearest-neighbor chroma: the batch falls back
    to the staged decode, matching the single-frame Decoder."""
    from compeg_tpu.pipeline import Decoder

    frames = [
        encoder.encode(test_image(24, 48, "noise", seed=s), sampling="422",
                       quality=80, restart_interval_mcus=2)
        for s in range(2)
    ]
    bdec = BatchDecoder(interpret=True, fancy_upsampling=True)
    pfs = bdec.prepare_batch(frames)
    assert pfs[0].geom.tiling is None  # scenario actually untiled
    out = bdec.to_rgb(bdec.decode_prepared(pfs))
    dec = Decoder(interpret=True, fancy_upsampling=True)
    for i, f in enumerate(frames):
        assert np.array_equal(out[i], dec.decode(f))
