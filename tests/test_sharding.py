"""Multi-device sharding tests on the virtual 8-device CPU mesh:
sharded decode must equal single-device decode exactly, including the
fancy-upsampling halo exchange across band boundaries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compeg_tpu import analyze, encoder
from compeg_tpu.parallel import sharding as SH
from compeg_tpu.pipeline import Decoder, FrameGeometry


def _decode_sharded(data, n_data, n_seq, batch=None, fancy=False):
    meta = analyze(data)
    bf = SH.prepare_banded(meta, n_seq)
    b = batch or n_data
    words, seg_mcus = SH.stack_banded([bf] * b)
    mesh = SH.make_mesh(n_data, n_seq)
    geom = FrameGeometry.from_image(meta)
    out = SH.decode_batch_sharded(
        jnp.asarray(words),
        jnp.asarray(seg_mcus),
        jnp.asarray(bf.qz_by_slot),
        bf.plan,
        mesh=mesh,
        geom=geom,
        band_rows=bf.band_rows,
        interpret=True,
        fancy_upsample=fancy,
    )
    return np.asarray(out), meta


def test_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("mesh_shape", [(2, 1), (1, 2), (4, 2)])
def test_sharded_matches_single(mesh_shape, test_image):
    img = test_image(32, 48, "gradient")
    data = encoder.encode(img, sampling="422", quality=85, restart_interval_mcus=1)
    n_data, n_seq = mesh_shape
    got, meta = _decode_sharded(data, n_data, n_seq)
    want = Decoder(interpret=True).decode(data)
    assert got.shape[0] == n_data
    for b in range(got.shape[0]):
        assert np.array_equal(got[b], want), (b, np.argwhere(got[b] != want)[:5])


def test_sharded_odd_height(test_image):
    """Height not divisible by bands: last band is padded and cropped."""
    img = test_image(40, 32, "edges")  # 5 MCU rows over 2 bands
    data = encoder.encode(img, sampling="422", quality=85, restart_interval_mcus=1)
    got, meta = _decode_sharded(data, 1, 2)
    want = Decoder(interpret=True).decode(data)
    assert np.array_equal(got[0], want)


def test_sharded_420(test_image):
    img = test_image(32, 32, "gradient")
    data = encoder.encode(img, sampling="420", quality=85, restart_interval_mcus=1)
    got, meta = _decode_sharded(data, 2, 1)
    want = Decoder(interpret=True).decode(data)
    assert np.array_equal(got[0], want)


def test_fancy_halo_exchange_matches_unbanded(test_image):
    """The ICI boundary-row exchange: fancy vertical chroma upsampling across
    4 bands must equal the same fancy decode with a single band."""
    img = test_image(64, 32, "gradient")  # 4:2:0 -> 4 MCU rows, 4 bands
    data = encoder.encode(img, sampling="420", quality=85, restart_interval_mcus=1)
    got4, _ = _decode_sharded(data, 1, 4, fancy=True)
    got1, _ = _decode_sharded(data, 1, 1, fancy=True)
    assert np.array_equal(got4[0], got1[0]), np.argwhere(got4[0] != got1[0])[:5]


def test_fancy_h_upsample_against_numpy():
    from compeg_tpu.ops.color import upsample_fancy_h

    p = jnp.asarray(np.arange(16).reshape(2, 8) * 10)
    up = np.asarray(upsample_fancy_h(p))
    pn = np.asarray(p)
    # interior: out[2i] = (3p[i]+p[i-1]+1)>>2, out[2i+1] = (3p[i]+p[i+1]+2)>>2
    assert up[0, 2] == (3 * pn[0, 1] + pn[0, 0] + 1) >> 2
    assert up[0, 3] == (3 * pn[0, 1] + pn[0, 2] + 2) >> 2
    # edges clamp
    assert up[0, 0] == pn[0, 0]
    assert up[0, -1] == pn[0, -1]


def test_dryrun_entrypoint():
    import __graft_entry__ as GE

    GE.dryrun_multichip(8)
