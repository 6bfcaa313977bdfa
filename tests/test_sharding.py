"""Multi-device sharding tests on the virtual 8-device CPU mesh:
sharded decode must equal single-device decode exactly — on the production
tiled planes path (fused kernel per shard, native banded layout), on the
staged fallback for irregular restart intervals, with exact_idct, and with
the fancy-upsampling ICI halo exchange across band boundaries (including
content-edge clamping when trailing bands are padding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from compeg_tpu import analyze, encoder, golden
from compeg_tpu.parallel import sharding as SH
from compeg_tpu.pipeline import Decoder, FrameGeometry


def _decode_sharded(
    data, n_data, n_seq, batch=None, fancy=False, exact_idct=False,
    expect_tiled=None,
):
    meta = analyze(data)
    bf = SH.prepare_banded(meta, n_seq)
    if expect_tiled is not None:
        assert (bf.tiling is not None) == expect_tiled, bf.tiling
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
        tiling=bf.tiling,
        interpret=True,
        fancy_upsample=fancy,
        exact_idct=exact_idct,
    )
    from compeg_tpu.ops.fused import rgba_to_rgb_array

    return rgba_to_rgb_array(np.asarray(out)), meta  # packed u32 -> RGB u8


def test_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("mesh_shape", [(2, 1), (1, 2), (4, 2)])
def test_sharded_matches_single(mesh_shape, test_image):
    """The tiled planes fast path on every mesh shape (incl. multiple bands
    per shard: NB == n_seq here, so (4,2) runs 2 frames x 2 bands/shard...
    one band per shard; see test_multiple_bands_per_shard for NB > n_seq)."""
    img = test_image(32, 48, "gradient")
    data = encoder.encode(img, sampling="422", quality=85, restart_interval_mcus=1)
    n_data, n_seq = mesh_shape
    got, meta = _decode_sharded(data, n_data, n_seq, expect_tiled=True)
    want = Decoder(interpret=True).decode(data)
    assert got.shape[0] == n_data
    for b in range(got.shape[0]):
        assert np.array_equal(got[b], want), (b, np.argwhere(got[b] != want)[:5])


def test_sharded_odd_height(test_image):
    """Height not divisible by bands: last band is padded and cropped."""
    img = test_image(40, 32, "edges")  # 5 MCU rows over 2 bands
    data = encoder.encode(img, sampling="422", quality=85, restart_interval_mcus=1)
    got, meta = _decode_sharded(data, 1, 2, expect_tiled=True)
    want = Decoder(interpret=True).decode(data)
    assert np.array_equal(got[0], want)


def test_sharded_empty_bands(test_image):
    """More bands than MCU rows: trailing shards decode pure padding and
    their rows are cropped away."""
    img = test_image(24, 32, "gradient")  # 3 MCU rows (422) over 4 bands
    data = encoder.encode(img, sampling="422", quality=85, restart_interval_mcus=1)
    got, _ = _decode_sharded(data, 2, 4, expect_tiled=True)
    want = Decoder(interpret=True).decode(data)
    for b in range(got.shape[0]):
        assert np.array_equal(got[b], want)


def test_sharded_420(test_image):
    img = test_image(32, 32, "gradient")
    data = encoder.encode(img, sampling="420", quality=85, restart_interval_mcus=1)
    got, meta = _decode_sharded(data, 2, 1, expect_tiled=True)
    want = Decoder(interpret=True).decode(data)
    assert np.array_equal(got[0], want)


def test_sharded_exact_idct(test_image):
    """exact_idct through shard_map: byte-identical to the integer golden
    decode (the single-chip exact mode's bar, now on the sharded path)."""
    img = test_image(32, 48, "noise")
    data = encoder.encode(img, sampling="420", quality=90, restart_interval_mcus=1)
    got, _ = _decode_sharded(data, 2, 2, exact_idct=True, expect_tiled=True)
    want = golden.decode_rgb(data, idct="int")
    for b in range(got.shape[0]):
        assert np.array_equal(got[b], want)


def test_fancy_halo_exchange_matches_unbanded(test_image):
    """The ICI boundary-row exchange: fancy vertical chroma upsampling across
    4 bands must equal the same fancy decode with a single band."""
    img = test_image(64, 32, "gradient")  # 4:2:0 -> 4 MCU rows, 4 bands
    data = encoder.encode(img, sampling="420", quality=85, restart_interval_mcus=1)
    got4, _ = _decode_sharded(data, 1, 4, fancy=True, expect_tiled=True)
    got1, _ = _decode_sharded(data, 1, 1, fancy=True, expect_tiled=True)
    assert np.array_equal(got4[0], got1[0]), np.argwhere(got4[0] != got1[0])[:5]


def test_fancy_halo_content_edge(test_image):
    """Fancy 4:2:0 with a partial last band AND empty trailing bands: the
    vertical triangle filter must clamp at the image's content edge, not
    blend decoded padding into the last real rows."""
    img = test_image(48, 32, "gradient")  # 3 MCU rows (420) over 4 bands
    data = encoder.encode(img, sampling="420", quality=85, restart_interval_mcus=1)
    got, _ = _decode_sharded(data, 1, 4, fancy=True, expect_tiled=True)
    want = Decoder(interpret=True, fancy_upsampling=True).decode(data)
    assert np.array_equal(got[0], want), np.argwhere(got[0] != want)[:5]


def test_multiple_bands_per_shard(test_image):
    """NB > n_seq: each shard decodes several contiguous bands; in-shard
    band boundaries are plain adjacent rows (fancy blends them with no
    collective), shard boundaries ride the halo exchange."""
    img = test_image(64, 32, "gradient")  # 4 MCU rows (420)
    data = encoder.encode(img, sampling="420", quality=85, restart_interval_mcus=1)
    meta = analyze(data)
    bf = SH.prepare_banded(meta, 4)  # 4 bands over a 2-shard seq axis
    words, seg_mcus = SH.stack_banded([bf])
    mesh = SH.make_mesh(1, 2)
    out = SH.decode_batch_sharded(
        jnp.asarray(words), jnp.asarray(seg_mcus), jnp.asarray(bf.qz_by_slot),
        bf.plan, mesh=mesh, geom=FrameGeometry.from_image(meta),
        band_rows=bf.band_rows, tiling=bf.tiling, interpret=True,
        fancy_upsample=True,
    )
    from compeg_tpu.ops.fused import rgba_to_rgb_array

    want = Decoder(interpret=True, fancy_upsampling=True).decode(data)
    assert np.array_equal(rgba_to_rgb_array(np.asarray(out))[0], want)


def test_sharded_irregular_ri_fallback(test_image):
    """Ri=5 not dividing the MCU-row width (segments wrap rows): no tiled
    layout exists, bands are cut at the nearest restart boundary (rounded
    band heights, possibly empty trailing bands) on the staged fallback."""
    img = test_image(56, 48, "gradient")  # 7 MCU rows x 6 MCUs/row (444)
    data = encoder.encode(img, sampling="444", quality=85, restart_interval_mcus=5)
    meta = analyze(data)
    assert meta.width_mcus % meta.restart_interval != 0
    got, _ = _decode_sharded(data, 2, 2, expect_tiled=False)
    want = Decoder(interpret=True).decode(data)
    for b in range(got.shape[0]):
        assert np.array_equal(got[b], want)


def test_sharded_irregular_ri_exact_idct(test_image):
    """Bit-exact mode on the staged fallback: Ri=5 not dividing the row
    width + exact_idct must be byte-identical to the integer golden decode
    (round-3 gap: the fallback used to bail on exact_idct)."""
    img = test_image(56, 48, "noise")  # 7 MCU rows x 6 MCUs/row (444)
    data = encoder.encode(img, sampling="444", quality=85, restart_interval_mcus=5)
    meta = analyze(data)
    assert meta.width_mcus % meta.restart_interval != 0
    got, _ = _decode_sharded(data, 2, 2, exact_idct=True, expect_tiled=False)
    want = golden.decode_rgb(data, idct="int")
    for b in range(got.shape[0]):
        assert np.array_equal(got[b], want)


def test_staged_exact_idct_single_chip(test_image):
    """Decoder's staged path (fused=False) with exact_idct: byte-identical
    to the integer golden decode (decode_frame_device now plumbs the flag)."""
    img = test_image(24, 48, "noise")
    data = encoder.encode(img, sampling="422", quality=90, restart_interval_mcus=1)
    got = Decoder(interpret=True, fused=False, exact_idct=True).decode(data)
    assert np.array_equal(got, golden.decode_rgb(data, idct="int"))


def test_sharded_ri5_aligned_tiled(test_image):
    """Ri=5 dividing the MCU-row width: tiled fast path despite Ri > 1,
    with a band count that does not divide the MCU rows evenly."""
    img = test_image(56, 80, "gradient")  # 7 MCU rows x 10 MCUs/row (444)
    data = encoder.encode(img, sampling="444", quality=85, restart_interval_mcus=5)
    meta = analyze(data)
    assert meta.width_mcus % meta.restart_interval == 0
    got, _ = _decode_sharded(data, 1, 2, expect_tiled=True)
    want = Decoder(interpret=True).decode(data)
    assert np.array_equal(got[0], want)


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
