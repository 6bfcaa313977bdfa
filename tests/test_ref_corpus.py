"""Tests against the reference's own on-disk corpus.

The reference auto-discovers and snapshot-tests every image under
``src/file/test-images/`` (src/file/tests.rs:69-99) and pixel-checks its GPU
decode of ``src/refs/64x8-Ri-{1,2}.jpg`` against the PNG ground truth
``64x8.png`` with ABS_TOLERANCE=3 (src/tests.rs:18,131-135). These tests run
the same corpus through this engine:

 * parser snapshots over every corpus .jpg (our own committed .log format,
   tests/snapshots/ref/ — the reference's expect-test format differs);
 * analyzer envelope: which files decode and which are rejected, with the
   reason pinned;
 * pixel reftests vs the reference's own PNG ground truth at its tolerance,
   at both retained=32 (the reference's default, src/metadata.rs:43) and 64;
 * end-to-end decodes of every in-envelope image cross-checked against
   Pillow/libjpeg — including mjpeg.jpg (a real webcam frame with no DHT,
   exercising the Annex K default-table path) and rgb.jpg (component IDs
   R,G,B: RGB color space, no YCbCr transform).

The corpus is mounted read-only; tests skip if it is absent.
"""

import io
import os

import numpy as np
import pytest

from compeg_tpu import golden
from compeg_tpu.errors import CompegError
from compeg_tpu.metadata import analyze
from compeg_tpu.parser import dump_segments
from compeg_tpu.pipeline import Decoder

REF_ROOT = "/root/reference/src"
TI = os.path.join(REF_ROOT, "file", "test-images")
REFS = os.path.join(REF_ROOT, "refs")
SNAP_DIR = os.path.join(os.path.dirname(__file__), "snapshots", "ref")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TI), reason="reference corpus not mounted"
)


def _corpus():
    out = []
    for d, prefix in ((TI, ""), (REFS, "refs-")):
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if f.endswith(".jpg"):
                out.append((prefix + f[: -len(".jpg")], os.path.join(d, f)))
    return out


CORPUS = _corpus()


def _load(name):
    path = dict(CORPUS)[name]
    with open(path, "rb") as f:
        return f.read()


# ---------------------------------------------------------------------------
# Parser snapshots (reference: src/file/tests.rs:69-99)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", [n for n, _ in CORPUS])
def test_parser_snapshot(name):
    dump = dump_segments(_load(name))
    path = os.path.join(SNAP_DIR, f"{name}.log")
    if os.environ.get("COMPEG_UPDATE_SNAPSHOTS"):
        os.makedirs(SNAP_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write(dump)
    assert os.path.exists(path), "snapshot missing; set COMPEG_UPDATE_SNAPSHOTS=1"
    assert dump == open(path).read(), f"snapshot mismatch for {name}"


# ---------------------------------------------------------------------------
# Analyzer envelope over the corpus
# ---------------------------------------------------------------------------

# name -> None (analyzes) or the expected rejection-message prefix.
ENVELOPE = {
    "16bit-qtables": "16-bit quantization tables",
    "blank_800x280": None,  # grayscale declared 2x2: normalized to 1x1
    "extraneous-data": None,
    "grayscale_16x24_sampling2x2": None,
    "grayscale_24x16_sampling2x2": None,
    "grayscale_large": None,
    "grayscale_long": None,
    "grayscale_square": None,
    "mjpeg": None,  # no DHT: Annex K default tables
    "non-interleaved-mcu": "multiple scans",
    "partial_progressive": "multiple scans",
    "progressive-missing-ac": "only baseline (SOF0)",
    "progressive-missing-dc": "only baseline (SOF0)",
    "progressive3": "multiple scans",
    "restarts": None,  # Ri=5, 33x33 4:4:4
    "rgb": None,  # component IDs R,G,B: RGB color space
    "refs-64x8-Hi1-Vi1": None,  # 4:4:4 (the reference #[ignore]s this one)
    "refs-64x8-Ri-1": None,
    "refs-64x8-Ri-2": None,
}


@pytest.mark.parametrize("name", sorted(ENVELOPE))
def test_analyze_envelope(name):
    data = _load(name)
    want = ENVELOPE[name]
    if want is None:
        analyze(data)  # must not raise
    else:
        with pytest.raises(CompegError, match=None) as ei:
            analyze(data)
        assert str(ei.value).startswith(want), str(ei.value)


def test_mjpeg_uses_annex_k_defaults():
    """mjpeg.jpg (real webcam frame) carries no DHT segment; the analyzer
    must install the T.81 Annex K defaults (reference src/lib.rs:608-613)."""
    data = _load("mjpeg")
    assert "DHT" not in dump_segments(data)
    img = analyze(data)
    assert img.restart_interval == 10 and img.total_restart_intervals == 540
    assert (0, 0) in img.htables and (1, 1) in img.htables


# ---------------------------------------------------------------------------
# Pixel reftests vs the reference's PNG ground truth (src/tests.rs:18,131-142)
# ---------------------------------------------------------------------------

ABS_TOLERANCE = 3  # the reference's bar, src/tests.rs:18


def _png_64x8():
    PIL = pytest.importorskip("PIL.Image")
    return np.asarray(
        PIL.open(os.path.join(REFS, "64x8.png")).convert("RGB")
    ).astype(int)


@pytest.mark.parametrize("name", ["refs-64x8-Ri-1", "refs-64x8-Ri-2"])
@pytest.mark.parametrize("retained", [32, 64])
def test_reftest_pixels(name, retained):
    """The reference's own GPU reftest, on its own artifacts: decode the
    4:2:2 64x8 JPEGs and compare against 64x8.png within tolerance 3.
    retained=32 is the reference's default envelope (src/metadata.rs:43)."""
    got = (
        Decoder(retained_coefficients=retained, interpret=True)
        .decode(_load(name))
        .astype(int)
    )
    diff = np.abs(got - _png_64x8())
    assert diff.max() <= ABS_TOLERANCE, (name, retained, diff.max())


def test_reftest_pixels_444():
    """The 4:4:4 reftest the reference gates off with #[ignore]
    (src/tests.rs:138-142) — this engine decodes it within the same bar."""
    got = Decoder(interpret=True).decode(_load("refs-64x8-Hi1-Vi1")).astype(int)
    assert np.abs(got - _png_64x8()).max() <= ABS_TOLERANCE


# ---------------------------------------------------------------------------
# End-to-end decodes of the in-envelope corpus vs Pillow/libjpeg
# ---------------------------------------------------------------------------


def _pillow(data):
    PIL = pytest.importorskip("PIL.Image")
    return np.asarray(PIL.open(io.BytesIO(data)).convert("RGB")).astype(int)


@pytest.mark.parametrize(
    "name",
    [
        "blank_800x280",
        "grayscale_16x24_sampling2x2",
        "grayscale_24x16_sampling2x2",
        "grayscale_large",
        "grayscale_long",
        "grayscale_square",
        "rgb",
    ],
)
def test_golden_int_matches_libjpeg_exactly(name):
    """Corpus images with no YCbCr conversion (grayscale / RGB color space):
    the integer-IDCT golden decode must be byte-identical to libjpeg —
    including the declared-2x2 grayscale frames (sampling normalization) and
    rgb.jpg (no color transform)."""
    data = _load(name)
    got = golden.decode_rgb(data, idct="int").astype(int)
    theirs = _pillow(data)
    assert np.array_equal(got, theirs), np.abs(got - theirs).max()


@pytest.mark.parametrize("name", ["restarts", "extraneous-data", "grayscale_square"])
def test_device_decode_matches_golden(name):
    """Device pipeline over the real corpus files (multi-segment / small):
    within +-1 of the float golden decoder (MXU ulps), and the exact-IDCT
    mode byte-identical to the integer golden decode."""
    data = _load(name)
    got = Decoder(interpret=True).decode(data).astype(int)
    want = golden.decode_rgb(data).astype(int)
    assert np.abs(got - want).max() <= 1
    got_exact = Decoder(interpret=True, exact_idct=True).decode(data)
    want_exact = golden.decode_rgb(data, idct="int")
    assert np.array_equal(got_exact, want_exact)


def test_mjpeg_device_decode():
    """The real webcam MJPEG frame (960x720 4:2:2, Ri=10, no DHT) through
    the full device pipeline: exact-IDCT fancy decode within the engine's
    color-constant envelope of libjpeg (the BT.601 fixed-point constants
    deliberately match the reference, not libjpeg — PARITY.md), and
    byte-identical between device and golden on the nearest path."""
    data = _load("mjpeg")
    theirs = _pillow(data)
    got = (
        Decoder(interpret=True, fancy_upsampling=True, exact_idct=True)
        .decode(data)
        .astype(int)
    )
    assert np.abs(got - theirs).max() <= 4
    # Nearest path: same upsampling convention as golden -> must be exact.
    got_n = Decoder(interpret=True, exact_idct=True).decode(data)
    want_n = golden.decode_rgb(data, idct="int")
    assert np.array_equal(got_n, want_n)


def test_rgb_device_path():
    """RGB color space on the device kernels: synthesize an R,G,B-id stream
    (the corpus rgb.jpg is one giant segment — exercised via golden above)
    and check the fused kernel's passthrough against golden."""
    import struct

    from compeg_tpu import encoder

    yy, xx = np.mgrid[0:16, 0:32]
    img = np.stack([xx * 8 % 256, yy * 16 % 256, (xx + yy) % 256], -1).astype(
        np.uint8
    )
    data = bytearray(
        encoder.encode(img, sampling="444", quality=90, restart_interval_mcus=1)
    )
    i = bytes(data).find(b"\xff\xc0")
    base = i + 4 + 6
    for k, cid in enumerate(b"RGB"):
        data[base + 3 * k] = cid
    j = bytes(data).find(b"\xff\xda")
    sbase = j + 4 + 1
    for k, cid in enumerate(b"RGB"):
        data[sbase + 2 * k] = cid
    data = bytes(data)
    assert analyze(data).color_space == "rgb"
    # (The coded samples are the encoder's YCbCr transform of `img`; with
    # R,G,B ids the decoder must return them untransformed, so the oracle is
    # golden's passthrough, not the source image.)
    want = golden.decode_rgb(data).astype(int)
    same_stream_ycbcr = golden.decode_rgb(
        encoder.encode(img, sampling="444", quality=90, restart_interval_mcus=1)
    ).astype(int)
    assert not np.array_equal(want, same_stream_ycbcr)  # transform really off
    for planes_epilogue in (False, True):  # composite kernel + planes epilogue
        got = (
            Decoder(interpret=True, planes_epilogue=planes_epilogue)
            .decode(data)
            .astype(int)
        )
        assert np.abs(got - want).max() <= 1, planes_epilogue
    got_exact = Decoder(interpret=True, exact_idct=True).decode(data)
    assert np.array_equal(got_exact, golden.decode_rgb(data, idct="int"))


@pytest.mark.parametrize("name", ["refs-64x8-Ri-1", "refs-64x8-Ri-2"])
def test_reftest_pixels_aan_oracle(name):
    """The jidctflt-model golden decode at the reference's exact semantics
    (zrl17, retained=32, float AAN butterflies) against the reference's own
    PNG ground truth, at its reftest tolerance — the closest executable
    statement of 'produces what Compeg's GPU produces' (src/tests.rs:18)."""
    got = golden.decode_rgb(
        _load(name), retained_coefficients=32, idct="aan", zrl17=True
    ).astype(int)
    diff = np.abs(got - _png_64x8())
    assert diff.max() <= ABS_TOLERANCE, (name, diff.max())
