"""Test configuration: run everything on CPU with 8 virtual devices.

Device kernels run in Pallas interpret mode on CPU (selected automatically by
compeg_tpu when the backend is not TPU); multi-chip sharding logic is
exercised on the virtual 8-device mesh, the same way the reference's
test tiers avoid needing exotic hardware (SURVEY.md §4).
"""

import os

# Force CPU even when the session environment preselects the TPU platform.
# The environment's sitecustomize re-forces JAX_PLATFORMS=axon, so the env
# var alone is not enough — jax.config wins over it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def make_test_image(h, w, kind="gradient", seed=0):
    """Deterministic synthetic RGB test images."""
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "gradient":
        img = np.stack(
            [
                (xx * 255 // max(w - 1, 1)),
                (yy * 255 // max(h - 1, 1)),
                ((xx + yy) * 255 // max(h + w - 2, 1)),
            ],
            axis=-1,
        )
    elif kind == "noise":
        img = r.integers(0, 256, (h, w, 3))
    elif kind == "flat":
        img = np.full((h, w, 3), 128)
    elif kind == "edges":
        img = np.where((xx // 8 + yy // 8) % 2 == 0, 235, 20)
        img = np.stack([img, 255 - img, img // 2], axis=-1)
    else:
        raise ValueError(kind)
    return img.astype(np.uint8)


@pytest.fixture
def test_image():
    return make_test_image
