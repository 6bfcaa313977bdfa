"""MCU assembly, chroma upsampling, and YCbCr -> RGB conversion.

The reference's ``finalize`` shader stages each MCU's DUs through workgroup
memory, samples subsampled components at nearest-neighbor rate, and converts
with fixed-point BT.601 (src/dct.wgsl:257-334). On TPU this whole stage is
shape manipulation (reshape/transpose — no gathers) plus integer elementwise
math, which XLA fuses well; the exact color constants are preserved:

    r = y + (45*cr >> 5)
    g = y - ((11*cb + 23*cr) >> 5)
    b = y + (113*cb >> 6)          (src/dct.wgsl:323-334, arithmetic shifts)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def assemble_component_plane(
    pix_mcus: jax.Array,  # [total_mcus, sv*sh, 64] int32 for one component
    width_mcus: int,
    height_mcus: int,
    sh: int,
    sv: int,
) -> jax.Array:
    """Per-MCU DU blocks -> one plane at component resolution
    ``[height_mcus*sv*8, width_mcus*sh*8]``."""
    x = pix_mcus.reshape(height_mcus, width_mcus, sv, sh, 8, 8)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [hm, sv, 8, wm, sh, 8]
    return x.reshape(height_mcus * sv * 8, width_mcus * sh * 8)


def upsample_nearest(plane: jax.Array, fx: int, fy: int) -> jax.Array:
    """Sample replication (the reference's upsampling, src/dct.wgsl:302-313)."""
    if fy > 1:
        plane = jnp.repeat(plane, fy, axis=0)
    if fx > 1:
        plane = jnp.repeat(plane, fx, axis=1)
    return plane


def ycbcr_to_rgb(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    """Integer full-range BT.601 with the reference's constants; int32 in,
    u8 [H, W, 3] out."""
    cb = cb - 128
    cr = cr - 128
    r = y + ((45 * cr) >> 5)
    g = y - ((11 * cb + 23 * cr) >> 5)
    b = y + ((113 * cb) >> 6)
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


def finalize_rgb(
    pixels: jax.Array,  # [G, RI, DUS, 64, 8, 128] int32 from idct_pixels
    *,
    ri: int,
    du_to_comp: Tuple[int, ...],
    samplings: Tuple[Tuple[int, int], ...],  # per component (h, v)
    width: int,
    height: int,
    width_mcus: int,
    height_mcus: int,
) -> jax.Array:
    """Full finalize: assemble planes, upsample, convert. Returns [H, W, 3] u8.

    Grayscale (one component) replicates luma into all three channels.
    """
    G, RI, DUS, _, S, L = pixels.shape
    total_mcus = width_mcus * height_mcus
    # Segment-major ordering: [G, sub, lane, RI, DUS, 64] -> [mcu, DUS, 64].
    x = pixels.transpose(0, 4, 5, 1, 2, 3).reshape(G * S * L * RI, DUS, 64)
    x = x[:total_mcus]

    max_h = max(s[0] for s in samplings)
    max_v = max(s[1] for s in samplings)
    planes = []
    slot = 0
    for ci, (sh, sv) in enumerate(samplings):
        ndu = sh * sv
        plane = assemble_component_plane(
            x[:, slot : slot + ndu, :], width_mcus, height_mcus, sh, sv
        )
        plane = upsample_nearest(plane, max_h // sh, max_v // sv)
        planes.append(plane[:height, :width])
        slot += ndu

    if len(planes) == 1:
        yp = jnp.clip(planes[0], 0, 255).astype(jnp.uint8)
        return jnp.stack([yp, yp, yp], axis=-1)
    return ycbcr_to_rgb(planes[0], planes[1], planes[2])
