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

from typing import Tuple

import jax
import jax.numpy as jnp


def assemble_component_plane(
    pix_mcus: jax.Array,  # [total_mcus, sv*sh, blk*blk] int32, one component
    width_mcus: int,
    height_mcus: int,
    sh: int,
    sv: int,
    blk: int = 8,
) -> jax.Array:
    """Per-MCU DU blocks -> one plane at component resolution
    ``[height_mcus*sv*blk, width_mcus*sh*blk]`` (``blk`` < 8 for the
    scaled thumbnail decode)."""
    x = pix_mcus.reshape(height_mcus, width_mcus, sv, sh, blk, blk)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [hm, sv, blk, wm, sh, blk]
    return x.reshape(height_mcus * sv * blk, width_mcus * sh * blk)


def component_planes(
    pixels: jax.Array,  # [G, RI, DUS, blk*blk, 8, 128] int32 (idct_pixels)
    *,
    samplings: Tuple[Tuple[int, int], ...],
    width_mcus: int,
    height_mcus: int,
    blk: int = 8,
) -> Tuple[jax.Array, ...]:
    """Per-component planes at component resolution (no upsampling, no color
    conversion) from linear-slot decoded pixels."""
    G, RI, DUS, _, S, L = pixels.shape
    total_mcus = width_mcus * height_mcus
    x = pixels.transpose(0, 4, 5, 1, 2, 3).reshape(
        G * S * L * RI, DUS, blk * blk
    )
    x = x[:total_mcus]
    planes = []
    slot = 0
    for (sh, sv) in samplings:
        ndu = sh * sv
        planes.append(
            assemble_component_plane(
                x[:, slot : slot + ndu, :], width_mcus, height_mcus, sh, sv,
                blk,
            )
        )
        slot += ndu
    return tuple(planes)


def upsample_nearest(plane: jax.Array, fx: int, fy: int) -> jax.Array:
    """Sample replication (the reference's upsampling, src/dct.wgsl:302-313)."""
    if fy > 1:
        plane = jnp.repeat(plane, fy, axis=0)
    if fx > 1:
        plane = jnp.repeat(plane, fx, axis=1)
    return plane


def upsample_fancy_h(plane: jax.Array) -> jax.Array:
    """Horizontal x2 triangle-filter upsampling (libjpeg 'fancy' weighting:
    nearer sample x3 + farther x1, rounding 1/2 alternating; edges clamp)."""
    left = jnp.concatenate([plane[:, :1], plane[:, :-1]], axis=1)
    right = jnp.concatenate([plane[:, 1:], plane[:, -1:]], axis=1)
    even = (3 * plane + left + 1) >> 2
    odd = (3 * plane + right + 2) >> 2
    h, w = plane.shape
    return jnp.stack([even, odd], axis=2).reshape(h, 2 * w)


def upsample_fancy_v(
    plane: jax.Array,
    top_halo: jax.Array | None = None,
    bottom_halo: jax.Array | None = None,
) -> jax.Array:
    """Vertical x2 triangle-filter upsampling. ``top_halo``/``bottom_halo``
    are the neighbor rows adjacent to this band (for sharded decode they
    arrive over ICI; None clamps at the image edge)."""
    above = jnp.concatenate(
        [plane[:1] if top_halo is None else top_halo[None], plane[:-1]], axis=0
    )
    below = jnp.concatenate(
        [plane[1:], plane[-1:] if bottom_halo is None else bottom_halo[None]], axis=0
    )
    even = (3 * plane + above + 1) >> 2
    odd = (3 * plane + below + 2) >> 2
    h, w = plane.shape
    return jnp.stack([even, odd], axis=1).reshape(2 * h, w)


def _exchange_boundary_rows(plane: jax.Array, seq_axis: str):
    """Fetch the neighboring bands' adjacent chroma rows over the mesh's
    ``seq`` axis: each shard receives the row above its band (the previous
    shard's last row) and the row below (the next shard's first row).

    This is the boundary-row ICI collective of the sharded decode: a pair of
    ``ppermute`` ring shifts (SURVEY.md §5 'halo exchange').
    """
    n = jax.lax.axis_size(seq_axis)
    idx = jax.lax.axis_index(seq_axis)
    perm_down = [(i, (i + 1) % n) for i in range(n)]
    perm_up = [(i, (i - 1) % n) for i in range(n)]
    from_above = jax.lax.ppermute(plane[-1], seq_axis, perm_down)
    from_below = jax.lax.ppermute(plane[0], seq_axis, perm_up)
    # Image edges: clamp to own boundary row.
    top = jnp.where(idx == 0, plane[0], from_above)
    bottom = jnp.where(idx == n - 1, plane[-1], from_below)
    return top, bottom


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


def rgb_to_rgba(rgb: jax.Array) -> jax.Array:
    """Append an opaque alpha channel: the reference's rgba8unorm output
    format (src/lib.rs:48, src/dct.wgsl:319)."""
    a = jnp.full(rgb.shape[:-1] + (1,), 255, dtype=jnp.uint8)
    return jnp.concatenate([rgb, a], axis=-1)


def finalize_band(
    pixels: jax.Array,  # [G_b, RI, DUS, 64, 8, 128] int32 for one band
    *,
    ri: int,
    du_to_comp: Tuple[int, ...],
    samplings: Tuple[Tuple[int, int], ...],
    band_width_mcus: int,
    band_height_mcus: int,
    fancy: bool = False,
    seq_axis: str | None = None,
    rgb: bool = False,
) -> jax.Array:
    """Assemble one MCU-row band into ``[band_h, band_w, 3]`` u8.

    With ``fancy=True`` chroma is upsampled with the triangle filter; when
    ``seq_axis`` names a mesh axis, vertical interpolation exchanges band
    boundary rows with neighboring shards over ICI (ppermute).
    """
    G, RI, DUS, _, S, L = pixels.shape
    total_mcus = band_width_mcus * band_height_mcus
    x = pixels.transpose(0, 4, 5, 1, 2, 3).reshape(G * S * L * RI, DUS, 64)
    x = x[:total_mcus]

    max_h = max(s[0] for s in samplings)
    max_v = max(s[1] for s in samplings)
    planes = []
    slot = 0
    for ci, (sh, sv) in enumerate(samplings):
        ndu = sh * sv
        plane = assemble_component_plane(
            x[:, slot : slot + ndu, :], band_width_mcus, band_height_mcus, sh, sv
        )
        fx, fy = max_h // sh, max_v // sv
        if not fancy:
            plane = upsample_nearest(plane, fx, fy)
        else:
            if fy > 1:
                if seq_axis is not None:
                    top, bottom = _exchange_boundary_rows(plane, seq_axis)
                    plane = upsample_fancy_v(plane, top, bottom)
                else:
                    plane = upsample_fancy_v(plane)
            if fx > 1:
                # Triangle filter is a 2x construct; 4x (4:1:1) replicates,
                # matching libjpeg (jdsample.c int_upsample for non-2x).
                plane = (
                    upsample_fancy_h(plane) if fx == 2
                    else upsample_nearest(plane, fx, 1)
                )
        planes.append(plane)
        slot += ndu

    if len(planes) == 1:
        yp = jnp.clip(planes[0], 0, 255).astype(jnp.uint8)
        return jnp.stack([yp, yp, yp], axis=-1)
    if rgb:  # samples are already RGB (component IDs R,G,B): no transform
        return jnp.clip(jnp.stack(planes, axis=-1), 0, 255).astype(jnp.uint8)
    return ycbcr_to_rgb(planes[0], planes[1], planes[2])


def finalize_rgb(
    pixels: jax.Array,  # [G, RI, DUS, blk*blk, 8, 128] int32 (idct_pixels)
    *,
    ri: int,
    du_to_comp: Tuple[int, ...],
    samplings: Tuple[Tuple[int, int], ...],  # per component (h, v)
    width: int,
    height: int,
    width_mcus: int,
    height_mcus: int,
    fancy: bool = False,
    rgb: bool = False,
    blk: int = 8,
) -> jax.Array:
    """Full finalize: assemble planes, upsample, convert. Returns [H, W, 3] u8.

    Grayscale (one component) replicates luma into all three channels.
    ``blk`` < 8 is the scaled thumbnail decode (callers pass the SCALED
    width/height for the crop).
    """
    G, RI, DUS, _, S, L = pixels.shape
    total_mcus = width_mcus * height_mcus
    # Segment-major ordering: [G, sub, lane, RI, DUS, k2] -> [mcu, DUS, k2].
    x = pixels.transpose(0, 4, 5, 1, 2, 3).reshape(
        G * S * L * RI, DUS, blk * blk
    )
    x = x[:total_mcus]

    max_h = max(s[0] for s in samplings)
    max_v = max(s[1] for s in samplings)
    planes = []
    slot = 0
    for ci, (sh, sv) in enumerate(samplings):
        ndu = sh * sv
        plane = assemble_component_plane(
            x[:, slot : slot + ndu, :], width_mcus, height_mcus, sh, sv, blk
        )
        fx, fy = max_h // sh, max_v // sv
        if not fancy:
            plane = upsample_nearest(plane, fx, fy)
        else:
            if fy > 1:
                plane = upsample_fancy_v(plane)
            if fx > 1:
                plane = (
                    upsample_fancy_h(plane) if fx == 2
                    else upsample_nearest(plane, fx, 1)
                )
        planes.append(plane[:height, :width])
        slot += ndu

    if len(planes) == 1:
        yp = jnp.clip(planes[0], 0, 255).astype(jnp.uint8)
        return jnp.stack([yp, yp, yp], axis=-1)
    if rgb:  # samples are already RGB (component IDs R,G,B): no transform
        return jnp.clip(jnp.stack(planes, axis=-1), 0, 255).astype(jnp.uint8)
    return ycbcr_to_rgb(planes[0], planes[1], planes[2])
