"""Dequantization + 8x8 IDCT as one batched MXU matmul.

The reference runs an 8-thread float AAN butterfly per DU with workgroup
staging (src/dct.wgsl:46-201). On TPU the 2D IDCT of every DU in the image
is a single dense contraction on the systolic array:

    pixels[p, n] = clamp(trunc( L[p, z] @ deq[z, n] + 128.5 ), 0, 255)

where ``L`` is the 64x64 IDCT operator with the zigzag permutation and the
``retained_coefficients`` truncation folded into its columns (ops/luts.py),
``deq`` is the entropy kernel's raw coefficient output multiplied by the
per-component quantizer (an elementwise op XLA fuses into the matmul's
operand), and the +128.5/clamp/truncate epilogue reproduces the reference's
level shift + clamp + u8 pack (src/dct.wgsl:144,174-181,189-201) exactly.

The contraction runs in float32. The entropy layout ``[..., DUS, 64, 8, 128]``
already has the 64-axis contiguous ahead of the (8, 128) vector minor dims,
so no transpose is needed: we contract ``L @ X`` with X's 64-axis as the
leading reduction dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .luts import idct_matrix_zigzag


@functools.partial(jax.jit, static_argnames=("retained",))
def idct_pixels(
    coeffs: jax.Array,  # [G, RI, DUS, 64, 8, 128] int32, raw (quantized)
    qz_by_slot: jax.Array,  # [DUS, 64] int32: qtable (zigzag) per DU slot
    retained: int = 64,
) -> jax.Array:
    """Raw zigzag coefficients -> u8 pixel blocks ``[G, RI, DUS, 64, 8, 128]``
    (the 64-axis switches meaning from zigzag position to raster pixel)."""
    L = jnp.asarray(idct_matrix_zigzag(retained))  # [64p, 64z] f32
    deq = coeffs.astype(jnp.float32) * qz_by_slot[None, None, :, :, None, None].astype(
        jnp.float32
    )
    # deq: [G, RI, DUS, 64z, 8, 128]; contract z against L.
    pix = jnp.einsum(
        "pz,grdzsl->grdpsl",
        L,
        deq,
        precision=jax.lax.Precision.HIGHEST,
    )
    pix = pix + jnp.float32(128.5)
    pix = jnp.clip(pix, 0.0, 255.0)
    return pix.astype(jnp.int32)


def qz_by_slot_array(img) -> np.ndarray:
    """Per-DU-slot zigzag quantization rows: ``[DUS, 64]`` int32."""
    return np.stack([np.asarray(img.qtable_for_comp(c)) for c in img.du_to_comp])


@functools.partial(jax.jit, static_argnames=("retained",))
def idct_pixels_exact(
    coeffs: jax.Array,  # [G, RI, DUS, 64, 8, 128] int32, raw (quantized)
    qz_by_slot: jax.Array,  # [DUS, 64] int32
    retained: int = 64,
) -> jax.Array:
    """Integer-exact variant of :func:`idct_pixels` for the staged path:
    runs :func:`~compeg_tpu.ops.int_idct.idct_2d_rows` — literally the same
    butterfly the golden decoder executes (golden.idct_pixels_int) — as
    vectorized jnp int32 elementwise ops, so the result is byte-identical to
    ``golden.decode_rgb(idct="int")`` on every backend. This is the
    bit-exact mode for layouts the fused tiled kernel cannot take
    (irregular restart intervals on the sharded fallback)."""
    from ..tables import ZIGZAG
    from .int_idct import idct_2d_rows

    q = qz_by_slot
    if retained < 64:
        mask = np.zeros((1, 64), np.int32)
        mask[0, :retained] = 1
        q = q * jnp.asarray(mask)
    # Dequantize, clamp to int16 range (golden.idct_pixels_int semantics;
    # |coeff| <= 32767 and q <= 255, so the int32 product cannot wrap and
    # matches golden's int64 product exactly).
    deq = coeffs * q[None, None, :, :, None, None]
    deq = jnp.clip(deq, -32768, 32767)
    zz = np.asarray(ZIGZAG).reshape(8, 8)
    cols = [[deq[..., int(zz[r, c]), :, :] for c in range(8)] for r in range(8)]
    out = idct_2d_rows(cols)
    pix = jnp.stack(
        [out[r][c] for r in range(8) for c in range(8)], axis=-3
    )  # [G, RI, DUS, 64p, 8, 128]
    return jnp.clip(pix, 0, 255)
