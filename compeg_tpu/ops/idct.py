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
