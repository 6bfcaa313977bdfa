"""Exact integer IDCT (scaled fixed-point Loeffler, libjpeg-islow-style).

The float IDCT path (ops/luts.py) matches the golden decoder only to within
MXU f32 accumulation order (±2 on ~1e-6 of pixels). This module defines a
fully *integer* IDCT whose arithmetic is identical on every backend — the
engine's bit-exact mode: `Decoder(exact_idct=True)` and
`golden.decode_rgb(idct="int")` produce byte-identical images.

Spec (13-bit fixed-point constants, two scaled 1D passes — the classic
"slow-but-accurate" integer 8-point IDCT structure after Loeffler et al.):

  pass 1 (columns): inputs are dequantized coefficients; outputs scaled by
     2^PASS1_BITS (descale by CONST_BITS - PASS1_BITS).
  pass 2 (rows): descale by CONST_BITS + PASS1_BITS + 3, add the +128 level
     shift, clamp to [0, 255].

All arithmetic is int32 with two's-complement wrap; right shifts are
arithmetic with round-half-up (DESCALE). Dequantized inputs are clamped to
int16 range first (legal baseline streams stay well inside; the clamp only
bounds corrupt streams away from int32 overflow).

The 1D butterfly is written against operator overloading so the *same
function* executes as numpy int32 (golden decoder) and as jnp int32 inside
the Pallas kernel — the two cannot diverge.
"""

from __future__ import annotations

CONST_BITS = 13
PASS1_BITS = 2

FIX_0_298631336 = 2446
FIX_0_390180644 = 3196
FIX_0_541196100 = 4433
FIX_0_765366865 = 6270
FIX_0_899976223 = 7373
FIX_1_175875602 = 9633
FIX_1_501321110 = 12299
FIX_1_847759065 = 15137
FIX_1_961570560 = 16069
FIX_2_053119869 = 16819
FIX_2_562915447 = 20995
FIX_3_072711026 = 25172


def descale(x, n: int):
    """Round-half-up arithmetic right shift (two's complement)."""
    return (x + (1 << (n - 1))) >> n


def idct_1d(s, shift_out):
    """One scaled 8-point integer IDCT: ``s`` is a list of 8 int32 arrays
    (numpy or jnp — any type with +,-,*,<<,>> semantics), returns 8 arrays
    descaled by ``shift_out``. ``shift_out=None`` returns the raw pre-descale
    sums (used to extract the pass as an integer matrix)."""
    # Even part.
    z2, z3 = s[2], s[6]
    z1 = (z2 + z3) * FIX_0_541196100
    tmp2 = z1 - z3 * FIX_1_847759065
    tmp3 = z1 + z2 * FIX_0_765366865
    tmp0 = (s[0] + s[4]) << CONST_BITS
    tmp1 = (s[0] - s[4]) << CONST_BITS
    t10 = tmp0 + tmp3
    t13 = tmp0 - tmp3
    t11 = tmp1 + tmp2
    t12 = tmp1 - tmp2
    # Odd part.
    t0, t1, t2, t3 = s[7], s[5], s[3], s[1]
    z1 = t0 + t3
    z2 = t1 + t2
    z3 = t0 + t2
    z4 = t1 + t3
    z5 = (z3 + z4) * FIX_1_175875602
    t0 = t0 * FIX_0_298631336
    t1 = t1 * FIX_2_053119869
    t2 = t2 * FIX_3_072711026
    t3 = t3 * FIX_1_501321110
    z1 = z1 * (-FIX_0_899976223)
    z2 = z2 * (-FIX_2_562915447)
    z3 = z3 * (-FIX_1_961570560) + z5
    z4 = z4 * (-FIX_0_390180644) + z5
    t0 = t0 + z1 + z3
    t1 = t1 + z2 + z4
    t2 = t2 + z2 + z3
    t3 = t3 + z1 + z4
    if shift_out is None:
        return [
            t10 + t3, t11 + t2, t12 + t1, t13 + t0,
            t13 - t0, t12 - t1, t11 - t2, t10 - t3,
        ]
    return [
        descale(t10 + t3, shift_out),
        descale(t11 + t2, shift_out),
        descale(t12 + t1, shift_out),
        descale(t13 + t0, shift_out),
        descale(t13 - t0, shift_out),
        descale(t12 - t1, shift_out),
        descale(t11 - t2, shift_out),
        descale(t10 - t3, shift_out),
    ]


def idct_2d_rows(cols):
    """Full 2D transform from a natural-order 8x8 of arrays.

    ``cols[r][c]`` are int32 arrays (dequantized, clamped). Returns the 8x8
    of pixel arrays (still unclamped ints, level-shifted by +128).
    """
    # Pass 1: transform each column (vary r), scale up by PASS1_BITS.
    p1 = [[None] * 8 for _ in range(8)]
    for c in range(8):
        col = [cols[r][c] for r in range(8)]
        out = idct_1d(col, CONST_BITS - PASS1_BITS)
        for r in range(8):
            p1[r][c] = out[r]
    # Pass 2: transform each row (vary c), final descale + level shift.
    final_shift = CONST_BITS + PASS1_BITS + 3
    out = [[None] * 8 for _ in range(8)]
    for r in range(8):
        o = idct_1d(p1[r], final_shift)
        for c in range(8):
            out[r][c] = o[c] + 128
    return out


# ---------------------------------------------------------------------------
# MXU formulation. Each 1D pass is a LINEAR map followed by one descale, so
# the 2D transform is two exact integer 64-point matmuls with a descale
# between them. The matmuls run on the MXU as f32 with the operands split
# into 8-bit limbs: every partial product sum stays below 2^24, so f32
# accumulation is exact, and the int32 recombination (shifts + adds with
# two's-complement wrap) reproduces the butterfly's value mod 2^32 — which
# is exactly what the int32 butterfly itself computes. The device kernel
# (ops/fused.py) and the golden decoder therefore remain bit-identical,
# including on streams that wrap int32.
# ---------------------------------------------------------------------------


def _pass_matrix():
    """The 8-point pass as its pre-descale integer matrix M (|entries| < 2^15
    — the FIX constants and their sums)."""
    import numpy as np

    basis = [np.eye(8, dtype=np.int64)[j] for j in range(8)]
    return np.stack(idct_1d(basis, None))  # M[i, j]: out i <- in j


def pass_operators():
    """``(T1z, T2)`` int64 64-point operators: pass 1 over columns with the
    zigzag deswizzle folded in (input is the z-major coefficient vector),
    pass 2 over rows. Natural-order index n = 8*r + c."""
    import numpy as np

    from ..tables import ZIGZAG

    M = _pass_matrix()
    eye = np.eye(8, dtype=np.int64)
    T1 = np.kron(M, eye)  # columns: out (r, c) <- sum_r' M[r, r'] in (r', c)
    Z = np.zeros((64, 64), dtype=np.int64)
    for n in range(64):
        Z[n, int(ZIGZAG[n])] = 1  # natural n reads zigzag slot ZIGZAG[n]
    T2 = np.kron(eye, M)  # rows: out (r, c) <- sum_c' M[c, c'] in (r, c')
    return T1 @ Z, T2


def mxu_operators():
    """Stacked 8-bit-limb pass operators ``[2, 128, 64]`` f32 for the MXU
    exact-IDCT path: ``ops[p] = concat([T >> 8, T & 255])`` for pass p. The
    high limb is in [-102, 102] and the low limb in [0, 255], so products
    against <= 13-bit input limbs accumulate exactly in f32."""
    import numpy as np

    ops = []
    for T in pass_operators():
        ops.append(
            np.concatenate([T >> 8, T & 255], axis=0).astype(np.float32)
        )
    return np.stack(ops)
