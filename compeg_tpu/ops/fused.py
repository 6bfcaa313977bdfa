"""Fully fused decode kernel: entropy -> IDCT -> upsample/color -> RGBA.

The reference leaves stage fusion as a FIXME ("use a subset of the DCT
threads to do [compositing], saves a trip to memory", src/dct.wgsl:203-215).
On TPU the fusion is decisive: the unfused pipeline's coefficient and pixel
intermediates cost two 66 MB HBM round-trips plus XLA relayouts — more
device time than the decode itself. This kernel keeps a block's
coefficients in VMEM from entropy decode through to packed RGBA pixels:

  phase 1  entropy decode (identical logic to ops/entropy.py) into a VMEM
           coefficient scratch [DUS, 64z, 8, 128]
  phase 2  dequant (broadcast multiply) + IDCT as 8 MXU matmuls per DU slot
           (L[64,64] @ X[64,128] per sublane) + 128.5/clamp/truncate
  phase 3  per-MCU compositing: static slot/row selection implements the
           nearest-neighbor chroma upsampling; integer BT.601 with the
           reference's constants; packed rgba8 u32 stores (the reference's
           texture format, src/lib.rs:48)

Output stays segment-major ([G, RI, mcu_h, mcu_w, 8, 128] u32, one u32 per
pixel); `assemble_image` turns it into the raster [H, W] RGBA image with a
single u32 transpose.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..scan import LANES, SUBLANES
from .entropy import (
    EntropyPlan,
    I32,
    U32,
    _extend,
    decode_dc,
    decode_mcu_coefficients as E_decode_mcu,
    make_symbol_decoder,
)

F32 = jnp.float32


def _mcu_shape(samplings) -> Tuple[int, int]:
    return 8 * max(s[1] for s in samplings), 8 * max(s[0] for s in samplings)


def _slot_layout(samplings):
    """Per-component (first_slot, h, v) in MCU slot order."""
    out = []
    slot = 0
    for (h, v) in samplings:
        out.append((slot, h, v))
        slot += h * v
    return out


def _make_fused_kernel(plan: EntropyPlan, samplings, retained: int,
                       unroll: int = 4, exact_idct: bool = False,
                       tiled: bool = False, planes: bool = False,
                       flat: bool = False, rgb: bool = False,
                       precision: str = "highest", _ablate: str = "",
                       scale: int = 8, scaled_ops=None):
    W = plan.words_per_segment
    dus = plan.dus_per_mcu
    # ``scale`` = pixels per DU side (k of the k-point scaled IDCT; 8 =
    # full decode). The entropy phase is identical at every scale; phase 2
    # contracts the k-point operator and phase 3 composites k x k blocks.
    blk = scale
    max_v = max(sv for _, sv in samplings)
    max_h = max(sh for sh, _ in samplings)
    mh = blk * max_v
    mw = blk * max_h
    layout = _slot_layout(samplings)

    def kernel(words_ref, segmcus_ref, l_ref, *out_and_scratch):
        if exact_idct:
            # Extra operand: stacked 8-bit-limb pass operators [2, 128, 64]
            # (ops/int_idct.mxu_operators).
            t_ref, *out_and_scratch = out_and_scratch
        if planes:
            nout = len(samplings)
        else:
            nout = 1
        out_refs = out_and_scratch[:nout]
        out_ref = out_refs[0]
        coeff_s, hi_s, lo_s, nb_s, wi_s, dp_s = out_and_scratch[nout:]
        m = pl.program_id(1)

        @pl.when(m == 0)
        def _():
            hi_s[:] = jnp.zeros((SUBLANES, LANES), U32)
            lo_s[:] = jnp.zeros((SUBLANES, LANES), U32)
            nb_s[:] = jnp.zeros((SUBLANES, LANES), I32)
            wi_s[:] = jnp.zeros((SUBLANES, LANES), I32)
            dp_s[:] = jnp.zeros((3, SUBLANES, LANES), I32)

        coeff_s[:] = jnp.zeros((dus, 64, SUBLANES, LANES), I32)

        hi, lo = hi_s[:], lo_s[:]
        nbits, widx = nb_s[:], wi_s[:]
        words = [words_ref[0, k] for k in range(W)]
        act = m < segmcus_ref[0]

        decode_symbol = make_symbol_decoder(words, W)

        # ---- phase 1: entropy decode into coeff_s ------------------------
        # Shared symbol-synchronous loop (entropy.decode_mcu_coefficients):
        # every iteration decodes one AC symbol on every still-active lane
        # and masked-stores at its zigzag row — ~2.7x fewer iterations than
        # walking positions, at the price of a 64-row masked store. (A
        # hot/cold split of the store at row 16 with a scalar any() gate
        # measured ~1.8x SLOWER on the chip.)
        hi, lo, nbits, widx = E_decode_mcu(
            plan,
            decode_symbol,
            lambda slot, row, vec: coeff_s.__setitem__((slot, row), vec),
            lambda slot: coeff_s.at[slot],
            dp_s,
            act,
            hi,
            lo,
            nbits,
            widx,
            unroll=unroll,
            _ablate=_ablate,
        )

        hi_s[:], lo_s[:] = hi, lo
        nb_s[:], wi_s[:] = nbits, widx

        # ---- phase 2: fused dequant+IDCT per DU slot ---------------------
        if _ablate in ("noidct", "nop23"):
            pass
        elif scale != 8:
            # Scaled (thumbnail) IDCT: only the k x k low frequencies
            # contribute, so the contraction is k^2 vector MACs per output
            # pixel with the dequantized operator folded into COMPILE-TIME
            # constants (scaled_ops[slot][p] = (zigzag positions, weights);
            # the kernel is compiled per stream anyway). Pixels overwrite
            # the first k^2 coefficient-scratch rows.
            for slot in range(dus):
                rows = []
                for p in range(blk * blk):
                    zzs, wts = scaled_ops[slot][p]
                    acc = None
                    for z, wt in zip(zzs, wts):
                        term = coeff_s[slot, z].astype(F32) * F32(wt)
                        acc = term if acc is None else acc + term
                    if acc is None:
                        acc = jnp.zeros((SUBLANES, LANES), F32)
                    rows.append(
                        jnp.clip(acc + F32(128.5), 0.0, 255.0).astype(I32)
                    )
                for p, row in enumerate(rows):
                    coeff_s[slot, p] = row
        elif exact_idct:
            # Exact-integer mode: l_ref holds the broadcast int32 quantizers
            # [DUS, 64, 8, 128]; t_ref the limb-split integer pass operators.
            # Each fixed-point Loeffler pass (ops/int_idct.py) is a linear
            # map + one descale, so it runs as ONE exact single-pass bf16
            # MXU matmul: every operand limb is an integer in [-256, 255]
            # (bf16-exact) and the operator rows have only 8 nonzeros, so
            # partial sums stay < 2^20 and f32 accumulation is exact. The
            # int32 recombination (shifts + adds with two's-complement wrap)
            # reproduces the butterfly's arithmetic mod 2^32 — bit-identical
            # to the golden decoder, at a fraction of the VPU vector
            # butterflies' cost. Zigzag deswizzle is folded into the pass-1
            # operator. Bounds checked in ops/int_idct.py docstrings.
            # All DU slots ride ONE dot per pass (columns concatenated):
            # same FLOPs, but the [128, 64] operator is loaded once per pass
            # instead of once per slot, and the wide dots pipeline better.
            # Limb-pair sums happen in f32 BEFORE the i32 casts: every P
            # entry is an exact integer < 2^19 (8 products of 8-bit limbs),
            # so pair sums stay < 2^24 and are f32-exact — one cast per
            # recombination term instead of one per limb block.
            n = SUBLANES * LANES
            N = dus * n
            BF16 = jnp.bfloat16
            xs = []
            for slot in range(dus):
                xq = jnp.clip(coeff_s[slot] * l_ref[slot], -32768, 32767)
                xs.append(xq.reshape(64, n))
            x = jnp.concatenate(xs, axis=1)  # [64, N]
            # One dot per input limb (vs one wide dot on a concatenated
            # operand): same FLOPs, but no [64, k*N] concat for Mosaic to
            # materialize in VMEM.
            Ph = jnp.dot(t_ref[0], (x >> 8).astype(BF16),
                         preferred_element_type=F32)
            Pl = jnp.dot(t_ref[0], (x & 255).astype(BF16),
                         preferred_element_type=F32)
            y = (
                (Ph[:64].astype(I32) << 16)
                + ((Ph[64:] + Pl[:64]).astype(I32) << 8)
                + Pl[64:].astype(I32)
            )
            p1 = (y + (1 << 10)) >> 11  # descale CONST_BITS-PASS1_BITS
            # Pass 2 input is ~2^20; three 8-bit limbs keep it bf16-exact
            # (high limb p1>>16 is in [-15, 14]).
            Qh = jnp.dot(t_ref[1], (p1 >> 16).astype(BF16),
                         preferred_element_type=F32)
            Qm = jnp.dot(t_ref[1], ((p1 >> 8) & 255).astype(BF16),
                         preferred_element_type=F32)
            Ql = jnp.dot(t_ref[1], (p1 & 255).astype(BF16),
                         preferred_element_type=F32)
            y2 = (
                (Qh[:64].astype(I32) << 24)
                + ((Qh[64:] + Qm[:64]).astype(I32) << 16)
                + ((Qm[64:] + Ql[:64]).astype(I32) << 8)
                + Ql[64:].astype(I32)
            )
            # descale CONST_BITS+PASS1_BITS+3, +128 level shift, clamp.
            pix = jnp.clip(((y2 + (1 << 17)) >> 18) + 128, 0, 255)
            for slot in range(dus):
                coeff_s[slot] = pix[:, slot * n:(slot + 1) * n].reshape(
                    64, SUBLANES, LANES
                )
        elif _ablate == "unpairidct":
            # Probe: round-1 per-slot per-sublane formulation (l_ref is the
            # unpaired [DUS, 64, 64] operator set) for profiler A/Bs.
            for slot in range(dus):
                xf = coeff_s[slot].astype(F32)
                for s in range(SUBLANES):
                    p = jnp.dot(
                        l_ref[slot], xf[:, s, :],
                        preferred_element_type=F32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    p = jnp.clip(p + F32(128.5), 0.0, 255.0)
                    coeff_s[slot, :, s, :] = p.astype(I32)
        else:
            # l_ref holds block-diagonal slot-PAIRED operators
            # [ceil(DUS/2), 128, 128] = diag(Lq[2p], Lq[2p+1]) with the
            # quantizer folded in (ops/luts.idct_dequant_matrices_paired).
            # Pairing fills the MXU's full 128-row tile and flattening the
            # sublanes into N=1024 columns amortizes the weight load; the
            # device trace measures it NEUTRAL vs per-slot per-sublane
            # [64,64]@[64,128] contractions (0.697 vs 0.690 ms/4K composite
            # kernel, tools/exp_trace_ablate.py) — the IDCT phase is bound
            # by the coeff-scratch relayout (i32->f32 cast + z-major ->
            # sublane-major), not MXU issue — and is kept for the simpler
            # single-dot-per-pair form. HIGHEST keeps the MXU's full f32
            # path (multi-pass bf16) so the pixel output stays within +-1
            # of the f32 golden decoder (Mosaic supports only
            # DEFAULT/HIGHEST).
            prec = {
                "highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT,
            }[precision]
            for pr in range((dus + 1) // 2):
                s0, s1 = 2 * pr, 2 * pr + 1
                xa = coeff_s[s0].astype(F32).reshape(64, SUBLANES * LANES)
                xb = (
                    coeff_s[s1].astype(F32).reshape(64, SUBLANES * LANES)
                    if s1 < dus
                    else jnp.zeros((64, SUBLANES * LANES), F32)
                )
                x2 = jnp.concatenate([xa, xb], axis=0)
                p2 = jnp.dot(
                    l_ref[pr], x2, preferred_element_type=F32, precision=prec
                )
                # In-place: pixels overwrite the coefficient scratch (the
                # reference reuses its coefficients buffer the same way,
                # src/dct.wgsl:186-201); x2 was materialized above.
                p2 = jnp.clip(p2 + F32(128.5), 0.0, 255.0).astype(I32)
                coeff_s[s0] = p2[:64].reshape(64, SUBLANES, LANES)
                if s1 < dus:
                    coeff_s[s1] = p2[64:].reshape(64, SUBLANES, LANES)

        # ---- phase 3: composite MCU -> packed RGBA -----------------------
        if _ablate == "nop23":
            # Budget probe: minimal output write (entropy phase only).
            if tiled:
                out_ref[0, 0, 0] = jnp.zeros((SUBLANES * mh, LANES), U32)
            else:
                out_ref[0, 0, 0, 0] = jnp.zeros((SUBLANES, LANES), U32)
            return
        gray = len(samplings) == 1
        ys0, yh, yv = layout[0]
        # Chroma color terms are shared by the 2 (4:2:2) or 4 (4:2:0) luma
        # pixels that sample the same chroma position; memoize per position.
        chroma_terms = {}

        def rgba_at(r, x):
            # luma slot + in-DU position (sampling-relative coordinates;
            # blk = pixels per DU side, 8 full / k scaled)
            yslot = ys0 + (r * yv // mh) * yh + (x * yh // mw)
            yp = (r * yv * blk // mh % blk) * blk + (x * yh * blk // mw % blk)
            y = coeff_s[yslot, yp]
            if gray:
                rr = gg = bb = y
            elif rgb:
                # Samples are already RGB (component IDs R,G,B): channels map
                # straight through, nearest-sampled like chroma would be.
                cs0, ch, cv = layout[1]
                cp = (r * cv * blk // mh) * blk + (x * ch * blk // mw)
                rr = y
                gg = coeff_s[cs0, cp]
                bb = coeff_s[layout[2][0], cp]
            else:
                cs0, ch, cv = layout[1]
                cslot = cs0  # chroma is 1x1 in every supported sampling
                cp = (r * cv * blk // mh) * blk + (x * ch * blk // mw)
                if cp not in chroma_terms:
                    cb = coeff_s[cslot, cp] - 128
                    cr = coeff_s[layout[2][0], cp] - 128
                    chroma_terms[cp] = (
                        (45 * cr) >> 5,
                        (11 * cb + 23 * cr) >> 5,
                        (113 * cb) >> 6,
                    )
                tr_, tg_, tb_ = chroma_terms[cp]
                rr = y + tr_
                gg = y - tg_
                bb = y + tb_
            rr = jnp.clip(rr, 0, 255)
            gg = jnp.clip(gg, 0, 255)
            bb = jnp.clip(bb, 0, 255)
            rgba = rr | (gg << 8) | (bb << 16) | jnp.int32(-16777216)
            return jax.lax.bitcast_convert_type(rgba, U32)

        if planes:
            # Per-component pixel-plane epilogue (fancy-upsampling support):
            # no in-kernel color math; each component's pixels go out as a
            # raster-tiled slab at the component's own resolution, with FOUR
            # consecutive x-pixels byte-packed per u32 (pixels are already
            # clipped to [0, 255] by phase 2) — 4x less HBM traffic through
            # the slab write, the assembly transpose, and the epilogue read
            # than int32-per-pixel slabs. The triangle-filter upsampling +
            # color conversion then run as an XLA-fused elementwise epilogue
            # over the unpacked sub-planes (finalize_fancy_planes), which the
            # in-kernel nearest-composite cannot express (it would need
            # neighboring MCUs from other lanes/blocks).
            for ci, (slot0, ch, cv) in enumerate(layout):
                wc = 8 * ch
                rows_per = 8 * cv
                for xq in range(wc // 4):
                    rows = []
                    for r in range(rows_per):
                        word = None
                        for b in range(4):
                            x = xq * 4 + b
                            px = coeff_s[
                                slot0 + (r // 8) * ch + (x // 8),
                                (r % 8) * 8 + (x % 8),
                            ]
                            px = px << (8 * b) if b else px
                            word = px if word is None else word | px
                        rows.append(jax.lax.bitcast_convert_type(word, U32))
                    # Block shape (1, RT, wq*L): word column xq goes to lane
                    # slice [xq*L, (xq+1)*L) — a vreg-column store. The
                    # out_spec index_map already places this block at its
                    # raster tile-row/column, so XLA-side assembly is only
                    # the (m,q)/lane minor swap (assemble_plane_tiled).
                    out_refs[ci][
                        0, :, xq * LANES:(xq + 1) * LANES
                    ] = jnp.stack(rows, axis=1).reshape(
                        SUBLANES * rows_per, LANES
                    )
        elif tiled:
            # Raster-tiled epilogue: for each in-MCU column x, interleave the
            # mh per-pixel-row [S, L] vectors along SUBLANES (the one
            # relayout axon Mosaic compiles well — and it measures faster
            # than a plain copy) so the stored slab's rows are raster rows
            # s*mh + r of the 8-MCU-row tile. Assembly then needs only one
            # XLA minor transpose (assemble_image_tiled).
            for x in range(mw):
                rows = [rgba_at(r, x) for r in range(mh)]
                stacked = jnp.stack(rows, axis=1).reshape(
                    SUBLANES * mh, LANES
                )
                if flat:
                    # Raster-placed block (1, RT, mw*L): the out_spec
                    # index_map puts this block at its tile position, so
                    # assembly is only the minor-pair lane swap.
                    out_ref[0, :, x * LANES:(x + 1) * LANES] = stacked
                else:
                    out_ref[0, 0, x] = stacked
        else:
            for r in range(mh):
                for x in range(mw):
                    out_ref[0, 0, r, x] = rgba_at(r, x)

    return kernel


def scaled_ops_static(qz_by_slot, k: int, retained: int = 64):
    """Compile-time scaled-IDCT operator constants for the fused kernel:
    per slot, per output pixel, the (zigzag positions, f32 weights) of the
    nonzero columns of the dequant-folded k-point operator. Hashable (pure
    tuples) so it rides the jit compile key like the Huffman tables do."""
    from .luts import scaled_idct_dequant_matrices

    Lq = scaled_idct_dequant_matrices(np.asarray(qz_by_slot), k, retained)
    out = []
    for d in range(Lq.shape[0]):
        rows = []
        for p in range(k * k):
            zzs = tuple(int(z) for z in np.nonzero(Lq[d, p])[0])
            wts = tuple(float(Lq[d, p, z]) for z in zzs)
            rows.append((zzs, wts))
        out.append(tuple(rows))
    return tuple(out)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "samplings", "retained", "interpret", "exact_idct", "tiled",
        "tiling", "precision", "rgb", "_ablate", "scale", "scaled_ops",
    ),
)
def fused_decode_blocks(
    words: jax.Array,  # [G, W, 8, 128] uint32
    seg_mcus: jax.Array,  # [G, 8, 128] int32
    idct_l: jax.Array,  # [ceil(DUS/2), 128, 128] f32 paired operators
                        # (luts.idct_dequant_matrices_paired), or int32
                        # broadcast quantizers [DUS, 64, 8, 128] when
                        # exact_idct
    plan: EntropyPlan,
    samplings: Tuple[Tuple[int, int], ...],
    retained: int = 64,
    interpret: bool = False,
    exact_idct: bool = False,
    tiled: bool = False,
    tiling: Optional[Tuple[int, int]] = None,
    precision: str = "highest",
    rgb: bool = False,
    _ablate: str = "",
    scale: int = 8,
    scaled_ops=None,
) -> jax.Array:
    """Full fused decode, packed RGBA (r | g<<8 | b<<16 | a<<24) u32.

    Returns segment-major ``[G, RI, mcu_h, mcu_w, 8, 128]`` by default, or —
    when ``tiled`` — a raster-tiled slab: with ``tiling=(n_tr, n_tc)`` the
    raster-placed form ``[n_tr, 8*mcu_h, n_tc*RI*mcu_w*128]`` (out_spec
    index_map places blocks at their tile positions; assembly is one
    minor-pair swap), else the legacy per-block form
    ``[G, RI, mcu_w, 8*mcu_h, 128]`` (kept for the A/B tools)."""
    G = plan.num_blocks
    W = plan.words_per_segment
    dus = plan.dus_per_mcu
    max_v = max(sv for _, sv in samplings)
    max_h = max(sh for sh, _ in samplings)
    mh, mw = scale * max_v, scale * max_h
    if scale != 8 and (scaled_ops is None or tiling is None):
        raise ValueError("scaled fused decode needs scaled_ops + tiling")
    # Interpret mode (tests) pays per-op tracing/execution costs; the unroll
    # only helps compiled TPU execution.
    kernel = _make_fused_kernel(plan, samplings, retained,
                                unroll=1 if interpret else 8,
                                exact_idct=exact_idct, tiled=tiled,
                                flat=tiling is not None, rgb=rgb,
                                precision=precision, _ablate=_ablate,
                                scale=scale, scaled_ops=scaled_ops)
    if tiled and tiling is not None:
        n_tr, n_tc = tiling
        if n_tr * n_tc != G:
            raise ValueError(f"tiling {tiling} does not cover {G} blocks")
        ri = plan.ri
        out_specs = pl.BlockSpec(
            (1, SUBLANES * mh, mw * LANES),
            lambda g, m: (g // n_tc, 0, (g % n_tc) * ri + m),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (n_tr, SUBLANES * mh, n_tc * plan.ri * mw * LANES), U32
        )
    elif tiled:
        out_specs = pl.BlockSpec(
            (1, 1, mw, SUBLANES * mh, LANES),
            lambda g, m: (g, m, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (G, plan.ri, mw, SUBLANES * mh, LANES), U32
        )
    else:
        out_specs = pl.BlockSpec(
            (1, 1, mh, mw, SUBLANES, LANES),
            lambda g, m: (g, m, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct(
            (G, plan.ri, mh, mw, SUBLANES, LANES), U32
        )
    in_specs = [
        pl.BlockSpec(
            (1, W, SUBLANES, LANES), lambda g, m: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, SUBLANES, LANES), lambda g, m: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [words, seg_mcus, idct_l]
    if exact_idct:
        from .int_idct import mxu_operators

        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(jnp.asarray(mxu_operators(), dtype=jnp.bfloat16))
    return pl.pallas_call(
        kernel,
        grid=(G, plan.ri),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((dus, 64, SUBLANES, LANES), I32),
            pltpu.VMEM((SUBLANES, LANES), U32),
            pltpu.VMEM((SUBLANES, LANES), U32),
            pltpu.VMEM((SUBLANES, LANES), I32),
            pltpu.VMEM((SUBLANES, LANES), I32),
            pltpu.VMEM((3, SUBLANES, LANES), I32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("geom",))
def assemble_image(blocks: jax.Array, geom) -> jax.Array:
    """Segment-major RGBA blocks -> raster ``[H, W]`` u32 image."""
    if geom.tiling is not None:
        return assemble_image_tiled(blocks, geom)
    G, RI, mh, mw, S, L = blocks.shape
    # MCU index = (g*1024 + sub*128 + lane) * RI + m.
    x = blocks.transpose(0, 4, 5, 1, 2, 3).reshape(G * S * L * RI, mh, mw)
    hm, wm = geom.height_mcus, geom.width_mcus
    x = x[: hm * wm].reshape(hm, wm, mh, mw).transpose(0, 2, 1, 3)
    img = x.reshape(hm * mh, wm * mw)
    return img[: geom.height, : geom.width]


def assemble_image_tiled(slabs: jax.Array, geom) -> jax.Array:
    """Raster-tiled kernel slabs -> raster ``[H, W]`` packed RGBA u32.

    Raster-placed 3-d slabs ``[n_tr, RT, n_tc*RI*mw*L]`` (fused_decode_blocks
    with ``tiling``) need only the per-tile-column ``(RI*mw, lane)``
    minor-pair swap + crop — the out_spec index_map already did the tile
    placement. Legacy 5-d slabs ``[G, RI, mw, RT, L]`` take the round-2
    6-dim strided transpose (kept for the A/B tools).

    Raster row = tr*RT + rt; col = ((tc*128 + lane)*RI + m)*mw + x.
    """
    if slabs.ndim == 3:
        n_tr, RT, M = slabs.shape
        n_tc = geom.tiling[1]
        rimw = M // (n_tc * LANES)
        z = slabs.reshape(n_tr * RT, n_tc, rimw, LANES)
        img = z.swapaxes(2, 3).reshape(n_tr * RT, M)
        return img[: geom.height, : geom.width]
    G, RI, mw, RT, L = slabs.shape
    n_tr, n_tc = geom.tiling
    z = slabs.reshape(n_tr, n_tc, RI, mw, RT, L)
    z = z.transpose(0, 4, 1, 5, 2, 3)  # [n_tr, RT, n_tc, L, RI, mw]
    img = z.reshape(n_tr * RT, n_tc * L * RI * mw)
    return img[: geom.height, : geom.width]


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "samplings", "tiling", "retained", "interpret", "exact_idct",
        "precision",
    ),
)
def fused_decode_planes(
    words: jax.Array,  # [G, W, 8, 128] uint32
    seg_mcus: jax.Array,  # [G, 8, 128] int32
    idct_l: jax.Array,
    plan: EntropyPlan,
    samplings: Tuple[Tuple[int, int], ...],
    tiling: Tuple[int, int],
    retained: int = 64,
    interpret: bool = False,
    exact_idct: bool = False,
    precision: str = "highest",
) -> Tuple[jax.Array, ...]:
    """Fused decode to per-component pixel planes (raster-placed slabs).

    Returns one uint32 slab ``[n_tr, SUBLANES*8*v, n_tc*RI*2*h*128]`` per
    component. ``tiling = (n_tr, n_tc)`` is the raster tile grid (blocks are
    (tr, tc) row-major, so ``n_tr * n_tc == plan.num_blocks``). Rows are
    raster rows at the component's resolution; the minor dim nests
    ``(tc, m, q, lane)`` with each u32 byte-packing 4 consecutive x-pixels
    (byte ``b`` = pixel ``4q+b``). The out_spec index_map places every
    (block, MCU) directly at its raster tile position, so host-side assembly
    (assemble_plane_tiled) is a single (RI*wq, lane) minor-pair swap + crop
    instead of round 2's 6-dim strided transpose. Requires the raster-tiled
    slot assignment. This is the fast path for fancy (triangle-filter)
    chroma upsampling, which needs raster-space neighbors and therefore
    cannot composite in-kernel."""
    G = plan.num_blocks
    W = plan.words_per_segment
    dus = plan.dus_per_mcu
    n_tr, n_tc = tiling
    if n_tr * n_tc != G:
        raise ValueError(f"tiling {tiling} does not cover {G} blocks")
    kernel = _make_fused_kernel(plan, samplings, retained,
                                unroll=1 if interpret else 8,
                                exact_idct=exact_idct, tiled=True,
                                planes=True, precision=precision)
    ri = plan.ri

    def _index_map(g, m):
        return (g // n_tc, 0, (g % n_tc) * ri + m)

    out_specs = []
    out_shape = []
    for (h, v) in samplings:
        out_specs.append(
            pl.BlockSpec(
                (1, SUBLANES * 8 * v, 2 * h * LANES),
                _index_map,
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct(
                (n_tr, SUBLANES * 8 * v, n_tc * ri * 2 * h * LANES), U32
            )
        )
    in_specs = [
        pl.BlockSpec(
            (1, W, SUBLANES, LANES), lambda g, m: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, SUBLANES, LANES), lambda g, m: (g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    operands = [words, seg_mcus, idct_l]
    if exact_idct:
        from .int_idct import mxu_operators

        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(jnp.asarray(mxu_operators(), dtype=jnp.bfloat16))
    return pl.pallas_call(
        kernel,
        grid=(G, plan.ri),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((dus, 64, SUBLANES, LANES), I32),
            pltpu.VMEM((SUBLANES, LANES), U32),
            pltpu.VMEM((SUBLANES, LANES), U32),
            pltpu.VMEM((SUBLANES, LANES), I32),
            pltpu.VMEM((SUBLANES, LANES), I32),
            pltpu.VMEM((3, SUBLANES, LANES), I32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)


def assemble_plane_tiled(slab: jax.Array, geom, sh: int, sv: int) -> jax.Array:
    """One component's raster-placed slab -> its raster plane (component
    res, 4 x-pixels byte-packed per u32 element).

    The kernel's out_spec already placed rows/tile-columns at raster
    positions (fused_decode_planes), so the only data movement left is the
    per-tile-column ``(RI*wq, lane)`` minor-pair swap hoisting the lane
    (segment) index above the in-segment word index. The crop is to the
    component's *content* size (``height_mcus*8*v`` x ``width_mcus*8*h / 4``
    packed words — always integral since MCU columns are 8 or 16 pixels) so
    the triangle filter's edge clamping sees the same boundary samples as
    the staged path (ops/color.finalize_rgb)."""
    n_tr, RT, M = slab.shape
    n_tc = geom.tiling[1]
    riwq = M // (n_tc * LANES)
    z = slab.reshape(n_tr * RT, n_tc, riwq, LANES)
    z = z.swapaxes(2, 3)  # [rows, n_tc, L, RI*wq]
    img = z.reshape(n_tr * RT, M)
    return img[: geom.height_mcus * 8 * sv, : geom.width_mcus * 8 * sh // 4]


def _upsample_fancy_v_sharded(
    p: jax.Array,  # [shard_rows, W] int32, one unpacked sub-plane
    seq_axis: str,
    rows_per_mcu_row: int,
    v_rows: Tuple[int, int],  # (total content MCU rows, MCU rows per shard)
) -> jax.Array:
    """Vertical x2 triangle-filter upsampling across shard boundaries.

    The neighbor rows adjacent to this shard's band arrive over ICI
    (``jax.lax.ppermute`` ring shifts — the halo exchange of SURVEY.md §5).
    Bands cover the image's MCU rows in order, so any padding rows (bands
    past the image bottom, or a partial last band) form a SUFFIX of the
    global row space; the ``limit`` mask clamps the filter at the content
    edge exactly like the single-chip edge clamp, so garbage rows never
    bleed into real pixels (they still produce garbage output rows, which
    the caller crops)."""
    n = jax.lax.axis_size(seq_axis)
    idx = jax.lax.axis_index(seq_axis)
    total_mr, shard_mr = v_rows
    shard = shard_mr * rows_per_mcu_row  # == p.shape[0]
    total = total_mr * rows_per_mcu_row
    start = idx * shard
    valid = jnp.clip(total - start, 0, shard)
    content_below = (total - start > shard).astype(jnp.int32)

    perm_down = [(i, (i + 1) % n) for i in range(n)]
    perm_up = [(i, (i - 1) % n) for i in range(n)]
    from_above = jax.lax.ppermute(p[-1], seq_axis, perm_down)
    from_below = jax.lax.ppermute(p[0], seq_axis, perm_up)
    top = jnp.where(idx == 0, p[0], from_above)
    above = jnp.concatenate([top[None], p[:-1]], axis=0)
    below = jnp.concatenate([p[1:], from_below[None]], axis=0)
    # Rows at/past the content edge clamp to themselves (libjpeg edge rule).
    iota = jnp.arange(p.shape[0], dtype=jnp.int32)[:, None]
    below = jnp.where(iota < valid - 1 + content_below, below, p)
    even = (3 * p + above + 1) >> 2
    odd = (3 * p + below + 2) >> 2
    h, w = p.shape
    return jnp.stack([even, odd], axis=1).reshape(2 * h, w)


def _finalize_planes_nearest_packed(
    planes, samplings, width, height, rgb, max_h, max_v
) -> jax.Array:
    """Nearest-neighbor epilogue over byte-packed planes with the chroma
    repeat done ONCE per component at word level (one broadcast+reshape),
    followed by per-lane vector-shift byte extraction that XLA fuses into
    the color/interleave output pass. Bit-identical to the sub-plane
    formulation in finalize_planes (same integer arithmetic; only the
    order of the repeat vs the byte unpack changes)."""
    ys = [
        (jax.lax.shift_right_logical(planes[0], U32(8 * b)) & U32(0xFF))
        .astype(jnp.int32)
        for b in range(4)
    ]
    Wy = ys[0].shape[1]

    def chroma_grid(plane, sh, sv):
        f = max_h // sh
        fy = max_v // sv
        H, Wc = plane.shape
        p = plane
        if f > 1 or fy > 1:
            # One fused repeat over both axes: luma-grid word (r, w) reads
            # chroma word (r // fy, w // f).
            p = jnp.broadcast_to(
                p[:, None, :, None], (H, fy, Wc, f)
            ).reshape(H * fy, Wc * f)
        if f == 2:
            # Byte index within the repeated word: (w % 2) * 2 + b // 2.
            sh16 = ((jnp.arange(Wy, dtype=U32) & U32(1)) * U32(16))[None, :]
            return [
                (jax.lax.shift_right_logical(p, sh16 + U32(8 * (b // 2)))
                 & U32(0xFF)).astype(jnp.int32)
                for b in range(4)
            ]
        if f == 4:
            # 4:1:1 replication: byte w % 4, independent of b.
            sh8 = ((jnp.arange(Wy, dtype=U32) & U32(3)) * U32(8))[None, :]
            v = (jax.lax.shift_right_logical(p, sh8) & U32(0xFF)).astype(
                jnp.int32
            )
            return [v] * 4
        return [
            (jax.lax.shift_right_logical(p, U32(8 * b)) & U32(0xFF))
            .astype(jnp.int32)
            for b in range(4)
        ]

    cbs = chroma_grid(planes[1], *samplings[1])
    crs = chroma_grid(planes[2], *samplings[2])
    rgba_subs = []
    for y, cb, cr in zip(ys, cbs, crs):
        if rgb:
            r, g, b = y, cb, cr
        else:
            cb = cb - 128
            cr = cr - 128
            r = jnp.clip(y + ((45 * cr) >> 5), 0, 255)
            g = jnp.clip(y - ((11 * cb + 23 * cr) >> 5), 0, 255)
            b = jnp.clip(y + ((113 * cb) >> 6), 0, 255)
        rgba_subs.append(r | (g << 8) | (b << 16) | jnp.int32(-16777216))
    hq, wq = rgba_subs[0].shape
    img = jnp.stack(rgba_subs, axis=2).reshape(hq, wq * 4)
    return jax.lax.bitcast_convert_type(img[:height, :width], U32)


def _finalize_planes_fancy422_packed(
    planes, samplings, width, height, rgb
) -> jax.Array:
    """Fancy (triangle-filter) 4:2:2 epilogue on the packed word grid —
    the horizontal-only analogue of :func:`_finalize_planes_nearest_packed`.

    Identical integer arithmetic to the sub-plane formulation (libjpeg
    triangle filter: even x blends the nearest chroma sample with its LEFT
    neighbor as ``(3c + l + 1) >> 2``, odd x with its RIGHT as
    ``(3c + r + 2) >> 2``, plane-edge clamped), but the chroma is repeated
    ONCE per component at word level and the main/neighbor samples are
    extracted with per-lane vector shifts — 3 materializations per
    component (repeat + two one-column shifts) instead of the sub-plane
    path's 4 repeats + edge concats per output byte.

    Byte algebra (luma word w, byte b; chroma sample s = 2w + b//2;
    R[:, w] = packed chroma word w//2, so R repeats in column pairs and
    packed[w//2 - 1] = R[:, w-1] for even w):
      main:        byte (w%2)*2 + b//2 of R[w]
      left  (b=0): even w: byte 3 of R[w-1] (w=0 clamps to sample 0);
                   odd  w: byte 1 of R[w]
      left  (b=2): byte (w%2)*2 of R[w]
      right (b=1): byte (w%2)*2 + 1 of R[w]
      right (b=3): even w: byte 2 of R[w];
                   odd  w: byte 0 of R[w+1] (last w clamps to last sample)
    """
    ys = [
        (jax.lax.shift_right_logical(planes[0], U32(8 * b)) & U32(0xFF))
        .astype(jnp.int32)
        for b in range(4)
    ]
    Wy = ys[0].shape[1]
    col = jnp.arange(Wy, dtype=jnp.int32)[None, :]
    sh16 = ((jnp.arange(Wy, dtype=U32) & U32(1)) * U32(16))[None, :]
    weven = (col & 1) == 0

    def chroma_grid(plane):
        H, Wc = plane.shape
        R = jnp.broadcast_to(plane[:, :, None], (H, Wc, 2)).reshape(H, Wy)
        Rl = jnp.concatenate([R[:, :1], R[:, :-1]], axis=1)
        Rr = jnp.concatenate([R[:, 1:], R[:, -1:]], axis=1)

        def byte(a, k):
            return ((a >> U32(8 * k)) & U32(0xFF)).astype(jnp.int32)

        def vbyte(a, sh):
            return (jax.lax.shift_right_logical(a, sh) & U32(0xFF)).astype(
                jnp.int32
            )

        out = []
        for b in range(4):
            main = vbyte(R, sh16 + U32(8 * (b // 2)))
            if b == 0:
                nb = jnp.where(weven, byte(Rl, 3), byte(R, 1))
                nb = jnp.where(col == 0, byte(R, 0), nb)
                out.append((3 * main + nb + 1) >> 2)
            elif b == 2:
                nb = vbyte(R, sh16)
                out.append((3 * main + nb + 1) >> 2)
            elif b == 1:
                nb = vbyte(R, sh16 + U32(8))
                out.append((3 * main + nb + 2) >> 2)
            else:  # b == 3
                nb = jnp.where(weven, byte(R, 2), byte(Rr, 0))
                nb = jnp.where(col == Wy - 1, byte(R, 3), nb)
                out.append((3 * main + nb + 2) >> 2)
        return out

    cbs = chroma_grid(planes[1])
    crs = chroma_grid(planes[2])
    rgba_subs = []
    for y, cb, cr in zip(ys, cbs, crs):
        if rgb:
            r, g, b = y, cb, cr
        else:
            cb = cb - 128
            cr = cr - 128
            r = jnp.clip(y + ((45 * cr) >> 5), 0, 255)
            g = jnp.clip(y - ((11 * cb + 23 * cr) >> 5), 0, 255)
            b = jnp.clip(y + ((113 * cb) >> 6), 0, 255)
        rgba_subs.append(r | (g << 8) | (b << 16) | jnp.int32(-16777216))
    hq, wq = rgba_subs[0].shape
    img = jnp.stack(rgba_subs, axis=2).reshape(hq, wq * 4)
    return jax.lax.bitcast_convert_type(img[:height, :width], U32)


def finalize_planes(
    planes: Tuple[jax.Array, ...],
    samplings: Tuple[Tuple[int, int], ...],
    width: int,
    height: int,
    fancy: bool = True,
    rgb: bool = False,
    seq_axis: Optional[str] = None,
    v_rows: Optional[Tuple[int, int]] = None,
) -> jax.Array:
    """Chroma upsample + BT.601 over byte-packed raster planes -> packed
    RGBA u32 ``[H, W]``. ``fancy=True`` is the libjpeg triangle filter
    (identical integer arithmetic to the staged path, ops/color.finalize_rgb
    with fancy=True); ``fancy=False`` is the reference's nearest-neighbor
    sampling (src/dct.wgsl:302-313), bit-identical to the in-kernel
    composite path.

    Each input plane packs 4 x-pixels per u32 (byte ``b`` = column ``4q+b``,
    from :func:`assemble_plane_tiled`). Upsampling runs on the 4 unpacked
    sub-planes — neighbor columns live in adjacent sub-planes, so every step
    stays elementwise: chroma is mapped onto the luma word grid with column
    repeats + word-parity selects (NOT by re-striding luma, which lowers to
    XLA gathers on the tiled layout), and XLA fuses the unpack, filter,
    color convert, and the final 4-way interleave into the output pass."""
    from . import color as C

    max_h = max(s[0] for s in samplings)
    max_v = max(s[1] for s in samplings)

    if (
        fancy
        and len(planes) > 1
        and samplings[1] == samplings[2]
        and max_h // samplings[1][0] == 2
        and max_v // samplings[1][1] == 1
    ):
        # Fancy 4:2:2 (horizontal-only triangle filter) on the packed grid.
        return _finalize_planes_fancy422_packed(
            planes, samplings, width, height, rgb
        )

    if not fancy and len(planes) > 1 and (
        max_h // samplings[1][0] > 1 or max_v // samplings[1][1] > 1
    ):
        # Nearest-neighbor chroma on the PACKED word grid: the sub-plane
        # formulation below materializes 4 repeated arrays per chroma
        # component (XLA does not fuse the column repeat into the output
        # pass — 8 broadcast+reshape materializations, ~0.1 ms/4K frame).
        # Instead repeat each chroma plane ONCE at word level (luma word w
        # maps to chroma word w//fx) and extract the per-output-byte sample
        # with a per-lane vector shift — pure elementwise on the repeated
        # words, which fuses into the final color/interleave pass:
        #   fx=2: pixel x=4w+b reads sample 2w + b//2 = byte (w%2)*2 + b//2
        #         of chroma word w//2 -> shift (w%2)*16 + (b//2)*8.
        #   fx=4: pixel x=4w+b reads sample w = byte w%4 of word w//4
        #         -> shift (w%4)*8, independent of b.
        return _finalize_planes_nearest_packed(
            planes, samplings, width, height, rgb, max_h, max_v
        )

    comps = []
    for plane, (sh, sv) in zip(planes, samplings):
        subs = [
            (jax.lax.shift_right_logical(plane, U32(8 * b)) & U32(0xFF))
            .astype(jnp.int32)
            for b in range(4)
        ]
        if max_v // sv > 1:
            if fancy and seq_axis is not None:
                # Sharded: boundary rows arrive over ICI, content-edge
                # clamped (see _upsample_fancy_v_sharded).
                subs = [
                    _upsample_fancy_v_sharded(s, seq_axis, 8 * sv, v_rows)
                    for s in subs
                ]
            elif fancy:
                subs = [C.upsample_fancy_v(s) for s in subs]
            else:
                subs = [jnp.repeat(s, 2, axis=0) for s in subs]
        comps.append(subs)

    if len(comps) == 1:
        ys = comps[0]
        rgba_subs = []
        for y in ys:
            y = jnp.clip(y, 0, 255)
            rgba_subs.append(y | (y << 8) | (y << 16) | jnp.int32(-16777216))
    else:
        # The luma sub-planes stay on their natural stride-4 grid and the
        # CHROMA is mapped onto it — never the other way around: re-striding
        # luma ([:, c//4::fx]) lowers to XLA gathers on the tiled TPU layout
        # (8 kCustom gather fusions + index plumbing, ~55us/4K frame,
        # r3 HLO dump). Chroma-to-luma mapping is pure elementwise: output
        # x = 4w+b (luma word w = 2q+p, byte b) reads chroma sample
        # s = x//fx = 4q + 2p + b//2 (fx=2), i.e. chroma sub 2p + b//2 at
        # word q — a column 2x-repeat plus ONE select on the word parity p.
        fx = max_h // samplings[1][0]
        ys = comps[0]
        Wy = ys[0].shape[1]

        def rep(a, f):
            return jnp.repeat(a, f, axis=1)

        if fx == 2:
            wpar = (jnp.arange(Wy, dtype=jnp.int32) & 1)[None, :]

            def to_luma_grid(subs):
                if not fancy:
                    return [
                        jnp.where(wpar == 0,
                                  rep(subs[b // 2], 2),
                                  rep(subs[2 + b // 2], 2))
                        for b in range(4)
                    ]
                # libjpeg triangle filter: even output x blends the nearest
                # sample with its LEFT neighbor ((3*c + l + 1) >> 2), odd x
                # with its RIGHT ((3*c + r + 2) >> 2); x parity == b parity.
                # Neighbor sub/word indices are static per (b, p); the word
                # borrow/carry at sample 4q-1 / 4q+4 is an edge-clamped
                # column shift (clamp value = true first/last sample).
                out = []
                for b in range(4):
                    t0 = b // 2
                    main = jnp.where(wpar == 0,
                                     rep(subs[t0], 2),
                                     rep(subs[2 + t0], 2))
                    if b % 2 == 0:
                        a0 = (
                            jnp.concatenate(
                                [subs[0][:, :1], subs[3][:, :-1]], axis=1
                            )
                            if t0 == 0
                            else subs[t0 - 1]
                        )
                        nb = jnp.where(wpar == 0, rep(a0, 2),
                                       rep(subs[t0 + 1], 2))
                        out.append((3 * main + nb + 1) >> 2)
                    else:
                        a1 = (
                            jnp.concatenate(
                                [subs[0][:, 1:], subs[3][:, -1:]], axis=1
                            )
                            if t0 == 1
                            else subs[t0 + 3]
                        )
                        nb = jnp.where(wpar == 0, rep(subs[t0 + 1], 2),
                                       rep(a1, 2))
                        out.append((3 * main + nb + 2) >> 2)
                return out

            cbs, crs = to_luma_grid(comps[1]), to_luma_grid(comps[2])
        elif fx == 4:
            # 4:1:1 is sample replication even in fancy mode — libjpeg's
            # fancy upsampler is defined only for 2x ratios (jdsample.c
            # routes everything else to int_upsample). s = x//4 = w:
            # chroma sub w%4 at word w//4, independent of b.
            wm4 = (jnp.arange(Wy, dtype=jnp.int32) & 3)[None, :]

            def to_luma_grid(subs):
                v = rep(subs[0], 4)
                for k in range(1, 4):
                    v = jnp.where(wm4 == k, rep(subs[k], 4), v)
                return [v] * 4

            cbs, crs = to_luma_grid(comps[1]), to_luma_grid(comps[2])
        else:
            cbs, crs = comps[1], comps[2]
        rgba_subs = []
        for y, cb, cr in zip(ys, cbs, crs):
            if rgb:
                # Samples already RGB (component IDs R,G,B): no transform.
                r, g, b = y, cb, cr
            else:
                cb = cb - 128
                cr = cr - 128
                r = jnp.clip(y + ((45 * cr) >> 5), 0, 255)
                g = jnp.clip(y - ((11 * cb + 23 * cr) >> 5), 0, 255)
                b = jnp.clip(y + ((113 * cb) >> 6), 0, 255)
            rgba_subs.append(r | (g << 8) | (b << 16) | jnp.int32(-16777216))

    stride = len(rgba_subs)
    hq, wq = rgba_subs[0].shape
    img = jnp.stack(rgba_subs, axis=2).reshape(hq, wq * stride)
    return jax.lax.bitcast_convert_type(img[:height, :width], U32)


# Backwards-compatible alias (fancy epilogue).
finalize_fancy_planes = finalize_planes


def rgba_to_rgb_array(img_u32: np.ndarray) -> np.ndarray:
    """[H, W] u32 packed -> [H, W, 3] u8 (host-side view/cast)."""
    v = np.asarray(img_u32)
    if not v.flags.c_contiguous:
        # np.asarray on a device array can be a zero-copy strided view when
        # XLA picked a transposed HBM layout; the u8 view needs the last
        # axis contiguous.
        v = np.ascontiguousarray(v)
    return v.view(np.uint8).reshape(v.shape + (4,))[..., :3]
