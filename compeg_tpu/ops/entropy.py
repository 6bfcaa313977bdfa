"""Restart-segment-parallel Huffman entropy decode as a Pallas TPU kernel.

This is the TPU answer to the reference's ``huffman.wgsl`` compute shader
(one GPU thread per restart interval, divergent per-thread bit readers and
LUT walks; src/huffman.wgsl:116-216). TPU vector lanes execute in lockstep
and cannot gather from per-lane addresses, so the kernel is built from three
ideas that remove every memory-indexed lookup:

1. **Lane-per-segment, DU-synchronized stepping.** Each grid block decodes
   1024 restart segments (vector shape ``(8, 128)``); every lane works on the
   *same* DU slot of its own segment at the same time, so the component — and
   therefore the Huffman table and quantization table — is a compile-time
   constant at every step. There is no per-lane table selection anywhere.

2. **Canonical-limit arithmetic instead of a code LUT.** The code length of
   the peeked 16 bits is ``1 + sum(c16 >= limits[L])`` over the table's
   populated lengths — pure vector compares against scalar constants
   (see huffman.py). The symbol value is fetched from the table's packed
   value words with a short select tree plus a per-lane dynamic-shift
   extract — the only "lookup" primitive the VPU gives us.

3. **Symbol-synchronous commit loop.** Instead of each lane running its
   own data-dependent AC loop (the reference's divergence problem,
   TODO.txt:3-5), every iteration decodes one AC symbol on every
   still-active lane and masked-stores the coefficient at its (divergent)
   zigzag row; lane liveness is folded into the position encoding and the
   advance is uniform (``decode_mcu_coefficients`` — the same loop the
   fused kernel runs; r5 replaced this kernel's original
   position-synchronized walk with it, 2.35 -> 0.38 ms on the 4K stream).

The output is **raw** (still-quantized) coefficients in zigzag order, laid
out ``[G, RI, DUS, 64, 8, 128]`` so that the downstream dequant + IDCT stage
contracts the 64-axis directly on the MXU with zero reshuffling.
Dequantization happens there (folded into the IDCT input), unlike the
reference which fuses it here (src/huffman.wgsl:171,195) — on TPU the fusion
point is the matmul, not the decode loop.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..huffman import CanonicalTable
from ..scan import LANES, SUBLANES

SEGS = SUBLANES * LANES  # segments per grid block

U32 = jnp.uint32
I32 = jnp.int32


@dataclass(frozen=True)
class TableConsts:
    """Compile-time constants for one Huffman table (see huffman.py)."""

    limits: Tuple[int, ...]  # 17 entries
    delta: Tuple[int, ...]  # 17 entries
    value_words: Tuple[int, ...]  # packed 4x8-bit values per u32
    max_len: int
    num_values: int

    @staticmethod
    @functools.lru_cache(maxsize=256)
    def from_table(t: CanonicalTable) -> "TableConsts":
        nwords = (t.num_values + 3) // 4
        # Stored as signed i32 (two's complement) so they broadcast into
        # int32 vector ops directly.
        words = tuple(
            int(w) - (1 << 32) if int(w) >= (1 << 31) else int(w)
            for w in t.value_words(pad_to=nwords)
        )
        return TableConsts(t.limits, t.delta, words, t.max_len, t.num_values)


@dataclass(frozen=True)
class EntropyPlan:
    """Static decode geometry + tables; the kernel compile key."""

    ri: int  # MCUs per restart interval
    du_to_comp: Tuple[int, ...]  # DU slot -> component
    words_per_segment: int
    num_blocks: int  # G
    total_mcus: int
    dc: Tuple[TableConsts, ...]  # per component
    ac: Tuple[TableConsts, ...]  # per component
    # Compeg-compat ZRL: advance 17 positions per ZRL like the reference
    # (src/huffman.wgsl:182-185: pos += 16 plus the loop's pos++) instead of
    # the spec/libjpeg 16. Lets decodes be checked bit-exact against the
    # reference's kernel semantics on ZRL-bearing streams (PARITY.md).
    zrl17: bool = False

    @property
    def dus_per_mcu(self) -> int:
        return len(self.du_to_comp)


# ---------------------------------------------------------------------------
# Vectorized bit-window primitives. The window is 64 bits held MSB-aligned in
# (hi, lo) u32 pairs with `nbits` valid bits; same scheme as the reference's
# bit reader (src/huffman.wgsl:35-79) but as (8, 128) lane vectors, and with
# no byte swap (the host packs words MSB-first).
# ---------------------------------------------------------------------------


def _refill(words, hi, lo, nbits, widx, wmax, mask=None):
    """Top the window up to >=32 bits, fetching each lane's next word via a
    masked select over the block's word rows (lanes cannot gather).
    ``mask`` excludes inactive lanes entirely."""
    need = nbits < 32
    if mask is not None:
        need = need & mask
    wi = jnp.minimum(widx, wmax - 1)
    # Word fetch as a bit-test mux tree over the block's word rows: one
    # compare per level (shared by every select at that level) instead of a
    # wi == k compare per row — ~half the vector ops of the linear chain.
    nodes = list(words)
    bit = 0
    while len(nodes) > 1:
        cond = (wi & (1 << bit)) != 0
        nxt = []
        for i in range(0, len(nodes) - 1, 2):
            nxt.append(jnp.where(cond, nodes[i + 1], nodes[i]))
        if len(nodes) % 2:
            nxt.append(nodes[-1])
        nodes = nxt
        bit += 1
    w = jnp.where(need, nodes[0], jnp.zeros_like(hi))
    nb = jnp.minimum(nbits, 31).astype(U32)
    hi = hi | (w >> nb)
    lo = lo | ((w << 1) << (31 - nb))
    widx = widx + need.astype(I32)
    nbits = nbits + jnp.where(need, 32, 0)
    return hi, lo, nbits, widx


def _consume(hi, lo, nbits, n):
    """Advance by n (<=31) bits per lane."""
    nu = n.astype(U32)
    hi = (hi << nu) | ((lo >> 1) >> (31 - nu))
    lo = lo << nu
    return hi, lo, nbits - n


def _peek(hi, n):
    """Next n (<=16) bits per lane; n may be 0."""
    return (hi >> 1) >> (31 - n.astype(U32))


def _decode_code(tc: TableConsts, hi):
    """Canonical Huffman decode of the code at the window top.

    Returns (value u8, code length) as i32 vectors; pure arithmetic on
    compile-time table constants.
    """
    c16 = (hi >> 16).astype(I32)
    # Code length + value-table offset in ONE compare pass. The canonical
    # limits are monotone and an empty length reuses the previous bound
    # (huffman.py:_build_table_cached), so compares within a run of equal
    # limits are identical: one compare per *distinct* limit decides the
    # whole run. Each fired run contributes its length increment and the
    # telescoped delta step delta[b+1]-delta[a] packed into a single
    # constant (delta*32 + run; total run sum <= 15 so 5 bits suffice and
    # the bitwise unpack is exact for negative deltas in two's complement).
    # ~40% fewer vector ops than the separate length compare-sum + delta
    # select chain this replaces.
    acc = jnp.zeros_like(c16)
    j = 1
    while j < tc.max_len:
        a = j
        while j + 1 < tc.max_len and tc.limits[j + 1] == tc.limits[a]:
            j += 1
        run = j - a + 1
        dd = tc.delta[j + 1] - tc.delta[a]
        acc = acc + jnp.where(c16 >= tc.limits[a], dd * 32 + run, 0)
        j += 1
    ln = 1 + (acc & 31)
    delta = tc.delta[1] + jax.lax.shift_right_arithmetic(acc, 5)
    # Symbol ordinal: (c16 >> (16 - ln)) + delta[ln].
    k = jax.lax.shift_right_logical(c16, 16 - ln)
    k = jnp.clip(k + delta, 0, tc.num_values - 1)
    # Value fetch: packed-word mux tree (conditions shared per level) then a
    # per-lane dynamic-shift byte extract.
    wsel = k >> 2
    nodes = list(tc.value_words)
    bit = 0
    while len(nodes) > 1:
        cond = (wsel & (1 << bit)) != 0
        nxt = []
        for i in range(0, len(nodes) - 1, 2):
            a, b = nodes[i], nodes[i + 1]
            if isinstance(a, int) and isinstance(b, int) and a == b:
                nxt.append(a)
            else:
                nxt.append(jnp.where(cond, b, a))
        if len(nodes) % 2:
            nxt.append(nodes[-1])
        nodes = nxt
        bit += 1
    vw = nodes[0] if not isinstance(nodes[0], int) else jnp.full_like(c16, nodes[0])
    value = jax.lax.shift_right_logical(vw, (k & 3) * 8) & 0xFF
    return value, ln


def _extend(v, s):
    """T.81 EXTEND: v (s magnitude bits, unsigned) -> signed coefficient.
    s == 0 yields 0 without a special case (vt == 0 makes the branch false
    and v is already 0)."""
    vi = v.astype(I32)
    vt = jax.lax.shift_right_logical(jax.lax.shift_left(jnp.ones_like(vi), s), 1)
    neg = vi - jax.lax.shift_left(jnp.ones_like(vi), s) + 1
    return jnp.where(vi < vt, neg, vi)


# ---------------------------------------------------------------------------
# Shared per-DU decode steps (used by this kernel AND ops/fused.py — one
# implementation of the bit-window + Huffman + DC flow, two AC commit
# strategies on top).
# ---------------------------------------------------------------------------


def make_symbol_decoder(words, W):
    """Build the per-step symbol decoder over a block's word rows.

    The returned ``decode_symbol(tc, hi, lo, nbits, widx, mask, nmag)``
    refills the window, canonically decodes one code, and extracts the
    ``nmag(value)``-bit magnitude at window offset ``ln``, consuming
    code+magnitude in a single advance. Masked lanes neither fetch nor
    consume."""

    def decode_symbol(tc, hi, lo, nbits, widx, mask, nmag):
        hi, lo, nbits, widx = _refill(words, hi, lo, nbits, widx, W, mask)
        value, ln = _decode_code(tc, hi)
        s = nmag(value)
        # Magnitude bits live at window offset ln: shift them down and
        # mask. ln + s <= 31 so a single consume covers both.
        mag = jax.lax.shift_right_logical(
            hi, (32 - (ln + s)).astype(U32)
        ).astype(I32) & (jax.lax.shift_left(jnp.ones_like(s), s) - 1)
        hi, lo, nbits = _consume(hi, lo, nbits, jnp.where(mask, ln + s, 0))
        return value, s, mag, hi, lo, nbits, widx

    return decode_symbol


def decode_dc(decode_symbol, dctab, dp_s, comp, act, hi, lo, nbits, widx):
    """One DU's DC coefficient: category + EXTEND + predictor update.

    The DC magnitude clamp to 15 bits keeps corrupt tables from driving the
    combined consume past 31 bits (legal 8-bit baseline categories are <=11).
    Returns the committed DC value (predictor, masked to active lanes)."""
    _, ssss, v, hi, lo, nbits, widx = decode_symbol(
        dctab, hi, lo, nbits, widx, act, lambda val: jnp.minimum(val, 15)
    )
    diff = _extend(v, ssss)
    dp = dp_s[comp] + jnp.where(act, diff, 0)
    dp_s[comp] = dp
    return jnp.where(act, dp, 0), hi, lo, nbits, widx


def decode_mcu_coefficients(
    plan: EntropyPlan,
    decode_symbol,
    set_row,
    ac_store_ref,
    dp_s,
    act,
    hi,
    lo,
    nbits,
    widx,
    unroll: int = 8,
    _ablate: str = "",
):
    """Decode ONE MCU's coefficients — the shared phase-1 loop of the fused
    kernel and the staged entropy kernel (one implementation, two output
    targets).

    ``set_row(slot, row, vec)`` writes a dense ``[8, 128]`` coefficient row;
    ``ac_store_ref(slot)`` returns the ``(64, 8, 128)`` ref the AC loop
    masked-stores into. Returns the advanced bit-window state.

    AC loop, symbol-synchronous: every iteration decodes one AC symbol on
    every still-active lane and masked-stores the coefficient at its
    (divergent) zigzag row. Iteration count is the max *symbol count* over
    the block — ~2.7x fewer iterations than walking positions, at the price
    of a 64-row masked store. Lane liveness is folded into the position
    (pos >= 63 = finished; padding lanes start at 64) and the advance is
    uniform (ZRL = rrrr 15, s 0 skips rrrr + 1 = 16 like a (run, size)
    commit; only EOB/invalid jump to 64) — see r4 notes in RESULTS.md."""
    iota_z = jax.lax.broadcasted_iota(I32, (64, SUBLANES, LANES), 0)
    for slot, comp in enumerate(plan.du_to_comp):
        dctab = plan.dc[comp]
        actab = plan.ac[comp]

        dc, hi, lo, nbits, widx = decode_dc(
            decode_symbol, dctab, dp_s, comp, act, hi, lo, nbits, widx
        )
        set_row(slot, 0, dc)

        def step(state):
            pos, hi, lo, nbits, widx = state
            mask = pos < 63
            value, s, v, hi, lo, nbits, widx = decode_symbol(
                actab, hi, lo, nbits, widx, mask, lambda val: val & 0xF
            )
            rrrr = jax.lax.shift_right_logical(value, 4)
            coeff = _extend(v, s)
            newpos = pos + rrrr + 1
            if plan.zrl17:
                # Compat mode: the reference skips 17 positions per ZRL
                # (src/huffman.wgsl:182-185); spec/libjpeg skip 16.
                newpos = newpos + ((s == 0) & (rrrr == 15)).astype(I32)
            # Lanes with nothing to write target row 64 (out of range), so
            # the write predicate folds into the row compare; finished lanes
            # are excluded by newpos >= 65 (pos >= 64), no mask needed.
            wrow = jnp.where((s != 0) & (newpos <= 63), newpos, 64)
            if _ablate == "densestore":
                # Budget probe: dense row-1 store, identical control flow.
                set_row(slot, 1, coeff + wrow)
            else:
                pltpu.store(
                    ac_store_ref(slot),
                    jnp.broadcast_to(coeff[None], (64, SUBLANES, LANES)),
                    mask=iota_z == wrow[None],
                )
            # Only EOB (s == 0, rrrr == 0) terminates the lane. Every other
            # s == 0 symbol — ZRL and the table-definable reserved (run, 0)
            # bytes — advances rrrr + 1 positions committing nothing (the
            # rows are pre-zeroed), exactly the golden/reference semantics
            # (golden.py AC loop; src/huffman.wgsl:174-197): a custom DHT
            # may legally map codes to reserved values, and the r1-r4
            # kernels' lane-kill on them diverged from the oracle there.
            pos = jnp.where((s == 0) & (rrrr == 0), 64, newpos)
            return pos, hi, lo, nbits, widx

        def cond(state):
            return jnp.any(state[0] < 63)

        def body(state):
            # Several symbols per trip amortize the cross-lane exit-check
            # reduction; tails cost a few wasted masked passes.
            for _ in range(unroll):
                state = step(state)
            return state

        pos0 = jnp.where(act, 0, 64)
        state = jax.lax.while_loop(cond, body, (pos0, hi, lo, nbits, widx))
        _, hi, lo, nbits, widx = state
    return hi, lo, nbits, widx


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _make_kernel(plan: EntropyPlan, unroll: int = 8):
    W = plan.words_per_segment
    dus = plan.dus_per_mcu

    def kernel(words_ref, segmcus_ref, out_ref, hi_s, lo_s, nb_s, wi_s, dp_s):
        m = pl.program_id(1)

        @pl.when(m == 0)
        def _():
            hi_s[:] = jnp.zeros((SUBLANES, LANES), U32)
            lo_s[:] = jnp.zeros((SUBLANES, LANES), U32)
            nb_s[:] = jnp.zeros((SUBLANES, LANES), I32)
            wi_s[:] = jnp.zeros((SUBLANES, LANES), I32)
            dp_s[:] = jnp.zeros((3, SUBLANES, LANES), I32)

        # Zero the whole output block; the commit loop then only has to touch
        # rows that actually hold a nonzero coefficient (the reference
        # likewise zero-clears its coefficients buffer, src/lib.rs:428).
        out_ref[:] = jnp.zeros((1, 1, dus, 64, SUBLANES, LANES), I32)

        hi, lo = hi_s[:], lo_s[:]
        nbits, widx = nb_s[:], wi_s[:]

        words = [words_ref[0, k] for k in range(W)]

        # Host-computed MCUs-per-segment handles both padding segments and a
        # short final interval, and keeps the kernel shard-position-agnostic.
        act = m < segmcus_ref[0]

        decode_symbol = make_symbol_decoder(words, W)

        # The fused kernel's symbol-synchronous phase-1 loop, masked-storing
        # straight into the output block (r5: this replaced the original
        # position-synchronized commit loop — 2.35 -> 0.38 ms on the 4K
        # stream, identical output).
        hi, lo, nbits, widx = decode_mcu_coefficients(
            plan,
            decode_symbol,
            lambda slot, row, vec: out_ref.__setitem__((0, 0, slot, row), vec),
            lambda slot: out_ref.at[0, 0, slot],
            dp_s,
            act,
            hi,
            lo,
            nbits,
            widx,
            unroll=unroll,
        )

        hi_s[:], lo_s[:] = hi, lo
        nb_s[:], wi_s[:] = nbits, widx

    return kernel


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def plan_from_image(img, device_scan, zrl17: bool = False) -> EntropyPlan:
    """Build the kernel's static plan from an analyzed image + packed scan."""
    ncomp = len(img.components)
    return EntropyPlan(
        ri=img.restart_interval,
        du_to_comp=tuple(img.du_to_comp),
        words_per_segment=device_scan.words_per_segment,
        num_blocks=device_scan.num_blocks,
        total_mcus=img.total_mcus,
        dc=tuple(TableConsts.from_table(img.dc_table_for_comp(c)) for c in range(ncomp)),
        ac=tuple(TableConsts.from_table(img.ac_table_for_comp(c)) for c in range(ncomp)),
        zrl17=zrl17,
    )


@functools.partial(jax.jit, static_argnames=("plan", "interpret"))
def entropy_decode(
    words: jax.Array,  # [G, W, 8, 128] uint32
    seg_mcus: jax.Array,  # [G, 8, 128] int32: valid MCUs per segment
    plan: EntropyPlan,
    interpret: bool = False,
) -> jax.Array:
    """Decode all restart segments to raw zigzag coefficients.

    Returns ``[G, RI, DUS, 64, 8, 128]`` int32: still-quantized coefficient
    ``z`` of DU slot ``d`` of MCU ``m`` within segment ``(g, sub, lane)``.
    """
    G = plan.num_blocks
    W = plan.words_per_segment
    dus = plan.dus_per_mcu
    # Interpret mode (tests) pays per-op tracing costs; the unroll only
    # helps compiled TPU execution (same policy as the fused kernel).
    kernel = _make_kernel(plan, unroll=1 if interpret else 8)
    grid = (G, plan.ri)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, W, SUBLANES, LANES), lambda g, m: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda g, m: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, dus, 64, SUBLANES, LANES),
            lambda g, m: (g, m, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((G, plan.ri, dus, 64, SUBLANES, LANES), I32),
        scratch_shapes=[
            pltpu.VMEM((SUBLANES, LANES), U32),
            pltpu.VMEM((SUBLANES, LANES), U32),
            pltpu.VMEM((SUBLANES, LANES), I32),
            pltpu.VMEM((SUBLANES, LANES), I32),
            pltpu.VMEM((3, SUBLANES, LANES), I32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(words, seg_mcus)
    return out


def coefficients_natural_order(out: jax.Array, plan: EntropyPlan) -> jax.Array:
    """Rearrange kernel output to ``[total_dus, 64]`` (MCUs in raster order),
    the layout the golden decoder produces — test/debug helper.

    DU index = ((seg * ri + m) * dus + d); seg = g*1024 + sub*128 + lane.
    """
    G, RI, D, _, S, L = out.shape
    x = out.transpose(0, 4, 5, 1, 2, 3)  # [G, sub, lane, RI, D, 64]
    x = x.reshape(G * S * L * RI * D, 64)
    total = plan.total_mcus * plan.dus_per_mcu
    return x[:total]
