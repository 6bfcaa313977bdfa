"""Batched multi-frame decode and asynchronous streaming.

The reference decodes one image per ``Decoder`` (multiple decoders share a
``Gpu``; src/lib.rs:6). On TPU, batch decoding is the key throughput lever:
the entropy kernel's grid is just "blocks of 1024 segments", so ``B`` frames
of the same geometry stack into one dispatch by concatenating their blocks —
one kernel launch, one IDCT matmul, one finalize, amortizing dispatch and
transfer latency across the whole batch (the 64-image webcam-stream
configuration of BASELINE.json).

``StreamDecoder`` additionally pipelines host preprocessing against device
execution: JAX dispatch is asynchronous, so preparing frame i+1 on the CPU
overlaps decoding frame i on the chip (the ``start_decode``/``DecodeOp``
split of the reference, src/lib.rs:483-529, without explicit fences).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Iterable, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .errors import bail
from .ops import color as C
from .ops import entropy as E
from .ops import idct as D
from .pipeline import Decoder, FrameGeometry, PreparedFrame


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "samplings", "tiling", "retained", "interpret",
        "exact_idct", "rgb",
    ),
)
def _batch_kernel_tiled(
    words, seg_mcus, idct_l, plan, samplings, tiling, retained,
    interpret, exact_idct, rgb,
):
    """Kernel-only program over the whole batch slab (frames concatenate
    along the tile-row axis)."""
    from .ops import fused as F
    from .pipeline import _as_blocks

    return F.fused_decode_blocks(
        _as_blocks(words), seg_mcus, idct_l, plan, samplings,
        retained, interpret, exact_idct, tiled=True, tiling=tiling, rgb=rgb,
    )


@functools.partial(jax.jit, static_argnames=("geom",))
def _assemble_frame_tiled(blocks: jax.Array, i, geom) -> jax.Array:
    """One frame's minor-swap assembly out of the batch slab (``i`` is a
    traced index: one executable serves every frame). The swap/crop itself
    is the single-frame assembly, shared so the two paths cannot diverge."""
    from .ops import fused as F

    n_tr1 = geom.tiling[0]
    sl = jax.lax.dynamic_slice(
        blocks, (i * n_tr1, 0, 0),
        (n_tr1, blocks.shape[1], blocks.shape[2]),
    )
    return F.assemble_image_tiled(sl, geom)


def decode_batch_fused(
    words: jax.Array,  # [B*G*1024, W] rows or [B*G, W, 8, 128] uint32
    seg_mcus: jax.Array,  # [B*G, 8, 128] int32
    idct_l: jax.Array,  # paired operators (or i32 quantizers), see pipeline
    plan: E.EntropyPlan,  # with num_blocks == B*G
    geom: FrameGeometry,
    batch: int,
    retained: int = 64,
    interpret: bool = False,
    exact_idct: bool = False,
    fancy: bool = False,
) -> jax.Array:
    """Decode ``batch`` same-geometry frames in one kernel dispatch.

    One kernel launch covers every restart segment of every frame (the grid
    is just "blocks of 1024 segments", so frames concatenate along it), and
    the caller's single ``words`` array means one h2d transfer per batch —
    the transfer-latency amortization the tunnel-bound rig needs. Returns a
    TUPLE of B packed-RGBA ``[H, W]`` u32 arrays.

    The nearest/tiled fast path runs the kernel in its own jit and each
    frame's assembly as a separate jitted call (one executable, traced frame
    index). Putting all B assemblies inside one jit let XLA horizontally
    fuse the per-frame swap copies into wide copies that run ~40% slower
    per byte (+19%/frame at B=64, r4); split, B=64 measures 0.80 ms/frame
    vs 0.82 single-frame (tools/exp_b64v2.py). A lax.map formulation was
    also tried: 1.10 ms/frame and a 3-minute compile.
    """
    if geom.tiling is not None and not fancy:
        import jax.numpy as jnp

        blocks = _batch_kernel_tiled(
            words, seg_mcus, idct_l, plan, geom.samplings,
            (batch * geom.tiling[0], geom.tiling[1]), retained, interpret,
            exact_idct, geom.rgb,
        )
        return tuple(
            _assemble_frame_tiled(blocks, jnp.int32(i), geom)
            for i in range(batch)
        )
    return _decode_batch_fused_onejit(
        words, seg_mcus, idct_l, plan, geom, batch, retained, interpret,
        exact_idct, fancy,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "geom", "batch", "retained", "interpret", "exact_idct",
        "fancy",
    ),
)
def _decode_batch_fused_onejit(
    words: jax.Array,
    seg_mcus: jax.Array,
    idct_l: jax.Array,
    plan: E.EntropyPlan,
    geom: FrameGeometry,
    batch: int,
    retained: int = 64,
    interpret: bool = False,
    exact_idct: bool = False,
    fancy: bool = False,
) -> jax.Array:
    """Single-jit batch decode for the fancy (planes) and untiled paths."""
    from .ops import fused as F
    from .pipeline import _as_blocks

    if geom.tiling is not None:
        # Fancy upsampling rides the per-component planes + XLA epilogue
        # (the triangle filter needs raster-space neighbors). Batched
        # frames concatenate along the tile-row axis as above.
        slabs = F.fused_decode_planes(
            _as_blocks(words), seg_mcus, idct_l, plan, geom.samplings,
            (batch * geom.tiling[0], geom.tiling[1]),
            retained, interpret, exact_idct,
        )
        # Per-frame assembly + finalize graphs inside the one jit: each
        # frame's slab slice is a free major-dim view, and the downstream
        # ops are IDENTICAL to the single-frame path's, which XLA fuses
        # tightly. Whole-batch epilogue variants all measured WORSE on the
        # device trace (vmap ~2.5x: fusion split into separate bitcast/
        # convert passes; tall stacked finalize ~4x: the crop + reshape
        # seam defeated elementwise fusion; batched flat assembly ~2x: the
        # [:, :H, :W] crop materialized as a separate slice pass).
        n_tr1 = geom.tiling[0]  # tile-rows per frame (slab dim 0 stacks them)
        outs = []
        for i in range(batch):
            planes_i = tuple(
                F.assemble_plane_tiled(
                    s[i * n_tr1 : (i + 1) * n_tr1], geom, sh, sv
                )
                for s, (sh, sv) in zip(slabs, geom.samplings)
            )
            outs.append(
                F.finalize_planes(
                    planes_i, geom.samplings, geom.width, geom.height, fancy,
                    rgb=geom.rgb,
                )
            )
        return tuple(outs)
    blocks = F.fused_decode_blocks(
        _as_blocks(words), seg_mcus, idct_l, plan, geom.samplings,
        retained, interpret, exact_idct, tiled=False, rgb=geom.rgb,
    )
    g = blocks.shape[0] // batch
    blocks = blocks.reshape((batch, g) + blocks.shape[1:])
    return jax.vmap(lambda b: F.assemble_image(b, geom))(blocks)


@functools.partial(
    jax.jit,
    static_argnames=("plan", "geom", "batch", "retained", "interpret", "fancy"),
)
def decode_batch_device(
    words: jax.Array,  # [B*G, W, 8, 128] uint32
    seg_mcus: jax.Array,  # [B*G, 8, 128] int32
    qz_by_slot: jax.Array,  # [DUS, 64] int32
    plan: E.EntropyPlan,  # with num_blocks == B*G
    geom: FrameGeometry,
    batch: int,
    retained: int = 64,
    interpret: bool = False,
    fancy: bool = False,
) -> jax.Array:
    """Decode ``batch`` same-geometry frames in one dispatch -> [B, H, W, 3]."""
    from .pipeline import _as_blocks

    coeffs = E.entropy_decode(_as_blocks(words), seg_mcus, plan, interpret=interpret)
    pix = D.idct_pixels(coeffs, qz_by_slot, retained)
    g = pix.shape[0] // batch
    pix = pix.reshape((batch, g) + pix.shape[1:])

    def one(p):
        return C.finalize_rgb(
            p,
            ri=geom.ri,
            du_to_comp=geom.du_to_comp,
            samplings=geom.samplings,
            width=geom.width,
            height=geom.height,
            width_mcus=geom.width_mcus,
            height_mcus=geom.height_mcus,
            fancy=fancy,
            rgb=geom.rgb,
        )

    return jax.vmap(one)(pix)


class BatchDecoder:
    """Decode batches of same-geometry frames in single dispatches.

    The default path is the fused single-kernel decode (entropy + IDCT +
    composite in VMEM) over the concatenated batch, with one h2d upload per
    batch; ``fused=False`` keeps the staged debug pipeline."""

    def __init__(
        self,
        retained_coefficients: int = 64,
        interpret: Optional[bool] = None,
        fused: bool = True,
        exact_idct: bool = False,
        fancy_upsampling: bool = False,
        compilation_cache=False,
    ):
        # fused is passed through: prepare() chooses the raster-tiled slot
        # layout only for the fused path, and the staged batch decode
        # (decode_batch_device) assumes linear segment-major slots.
        self._dec = Decoder(
            retained_coefficients, interpret, fused=fused,
            exact_idct=exact_idct, compilation_cache=compilation_cache,
        )
        self.retained = retained_coefficients
        self.fused = fused
        self.exact_idct = exact_idct
        self.fancy = fancy_upsampling
        # seg_mcus is a pure function of stream geometry — identical for
        # every frame of a batch — so the batched copy uploads once.
        self._segmcus_cache: dict = {}

    def prepare_batch(self, frames: Sequence[bytes]) -> List[PreparedFrame]:
        pfs = [self._dec.prepare(f) for f in frames]
        g0, p0 = pfs[0].geom, pfs[0].plan
        for pf in pfs[1:]:
            if pf.geom != g0 or pf.plan != p0:
                bail("batched frames must share geometry and tables")
        return pfs

    def _batch_plan(self, p0: E.EntropyPlan, b: int) -> E.EntropyPlan:
        return E.EntropyPlan(
            ri=p0.ri,
            du_to_comp=p0.du_to_comp,
            words_per_segment=p0.words_per_segment,
            num_blocks=p0.num_blocks * b,
            total_mcus=p0.total_mcus,
            dc=p0.dc,
            ac=p0.ac,
            zrl17=p0.zrl17,
        )

    def decode_prepared(self, pfs: Sequence[PreparedFrame]) -> jax.Array:
        p0 = pfs[0].plan
        b = len(pfs)
        words = np.concatenate([pf.words for pf in pfs], axis=0)
        key = (pfs[0].geom, p0.num_blocks, b)
        seg_mcus = self._segmcus_cache.get(key)
        if seg_mcus is None:
            one = np.asarray(pfs[0].seg_mcus)
            seg_mcus = jax.device_put(np.tile(one, (b, 1, 1)))
            self._segmcus_cache[key] = seg_mcus
        plan = self._batch_plan(p0, b)
        # Fancy on an untiled geometry cannot ride the fused kernel (its
        # in-kernel composite is nearest-only and the planes formulation
        # needs the raster-tiled layout) — fall through to the staged batch
        # decode, same as the single-frame Decoder's fancy fallback. The
        # untiled fused prepare packs linear slots, which the staged path
        # expects.
        if self.fused and not (self.fancy and pfs[0].geom.tiling is None):
            return decode_batch_fused(
                words,
                seg_mcus,
                self._dec._stream_consts(pfs[0]),
                plan,
                pfs[0].geom,
                b,
                self.retained,
                self._dec.interpret,
                self.exact_idct,
                self.fancy,
            )
        return decode_batch_device(
            words,
            seg_mcus,
            pfs[0].qz_by_slot,
            plan,
            pfs[0].geom,
            b,
            self.retained,
            self._dec.interpret,
            self.fancy,
        )

    def to_rgb(self, out) -> np.ndarray:
        """Device batch output -> [B, H, W, 3] u8 (synchronizes)."""
        from .ops.fused import rgba_to_rgb_array

        if isinstance(out, (tuple, list)):  # fused paths: per-frame RGBA u32
            return np.stack([rgba_to_rgb_array(np.asarray(o)) for o in out])
        if out.ndim == 3:  # legacy stacked packed RGBA u32 [B, H, W]
            return np.ascontiguousarray(rgba_to_rgb_array(np.asarray(out)))
        return np.asarray(out)

    def decode(self, frames: Sequence[bytes]) -> np.ndarray:
        """[B frames] -> [B, H, W, 3] u8."""
        return self.to_rgb(self.decode_prepared(self.prepare_batch(frames)))


class StreamDecoder:
    """Pipelined streaming decode: host preprocessing runs on worker threads
    (the native pack releases the GIL) while the device decodes earlier
    frames, with ``depth`` frames in flight on the device."""

    def __init__(
        self,
        retained_coefficients: int = 64,
        interpret: Optional[bool] = None,
        depth: int = 2,
        prepare_threads: Optional[int] = None,
        compilation_cache=False,
    ):
        import os

        if prepare_threads is None:
            prepare_threads = os.cpu_count() or 2
        # With several prepares in flight, per-call single-threaded packs
        # beat the shared pool ~2x (cross-caller parallelism has no pool
        # serialization or wakeup latency; tools/bench_stream.py).
        self._dec = Decoder(
            retained_coefficients,
            interpret,
            pack_threads=1 if prepare_threads > 1 else None,
            compilation_cache=compilation_cache,
        )
        self.depth = depth
        self.prepare_threads = prepare_threads

    def decode_iter(self, frames: Iterable[bytes]) -> Iterator[jax.Array]:
        """Yields device arrays in order (packed RGBA [H, W] u32 on the
        fused path), ``depth`` frames in flight. Convert with
        :meth:`to_rgb`."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        it = iter(frames)
        inflight: List[jax.Array] = []
        if self.prepare_threads <= 1:
            for data in it:
                inflight.append(self._dec.decode_prepared(self._dec.prepare(data)))
                if len(inflight) >= self.depth:
                    yield inflight.pop(0)
            yield from inflight
            return

        with ThreadPoolExecutor(self.prepare_threads) as ex:
            pending = deque()
            for _ in range(self.prepare_threads + 1):
                data = next(it, None)
                if data is None:
                    break
                pending.append(ex.submit(self._dec.prepare, data))
            while pending:
                pf = pending.popleft().result()
                data = next(it, None)
                if data is not None:
                    pending.append(ex.submit(self._dec.prepare, data))
                inflight.append(self._dec.decode_prepared(pf))
                if len(inflight) >= self.depth:
                    yield inflight.pop(0)
            yield from inflight

    def to_rgb(self, out: jax.Array) -> np.ndarray:
        """Device output -> [H, W, 3] u8 numpy (synchronizes)."""
        return self._dec._to_rgb(out)

    def decode_iter_rgb(self, frames: Iterable[bytes]) -> Iterator[np.ndarray]:
        for out in self.decode_iter(frames):
            yield self.to_rgb(out)
