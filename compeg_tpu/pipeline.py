"""Single-image decode orchestration (the reference's ``Decoder`` +
``DecodeOp`` layer, src/lib.rs:273-574, re-shaped for JAX).

Where the reference manages wgpu buffers, bind groups, and three dispatches
per frame, here a frame decode is one jitted function:

    entropy_decode (Pallas)  ->  idct_pixels (MXU matmul)  ->  finalize_rgb

compiled per *geometry + Huffman-table* signature and cached, so a steady
stream of same-shaped frames (the MJPEG/webcam case the reference optimizes
for with grow-only buffers, src/dynamic.rs) compiles exactly once and then
runs allocation-free.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from . import scan as S
from .errors import CompegError
from .metadata import ImageData, analyze
from .ops import color as C
from .ops import entropy as E
from .ops import idct as D


@dataclass(frozen=True)
class FrameGeometry:
    """Static per-compile decode geometry.

    ``tiling`` is ``(n_tr, n_tc)`` when the scan words were packed with the
    raster-tiled slot assignment (:class:`~compeg_tpu.scan.TileMap`), which
    the fused path's assembly exploits; ``None`` means linear packing.
    """

    width: int
    height: int
    width_mcus: int
    height_mcus: int
    samplings: Tuple[Tuple[int, int], ...]
    du_to_comp: Tuple[int, ...]
    ri: int
    tiling: Optional[Tuple[int, int]] = None
    # Samples are already RGB (component IDs R,G,B): skip the YCbCr matrix.
    rgb: bool = False

    @staticmethod
    def from_image(img: ImageData, tiling: Optional[Tuple[int, int]] = None) -> "FrameGeometry":
        return FrameGeometry(
            width=img.width,
            height=img.height,
            width_mcus=img.width_mcus,
            height_mcus=img.height_mcus,
            samplings=tuple((c.h_sample, c.v_sample) for c in img.components),
            du_to_comp=tuple(img.du_to_comp),
            ri=img.restart_interval,
            tiling=tiling,
            rgb=img.color_space == "rgb",
        )


def seg_mcu_counts(active: np.ndarray, ri: int, total_mcus: int) -> np.ndarray:
    """Valid-MCU count per segment: min(ri, remaining), 0 for padding."""
    g = active.shape[0]
    idx = np.arange(g * S.SEGMENTS_PER_BLOCK, dtype=np.int64)
    mcus = np.clip(total_mcus - idx * ri, 0, ri).astype(np.int32)
    return (active.reshape(-1) * mcus).reshape(active.shape)


@functools.partial(
    jax.jit,
    static_argnames=("plan", "geom", "retained", "interpret", "fancy",
                     "exact_idct"),
)
def decode_frame_device(
    words: jax.Array,  # [G, W, 8, 128] uint32
    seg_mcus: jax.Array,  # [G, 8, 128] int32
    qz_by_slot: jax.Array,  # [DUS, 64] int32
    plan: E.EntropyPlan,
    geom: FrameGeometry,
    retained: int = 64,
    interpret: bool = False,
    fancy: bool = False,
    exact_idct: bool = False,
) -> jax.Array:
    """The full on-device frame decode: scan words -> [H, W, 3] u8."""
    coeffs = E.entropy_decode(_as_blocks(words), seg_mcus, plan, interpret=interpret)
    idct = D.idct_pixels_exact if exact_idct else D.idct_pixels
    pix = idct(coeffs, qz_by_slot, retained)
    return C.finalize_rgb(
        pix,
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


def rows_to_blocks(rows: jax.Array) -> jax.Array:
    """Host-packed contiguous segment rows ``[G*1024, W]`` -> the kernel's
    vector block layout ``[G, W, 8, 128]`` (a device-side transpose; the
    host packs rows because strided column writes are cache-hostile)."""
    n, w = rows.shape
    g = n // (S.SUBLANES * S.LANES)
    return rows.reshape(g, S.SUBLANES, S.LANES, w).transpose(0, 3, 1, 2)


def _as_blocks(words: jax.Array) -> jax.Array:
    return rows_to_blocks(words) if words.ndim == 2 else words


@functools.partial(
    jax.jit,
    static_argnames=("plan", "geom", "retained", "interpret", "exact_idct"),
)
def decode_frame_fused(
    words: jax.Array,  # [G, W, 8, 128] uint32 (or [G*1024, W] rows)
    seg_mcus: jax.Array,  # [G, 8, 128] int32
    idct_l: jax.Array,  # [DUS, 64, 64] f32 operators (or i32 quantizers)
    plan: E.EntropyPlan,
    geom: FrameGeometry,
    retained: int = 64,
    interpret: bool = False,
    exact_idct: bool = False,
) -> jax.Array:
    """Single fused kernel path: scan words -> packed RGBA [H, W] u32."""
    from .ops import fused as F

    blocks = F.fused_decode_blocks(
        _as_blocks(words), seg_mcus, idct_l, plan, geom.samplings,
        retained, interpret, exact_idct, tiled=geom.tiling is not None,
        tiling=geom.tiling, rgb=geom.rgb,
    )
    return F.assemble_image(blocks, geom)


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "geom", "retained", "interpret", "exact_idct", "fancy",
    ),
)
def decode_frame_fused_planes(
    words: jax.Array,  # [G, W, 8, 128] uint32 (or [G*1024, W] rows)
    seg_mcus: jax.Array,  # [G, 8, 128] int32
    idct_l: jax.Array,
    plan: E.EntropyPlan,
    geom: FrameGeometry,
    retained: int = 64,
    interpret: bool = False,
    exact_idct: bool = False,
    fancy: bool = False,
) -> jax.Array:
    """Fused kernel with byte-packed per-component plane output + an
    XLA-fused upsample/color epilogue: scan words -> packed RGBA [H, W] u32.

    ``fancy=True`` is the libjpeg triangle filter (matches the staged fancy
    path, ops/color, bit-for-bit); ``fancy=False`` is the reference's
    nearest-neighbor sampling, bit-identical to the in-kernel composite path
    (decode_frame_fused) — and faster: the kernel writes 4x less plane data
    than u32-per-pixel RGBA, which more than pays for the epilogue."""
    from .ops import fused as F

    slabs = F.fused_decode_planes(
        _as_blocks(words), seg_mcus, idct_l, plan, geom.samplings,
        geom.tiling, retained, interpret, exact_idct,
    )
    planes = tuple(
        F.assemble_plane_tiled(s, geom, sh, sv)
        for s, (sh, sv) in zip(slabs, geom.samplings)
    )
    return F.finalize_planes(
        planes, geom.samplings, geom.width, geom.height, fancy, rgb=geom.rgb
    )


# Backwards-compatible alias: the fancy entry point routes through the
# general planes path.
def decode_frame_fused_fancy(*args, **kwargs):
    return decode_frame_fused_planes(*args, **kwargs, fancy=True)


@functools.partial(
    jax.jit,
    static_argnames=("plan", "geom", "retained", "interpret", "exact_idct"),
)
def decode_frame_component_planes(
    words: jax.Array,
    seg_mcus: jax.Array,
    idct_l: jax.Array,
    plan: E.EntropyPlan,
    geom: FrameGeometry,
    retained: int = 64,
    interpret: bool = False,
    exact_idct: bool = False,
) -> Tuple[jax.Array, ...]:
    """Fused decode to raw per-component planes (no upsampling / color
    conversion): one byte-packed u32 plane per component at the component's
    own resolution. Requires the raster-tiled layout."""
    from .ops import fused as F

    slabs = F.fused_decode_planes(
        _as_blocks(words), seg_mcus, idct_l, plan, geom.samplings,
        geom.tiling, retained, interpret, exact_idct,
    )
    return tuple(
        F.assemble_plane_tiled(s, geom, sh, sv)
        for s, (sh, sv) in zip(slabs, geom.samplings)
    )


@functools.partial(
    jax.jit,
    static_argnames=("plan", "geom", "scale_blocks", "retained", "interpret"),
)
def decode_frame_scaled(
    words: jax.Array,  # [G*1024, W] rows or [G, W, 8, 128] uint32 (linear)
    seg_mcus: jax.Array,  # [G, 8, 128] int32
    qz_by_slot: jax.Array,  # [DUS, 64] int32
    plan: E.EntropyPlan,
    geom: FrameGeometry,
    scale_blocks: int,
    retained: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Scaled (thumbnail) decode at ``scale_blocks/8`` scale — the libjpeg
    ``scale_num/scale_denom`` path, as a DCT-domain downsample: the entropy
    kernel runs unchanged and the IDCT contracts the k-point scaled
    operator (ops/luts.scaled_idct_matrix_zigzag) instead of the full one,
    so a 1/8-scale decode pays only the entropy cost plus a 64x smaller
    epilogue. Returns ``[ceil(H*k/8), ceil(W*k/8), 3]`` u8 RGB.

    Rides the staged (linear-slot) pipeline; nearest chroma sampling."""
    import jax.numpy as jnp

    from .ops.luts import scaled_idct_matrix_zigzag

    k = scale_blocks
    coeffs = E.entropy_decode(_as_blocks(words), seg_mcus, plan,
                              interpret=interpret)
    Lk = jnp.asarray(scaled_idct_matrix_zigzag(k, retained))
    deq = coeffs.astype(jnp.float32) * qz_by_slot[
        None, None, :, :, None, None
    ].astype(jnp.float32)
    pix = jnp.einsum("pz,grdzsl->grdpsl", Lk, deq,
                     precision=jax.lax.Precision.HIGHEST)
    pix = jnp.clip(pix + jnp.float32(128.5), 0.0, 255.0).astype(jnp.int32)
    hs = -(-geom.height * k // 8)
    ws = -(-geom.width * k // 8)
    return C.finalize_rgb(
        pix,
        ri=geom.ri,
        du_to_comp=geom.du_to_comp,
        samplings=geom.samplings,
        width=ws,
        height=hs,
        width_mcus=geom.width_mcus,
        height_mcus=geom.height_mcus,
        fancy=False,
        rgb=geom.rgb,
        blk=k,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "geom", "scale_blocks", "retained", "interpret", "scaled_ops",
    ),
)
def decode_frame_scaled_fused(
    words: jax.Array,  # [G, W, 8, 128] uint32 (raster-tiled packing)
    seg_mcus: jax.Array,  # [G, 8, 128] int32
    plan: E.EntropyPlan,
    geom: FrameGeometry,
    scale_blocks: int,
    retained: int = 64,
    interpret: bool = False,
    scaled_ops=None,
) -> jax.Array:
    """Scaled decode on the FUSED kernel (tiled packing): the entropy
    phase runs unchanged, phase 2 contracts the k-point scaled operator as
    compile-time-constant vector MACs, and phase 3 composites k x k pixel
    blocks into the same raster-tiled slab + one minor-swap assembly as
    the full decode. Returns packed RGBA u32 ``[ceil(H*k/8), ceil(W*k/8)]``.
    """
    import dataclasses

    from .ops import fused as F

    k = scale_blocks
    blocks = F.fused_decode_blocks(
        _as_blocks(words), seg_mcus, jnp_zero_operand(), plan,
        geom.samplings, retained, interpret, False, tiled=True,
        tiling=geom.tiling, rgb=geom.rgb, scale=k, scaled_ops=scaled_ops,
    )
    hs = -(-geom.height * k // 8)
    ws = -(-geom.width * k // 8)
    return F.assemble_image_tiled(
        blocks, dataclasses.replace(geom, height=hs, width=ws)
    )


def jnp_zero_operand():
    """Placeholder for the unused IDCT-operator operand of the scaled
    fused kernel (the scaled operator rides compile-time constants)."""
    import jax.numpy as jnp

    return jnp.zeros((1,), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("plan", "geom", "retained", "interpret")
)
def decode_frame_component_planes_staged(
    words: jax.Array,
    seg_mcus: jax.Array,
    qz_by_slot: jax.Array,
    plan: E.EntropyPlan,
    geom: FrameGeometry,
    retained: int = 64,
    interpret: bool = False,
) -> Tuple[jax.Array, ...]:
    """Staged-path raw per-component planes (linear slot packing)."""
    coeffs = E.entropy_decode(_as_blocks(words), seg_mcus, plan, interpret=interpret)
    pix = D.idct_pixels(coeffs, qz_by_slot, retained)
    return C.component_planes(
        pix,
        samplings=geom.samplings,
        width_mcus=geom.width_mcus,
        height_mcus=geom.height_mcus,
    )


@dataclass
class PreparedFrame:
    """Host-side preprocessing result for one frame — everything the device
    function needs, ready to upload."""

    words: np.ndarray
    seg_mcus: np.ndarray
    qz_by_slot: np.ndarray
    plan: E.EntropyPlan
    geom: FrameGeometry
    image: ImageData


def prepare_frame(
    data_or_img,
    words_per_segment: Optional[int] = None,
) -> PreparedFrame:
    """Host hot path: parse + validate + scan preprocessing + plan build."""
    img = data_or_img if isinstance(data_or_img, ImageData) else analyze(data_or_img)
    dscan = S.preprocess(
        img.scan_data, img.total_restart_intervals, words_per_segment
    )
    plan = E.plan_from_image(img, dscan)
    return PreparedFrame(
        words=np.asarray(dscan.words, dtype=np.uint32),
        seg_mcus=seg_mcu_counts(dscan.active, img.restart_interval, img.total_mcus),
        qz_by_slot=D.qz_by_slot_array(img),
        plan=plan,
        geom=FrameGeometry.from_image(img),
        image=img,
    )


def enable_compilation_cache(path: Optional[str] = None) -> str:
    """Enable JAX's persistent compilation cache for this process.

    The reference's flagship scenario is a long-lived webcam session
    (examples/viewer.rs:40-89) where pipelines compile once per process; on
    this engine a fresh process otherwise re-pays the 4K fused-kernel
    compile (~20-60 s through the tunnel). With the cache enabled, a warm
    process start deserializes the executable from disk instead.

    ``path`` defaults to ``$COMPEG_TPU_CACHE_DIR`` or
    ``~/.cache/compeg_tpu/jax``. Returns the cache directory. Call before
    the first decode (it only configures jax; safe to call repeatedly)."""
    import os

    path = path or os.environ.get("COMPEG_TPU_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "compeg_tpu", "jax"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every executable: the per-geometry decode programs are exactly
    # the artifacts a steady stream wants back after a restart, regardless
    # of size or compile time.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return path


class Decoder:
    """Per-stream decoder. Reuse one instance across frames of a stream so
    compiled pipelines are reused (the role of the reference's per-``Decoder``
    resource reuse)."""

    def __init__(
        self,
        retained_coefficients: int = 64,
        interpret: Optional[bool] = None,
        fused: bool = True,
        fancy_upsampling: bool = False,
        exact_idct: bool = False,
        max_device_bytes: int = 8 << 30,
        planes_epilogue: Optional[bool] = None,
        zrl_compat: bool = False,
        pack_threads: Optional[int] = None,
        compilation_cache=False,
    ):
        # compilation_cache: True (default dir) or a path enables JAX's
        # persistent executable cache so a restarted process skips the
        # per-geometry compile (see enable_compilation_cache).
        if compilation_cache:
            enable_compilation_cache(
                compilation_cache if isinstance(compilation_cache, str) else None
            )
        # pack_threads: worker threads per native pack call. None = the
        # machine-sized pool (fastest single-frame latency). Streaming
        # callers that run SEVERAL prepares concurrently should pass 1:
        # cross-caller parallelism beats the pool's serialized runs ~2x on
        # this VM (tools/bench_stream.py; pool wakeups on idle vCPUs are
        # ms-scale, and Pool::run is one-caller-at-a-time by design).
        self.pack_threads = pack_threads
        # zrl_compat: reproduce the reference's ZRL semantics (position
        # advance of 17 per ZRL symbol, src/huffman.wgsl:182-185) instead of
        # the spec/libjpeg 16. Combined with retained_coefficients=32 (the
        # reference's default) and exact_idct this is the documented
        # "Compeg-compat" configuration (PARITY.md).
        self.zrl_compat = zrl_compat
        # planes_epilogue: route the fused kernel through the byte-packed
        # per-component-plane output + XLA epilogue instead of the in-kernel
        # RGBA composite. None = auto: composite for nearest upsampling,
        # planes for fancy (which needs raster-space neighbors). True forces
        # planes (A/B; also the decode_ycbcr formulation), False forces the
        # composite. R4 finding (tools/trace_ops.py, full-ops-lane sums):
        # the planes path's final interleave materializes ~0.11 ms/4K frame
        # of XLA copies that no formulation or layout constraint removes
        # (tools/exp_layout.py), so composite + one-swap assembly is faster
        # for nearest: 0.836 vs 0.905 ms device (r2 chose planes using a
        # top-12-op trace sum that undercounted that tail).
        self.planes_epilogue = planes_epilogue
        # Device-buffer budget per frame — the analogue of the reference's
        # MAX_RESTART_INTERVALS dispatch cap (src/lib.rs:295-298). A
        # degenerate geometry (e.g. a large no-DRI image: one giant interval
        # padded to a 1024-lane block) implies absurd padded intermediates;
        # bail with a clean CompegError instead of letting XLA OOM.
        self.max_device_bytes = max_device_bytes
        # exact_idct: fixed-point integer IDCT, bit-identical to
        # golden.decode_rgb(idct="int") on every backend.
        self.exact_idct = exact_idct
        # fancy (triangle-filter) chroma upsampling rides the fused kernel's
        # per-component-plane output when the raster-tiled layout applies
        # (decode_frame_fused_planes); otherwise it falls back to the staged
        # path at decode time (see decode_prepared).
        self.fancy = fancy_upsampling
        self.retained = retained_coefficients
        self.interpret = (
            E._interpret_default() if interpret is None else interpret
        )
        # The fused single-kernel path (entropy+IDCT+color in VMEM) is the
        # fast path; the staged path remains for debugging/inspection.
        self.fused = fused
        # Per-stream constants keyed by the quantizer bytes: device-resident
        # quantizer broadcasts / IDCT operators, and the scaled-decode
        # static operator tuples.
        self._const_cache: Dict = {}
        # Device-resident seg_mcus (a pure function of stream geometry —
        # constant across frames, so upload it once).
        self._segmcus_cache: Dict[Tuple[int, int, int], jax.Array] = {}
        # Bucket scan width to cut recompiles across slightly-varying frames.
        self._width_buckets = (4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16,
                               20, 24, 32, 48, 64, 96, 128)
        # Steady-state width cache: frames of a stream reuse the last bucket
        # and only re-measure when a segment overflows it (the same trick as
        # the reference's grow-only buffers, src/dynamic.rs:38-61).
        self._cached_width: Optional[int] = None
        # Steady-state header cache: (header bytes, ImageData template) of
        # the last stream. Holds exactly ONE entry — a frame with different
        # header bytes misses and replaces it — so memory is bounded at one
        # parsed template plus ~600 header bytes; no eviction policy needed.
        # (header bytes, ImageData template, host-consts dict). The dict
        # holds the stream-constant host objects (EntropyPlan, quantizer
        # rows, geometry) keyed by (words_per_segment, blocks, tiling) —
        # rebuilding them per frame is pure-Python work serialized under
        # the GIL, capping the aggregate multi-thread prepare rate. The
        # consts live INSIDE the tuple so a concurrent prepare that
        # replaces the cache (new stream header) atomically replaces the
        # consts with it — a thread that read the old tuple keeps using
        # the old header WITH the old consts, never a mix.
        self._hdr_cache: Optional[Tuple[bytes, ImageData, dict]] = None
        self._warned_parallelism = False

    def _bucket_width(self, needed: int) -> int:
        for b in self._width_buckets:
            if needed <= b:
                return b
        return needed

    def prepare(self, data) -> PreparedFrame:
        import dataclasses

        from . import native
        from .profiling import stage_timer

        hdr_hit = hdr_stored = False
        with stage_timer("parse"):
            if isinstance(data, ImageData):
                img = data
            else:
                # Steady-state header cache: frames of an MJPEG stream carry
                # byte-identical headers (same tables/geometry), so a ~600 B
                # memcmp replaces the full re-parse (~0.6 ms/4K frame). The
                # terminator-aware native scanners bound the scan themselves,
                # so the cached frame's scan span is simply "rest of file";
                # the Python fallback needs the exact span, recovered by
                # finding the EOI marker (inside valid entropy data every FF
                # is followed by 00 or D0-D7, so the first FF D9 after the
                # header IS the terminator). A corrupt frame still fails the
                # pack's interval-count check either way.
                img = None
                cached = self._hdr_cache  # read ONCE: header+consts pair
                if (
                    cached is not None
                    and len(data) > len(cached[0])
                    and bytes(data[: len(cached[0])]) == cached[0]
                ):
                    tmpl = cached[1]
                    src = bytes(data)
                    if native.available():
                        # Zero-copy view: the native pack reads the scan
                        # straight out of `src` via (offset, length); slicing
                        # bytes here would copy the whole ~MB scan span
                        # (~0.15 ms/4K frame of pure memcpy).
                        scan = memoryview(src)[tmpl.scan_offset :]
                    else:
                        end = src.find(b"\xff\xd9", tmpl.scan_offset)
                        scan = src[tmpl.scan_offset : end] if end >= 0 else None
                    if scan is not None:
                        img = dataclasses.replace(
                            tmpl, source=src, scan_data=scan
                        )
                        hdr_hit = True
                if img is None:
                    img = analyze(data)
                    if img.source is not None:
                        cached = (
                            img.source[: img.scan_offset],
                            img,
                            {},
                        )
                        self._hdr_cache = cached
                        hdr_stored = True
        expected = img.total_restart_intervals
        if expected < 10000 and not getattr(self, "_warned_parallelism", False):
            # Same guidance as the reference (src/lib.rs:838-846): few restart
            # intervals leave the vector lanes idle; a CPU decoder (golden) is
            # likely faster below ~10k segments.
            import logging

            logging.getLogger("compeg_tpu").info(
                "image has %d restart intervals (parallelism); device decode "
                "is most efficient above ~10000",
                expected,
            )
            self._warned_parallelism = True
        g_lin = -(-expected // S.SEGMENTS_PER_BLOCK)
        tile = self._tile_map(img, g_lin)
        g = tile.num_blocks if tile is not None else g_lin
        # Device-buffer budget check: the dominating intermediate is the
        # padded per-MCU block array — fused path: packed RGBA pixels
        # [G, RI, mh, mw, 8, 128]; staged path: coefficients
        # [G, RI, DUS, 64, 8, 128] (i32 each). Uses the ACTUAL block count
        # (the tiled layout pads up to ~25% beyond the linear one).
        padded_mcus = g * S.SEGMENTS_PER_BLOCK * img.restart_interval
        per_mcu = (
            img.mcu_width * img.mcu_height
            if self.fused
            else img.dus_per_mcu * 64
        )
        est = padded_mcus * per_mcu * 4
        if est > self.max_device_bytes:
            raise CompegError(
                f"decode would need ~{est >> 20} MiB of device intermediates "
                f"(restart interval {img.restart_interval} MCUs over "
                f"{expected} segments); exceeds the {self.max_device_bytes >> 20}"
                " MiB budget — fall back to a software decoder"
            )
        if native.available():
            w = self._cached_width
            words = active = None
            with stage_timer("preprocess"):
                src, off, ln = (
                    (img.source, img.scan_offset, len(img.scan_data))
                    if img.source is not None
                    else (img.scan_data, 0, len(img.scan_data))
                )
                ntile = (tile.segs_per_row, tile.n_tc) if tile is not None else None
                nthr = self.pack_threads or 0
                if w is not None:
                    try:
                        words, active = native.pack_blocks(
                            src, expected, w, g, offset=off, length=ln,
                            tile=ntile, n_threads=nthr,
                        )
                    except CompegError:
                        words = None  # overflow or count change: re-measure
                if words is None:
                    # Zero-copy: scan straight out of the file buffer.
                    n, mx = native.scan_info(src, offset=off, length=ln)
                    if n != expected:
                        raise CompegError(
                            f"scan contains {n} restart intervals, expected {expected}"
                        )
                    w = self._bucket_width(S._words_per_segment(mx))
                    self._cached_width = w
                    words, active = native.pack_blocks(
                        src, expected, w, g, offset=off, length=ln, tile=ntile,
                        n_threads=nthr,
                    )
            dscan = S.DeviceScan(words, active, expected, w)
        else:
            # Pure-Python fallback path (converted to contiguous rows).
            intervals = S.split_intervals(img.scan_data, expected)
            needed = S._words_per_segment(max(len(s) for s in intervals))
            blk = S.to_device_layout(
                intervals,
                self._bucket_width(needed),
                slot_of_segment=(
                    tile.slot_of_segment(img.height_mcus) if tile is not None else None
                ),
                num_blocks=g if tile is not None else None,
            )
            rows = np.ascontiguousarray(
                blk.words.transpose(0, 2, 3, 1).reshape(-1, blk.words_per_segment)
            )
            dscan = S.DeviceScan(rows, blk.active, blk.num_segments,
                                 blk.words_per_segment)
        tiling = (tile.n_tr, tile.n_tc) if tile is not None else None
        # Stream-constant host objects: on a header-cache hit with unchanged
        # packing shape, the plan/quantizers/geometry of the previous frame
        # apply verbatim (they are pure functions of the header + (W, G)).
        # `cached` is the tuple this frame's header matched (or just
        # stored), so its consts dict can never belong to a different
        # stream even if another thread replaced self._hdr_cache meanwhile.
        ckey = (dscan.words_per_segment, dscan.num_blocks, tiling)
        hc = cached[2].get(ckey) if (hdr_hit or hdr_stored) else None
        if hc is not None:
            plan, qz_by_slot, geom = hc
        else:
            plan = E.plan_from_image(img, dscan, zrl17=self.zrl_compat)
            qz_by_slot = D.qz_by_slot_array(img)
            geom = FrameGeometry.from_image(img, tiling)
            if hdr_hit or hdr_stored:  # frame belongs to the cached stream
                cached[2][ckey] = (plan, qz_by_slot, geom)
        # The mask depends on the full MCU-grid shape, not just the MCU
        # count: a 8x2 and a 2x8 grid share (ri, total_mcus, blocks, tiling)
        # but activate different tiled slots.
        key = (
            img.restart_interval,
            img.total_mcus,
            img.height_mcus,
            img.width_mcus,
            dscan.num_blocks,
            tiling,
        )
        seg_mcus = self._segmcus_cache.get(key)
        if seg_mcus is None:
            if tile is not None:
                # Every tiled slot maps to a full-Ri segment (Ri divides the
                # MCU-row width), so the count is just Ri * active.
                seg_mcus = jax.device_put(
                    (img.restart_interval * dscan.active).astype(np.int32)
                )
            else:
                seg_mcus = jax.device_put(
                    seg_mcu_counts(dscan.active, img.restart_interval, img.total_mcus)
                )
            self._segmcus_cache[key] = seg_mcus
        return PreparedFrame(
            words=np.asarray(dscan.words, dtype=np.uint32),
            seg_mcus=seg_mcus,
            qz_by_slot=qz_by_slot,
            plan=plan,
            geom=geom,
            image=img,
        )

    def _tile_map(self, img: ImageData, g_lin: int) -> Optional[S.TileMap]:
        """Raster-tiled slot assignment when it applies (fused path, Ri
        divides the MCU-row width, padding overhead bounded)."""
        if not self.fused:
            return None  # the staged pipeline assembles from linear slots
        tile = S.TileMap.for_geometry(
            img.height_mcus, img.width_mcus, img.restart_interval
        )
        if tile is None:
            return None
        # Degenerate aspect ratios (one MCU row spanning few lanes, etc.)
        # can pad far beyond the linear layout; keep the transfer bounded.
        if tile.num_blocks > max(g_lin + g_lin // 4, g_lin + 1):
            return None
        return tile

    def _stream_consts(self, pf: PreparedFrame) -> jax.Array:
        key = (
            pf.qz_by_slot.tobytes()
            + bytes([self.retained, int(self.exact_idct)])
        )
        hit = self._const_cache.get(key)
        if hit is None:
            if self.exact_idct:
                q = pf.qz_by_slot.astype(np.int32)
                if self.retained < 64:
                    q = q.copy()
                    q[:, self.retained:] = 0
                qb = np.broadcast_to(
                    q[:, :, None, None], q.shape + (S.SUBLANES, S.LANES)
                )
                hit = jax.device_put(np.ascontiguousarray(qb))
            else:
                from .ops.luts import idct_dequant_matrices_paired

                hit = jax.device_put(
                    idct_dequant_matrices_paired(pf.qz_by_slot, self.retained)
                )
            self._const_cache[key] = hit
        return hit

    def decode_prepared(self, pf: PreparedFrame) -> jax.Array:
        """Async decode. Fused path returns packed RGBA [H, W] u32; staged
        path returns [H, W, 3] u8."""
        # Fancy on a tiled-packed frame MUST ride the planes path even when
        # planes_epilogue=False: the words carry the raster-tiled slot
        # permutation, which the staged fallback (linear slots) cannot
        # decode, and the planes path is the only fused fancy formulation.
        # Nearest defaults to the in-kernel composite (see __init__).
        use_planes = pf.geom.tiling is not None and (
            self.planes_epilogue is True or self.fancy
        )
        if self.fused and (use_planes or not self.fancy):
            idct_l = self._stream_consts(pf)
            if use_planes:
                return decode_frame_fused_planes(
                    pf.words,
                    pf.seg_mcus,
                    idct_l,
                    pf.plan,
                    pf.geom,
                    self.retained,
                    self.interpret,
                    self.exact_idct,
                    self.fancy,
                )
            return decode_frame_fused(
                pf.words,
                pf.seg_mcus,
                idct_l,
                pf.plan,
                pf.geom,
                self.retained,
                self.interpret,
                self.exact_idct,
            )
        return decode_frame_device(
            pf.words,
            pf.seg_mcus,
            pf.qz_by_slot,
            pf.plan,
            pf.geom,
            self.retained,
            self.interpret,
            self.fancy,
            self.exact_idct,
        )

    def _to_rgb(self, out: jax.Array) -> np.ndarray:
        if out.ndim == 2:  # fused paths: packed RGBA u32
            from .ops.fused import rgba_to_rgb_array

            return np.ascontiguousarray(rgba_to_rgb_array(np.asarray(out)))
        return np.asarray(out)

    def decode(self, data) -> np.ndarray:
        """Decode one JPEG to an [H, W, 3] u8 RGB numpy array."""
        return self._to_rgb(self.decode_prepared(self.prepare(data)))

    def start_decode(self, data) -> "DecodeOp":
        """Asynchronous decode: parse + preprocess on the host, dispatch to
        the device, return immediately (the reference's ``start_decode``
        pattern, src/lib.rs:483-499)."""
        pf = self.prepare(data)
        changed = pf.geom != getattr(self, "_last_geom", None)
        self._last_geom = pf.geom
        return DecodeOp(
            result=self.decode_prepared(pf),
            geometry=pf.geom,
            geometry_changed=changed,
            _decoder=self,
        )

    def decode_ycbcr(self, data) -> list:
        """Decode to raw per-component planes — no chroma upsampling, no
        color conversion: a list of ``[Hc, Wc]`` u8 arrays in frame
        component order (Y, Cb, Cr; one entry for grayscale). Component
        dimensions follow T.81 A.1.1 (``ceil(H*v/max_v)`` × ``ceil(W*h/max_h)``).

        This is the natural output for video pipelines that consume YUV
        directly — an extension over the reference's RGBA-only output
        (src/lib.rs:48)."""
        pf = self.prepare(data)
        img = pf.image
        max_h = max(s[0] for s in pf.geom.samplings)
        max_v = max(s[1] for s in pf.geom.samplings)
        crops = [
            (-(-img.height * sv // max_v), -(-img.width * sh // max_h))
            for (sh, sv) in pf.geom.samplings
        ]
        if self.fused and pf.geom.tiling is not None:
            idct_l = self._stream_consts(pf)
            slabs = decode_frame_component_planes(
                pf.words, pf.seg_mcus, idct_l, pf.plan, pf.geom,
                self.retained, self.interpret, self.exact_idct,
            )
            out = []
            for slab, (hc, wc) in zip(slabs, crops):
                v = np.asarray(slab)  # [rows, words] u32, 4 x-pixels/word
                if not v.flags.c_contiguous:
                    v = np.ascontiguousarray(v)
                out.append(v.view(np.uint8).reshape(v.shape[0], -1)[:hc, :wc])
            return out
        planes = decode_frame_component_planes_staged(
            pf.words, pf.seg_mcus, pf.qz_by_slot, pf.plan, pf.geom,
            self.retained, self.interpret,
        )
        return [
            np.asarray(p)[:hc, :wc].astype(np.uint8)
            for p, (hc, wc) in zip(planes, crops)
        ]

    def decode_scaled(self, data, scale_blocks: int) -> np.ndarray:
        """Thumbnail decode at ``scale_blocks/8`` scale (k ∈ {1, 2, 4, 8}):
        ``[ceil(H*k/8), ceil(W*k/8), 3]`` u8 RGB via the k-point scaled
        IDCT — the libjpeg ``scale_denom`` feature the reference lacks.
        k=8 is the full decode.

        Tiled geometries ride the FUSED kernel (k-point phase 2 + k x k
        composite — entropy-bound, ~2.3x the full-decode rate at k=1);
        untiled ones the staged linear-slot path. Both consume the main
        preparer's output, so stream caches are shared with full decodes."""
        if scale_blocks == 8:
            return self.decode(data)
        if scale_blocks not in (1, 2, 4):
            raise CompegError(
                f"scale_blocks must be 1, 2, 4, or 8 (got {scale_blocks})"
            )
        pf = self.prepare(data)
        if self.fused and pf.geom.tiling is not None:
            from .ops import fused as F

            key = (b"scaledops", pf.qz_by_slot.tobytes(),
                   scale_blocks, self.retained)
            ops = self._const_cache.get(key)
            if ops is None:
                ops = F.scaled_ops_static(
                    np.asarray(pf.qz_by_slot), scale_blocks, self.retained
                )
                self._const_cache[key] = ops
            out = decode_frame_scaled_fused(
                pf.words, pf.seg_mcus, pf.plan, pf.geom, scale_blocks,
                self.retained, self.interpret, ops,
            )
            return np.ascontiguousarray(
                F.rgba_to_rgb_array(np.asarray(out))
            )
        # Untiled geometry: the main preparer packed linear slots, which is
        # exactly what the staged scaled decode consumes.
        return np.asarray(
            decode_frame_scaled(
                pf.words, pf.seg_mcus, pf.qz_by_slot, pf.plan, pf.geom,
                scale_blocks, self.retained, self.interpret,
            )
        )

    def decode_rgba(self, data) -> np.ndarray:
        """Decode to [H, W, 4] u8 RGBA (alpha=255) — the reference's output
        format (rgba8unorm texture, src/lib.rs:48)."""
        out = self.decode_prepared(self.prepare(data))
        if out.ndim == 2:  # fused paths: packed RGBA u32
            v = np.asarray(out)
            if not v.flags.c_contiguous:  # XLA may pick a transposed layout
                v = np.ascontiguousarray(v)
            return v.view(np.uint8).reshape(v.shape + (4,))
        from .ops.color import rgb_to_rgba

        return np.asarray(rgb_to_rgba(out))


@dataclass
class DecodeOp:
    """Handle for an in-flight decode — the analogue of the reference's
    ``DecodeOp`` (src/lib.rs:538-574): the device result is asynchronous,
    and ``geometry_changed`` tells callers to rebuild downstream resources
    (the role of ``texture_changed``)."""

    result: jax.Array  # async device array (packed RGBA u32 on fused path)
    geometry: FrameGeometry
    geometry_changed: bool
    _decoder: "Decoder"

    def rgb(self) -> np.ndarray:
        """Blocking readback to [H, W, 3] u8."""
        return self._decoder._to_rgb(self.result)

    def block_until_ready(self) -> "DecodeOp":
        self.result.block_until_ready()
        return self

    # The reference's DecodeOp hands its output texture straight to the
    # caller's render pipeline with no host round trip (src/lib.rs:538-574,
    # examples/viewer.rs:244-246). The TPU-native analogue is the DLPack
    # protocol on the device array: ``torch.from_dlpack(op)`` (or any DLPack
    # consumer) views the decoded packed-RGBA words zero-copy.
    def __dlpack__(self, **kwargs):
        return self.result.__dlpack__(**kwargs)

    def __dlpack_device__(self):
        return self.result.__dlpack_device__()


def decode_rgb(data: bytes, retained_coefficients: int = 64) -> np.ndarray:
    """One-shot decode on the default backend."""
    return Decoder(retained_coefficients).decode(data)


def decode_rgba(data: bytes, retained_coefficients: int = 64) -> np.ndarray:
    """One-shot decode to RGBA8."""
    return Decoder(retained_coefficients).decode_rgba(data)
