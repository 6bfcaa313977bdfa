"""Sharded decode over a device mesh — the production multi-chip pipeline.

Two axes of parallelism, composable:

 * ``data``: frames of a batch are independent — pure data parallelism over
   chips/hosts (the dominant production configuration: many streams).
 * ``seq``: one frame's MCU rows are split into horizontal *bands*, one per
   mesh slot; restart segments give clean cut points (each band decodes its
   own segments independently, exactly the property the reference exploits
   per GPU thread, src/file.rs:663-671, lifted to the device mesh).

Each shard runs the SAME fast path as the single-chip pipeline: the banded
raster-tiled slot layout (scan.TileMap with ``band_rows``) is packed by the
native AVX2 pack in one pass, and the shard body is
``fused_decode_planes`` (single Pallas kernel: entropy + IDCT + byte-packed
per-component planes) + the one-minor-swap assembly + the XLA-fused
upsample/color epilogue — no per-band strided transposes, ``exact_idct``
and fancy upsampling both supported. Frames whose restart interval does not
divide the MCU-row width (segments wrap rows — no tiled layout possible)
fall back to the staged kernel path with bands cut at the nearest restart
boundary.

Bands align to MCU rows, so nearest-neighbor chroma upsampling needs no
cross-band communication (4:2:2 subsamples horizontally only; 4:2:0's
vertical replication stays inside an MCU). The *fancy* (triangle) chroma
upsampler does need each band's neighbor boundary rows — those are
exchanged over ICI with ``jax.lax.ppermute`` (ops/fused
``_upsample_fancy_v_sharded`` on the tiled path, ops/color halo exchange on
the fallback), with image-edge and content-edge clamping so bands whose
tail rows are padding do not bleed garbage into real pixels.

Everything here runs identically on a real TPU mesh and on a
``--xla_force_host_platform_device_count`` virtual CPU mesh (interpret mode),
which is how the multi-chip tests run (SURVEY.md §4 tier d).

Note on the XLA ``algebraic_simplifier ... circular simplification loop``
E-log seen on virtual-mesh runs: bisection (r2) shows it fires only for the
*interpret-mode* Pallas kernel's HLO expansion inside the SPMD partitioner's
simplifier pipeline — the same kernel compiled outside shard_map is clean,
and so is the band-assembly math under shard_map. Compilation completes and
results are exact; on real TPUs the kernel is a Mosaic custom call, so the
oscillating HLO pattern never reaches the partitioner. Benign, virtual-mesh
only.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import scan as S
from ..errors import CompegError, bail
from ..metadata import ImageData
from ..ops import color as C
from ..ops import entropy as E
from ..ops import idct as D


def make_mesh(n_data: int, n_seq: int = 1, devices=None) -> Mesh:
    """A (data, seq) mesh over the first ``n_data * n_seq`` devices."""
    devices = devices if devices is not None else jax.devices()
    need = n_data * n_seq
    if len(devices) < need:
        bail(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_data, n_seq)
    return Mesh(arr, ("data", "seq"))


@dataclass
class BandedFrame:
    """One frame packed as ``n_bands`` horizontal bands of MCU rows.

    words:    [n_bands, G_b, W, 8, 128] uint32
    seg_mcus: [n_bands, G_b, 8, 128] int32
    band_rows: MCU rows per band (uniform; trailing bands may be padding)
    tiling:   (n_tr_b, n_tc) when the bands carry the raster-tiled slot
              layout (the fast path); None for the linear fallback layout.
    """

    words: np.ndarray
    seg_mcus: np.ndarray
    qz_by_slot: np.ndarray
    plan: E.EntropyPlan
    band_rows: int
    image: ImageData
    tiling: Optional[Tuple[int, int]] = None


def _plan(img: ImageData, w: int, num_blocks: int, zrl17: bool) -> E.EntropyPlan:
    ncomp = len(img.components)
    return E.EntropyPlan(
        ri=img.restart_interval,
        du_to_comp=tuple(img.du_to_comp),
        words_per_segment=w,
        num_blocks=num_blocks,
        total_mcus=img.total_mcus,
        dc=tuple(
            E.TableConsts.from_table(img.dc_table_for_comp(c))
            for c in range(ncomp)
        ),
        ac=tuple(
            E.TableConsts.from_table(img.ac_table_for_comp(c))
            for c in range(ncomp)
        ),
        zrl17=zrl17,
    )


def prepare_banded(
    img: ImageData,
    n_bands: int,
    words_per_segment: Optional[int] = None,
    zrl17: bool = False,
) -> BandedFrame:
    """Host-side packing of one frame into MCU-row bands.

    Fast path: the banded raster-tiled layout (requires the restart interval
    to divide the MCU-row width — segments never wrap rows, so every
    MCU-row band boundary is a restart boundary), packed by the native
    one-pass AVX2 pack when available. Fallback: linear per-band slots with
    bands cut at the nearest restart boundary (band height rounded up so
    each band covers whole restart intervals — works for any Ri).
    """
    from .. import native

    ri = img.restart_interval
    wm, hm = img.width_mcus, img.height_mcus
    tile = S.TileMap.for_geometry(hm, wm, ri, n_bands=n_bands)

    if tile is not None:
        g_b = tile.n_tr * tile.n_tc
        if words_per_segment is None:
            if native.available():
                n, mx = native.scan_info(img.scan_data)
                if n != img.total_restart_intervals:
                    bail(
                        f"scan contains {n} restart intervals, expected "
                        f"{img.total_restart_intervals}"
                    )
                words_per_segment = S._words_per_segment(mx)
            else:
                intervals = S.split_intervals(
                    img.scan_data, img.total_restart_intervals
                )
                words_per_segment = S._words_per_segment(
                    max(len(s) for s in intervals)
                )
        w = words_per_segment
        ntile = (tile.segs_per_row, tile.n_tc, tile.band_rows)
        if native.available():
            src, off, ln = (
                (img.source, img.scan_offset, len(img.scan_data))
                if img.source is not None
                else (img.scan_data, 0, len(img.scan_data))
            )
            words, active = native.pack_blocks(
                src,
                img.total_restart_intervals,
                w,
                tile.num_blocks,
                offset=off,
                length=ln,
                tile=ntile,
            )
        else:
            intervals = S.split_intervals(
                img.scan_data, img.total_restart_intervals
            )
            blk = S.to_device_layout(
                intervals,
                w,
                slot_of_segment=tile.slot_of_segment(hm),
                num_blocks=tile.num_blocks,
            )
            words, active = blk.words, blk.active
        # ri | wm => every segment holds exactly ri MCUs; the count is just
        # ri * active (same shortcut as the single-chip tiled prepare).
        seg_mcus = (ri * active).astype(np.int32)
        return BandedFrame(
            words=words.reshape((n_bands, g_b) + words.shape[1:]),
            seg_mcus=seg_mcus.reshape((n_bands, g_b) + seg_mcus.shape[1:]),
            qz_by_slot=D.qz_by_slot_array(img),
            plan=_plan(img, w, g_b, zrl17),
            # Unbanded TileMap (n_bands == 1) reports band_rows == 0; the
            # single band covers the whole image.
            band_rows=tile.band_rows or hm,
            image=img,
            tiling=(tile.n_tr, tile.n_tc),
        )

    # ---- linear fallback (Ri does not divide the MCU-row width) ----------
    # Bands must cover whole restart intervals; the smallest row count whose
    # MCU total is a multiple of ri is r0 = ri / gcd(ri, wm). Rounding the
    # band height up to r0 cuts every band at a restart boundary (trailing
    # bands may be empty — they decode padding and are cropped).
    r0 = ri // math.gcd(ri, wm)
    band_rows = -(-(-(-hm // n_bands)) // r0) * r0
    band_mcus = band_rows * wm
    segs_per_band = band_mcus // ri
    g_b = -(-segs_per_band // S.SEGMENTS_PER_BLOCK)

    intervals = S.split_intervals(img.scan_data, img.total_restart_intervals)
    if words_per_segment is None:
        words_per_segment = S._words_per_segment(max(len(s) for s in intervals))

    words = np.zeros(
        (n_bands, g_b, words_per_segment, S.SUBLANES, S.LANES), dtype=np.uint32
    )
    seg_mcus = np.zeros((n_bands, g_b, S.SUBLANES, S.LANES), dtype=np.int32)
    for b in range(n_bands):
        lo = b * segs_per_band
        hi = min(len(intervals), lo + segs_per_band)
        if hi <= lo:
            continue
        d = S.to_device_layout(intervals[lo:hi], words_per_segment)
        words[b, : d.num_blocks] = d.words
        # MCUs per segment within this band (short final interval handling).
        idx = lo + np.arange(g_b * S.SEGMENTS_PER_BLOCK, dtype=np.int64)
        mc = np.clip(img.total_mcus - idx * ri, 0, ri).astype(np.int32)
        mc[hi - lo :] = 0
        seg_mcus[b] = mc.reshape(g_b, S.SUBLANES, S.LANES)

    return BandedFrame(
        words=words,
        seg_mcus=seg_mcus,
        qz_by_slot=D.qz_by_slot_array(img),
        plan=_plan(img, words_per_segment, g_b, zrl17),
        band_rows=band_rows,
        image=img,
        tiling=None,
    )


def stack_banded(frames: List[BandedFrame]) -> Tuple[np.ndarray, np.ndarray]:
    """Stack same-plan frames into batch arrays [B, n_bands, ...]."""
    return (
        np.stack([f.words for f in frames]),
        np.stack([f.seg_mcus for f in frames]),
    )


def decode_batch_sharded(
    words: jax.Array,  # [B, NB, G_b, W, 8, 128]
    seg_mcus: jax.Array,  # [B, NB, G_b, 8, 128]
    qz_by_slot: jax.Array,  # [DUS, 64]
    plan: E.EntropyPlan,
    *,
    mesh: Mesh,
    geom,  # pipeline.FrameGeometry
    band_rows: int,
    tiling: Optional[Tuple[int, int]],
    retained: int = 64,
    interpret: bool = False,
    fancy_upsample: bool = False,
    exact_idct: bool = False,
) -> jax.Array:
    """Decode a batch of banded frames over the mesh.

    Returns packed RGBA ``[B, H, W]`` u32 (r | g<<8 | b<<16 | a<<24 — the
    single-chip fused contract; ``ops.fused.rgba_to_rgb_array`` views it as
    RGB u8 host-side), sharded (data, seq-concatenated rows). ``tiling``
    must be the frame's ``BandedFrame.tiling`` — it states which slot
    layout the words were packed in. With it (the fast path) every shard
    runs the single-chip default pipeline: the in-kernel composite for
    nearest upsampling, the planes + fused epilogue for fancy; ``None``
    (the linear fallback layout) takes the staged path. Required keyword:
    the two layouts are indistinguishable from the arrays alone, and
    decoding one as the other yields silently wrong pixels.
    """
    B, NB, G_b = words.shape[:3]
    n_data, n_seq = mesh.shape["data"], mesh.shape["seq"]
    if B % n_data or NB % n_seq:
        bail(f"batch {B}x{NB} not divisible by mesh {n_data}x{n_seq}")
    if tiling is not None:
        return _decode_sharded_tiled(
            words, seg_mcus, qz_by_slot, plan,
            mesh=mesh, geom=geom, band_rows=band_rows, tiling=tiling,
            retained=retained, interpret=interpret,
            fancy_upsample=fancy_upsample, exact_idct=exact_idct,
        )
    return _decode_sharded_staged(
        words, seg_mcus, qz_by_slot, plan,
        mesh=mesh, geom=geom, band_rows=band_rows,
        retained=retained, interpret=interpret,
        fancy_upsample=fancy_upsample, exact_idct=exact_idct,
    )


def _idct_consts(
    qz_by_slot: np.ndarray, retained: int, exact_idct: bool
) -> np.ndarray:
    """The fused kernel's IDCT operand (same construction as the single-chip
    Decoder._stream_consts): paired f32 operators, or broadcast int32
    quantizers for the exact-integer mode."""
    if exact_idct:
        q = np.asarray(qz_by_slot).astype(np.int32)
        if retained < 64:
            q = q.copy()
            q[:, retained:] = 0
        qb = np.broadcast_to(
            q[:, :, None, None], q.shape + (S.SUBLANES, S.LANES)
        )
        return np.ascontiguousarray(qb)
    from ..ops.luts import idct_dequant_matrices_paired

    return idct_dequant_matrices_paired(np.asarray(qz_by_slot), retained)


def _decode_sharded_tiled(
    words, seg_mcus, qz_by_slot, plan, *, mesh, geom, band_rows, tiling,
    retained, interpret, fancy_upsample, exact_idct,
):
    B, NB = words.shape[:2]
    fn = _tiled_program(
        plan, geom, band_rows, tuple(tiling), mesh, B, NB,
        retained, interpret, fancy_upsample, exact_idct,
    )
    lq = jnp.asarray(_idct_consts(np.asarray(qz_by_slot), retained, exact_idct))
    return fn(words, seg_mcus, lq)


@functools.lru_cache(maxsize=64)
def _tiled_program(
    plan, geom, band_rows, tiling, mesh, B, NB,
    retained, interpret, fancy_upsample, exact_idct,
):
    """Build (once per static configuration) the shard_map-wrapped tiled
    decode program. Cached: rebuilding the closure per call would defeat
    jit's executable cache and recompile the whole pipeline every frame."""
    from ..ops import fused as F

    G_b = tiling[0] * tiling[1]
    n_data, n_seq = mesh.shape["data"], mesh.shape["seq"]
    B_l, NB_l = B // n_data, NB // n_seq
    n_tr_b, n_tc = tiling
    samplings = geom.samplings
    max_h = max(s[0] for s in samplings)
    max_v = max(s[1] for s in samplings)
    wm, hm = geom.width_mcus, geom.height_mcus
    img_w = wm * 8 * max_h
    band_h = band_rows * 8 * max_v
    shard_h = NB_l * band_h
    needs_halo = fancy_upsample and any(max_v // sv > 1 for _, sv in samplings)

    def shard_fn(w_l, s_l, lq):
        flat = B_l * NB_l * G_b
        plan_l = dataclasses.replace(plan, num_blocks=flat)
        wf = w_l.reshape((flat,) + w_l.shape[3:])
        sf = s_l.reshape((flat,) + s_l.shape[3:])
        if not fancy_upsample:
            # Nearest: the in-kernel composite, same as the single-chip
            # default. One minor-pair swap over the shard-tall RGBA slab,
            # then the per-band crop of tile-row padding, then bands/frames
            # fold into contiguous rows.
            blocks = F.fused_decode_blocks(
                wf, sf, lq, plan_l, samplings, retained, interpret,
                exact_idct, tiled=True,
                tiling=(B_l * NB_l * n_tr_b, n_tc), rgb=geom.rgb,
            )
            rows_tot, RT, M = blocks.shape  # rows_tot = B_l*NB_l*n_tr_b
            rimw = M // (n_tc * S.LANES)
            z = blocks.reshape(rows_tot * RT, n_tc, rimw, S.LANES)
            z = z.swapaxes(2, 3).reshape(rows_tot * RT, M)
            z = z.reshape(B_l * NB_l, n_tr_b * RT, M)
            z = z[:, : band_rows * 8 * max_v, : img_w]
            return z.reshape(B_l, shard_h, img_w)

        slabs = F.fused_decode_planes(
            wf, sf, lq, plan_l, samplings,
            (B_l * NB_l * n_tr_b, n_tc),
            retained, interpret, exact_idct,
        )
        # Per component: one minor-pair swap over the whole shard-tall slab
        # (identical to the single-chip assemble), then the per-band crop of
        # tile-row padding, then bands/frames fold into contiguous rows.
        comp_planes = []
        for slab, (sh, sv) in zip(slabs, samplings):
            rows_tot, RT, M = slab.shape  # rows_tot = B_l*NB_l*n_tr_b
            riwq = M // (n_tc * S.LANES)
            z = slab.reshape(rows_tot * RT, n_tc, riwq, S.LANES)
            z = z.swapaxes(2, 3).reshape(rows_tot * RT, M)
            z = z.reshape(B_l * NB_l, n_tr_b * RT, M)
            z = z[:, : band_rows * 8 * sv, : wm * 8 * sh // 4]
            comp_planes.append(
                z.reshape(B_l, NB_l * band_rows * 8 * sv, wm * 8 * sh // 4)
            )

        def fin(planes_f):
            return F.finalize_planes(
                planes_f, samplings, img_w, shard_h, fancy_upsample,
                rgb=geom.rgb,
                seq_axis="seq" if needs_halo else None,
                v_rows=(hm, NB_l * band_rows),
            )

        return jax.vmap(fin)(tuple(comp_planes))  # [B_l, shard_h, img_w] u32

    spec_in = P("data", "seq")
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_in, spec_in, P()),
        out_specs=P("data", "seq"),
        check_vma=False,
    )

    # One jitted program per configuration, crop included (a crop outside
    # the jit costs a separate dispatch + copy per call).
    def run(w, s, lq):
        return mapped(w, s, lq)[:, : geom.height, : geom.width]

    return jax.jit(run)


def _decode_sharded_staged(
    words, seg_mcus, qz_by_slot, plan, *, mesh, geom, band_rows,
    retained, interpret, fancy_upsample, exact_idct=False,
):
    """Fallback for streams with no tiled layout (Ri does not divide the
    MCU-row width): staged entropy + IDCT + band assembly per shard.
    ``exact_idct`` swaps the float MXU IDCT for the vectorized integer
    butterfly (ops/idct.idct_pixels_exact), so the bit-exact mode shards
    for any restart interval."""
    fn = _staged_program(
        plan, geom, band_rows, mesh, retained, interpret, fancy_upsample,
        exact_idct,
    )
    return fn(words, seg_mcus, qz_by_slot)


@functools.lru_cache(maxsize=64)
def _staged_program(
    plan, geom, band_rows, mesh, retained, interpret, fancy_upsample,
    exact_idct=False,
):
    """Cached shard_map program for the staged fallback (see _tiled_program
    for why the wrapper must not be rebuilt per call)."""
    G_b = plan.num_blocks
    wm = geom.width_mcus

    def shard_fn(w_l, s_l, qz):
        B_l, NB_l = w_l.shape[0], w_l.shape[1]
        flat_blocks = B_l * NB_l * G_b
        plan_l = dataclasses.replace(plan, num_blocks=flat_blocks)
        wf = w_l.reshape((flat_blocks,) + w_l.shape[3:])
        sf = s_l.reshape((flat_blocks,) + s_l.shape[3:])
        coeffs = E.entropy_decode(wf, sf, plan_l, interpret=interpret)
        idct = D.idct_pixels_exact if exact_idct else D.idct_pixels
        pix = idct(coeffs, qz, retained)
        pix = pix.reshape((B_l, NB_l, G_b) + pix.shape[1:])

        def one_band(p):
            rgb = C.finalize_band(
                p,
                ri=plan.ri,
                du_to_comp=plan.du_to_comp,
                samplings=geom.samplings,
                band_width_mcus=wm,
                band_height_mcus=band_rows,
                fancy=fancy_upsample,
                seq_axis="seq" if fancy_upsample else None,
                rgb=geom.rgb,
            ).astype(jnp.int32)
            # Pack to the u32 RGBA contract (elementwise; XLA fuses it
            # into the finalize pass).
            packed = (
                rgb[..., 0] | (rgb[..., 1] << 8) | (rgb[..., 2] << 16)
                | jnp.int32(-16777216)
            )
            return jax.lax.bitcast_convert_type(packed, jnp.uint32)

        return jax.vmap(jax.vmap(one_band))(pix)  # [B_l, NB_l, band_h, W]

    band_h = band_rows * 8 * max(s[1] for s in geom.samplings)
    img_w = wm * 8 * max(s[0] for s in geom.samplings)
    spec_in = P("data", "seq")
    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_in, spec_in, P()),
        out_specs=P("data", "seq"),
        check_vma=False,
    )

    def run(w, s, qz):
        B, NB = w.shape[:2]
        out = mapped(w, s, qz).reshape(B, NB * band_h, img_w)
        return out[:, : geom.height, : geom.width]

    return jax.jit(run)


def dryrun(n_devices: int) -> None:
    """Driver hook: jit + execute one fully sharded decode step on an
    n-devices mesh with tiny shapes (data x seq = (n/2, 2) when possible).
    Runs THREE configurations so both slot layouts compile and execute:
    the production tiled planes path (fused kernel + native-layout banded
    tiling), tiled + the halo-aware fancy epilogue (ppermute over ICI), and
    the staged fallback (irregular Ri — segments wrap rows) with the exact
    integer IDCT."""
    import jax

    from ..encoder import encode
    from ..metadata import analyze
    from ..pipeline import FrameGeometry

    n_seq = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    n_data = n_devices // n_seq
    mesh = make_mesh(n_data, n_seq)

    # Tiny frame: height 4 MCU rows so 2 bands x 2 rows; batch of n_data.
    h, w = 32, 32
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 7 % 256, yy * 5 % 256, (xx + yy) % 256], axis=-1).astype(
        np.uint8
    )
    interpret = jax.default_backend() != "tpu"
    for ri, kwargs in (
        (1, dict(fancy_upsample=False)),  # tiled planes fast path
        (1, dict(fancy_upsample=True)),   # tiled + halo-aware fancy epilogue
        # Ri=3 does not divide the 2-MCU row width: no tiled layout exists,
        # bands cut at restart boundaries, staged kernel per shard — with
        # exact_idct (the bit-exact mode on the fallback layout).
        (3, dict(exact_idct=True)),
    ):
        data = encode(img, sampling="422", quality=85, restart_interval_mcus=ri)
        meta = analyze(data)
        geom = FrameGeometry.from_image(meta)
        bf = prepare_banded(meta, n_seq)
        words, seg_mcus = stack_banded([bf] * n_data)
        assert (bf.tiling is not None) == (ri == 1), (ri, bf.tiling)
        out = decode_batch_sharded(
            jnp.asarray(words),
            jnp.asarray(seg_mcus),
            jnp.asarray(bf.qz_by_slot),
            bf.plan,
            mesh=mesh,
            geom=geom,
            band_rows=bf.band_rows,
            tiling=bf.tiling,
            interpret=interpret,
            **kwargs,
        )
        out.block_until_ready()
        assert out.shape == (n_data, h, w) and out.dtype == jnp.uint32, (
            out.shape, out.dtype)
