"""Sharded decode over a device mesh.

Two axes of parallelism, composable:

 * ``data``: frames of a batch are independent — pure data parallelism over
   chips/hosts (the dominant production configuration: many streams).
 * ``seq``: one frame's MCU rows are split into horizontal *bands*, one per
   mesh slot; restart segments give clean cut points (each band decodes its
   own segments independently, exactly the property the reference exploits
   per GPU thread, src/file.rs:663-671, lifted to the device mesh).

Bands align to MCU rows, so nearest-neighbor chroma upsampling needs no
cross-band communication (4:2:2 subsamples horizontally only; 4:2:0's
vertical replication stays inside an MCU). The optional *fancy* (triangle)
chroma upsampler does need each band's neighbor boundary rows — those are
exchanged over ICI with ``jax.lax.ppermute`` (see ops/color.py fancy mode).

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

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import scan as S
from ..errors import bail
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
    band_rows: MCU rows per band (uniform; last band padded)
    """

    words: np.ndarray
    seg_mcus: np.ndarray
    qz_by_slot: np.ndarray
    plan: E.EntropyPlan
    band_rows: int
    image: ImageData


def prepare_banded(
    img: ImageData,
    n_bands: int,
    words_per_segment: Optional[int] = None,
) -> BandedFrame:
    """Host-side packing of one frame into MCU-row bands.

    Requires band boundaries to land on restart-interval boundaries:
    ``(band_rows * width_mcus) % ri == 0`` (always true for Ri=1 streams).
    """
    ri = img.restart_interval
    wm, hm = img.width_mcus, img.height_mcus
    band_rows = -(-hm // n_bands)
    band_mcus = band_rows * wm
    if band_mcus % ri != 0:
        bail(
            f"band of {band_mcus} MCUs not divisible by restart interval {ri};"
            " choose a band count aligned to restart boundaries"
        )
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

    plan = E.EntropyPlan(
        ri=ri,
        du_to_comp=tuple(img.du_to_comp),
        words_per_segment=words_per_segment,
        num_blocks=g_b,
        total_mcus=img.total_mcus,
        dc=tuple(
            E.TableConsts.from_table(img.dc_table_for_comp(c))
            for c in range(len(img.components))
        ),
        ac=tuple(
            E.TableConsts.from_table(img.ac_table_for_comp(c))
            for c in range(len(img.components))
        ),
    )
    return BandedFrame(
        words=words,
        seg_mcus=seg_mcus,
        qz_by_slot=D.qz_by_slot_array(img),
        plan=plan,
        band_rows=band_rows,
        image=img,
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
    retained: int = 64,
    interpret: bool = False,
    fancy_upsample: bool = False,
) -> jax.Array:
    """Decode a batch of banded frames over the mesh.

    Returns ``[B, H, W, 3]`` u8, sharded (data, seq-concatenated rows).
    """
    B, NB, G_b = words.shape[:3]
    n_data, n_seq = mesh.shape["data"], mesh.shape["seq"]
    if B % n_data or NB % n_seq:
        bail(f"batch {B}x{NB} not divisible by mesh {n_data}x{n_seq}")

    band_h = band_rows * 8 * max(s[1] for s in geom.samplings)
    wm = geom.width_mcus
    img_w = wm * 8 * max(s[0] for s in geom.samplings)

    from ..ops.luts import idct_dequant_matrices_paired

    lq_host = idct_dequant_matrices_paired(np.asarray(qz_by_slot), retained)

    def shard_fn(w_l, s_l, qz, lq):
        # w_l: [B_l, NB_l, G_b, W, 8, 128]
        B_l, NB_l = w_l.shape[0], w_l.shape[1]
        flat_blocks = B_l * NB_l * G_b
        plan_l = E.EntropyPlan(
            ri=plan.ri,
            du_to_comp=plan.du_to_comp,
            words_per_segment=plan.words_per_segment,
            num_blocks=flat_blocks,
            total_mcus=plan.total_mcus,
            dc=plan.dc,
            ac=plan.ac,
        )
        wf = w_l.reshape((flat_blocks,) + w_l.shape[3:])
        sf = s_l.reshape((flat_blocks,) + s_l.shape[3:])

        if not fancy_upsample:
            # Production path: the fused single-kernel decode per shard.
            from ..ops import fused as F

            blocks = F.fused_decode_blocks(
                wf, sf, lq, plan_l, geom.samplings, retained, interpret
            )
            mh = blocks.shape[2]
            mwz = blocks.shape[3]
            blocks = blocks.reshape((B_l, NB_l, G_b) + blocks.shape[1:])

            def band_img(blk):
                # [G_b, RI, mh, mw, 8, 128] -> [band_h, band_w] u32
                Gb, RI = blk.shape[0], blk.shape[1]
                x = blk.transpose(0, 4, 5, 1, 2, 3).reshape(
                    Gb * S.SUBLANES * S.LANES * RI, mh, mwz
                )
                x = x[: band_rows * wm].reshape(band_rows, wm, mh, mwz)
                return x.transpose(0, 2, 1, 3).reshape(band_rows * mh, wm * mwz)

            imgs = jax.vmap(jax.vmap(band_img))(blocks)  # [B_l, NB_l, bh, bw]
            # Unpack RGBA u32 -> [.., 3] u8 to match the staged path's output.
            r = (imgs & 0xFF).astype(jnp.uint8)
            g = ((imgs >> 8) & 0xFF).astype(jnp.uint8)
            b = ((imgs >> 16) & 0xFF).astype(jnp.uint8)
            return jnp.stack([r, g, b], axis=-1)

        coeffs = E.entropy_decode(wf, sf, plan_l, interpret=interpret)
        pix = D.idct_pixels(coeffs, qz, retained)
        # [flat, RI, DUS, 64, 8, 128] -> per (frame, band) assembly.
        pix = pix.reshape((B_l, NB_l, G_b) + pix.shape[1:])

        def one_band(p):
            return C.finalize_band(
                p,
                ri=plan.ri,
                du_to_comp=plan.du_to_comp,
                samplings=geom.samplings,
                band_width_mcus=wm,
                band_height_mcus=band_rows,
                fancy=fancy_upsample,
                seq_axis="seq" if fancy_upsample else None,
            )

        out = jax.vmap(jax.vmap(one_band))(pix)  # [B_l, NB_l, band_h, W, 3]
        return out

    spec_in = P("data", "seq")
    out = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_in, spec_in, P(), P()),
        out_specs=P("data", "seq"),
        check_vma=False,
    )(words, seg_mcus, qz_by_slot, jnp.asarray(lq_host))
    # [B, NB, band_h, W, 3] -> [B, NB*band_h, W, 3] -> crop.
    out = out.reshape(B, NB * band_h, img_w, 3)
    return out[:, : geom.height, : geom.width]


def dryrun(n_devices: int) -> None:
    """Driver hook: jit + execute one fully sharded decode step on an
    n-devices mesh with tiny shapes (data x seq = (n/2, 2) when possible)."""
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
    data = encode(img, sampling="422", quality=85, restart_interval_mcus=1)
    meta = analyze(data)
    bf = prepare_banded(meta, n_seq)
    words, seg_mcus = stack_banded([bf] * n_data)
    geom = FrameGeometry.from_image(meta)
    interpret = jax.default_backend() != "tpu"
    out = decode_batch_sharded(
        jnp.asarray(words),
        jnp.asarray(seg_mcus),
        jnp.asarray(bf.qz_by_slot),
        bf.plan,
        mesh=mesh,
        geom=geom,
        band_rows=bf.band_rows,
        interpret=interpret,
    )
    out.block_until_ready()
    assert out.shape == (n_data, h, w, 3), out.shape
