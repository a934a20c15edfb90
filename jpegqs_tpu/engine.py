"""The TPU-native smoothing engine.

This is the JAX equivalent of the reference's engine orchestrator
``do_quantsmooth`` (reference: quantsmooth.h:2404-2878): per component,
dequantize onto the device, iterate {IDCT refresh -> block pass ->
rebalance}, then run the optional JOINT_YUV / UPSAMPLE_UV color paths.

Architecture (SURVEY.md §7): the host does entropy decode/encode; the
device holds int32 coefficient tensors [B, 64] and padded pixel planes.
Each (shape, flags, niter, ...) configuration compiles once; the niter
loop is unrolled inside a single jitted function so a whole component
pass is one device program.  OpenMP row-parallelism of the reference
collapses into the block axis (all blocks are lanes); multi-chip
sharding lives in parallel/.

Bit-exactness contract: output coefficient planes are bit-identical to
the scalar (SIMD=none) reference build at every quality level — see
tests/test_engine.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .options import (JOINT_YUV, UPSAMPLE_UV, LOW_QUALITY,
                      NO_REBALANCE, NO_REBALANCE_UV, ITER_MAX, QsOptions)
from .specref import make_solver_tables
from .ops import planar
from .ops import fp32
from .ops import pallas_solver
from .ops.quant import make_quant_tables, roundf, c_f32_to_i32
from .ops.plane import downsample_plane
from .ops.upsample import upsample_chroma

F = jnp.float32
I32 = jnp.int32
CENTERJSAMPLE = 128


def _int16_wrap(x):
    """Model C's int16 coefficient storage (JCOEF) exactly."""
    return x.astype(jnp.int16).astype(I32)


def block_pass_p(coef, pix, image2, div, x1, qshr, flags, tables, luma,
                 mkhalo10, mkborders, hb, wb, want_pix=False):
    """One smoothing pass over all blocks of a component, planar layout
    (reference: quantsmooth.h:564-1848; driver loop 2624-2651).

    coef int32[64, B]; pix int32[8, 8, B] (current pixel blocks);
    image2: downsampled-luma halos int32[10, 10, B] or None.
    ``mkhalo10(pix) -> [10, 10, B]`` and ``mkborders(pix) -> 4x[8, B]``
    supply the cross-block pixel neighborhoods — the single-device
    gathers here, ppermute-exchanging variants in parallel/sharded.py.

    Returns (coef, new_pix): with ``want_pix`` on the Pallas path the
    kernel emits the IDCT of the updated coefficients directly (saving
    the XLA idct pass the driver loop would otherwise run); otherwise
    new_pix is None and the caller derives it.
    """
    do_reb = not (flags & NO_REBALANCE
                  or (not luma and (flags & NO_REBALANCE_UV)))
    if pallas_solver.use_pallas():
        if image2 is not None or (flags & LOW_QUALITY):
            # JOINT/LQ preamble + sweep + rebalance in ONE kernel
            out = pallas_solver.solve_fused(
                coef, mkhalo10(pix), image2, div, x1, qshr, flags,
                do_reb, fence=fp32.fence_value(), want_pix=want_pix)
        else:
            # fused sweep+rebalance kernel, VMEM-resident per tile
            out = pallas_solver.solve_rebalance(
                coef, mkborders(pix), div, x1, qshr, flags, do_reb,
                fence=fp32.fence_value(), want_pix=want_pix)
        return out if want_pix else (out, None)

    if image2 is not None:
        fb = planar.joint_yuv_fblocks(mkhalo10(pix), image2)
        coef = planar.fdct_clamp_p(fb, coef, div, x1, qshr)

    if flags & LOW_QUALITY:
        if image2 is None:
            rng = planar.low_quality_range_p(coef, div)
            fb = planar.low_quality_fblocks(mkhalo10(pix), rng)
            coef = planar.fdct_clamp_p(fb, coef, div, x1, qshr)
    else:
        borders = mkborders(pix)
        coef = planar.solve_blocks_p(coef, borders, div, x1, qshr, tables,
                                     hb, wb)
    if do_reb:
        coef = planar.rebalance_blocks_p(coef, div, x1, qshr)
    return coef, None


def _block_pass_p(coef, pix, image2, div, x1, qshr, flags, tables, luma,
                  hb, wb, want_pix=False):
    """Single-device block pass: in-array neighbor gathers."""
    return block_pass_p(
        coef, pix, image2, div, x1, qshr, flags, tables, luma,
        lambda p: planar.blocks_halo10(p, hb, wb),
        lambda p: planar.borders_from_blocks(p, hb, wb), hb, wb,
        want_pix=want_pix)


def _pallas_resident_iters(coef, pix, img2, div, x1, qshr, flags, luma,
                           hb, wb, niter, extra_refresh, n=1):
    """Pallas driver loop with fully resident tiled state: after the
    iter-0 IDCT, coefficients AND pixels stay in the kernel tile layout
    across iterations; the solver borders / pixel halo are rebuilt in
    VMEM from the resident pixel window each pass
    (pallas_solver._ring_from_pix), so no XLA gather, IDCT, or layout
    transpose runs between iterations (quantsmooth.h:2580-2651).

    For a batched call (batch.py) the block axis holds n same-shape
    planes concatenated; the per-image-local edge masks keep the
    in-kernel neighbor reads from crossing image boundaries.

    ``pix=None`` seeds the pixel state with the kernel's own IDCT of
    the tiled coefficients (idct_pix_tiles) — no XLA idct pass or
    pixel-array layout transpose runs at all."""
    B = coef.shape[1]
    do_reb = not (flags & NO_REBALANCE
                  or (not luma and (flags & NO_REBALANCE_UV)))
    coef_t = pallas_solver.tile_blocks(coef)
    if pix is None:
        pix_t = pallas_solver.idct_pix_tiles(coef_t, div, x1, qshr,
                                             fence=fp32.fence_value())
    else:
        pix_t = pallas_solver.tile_blocks(pix.reshape(64, B))
    masks_t = pallas_solver.edge_masks(hb, wb, n)
    img2_t = (pallas_solver.tile_blocks(img2.reshape(100, B))
              if img2 is not None else None)
    joint_or_lq = img2 is not None or (flags & LOW_QUALITY)
    for it in range(niter):
        keep = bool(it < niter - 1 or extra_refresh)
        if joint_or_lq:
            out = pallas_solver.solve_fused_pix(
                coef_t, pix_t, masks_t, img2_t, div, x1, qshr, flags,
                do_reb, wb, fence=fp32.fence_value(), want_pix=keep)
        else:
            out = pallas_solver.solve_rebalance_pix(
                coef_t, pix_t, masks_t, div, x1, qshr, flags, do_reb,
                wb, fence=fp32.fence_value(), want_pix=keep)
        if keep:
            coef_t, pix_t = out
        else:
            coef_t = out
    coef = pallas_solver.untile_blocks(coef_t, B)
    pix = pallas_solver.untile_blocks(pix_t, B).reshape(8, 8, B)
    return coef, pix


@partial(jax.jit, static_argnames=("hb", "wb", "flags", "niter",
                                   "extra_refresh", "luma", "use_image2",
                                   "want_plane"))
def _component_smooth_impl(coef16, qraw, div, x1, qshr, image2, fence, *,
                           hb, wb, flags, niter, extra_refresh, luma,
                           use_image2, want_plane=True):
    with fp32.fence_token(fence):
        return _component_smooth_body(
            coef16, qraw, div, x1, qshr, image2, hb=hb, wb=wb, flags=flags,
            niter=niter, extra_refresh=extra_refresh, luma=luma,
            use_image2=use_image2, want_plane=want_plane)


def component_smooth(coef16, qraw, div, x1, qshr, image2, **cfg):
    """Public entry: full smoothing of one component plane (one device
    program).  Injects the runtime-zero fp32 fence token (ops/fp32.py)."""
    return _component_smooth_impl(coef16, qraw, div, x1, qshr, image2,
                                  jnp.int32(0), **cfg)


def _component_smooth_body(coef16, qraw, div, x1, qshr, image2, *, hb, wb,
                           flags, niter, extra_refresh, luma, use_image2,
                           want_plane=True):
    """Full smoothing of one component plane, one device program.

    coef16 int16[B,64] (quantized, straight from entropy decode);
    qraw int32[64] raw quantizers; div/x1/qshr from make_quant_tables;
    image2: downsampled-luma padded plane (or a dummy when unused).

    Returns (coef int32[B,64] final-clamped, padded plane int32, badv).
    Models reference quantsmooth.h:2580-2689 including the iter-0
    dequantization overflow guard (2596-2610).  Compute runs in the
    planar layout (ops/planar.py); the padded plane is only built when
    a color path needs it (want_plane).
    """
    B = hb * wb
    tables = None
    if not (flags & LOW_QUALITY):
        tables = make_solver_tables(flags)

    # iter 0: dequantize with int16 storage and the crafted-file guard.
    coef_nat = coef16.astype(I32)
    prod = coef_nat.T * qraw[:, None]                     # planar [64, B]
    orv = jnp.bitwise_or.reduce((prod + 0x800).ravel())
    badv = (orv >> 12) != 0
    coef = _int16_wrap(prod)
    coef_dq = coef

    img2 = None
    if use_image2 and (flags & JOINT_YUV):
        # image2 halos computed once per component (it is constant
        # across iterations); accepted either as a padded plane or
        # already in [10, 10, B] halo form
        img2 = (image2 if use_image2 == "halo"
                else planar.padded_plane_to_halo10(image2, hb, wb))

    # Driver loop (quantsmooth.h:2580-2651).  The pass-input pixels for
    # iteration 0 come from the dequantized coefficients; afterwards
    # the Pallas kernel emits the refreshed pixels itself (want_pix),
    # so no XLA idct pass runs between iterations.  The final `pix`
    # matches the reference: refreshed only when extra_refresh asks.
    if pallas_solver.use_pallas() and niter > 0:
        coef, pix = _pallas_resident_iters(coef, None, img2, div, x1,
                                           qshr, flags, luma, hb, wb,
                                           niter, extra_refresh)
    else:
        pix = planar.idct_islow_p(coef.reshape(8, 8, B))
        for it in range(niter):
            keep = it < niter - 1 or extra_refresh
            coef, newpix = _block_pass_p(coef, pix, img2, div, x1, qshr,
                                         flags, tables, luma, hb, wb,
                                         want_pix=bool(keep))
            if keep:
                pix = (newpix if newpix is not None
                       else planar.idct_islow_p(coef.reshape(8, 8, B)))

    if want_plane == "pix":
        padded = pix                     # block form, no plane transpose
    elif want_plane:
        padded = planar.pix_to_plane(pix, hb, wb)
    else:
        padded = jnp.zeros((1, 1), dtype=I32)

    # Crafted-file fallback: keep the plain dequantized coefficients
    # (quantsmooth.h:2596-2610 sets stop before the block passes run).
    coef = jnp.where(badv, coef_dq, coef)
    # final coefficient clamp +-1023 (quantsmooth.h:2668-2689)
    coef = jnp.clip(coef, -1023, 1023)
    return coef.T, padded, badv


@partial(jax.jit, static_argnames=("hb_l", "wb_l", "hb_c", "wb_c",
                                   "ws", "hs"))
def downsample_jit(padded_luma, *, hb_l, wb_l, hb_c, wb_c, ws, hs):
    return downsample_plane(padded_luma, hb_l, wb_l, hb_c, wb_c, ws, hs)


@partial(jax.jit, static_argnames=("img_w", "img_h", "ws", "hs",
                                   "hb_l", "wb_l"))
def _upsample_fdct_impl(padded_chroma, image2, image1, fence, *, img_w,
                        img_h, ws, hs, hb_l, wb_l):
    with fp32.fence_token(fence):
        return _upsample_fdct_body(padded_chroma, image2, image1,
                                   img_w=img_w, img_h=img_h, ws=ws, hs=hs,
                                   hb_l=hb_l, wb_l=wb_l)


def upsample_fdct_jit(padded_chroma, image2, image1, **cfg):
    return _upsample_fdct_impl(padded_chroma, image2, image1,
                               jnp.int32(0), **cfg)


def _upsample_fdct_body(padded_chroma, image2, image1, *, img_w, img_h,
                        ws, hs, hb_l, wb_l):
    """UPSAMPLE_UV: upsampled chroma plane -> luma-dim coefficients
    (reference: quantsmooth.h:2732-2750)."""
    mem = upsample_chroma(padded_chroma, image2, image1, img_w, img_h,
                          ws, hs, hb_l, wb_l)
    fb = (mem - CENTERJSAMPLE).astype(F)
    out = planar.fdct_float_p(planar.plane_to_fblocks_p(fb, hb_l, wb_l))
    out = c_f32_to_i32(roundf(out.reshape(64, hb_l * wb_l)))
    return out.T.astype(jnp.int16).reshape(hb_l, wb_l, 64)


@partial(jax.jit, static_argnames=())
def dequant_fallback_jit(coef16, qraw):
    """Dequantize-only fallback once a crafted file is detected
    (quantsmooth.h:2551-2566)."""
    return _int16_wrap(coef16.astype(I32) * qraw[None, :]).astype(jnp.int16)


# ---------------------------------------------------------------------------
# Iteration-granular stages (the progress-callback path)
# ---------------------------------------------------------------------------

@jax.jit
def _dequant_stage(coef16, qraw):
    """Iter-0 dequantization with the crafted-file guard
    (quantsmooth.h:2596-2610).  Returns planar coef int32[64, B], badv."""
    prod = coef16.astype(I32).T * qraw[:, None]
    orv = jnp.bitwise_or.reduce((prod + 0x800).ravel())
    return _int16_wrap(prod), (orv >> 12) != 0


@partial(jax.jit, static_argnames=("hb", "wb"))
def _halo10_jit(padded, *, hb, wb):
    return planar.padded_plane_to_halo10(padded, hb, wb)


@partial(jax.jit, static_argnames=("hb", "wb", "flags", "luma",
                                   "use_image2"))
def _iter_stage_impl(coef, image2, div, x1, qshr, fence, *, hb, wb, flags,
                     luma, use_image2):
    """One smoothing iteration (IDCT refresh + block pass) as its own
    device program, so the host can interleave progress callbacks at
    the reference's cadence (quantsmooth.h:2580-2665)."""
    with fp32.fence_token(fence):
        B = hb * wb
        tables = None
        if not (flags & LOW_QUALITY):
            tables = make_solver_tables(flags)
        pix = planar.idct_islow_p(coef.reshape(8, 8, B))
        img2 = image2 if use_image2 else None
        coef, _ = _block_pass_p(coef, pix, img2, div, x1, qshr, flags,
                                tables, luma, hb, wb)
        return coef


@partial(jax.jit, static_argnames=("hb", "wb"))
def _idct_stage(coef, *, hb, wb):
    """Pass-1 pixel state of one iteration (quantsmooth.h:2586-2609's
    plane build, minus the iter-0 dequant handled by _dequant_stage)."""
    return planar.idct_islow_p(coef.reshape(8, 8, hb * wb))


@partial(jax.jit, static_argnames=("nrows", "hb", "wb", "flags", "luma",
                                   "use_image2"))
def _rows_stage_impl(coef, pix, image2, div, x1, qshr, r0, fence, *,
                     nrows, hb, wb, flags, luma, use_image2):
    """One PRECISE_PROGRESS row chunk: the block pass restricted to
    block rows [r0, r0+nrows) — pass 2 of the reference iteration
    under -DPRECISE_PROGRESS (quantsmooth.h:2624-2651), where the
    per-row atomic counter lets the callback fire (and cancel)
    between rows.  Reads the full pre-iteration pixel state, writes
    only its own rows' coefficients, so a mid-iteration cancel leaves
    exactly the reference's partial update."""
    with fp32.fence_token(fence):
        tables = None
        if not (flags & LOW_QUALITY):
            tables = make_solver_tables(flags)
        n = nrows * wb
        start = r0 * wb

        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, start, n,
                                                axis=x.ndim - 1)

        coef_sl = sl(coef)
        img2 = sl(image2) if use_image2 else None
        out_sl, _ = block_pass_p(
            coef_sl, pix, img2, div, x1, qshr, flags, tables, luma,
            lambda p: sl(planar.blocks_halo10(p, hb, wb)),
            lambda p: tuple(sl(b)
                            for b in planar.borders_from_blocks(p, hb, wb)),
            hb, wb)
        return jax.lax.dynamic_update_slice_in_dim(coef, out_sl, start,
                                                   axis=1)


@partial(jax.jit, static_argnames=("hb", "wb", "want_plane"))
def _final_stage_impl(coef, badv, coef_dq, fence, *, hb, wb, want_plane):
    """Final clamp (+ optional plane for the color paths) after the
    iteration loop (quantsmooth.h:2668-2689)."""
    with fp32.fence_token(fence):
        if want_plane:
            pix = planar.idct_islow_p(coef.reshape(8, 8, hb * wb))
            padded = planar.pix_to_plane(pix, hb, wb)
        else:
            padded = jnp.zeros((1, 1), dtype=I32)
        coef = jnp.where(badv, coef_dq, coef)
        return jnp.clip(coef, -1023, 1023).T, padded


# ---------------------------------------------------------------------------
# Whole-image program: all components in one device dispatch
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def _image_smooth_impl(inputs, fence, *, cfg):
    """One device program for the whole image (reference component loop
    quantsmooth.h:2484-2849 fused): comp sequencing, downsample,
    JOINT_YUV, UPSAMPLE_UV, crafted-file stop propagation.

    inputs: tuple per component of (coef16[B,64] i16, qraw, div, x1,
    qshr).  cfg: hashable _ImageCfg.  Returns (outs int16, badvs,
    upsampled dict) with badv-stop propagation done on device: once a
    component trips the dequantization guard, later components are
    plain-dequantized (unclamped), exactly like the host path.
    """
    with fp32.fence_token(fence):
        flags = cfg.flags
        image1 = None
        image2 = None
        stop = jnp.zeros((), jnp.bool_)
        outs = []
        badvs = []
        ups = {}
        img2_mode = "halo" if cfg.ds_blocks else "plane"
        for ci, cc in enumerate(cfg.comps):
            coef16, qraw, div, x1, qshr = inputs[ci]
            dq16 = _int16_wrap(coef16.astype(I32)
                               * qraw[None, :]).astype(jnp.int16)
            if cc.mode == "dequant":
                outs.append(dq16)
                continue
            img2_arg = image2 if image2 is not None else jnp.zeros(
                (1, 1), dtype=I32)
            coef, padded, badv = _component_smooth_body(
                coef16, qraw, div, x1, qshr, img2_arg,
                hb=cc.hb, wb=cc.wb, flags=flags, niter=cc.niter2,
                extra_refresh=cc.extra_refresh, luma=cc.luma,
                use_image2=(img2_mode if image2 is not None else False),
                want_plane=cc.want_plane)
            out16 = jnp.where(stop, dq16, coef.astype(jnp.int16))
            outs.append(out16)
            badvs.append(badv)
            stop = stop | badv
            if image1 is not None:
                hbl, wbl = cfg.comps[0].hb, cfg.comps[0].wb
                hbc, wbc = cfg.comps[1].hb, cfg.comps[1].wb
                if cfg.ds_blocks:
                    # fully block-wise upsample: padded is the chroma
                    # pix blocks, image1 the luma pix blocks, image2
                    # the downsampled-luma halos
                    up = planar.upsample_chroma_blocks(
                        planar.blocks_halo10(padded, hbc, wbc), image2,
                        image1, cfg.img_w, cfg.img_h, cfg.ws, cfg.hs,
                        hbl, wbl, hbc, wbc)
                    fb = (up - CENTERJSAMPLE).astype(F)
                    uc = c_f32_to_i32(roundf(
                        planar.fdct_float_p(fb).reshape(64, hbl * wbl)))
                    ups[str(ci)] = uc.T.astype(jnp.int16).reshape(
                        hbl, wbl, 64)
                else:
                    ups[str(ci)] = _upsample_fdct_body(
                        padded, image2, image1, img_w=cfg.img_w,
                        img_h=cfg.img_h, ws=cfg.ws, hs=cfg.hs,
                        hb_l=hbl, wb_l=wbl)
            elif ci == 0 and cfg.need_downsample and len(cfg.comps) > 1:
                # (len guard: at 4:4:4 + UPSAMPLE_UV + niter=0 the
                # chroma components drop out of the program entirely —
                # num_iter2 + extra_refresh == 0, exactly like the
                # reference's per-component `continue`,
                # quantsmooth.h:2542 — leaving nothing to consume the
                # downsampled plane)
                hbl, wbl = cfg.comps[0].hb, cfg.comps[0].wb
                hbc, wbc = cfg.comps[1].hb, cfg.comps[1].wb
                if cfg.ds_blocks:
                    # block-wise: no full-resolution plane transpose
                    if (flags & UPSAMPLE_UV) and not (cfg.ws == 1
                                                      and cfg.hs == 1):
                        image1 = padded          # luma pix blocks
                    ds = planar.downsample_blocks(
                        padded, hbl, wbl, hbc, wbc, cfg.ws, cfg.hs)
                    image2 = planar.blocks_halo10(ds, hbc, wbc)
                elif cfg.ws == 1 and cfg.hs == 1:
                    image2 = padded
                else:
                    if flags & UPSAMPLE_UV:
                        image1 = padded
                    image2 = downsample_plane(
                        padded, hbl, wbl, hbc, wbc, cfg.ws, cfg.hs)
        return tuple(outs), tuple(badvs), ups


class _CompCfg:
    __slots__ = ("hb", "wb", "niter2", "extra_refresh", "luma", "mode",
                 "want_plane")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)

    def _key(self):
        return tuple(getattr(self, k) for k in self.__slots__)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, _CompCfg) and self._key() == other._key()


class _ImageCfg:
    __slots__ = ("flags", "need_downsample", "img_w", "img_h", "ws", "hs",
                 "comps", "ds_blocks")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)

    def _key(self):
        return (self.flags, self.need_downsample, self.img_w, self.img_h,
                self.ws, self.hs, self.comps, self.ds_blocks)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, _ImageCfg) and self._key() == other._key()


class SmoothResult:
    """Engine output: transformed (quant=1) coefficient planes."""

    def __init__(self):
        self.coefs = []        # per-component int16 [hb, wb, 64]
        self.upsampled = None  # (cb, cr) int16 at luma dims, or None
        self.stop = 0


def smooth(img, opts: QsOptions) -> SmoothResult:
    """Run the full engine on a decoded-to-coefficients JPEG.

    ``img`` is a host.jpegio.JpegImage.  The JAX equivalent of
    do_quantsmooth (reference: quantsmooth.h:2404-2878).  Without a
    progress callback the whole image runs as ONE device program
    (component sequencing, downsample, JOINT/UPSAMPLE and stop
    propagation all on device); with a callback it falls back to
    per-component dispatches so the host can interleave.

    On a multi-device mesh (len(jax.devices()) > 1) large images are
    automatically sharded across the devices (parallel/sharded.py) —
    block rows first (padded to divisibility with masked dead blocks,
    so ANY row count uses the full device set), block columns only
    when an image has fewer block rows than devices (_shard_grid) —
    bit-identical output, the TPU equivalent of the reference's OpenMP
    row loop (quantsmooth.h:2552-2554, schedule(dynamic) 2586-2588).
    """
    try:
        if opts.progress is None:
            res = _try_smooth_sharded(img, opts)
            if res is not None:
                return res
            return _smooth_fused(img, opts)
        return _smooth_percomp(img, opts)
    except Exception as e:   # device allocation failure -> degrade
        if not _is_oom(e):
            raise
        return _smooth_degraded(img, opts)


def _is_oom(e) -> bool:
    """Device allocation failure (XLA OOM), the condition the
    reference meets with its malloc-failure degradation
    (quantsmooth.h:2548-2566)."""
    s = f"{type(e).__name__}: {e}"
    return ("RESOURCE_EXHAUSTED" in s or "Out of memory" in s
            or "out of memory" in s)


def _smooth_degraded(img, opts: QsOptions) -> SmoothResult:
    """Allocation-failure degradation: plain host-side dequantization
    (reference: quantsmooth.h:2551-2566 — when the scratch plane fails
    to allocate, each component's coefficients are multiplied by the
    quant table in place, int16 storage wrap, unclamped, and
    processing keeps going).  The output is still a valid quant=1
    JPEG, just unsmoothed.  No device work at all — this must succeed
    when the device cannot allocate."""
    res = SmoothResult()
    comps = img.components
    res.coefs = [np.asarray(c.coefs, np.int16).copy() for c in comps]
    num_iter = min(max(opts.niter, 0), ITER_MAX)
    if num_iter <= 0 and not (opts.flags & UPSAMPLE_UV):
        return res
    for ci, comp in enumerate(comps):
        qraw = np.asarray(comp.quantval, np.int32)
        if not qraw.any():
            continue
        val = int(np.bitwise_or.reduce(qraw))
        if val >= 0x800:
            res.stop = 1          # crafted file (quantsmooth.h:2502-2504)
        if val <= 1:
            continue              # already processed (2500-2501)
        hb, wb = comp.height_in_blocks, comp.width_in_blocks
        c = res.coefs[ci].reshape(hb * wb, 64).astype(np.int32)
        res.coefs[ci] = (c * qraw[None, :]).astype(np.int16).reshape(
            hb, wb, 64)
    return res


def prepare_fused(img, opts: QsOptions):
    """Build the device inputs and static config for the whole-image
    program.  Returns (inputs, cfg, meta) or None when there is
    nothing to run on device.  Exposed so callers (bench, pipelines)
    can keep inputs device-resident across repeated runs."""
    comps = img.components
    need_downsample = (
        bool(opts.flags & (JOINT_YUV | UPSAMPLE_UV)) and img.is_ycbcr
        and len(comps) >= 3
        and comps[1].h_samp_factor == 1 and comps[1].v_samp_factor == 1
        and comps[2].h_samp_factor == 1 and comps[2].v_samp_factor == 1)

    num_iter = min(max(opts.niter, 0), ITER_MAX)
    if num_iter <= 0 and not ((opts.flags & UPSAMPLE_UV) and need_downsample):
        return None

    flags = opts.flags
    ws = comps[0].h_samp_factor
    hs = comps[0].v_samp_factor
    static_stop = False
    comp_cfgs = []
    prog_inputs = []
    prog_index = {}          # ci -> index into program inputs/outputs
    image1_live = False      # image1 will exist for later components
    downsample_live = False

    for ci, comp in enumerate(comps):
        qraw = np.asarray(comp.quantval, dtype=np.int32)
        if not qraw.any():
            continue
        hb, wb = comp.height_in_blocks, comp.width_in_blocks
        extra_refresh = 1 if (image1_live
                              or (ci == 0 and need_downsample)) else 0
        num_iter2 = num_iter
        val = int(np.bitwise_or.reduce(qraw))
        if val <= 1:
            num_iter2 = 0       # already processed (quantsmooth.h:2500-2501)
        if val >= 0x800:
            static_stop = True  # crafted file (quantsmooth.h:2502-2504)
        if num_iter2 + extra_refresh == 0:
            continue
        mode = "dequant" if static_stop else "smooth"
        luma = (ci == 0) or not img.is_ycbcr
        # pixel output in block ('pix') form when the color paths can
        # run block-wise (sampling factors <= 2; always true for
        # 4:4:4/4:2:2/4:2:0); plane form only for exotic factors
        ds_block_ok = ws <= 2 and hs <= 2
        if mode == "smooth" and (image1_live
                                 or (ci == 0 and need_downsample)):
            want_plane = "pix" if ds_block_ok else True
        else:
            want_plane = False
        comp_cfgs.append(_CompCfg(hb=hb, wb=wb, niter2=num_iter2,
                                  extra_refresh=extra_refresh, luma=luma,
                                  mode=mode, want_plane=want_plane))
        div, x1, qshr = make_quant_tables(qraw)
        prog_inputs.append((
            jnp.asarray(np.asarray(comp.coefs, np.int16).reshape(
                hb * wb, 64)),
            jnp.asarray(qraw), jnp.asarray(div), jnp.asarray(x1),
            jnp.asarray(qshr)))
        prog_index[ci] = len(comp_cfgs) - 1
        if mode == "smooth" and ci == 0 and need_downsample:
            if not (ws == 1 and hs == 1) and (flags & UPSAMPLE_UV):
                image1_live = True
            downsample_live = True

    ds_blocks = downsample_live and ws <= 2 and hs <= 2
    cfg = _ImageCfg(flags=flags, need_downsample=downsample_live,
                    img_w=img.width, img_h=img.height, ws=ws, hs=hs,
                    comps=tuple(comp_cfgs), ds_blocks=ds_blocks)
    meta = {"static_stop": static_stop, "prog_index": prog_index,
            "image1_live": image1_live}
    return tuple(prog_inputs), cfg, meta


# ---------------------------------------------------------------------------
# Multi-device auto-sharding
# ---------------------------------------------------------------------------

_MESH_CACHE = {}
_SHARD_FN_CACHE = {}


def _row_mesh(n_rows):
    import jax
    from jax.sharding import Mesh
    mesh = _MESH_CACHE.get(n_rows)
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()[:n_rows]), ("row",))
        _MESH_CACHE[n_rows] = mesh
    return mesh


def _shard_grid(img, opts, allow_col=True):
    """Pick the (rows, cols) spatial shard grid for auto-sharding, or
    None.

    Conditions: >1 device, image big enough to beat the per-exchange
    overhead (override threshold with JPEGQS_SHARD_MIN_BLOCKS), all
    quant tables clean (the val<=1 / crafted-file shortcuts keep the
    single-device path), and sampling factors <= 2.

    Pad-to-divisible sharding (parallel/sharded.py) means divisibility
    never constrains the grid: rows are taken first up to the smallest
    component's block-row count; a second ``col`` mesh axis only picks
    up devices when an image has fewer block rows than devices
    (ultra-wide strips) — the TPU analogue of OpenMP's
    schedule(dynamic) over arbitrary row counts
    (quantsmooth.h:2586-2588).  Both flows run the resident-tile
    kernel loop on the Pallas path (sharded._sharded_resident_iters;
    the 2-D grid adds ghost block columns).
    """
    import os
    import jax

    ndev = len(jax.devices())
    if ndev < 2 or opts.niter < 1:
        return None
    comps = img.components
    if not comps:
        return None
    min_blocks = int(os.environ.get("JPEGQS_SHARD_MIN_BLOCKS", "16384"))
    if sum(c.height_in_blocks * c.width_in_blocks for c in comps) \
            < min_blocks:
        return None
    if comps[0].h_samp_factor > 2 or comps[0].v_samp_factor > 2:
        return None
    for c in comps:
        q = np.asarray(c.quantval, np.int32)
        val = int(np.bitwise_or.reduce(q))
        if val <= 1 or val >= 0x800:
            return None
    hbs = [c.height_in_blocks for c in comps]
    wbs = [c.width_in_blocks for c in comps]
    r = min(ndev, min(hbs))
    c = 1
    if allow_col and r < ndev:
        c = max(1, min(ndev // r, min(wbs)))
    return (r, c) if r * c >= 2 else None


def _grid_mesh(n_rows, n_cols):
    import jax
    from jax.sharding import Mesh
    key = (n_rows, n_cols)
    mesh = _MESH_CACHE.get(key)
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()[:n_rows * n_cols]).reshape(
            n_rows, n_cols), ("row", "col"))
        _MESH_CACHE[key] = mesh
    return mesh


def _try_smooth_sharded(img, opts: QsOptions):
    """Auto-sharded engine run, or None when it doesn't apply."""
    from .parallel import sharded as _sh

    comps = img.components
    flags = opts.flags
    niter = min(max(opts.niter, 0), ITER_MAX)
    need_downsample = (
        bool(flags & (JOINT_YUV | UPSAMPLE_UV)) and img.is_ycbcr
        and len(comps) >= 3
        and comps[1].h_samp_factor == 1 and comps[1].v_samp_factor == 1
        and comps[2].h_samp_factor == 1 and comps[2].v_samp_factor == 1)
    if niter == 0:
        # n=0 is dequant-only (plus the reference's chroma-skip
        # semantics at 4:4:4 + UPSAMPLE_UV, quantsmooth.h:2542) —
        # trivial work; let the fused path model it exactly
        return None
    grid = _shard_grid(img, opts)
    if grid is None:
        return None
    r, ncol = grid
    if need_downsample and (flags & UPSAMPLE_UV) and ncol > 1 and \
            comps[0].width_in_blocks // ncol < 2:
        # col-sharded UPSAMPLE needs the right-tail source column
        # shard-local (planar.upsample_chroma_blocks) — fall back to
        # the best row-only split for pathologically narrow planes
        grid = _shard_grid(img, opts, allow_col=False)
        if grid is None:
            return None
        r, ncol = grid
    mesh = _row_mesh(r) if ncol == 1 else _grid_mesh(r, ncol)
    col_axis = None if ncol == 1 else "col"

    def tabs(ci):
        qraw = np.asarray(comps[ci].quantval, np.int32)
        div, x1, qshr = make_quant_tables(qraw)
        return tuple(map(jnp.asarray, (qraw, div, x1, qshr)))

    res = SmoothResult()
    res.coefs = [np.asarray(c.coefs, dtype=np.int16).copy() for c in comps]

    if need_downsample:
        y, cb, cr = comps[0], comps[1], comps[2]
        ws, hs = y.h_samp_factor, y.v_samp_factor
        aligned = (y.height_in_blocks == hs * cb.height_in_blocks
                   and y.width_in_blocks == ws * cb.width_in_blocks
                   and cb.height_in_blocks == cr.height_in_blocks
                   and cb.width_in_blocks == cr.width_in_blocks)
        if not aligned or len(comps) != 3:
            return None
        key = ("ycbcr", r, ncol, y.height_in_blocks, y.width_in_blocks,
               cb.height_in_blocks, cb.width_in_blocks, ws, hs, flags,
               niter, img.width, img.height)
        fn = _SHARD_FN_CACHE.get(key)
        if fn is None:
            fn = _sh.make_sharded_ycbcr_smooth(
                mesh, hb_l=y.height_in_blocks, wb_l=y.width_in_blocks,
                hb_c=cb.height_in_blocks, wb_c=cb.width_in_blocks,
                ws=ws, hs=hs, flags=flags, niter=niter,
                img_w=img.width, img_h=img.height, col_axis=col_axis)
            _SHARD_FN_CACHE[key] = fn
        # run() pads non-divisible planes and slices results back; the
        # jitted shard_map places host inputs per its in_specs
        arr = lambda c: np.asarray(c.coefs, np.int16).reshape(
            c.height_in_blocks, c.width_in_blocks, 64)
        oy, ocb, ocr, badv, ups = fn(arr(y), arr(cb), arr(cr),
                                     tabs(0), tabs(1), tabs(2))
        res.coefs[0] = np.asarray(oy)
        res.coefs[1] = np.asarray(ocb)
        res.coefs[2] = np.asarray(ocr)
        res.stop = int(bool(badv))
        if ups is not None and not res.stop:
            res.upsampled = (np.asarray(ups[0]), np.asarray(ups[1]))
        return res

    # independent per-component sharding (gray, 4:4:4 without color
    # features, non-YCbCr multi-component)
    stop = 0
    for ci, comp in enumerate(comps):
        qraw = np.asarray(comp.quantval, np.int32)
        if not qraw.any():
            continue
        hb, wb = comp.height_in_blocks, comp.width_in_blocks
        if stop:
            res.coefs[ci] = np.asarray(dequant_fallback_jit(
                jnp.asarray(res.coefs[ci].reshape(hb * wb, 64)),
                jnp.asarray(qraw))).reshape(hb, wb, 64)
            continue
        luma = (ci == 0) or not img.is_ycbcr
        key = ("comp", r, ncol, hb, wb, flags, niter, luma)
        fn = _SHARD_FN_CACHE.get(key)
        if fn is None:
            fn = _sh.make_sharded_smooth(mesh, hb=hb, wb=wb, flags=flags,
                                         niter=niter, luma=luma,
                                         col_axis=col_axis)
            _SHARD_FN_CACHE[key] = fn
        coef_np = np.asarray(comp.coefs, np.int16).reshape(hb, wb, 64)
        qraw_j, div, x1, qshr = tabs(ci)
        out, badv = fn(coef_np, qraw_j, div, x1, qshr)
        # the device result already carries the tripping component's
        # reference semantics: int16-wrapped dequant merged in via
        # where(badv, ...) and clamped to +/-1023 (quantsmooth.h:2596-
        # 2610 break -> 2668-2689 clamp); only LATER components fall
        # back to the unclamped plain dequant (2551-2566 continue)
        res.coefs[ci] = np.asarray(out).astype(np.int16)
        if bool(badv):
            stop = 1
    res.stop = stop
    return res


def _smooth_fused(img, opts: QsOptions) -> SmoothResult:
    res = SmoothResult()
    comps = img.components
    res.coefs = [np.asarray(c.coefs, dtype=np.int16).copy() for c in comps]

    prep = prepare_fused(img, opts)
    if prep is None:
        return res
    prog_inputs, cfg, meta = prep
    static_stop = meta["static_stop"]
    prog_index = meta["prog_index"]
    image1_live = meta["image1_live"]
    comp_cfgs = cfg.comps

    if not comp_cfgs:
        res.stop = 1 if static_stop else 0
        return res

    outs, badvs, ups = _image_smooth_impl(prog_inputs, jnp.int32(0),
                                          cfg=cfg)
    stop = 1 if static_stop else 0
    if any(bool(b) for b in badvs):
        stop = 1
    for ci, pi in prog_index.items():
        hb = comp_cfgs[pi].hb
        wb = comp_cfgs[pi].wb
        res.coefs[ci] = np.asarray(outs[pi]).reshape(hb, wb, 64)
    if not stop and image1_live:
        up1 = ups.get(str(prog_index.get(1)))
        up2 = ups.get(str(prog_index.get(2)))
        if up1 is not None and up2 is not None:
            res.upsampled = (np.asarray(up1), np.asarray(up2))
    res.stop = stop
    return res


def _smooth_percomp(img, opts: QsOptions) -> SmoothResult:
    """Progress-callback path: one device program per iteration, with
    the reference's exact progress accounting (quantsmooth.h:2474-2482
    init, 2652-2663 per-iteration update; ``progprec`` semantics from
    libjpegqs.h:42-44: 0 -> 20 steps, <0 -> max resolution)."""
    res = SmoothResult()
    comps = img.components
    res.coefs = [np.asarray(c.coefs, dtype=np.int16).copy() for c in comps]

    need_downsample = (
        bool(opts.flags & (JOINT_YUV | UPSAMPLE_UV)) and img.is_ycbcr
        and len(comps) >= 3
        and comps[1].h_samp_factor == 1 and comps[1].v_samp_factor == 1
        and comps[2].h_samp_factor == 1 and comps[2].v_samp_factor == 1)

    num_iter = min(max(opts.niter, 0), ITER_MAX)
    if num_iter <= 0 and not ((opts.flags & UPSAMPLE_UV) and need_downsample):
        return res

    stop = 0
    image1 = None   # full-res luma padded plane (UPSAMPLE_UV)
    image2 = None   # downsampled luma padded plane (JOINT_YUV)
    image2_halo = None
    up_planes = {}
    flags = opts.flags

    # progress accounting (quantsmooth.h:2474-2482); prog_next carries
    # every component's full share — including skipped components'
    # (no qtable / val<=1) — so later components report the same cur
    # values as the reference (prog_cur = prog_next at component top,
    # prog_next += height*v_samp*num_iter unconditionally, h:2487-2492)
    prog_cur = 0
    prog_next = 0
    prog_max = sum(c.height_in_blocks * c.v_samp_factor * num_iter
                   for c in comps)
    prog_prec = opts.progprec
    if prog_prec == 0:
        prog_prec = 20
    if prog_prec < 0:
        prog_prec = prog_max
    prog_thr = (prog_max + prog_prec - 1) // prog_prec if prog_max else 0

    def report_progress():
        """Threshold-gated callback, reference formula
        (quantsmooth.h:2652-2663).  Truthy return cancels."""
        nonlocal prog_thr
        if opts.progress is None or prog_cur < prog_thr:
            return 0
        cur = prog_prec * prog_cur // prog_max
        prog_thr = ((cur + 1) * prog_max + prog_prec - 1) // prog_prec
        return 1 if opts.progress(opts.userdata, cur, prog_prec) else 0

    for ci, comp in enumerate(comps):
        prog_cur = prog_next
        prog_next += (comp.height_in_blocks * comp.v_samp_factor
                      * num_iter)
        qraw = np.asarray(comp.quantval, dtype=np.int32)
        if not qraw.any():
            continue  # no quant table came with this component
        hb, wb = comp.height_in_blocks, comp.width_in_blocks
        coef16 = jnp.asarray(res.coefs[ci].reshape(hb * wb, 64))

        extra_refresh = 1 if (image1 is not None
                              or (ci == 0 and need_downsample)) else 0
        num_iter2 = num_iter

        val = int(np.bitwise_or.reduce(qraw))
        if val <= 1:
            num_iter2 = 0       # already processed (quantsmooth.h:2500-2501)
        if val >= 0x800:
            stop = 1            # crafted/damaged file (quantsmooth.h:2502-2504)
        if num_iter2 + extra_refresh == 0:
            continue
        qraw_j = jnp.asarray(qraw)
        if stop:
            # dequant-only fallback (quantsmooth.h:2551-2566)
            res.coefs[ci] = np.asarray(
                dequant_fallback_jit(coef16, qraw_j)).reshape(hb, wb, 64)
            continue

        div, x1, qshr = (jnp.asarray(a) for a in make_quant_tables(qraw))
        luma = (ci == 0) or not img.is_ycbcr
        use_image2 = image2 is not None and bool(flags & JOINT_YUV)
        if use_image2 and image2_halo is None:
            image2_halo = _halo10_jit(image2, hb=hb, wb=wb)
        img2_arg = image2_halo if use_image2 else jnp.zeros(
            (1, 1, 1), dtype=I32)
        want_plane = (image1 is not None
                      or (ci == 0 and need_downsample))

        fence = jnp.int32(0)
        coef, badv = _dequant_stage(coef16, qraw_j)
        coef_dq = coef
        canceled = False
        if opts.precise and opts.progress is not None:
            # -DPRECISE_PROGRESS: per-row counter semantics
            # (quantsmooth.h:2632-2665) — chunk each iteration at the
            # exact rows where the running counter crosses prog_thr,
            # fire the callback there, and stop mid-iteration on
            # cancel (remaining rows keep their previous coefs, like
            # the reference's `if (stop) continue`)
            prog_inc = comp.v_samp_factor
            for it in range(num_iter2):
                pix = _idct_stage(coef, hb=hb, wb=wb)
                rows_done = 0
                while rows_done < hb:
                    need = prog_thr - prog_cur
                    t = max(1, -(-need // prog_inc))
                    chunk = int(min(t, hb - rows_done))
                    coef = _rows_stage_impl(
                        coef, pix, img2_arg, div, x1, qshr,
                        jnp.int32(rows_done), fence, nrows=chunk,
                        hb=hb, wb=wb, flags=flags, luma=luma,
                        use_image2=use_image2)
                    rows_done += chunk
                    prog_cur += chunk * prog_inc
                    if prog_cur >= prog_thr:
                        cur = prog_prec * prog_cur // prog_max
                        prog_thr = ((cur + 1) * prog_max
                                    + prog_prec - 1) // prog_prec
                        if opts.progress(opts.userdata, cur, prog_prec):
                            canceled = True
                            break
                if canceled:
                    break
        else:
            for it in range(num_iter2):
                coef = _iter_stage_impl(coef, img2_arg, div, x1, qshr,
                                        fence, hb=hb, wb=wb, flags=flags,
                                        luma=luma, use_image2=use_image2)
                prog_cur += hb * comp.v_samp_factor
                if report_progress():
                    canceled = True
                    break
        out, padded = _final_stage_impl(
            coef, badv, coef_dq, fence, hb=hb, wb=wb,
            want_plane=want_plane and not canceled)
        res.coefs[ci] = np.asarray(out.astype(jnp.int16)).reshape(
            hb, wb, 64)
        if canceled or bool(badv):
            stop = 1
            continue

        if image1 is not None:
            ws = comps[0].h_samp_factor
            hs = comps[0].v_samp_factor
            hbl, wbl = comps[0].height_in_blocks, comps[0].width_in_blocks
            up_planes[ci] = np.asarray(upsample_fdct_jit(
                padded, image2, image1, img_w=img.width, img_h=img.height,
                ws=ws, hs=hs, hb_l=hbl, wb_l=wbl))
        elif ci == 0 and need_downsample:
            ws, hs = comp.h_samp_factor, comp.v_samp_factor
            if ws == 1 and hs == 1:
                image2 = padded
            else:
                if flags & UPSAMPLE_UV:
                    image1 = padded
                image2 = downsample_jit(
                    padded, hb_l=hb, wb_l=wb,
                    hb_c=comps[1].height_in_blocks,
                    wb_c=comps[1].width_in_blocks, ws=ws, hs=hs)

    if stop:
        image1 = None
    if image1 is not None and 1 in up_planes and 2 in up_planes:
        res.upsampled = (up_planes[1], up_planes[2])
    res.stop = stop
    return res


def decode_smoothed(data: bytes, opts: QsOptions = None) -> np.ndarray:
    """Decode a JPEG with smoothing applied — the library decode path
    (reference: jpegqs_start_decompress, quantsmooth.h:2882-2905,
    example.c:78-144).  Returns uint8 pixels (H, W) or (H, W, 3).

    Re-encode-free: pixels are decoded ON DEVICE from the smoothed
    coefficient planes (ops/colorout.py — libjpeg-exact IDCT, fancy
    upsampling and YCbCr->RGB), the TPU-native equivalent of the
    reference's in-place buffered-image integration
    (quantsmooth.h:2861-2876), which skips the Huffman encode + decode
    round trip entirely.  Exotic layouts (non-YCbCr multi-component,
    unsupported sampling) fall back to the re-encode path; both
    produce byte-identical pixels (tests/test_api.py)."""
    from .host.jpegio import decode_pixels, read_coefficients

    if opts is None:
        opts = QsOptions.from_quality(3, 3)
    img = read_coefficients(data)
    res = smooth(img, opts)
    out = _decode_native(img, res)
    if out is not None:
        return out
    return decode_pixels(_save_result(data, res))


def _decode_native(img, res: SmoothResult):
    """Device pixel decode of a SmoothResult, or None when the layout
    needs the libjpeg fallback (see decode_smoothed)."""
    from .ops import colorout

    comps = img.components
    H, W = img.height, img.width
    if len(comps) == 1:
        c = comps[0]
        return np.asarray(colorout.decode_gray_impl(
            jnp.asarray(res.coefs[0]), hb=c.height_in_blocks,
            wb=c.width_in_blocks, H=H, W=W))
    if len(comps) != 3 or not img.is_ycbcr:
        return None
    if res.upsampled is not None:
        # UPSAMPLE_UV output: all components at luma dims, 1x1 sampled
        hb, wb = comps[0].height_in_blocks, comps[0].width_in_blocks
        dims = ((hb, wb, H, W),) * 3
        planes = (res.coefs[0], res.upsampled[0], res.upsampled[1])
        ws = hs = 1
    else:
        ws, hs = comps[0].h_samp_factor, comps[0].v_samp_factor
        if (ws, hs) not in ((1, 1), (2, 1), (2, 2)):
            return None
        if any(c.h_samp_factor != 1 or c.v_samp_factor != 1
               for c in comps[1:]):
            return None
        dims = tuple(
            (c.height_in_blocks, c.width_in_blocks,
             -(-H * c.v_samp_factor // hs), -(-W * c.h_samp_factor // ws))
            for c in comps)
        planes = tuple(res.coefs)
    return np.asarray(colorout.decode_ycc_impl(
        *(jnp.asarray(p) for p in planes), dims=dims, ws=ws, hs=hs,
        H=H, W=W))


def _save_result(data: bytes, res: SmoothResult,
                 optimize: bool = False) -> bytes:
    """Re-encode a SmoothResult into the original container (the
    transcode tail of quantsmooth.c:552-593)."""
    from .host.jpegio import JpegCoefFile

    with JpegCoefFile(data) as f:
        img = f.read()
        for ci in range(len(img.components)):
            f.write_coefs(ci, res.coefs[ci])
        if res.upsampled is not None:
            f.set_upsampled(res.upsampled[0], res.upsampled[1])
        return f.save(optimize=optimize)


def smooth_jpeg_bytes(data: bytes, opts: QsOptions = None,
                      optimize: bool = False) -> bytes:
    """Transcode convenience path: JPEG bytes in, smoothed JPEG bytes
    out with all quant tables set to 1 (the reference CLI's canonical
    flow, quantsmooth.c:494-623)."""
    from .host.jpegio import JpegCoefFile

    if opts is None:
        opts = QsOptions.from_quality(3, 3)
    with JpegCoefFile(data) as f:
        img = f.read()
        res = smooth(img, opts)
        for ci in range(len(img.components)):
            f.write_coefs(ci, res.coefs[ci])
        if res.upsampled is not None:
            f.set_upsampled(res.upsampled[0], res.upsampled[1])
        return f.save(optimize=optimize)
