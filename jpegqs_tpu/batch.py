"""Batch engine: many-image throughput (SURVEY.md §7 step 6).

Mechanisms, composable:

- ``smooth_corpus`` / ``smooth_many``: the corpus pipeline.  Decodes
  on a thread pool, buckets images by (geometry, quant-table)
  signature, runs each bucket as ONE batched device program (bounded
  dispatch window keeps the device queue full), and re-encodes on the
  pool while later buckets compute — a real decode -> upload ->
  compute -> encode pipeline over a mixed corpus.

- ``smooth_plane_batch``: device batching for N same-shape gray planes
  sharing a quant table: one program over N*B blocks.

- ``smooth_image_batch``: device batching for N same-config images
  (any quality level, including JOINT_YUV and UPSAMPLE_UV): the whole
  color pipeline over all images in ONE device program.  Per-block
  stages (IDCT, Pallas solver, rebalance, clamps) see one flattened
  N*B block axis; the per-image structure (borders, halos, downsample,
  upsample, crafted-file stops) is preserved with vmaps over the image
  axis.

The reference's only batching is "run the CLI N times" — these are the
TPU-native replacement.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .options import (QsOptions, NO_REBALANCE, NO_REBALANCE_UV,
                      LOW_QUALITY, JOINT_YUV, UPSAMPLE_UV, ITER_MAX)
from .specref import make_solver_tables
from .ops import planar, fp32, pallas_solver
from .ops.quant import make_quant_tables, roundf, c_f32_to_i32

F = jnp.float32
I32 = jnp.int32


def _img_sig(img):
    """Bucket signature: everything that selects a compiled config."""
    return (img.width, img.height, img.jpeg_color_space,
            tuple((c.h_samp_factor, c.v_samp_factor,
                   c.width_in_blocks, c.height_in_blocks,
                   c.quantval.tobytes()) for c in img.components))


def smooth_corpus(datas, opts: QsOptions = None, workers: int = 8,
                  optimize: bool = False, copy_markers: int = 2,
                  max_batch: int = 16, window: int = 4,
                  warnings_out: list = None):
    """Smooth a mixed corpus of JPEG byte strings; outputs in order.

    The pipeline (SURVEY.md §7 step 6): entropy decode on a thread
    pool; bucket by (geometry, qtables) signature; each bucket runs as
    batched whole-image device programs of up to ``max_batch`` images,
    with up to ``window`` programs in flight on the device queue while
    finished batches re-encode on the pool.  Unbatchable leftovers
    (bucket of one, exotic sampling, progress callback) fall back to
    the per-image engine between batch programs.

    ``warnings_out``: optional list; the total libjpeg corrupt-data
    warning count across all files (decode + encode) is appended so
    callers can mirror the reference CLI's exit code 2
    (quantsmooth.c:626).
    """
    from . import engine
    from .host.jpegio import JpegCoefFile

    if opts is None:
        opts = QsOptions.from_quality(3, 3)
    n = len(datas)
    if n == 0:
        return []
    outs = [None] * n
    errors = [None] * n

    with ThreadPoolExecutor(max_workers=max(workers, 1)) as ex:
        def open_read(i):
            f = None
            try:
                f = JpegCoefFile(datas[i], copy_markers=copy_markers)
                return f, f.read()
            except Exception as e:            # keep pipeline order
                if f is not None:
                    f.close()
                return None, e

        decoded = list(ex.map(open_read, range(n)))
        files = [d[0] for d in decoded]
        imgs = [d[1] for d in decoded]

        try:
            return _corpus_pipeline(
                ex, datas, files, imgs, errors, outs, opts, optimize,
                max_batch, window, warnings_out)
        finally:
            # close() is idempotent — encode_one already closed the
            # successfully-encoded handles; this releases the native
            # libjpeg state of everything an error path left open
            for f in files:
                if f is not None:
                    f.close()


def _corpus_pipeline(ex, datas, files, imgs, errors, outs, opts,
                     optimize, max_batch, window, warnings_out=None):
    from . import engine

    n = len(datas)
    buckets = {}
    for i in range(n):
        if files[i] is None:
            errors[i] = imgs[i]
            continue
        buckets.setdefault(_img_sig(imgs[i]), []).append(i)

    # build the dispatch plan: large buckets first keep the device
    # busiest while small/odd ones trickle through the fallback
    plan = []
    for idxs in sorted(buckets.values(), key=len, reverse=True):
        comp0 = imgs[idxs[0]].components[0]
        batchable = (len(idxs) > 1 and opts.progress is None
                     and comp0.h_samp_factor <= 2
                     and comp0.v_samp_factor <= 2)
        if batchable:
            for c0 in range(0, len(idxs), max_batch):
                plan.append(idxs[c0:c0 + max_batch])
        else:
            plan.extend([i] for i in idxs)

    def encode_one(i, res):
        f = files[i]
        for ci in range(len(imgs[i].components)):
            f.write_coefs(ci, res.coefs[ci])
        if res.upsampled is not None:
            f.set_upsampled(res.upsampled[0], res.upsampled[1])
        out = f.save(optimize=optimize)
        nw = f.num_warnings()   # decode + encode (quantsmooth.c:626)
        f.close()
        return out, nw

    enc_futs = []
    inflight = []   # (chunk, assemble) dispatched, not yet drained

    def drain_one():
        chunk, asm = inflight.pop(0)
        results = (asm() if asm is not None
                   else [engine.smooth(imgs[i], opts) for i in chunk])
        for i, res in zip(chunk, results):
            enc_futs.append((i, ex.submit(encode_one, i, res)))

    for chunk in plan:
        asm = None
        if len(chunk) > 1:
            asm = _batch_dispatch([imgs[i] for i in chunk], opts)
        inflight.append((chunk, asm))
        while len(inflight) > window:
            drain_one()
    while inflight:
        drain_one()

    total_warnings = 0
    for i, fut in enc_futs:
        outs[i], nw = fut.result()
        total_warnings += nw
    if warnings_out is not None:
        warnings_out.append(total_warnings)

    for i, err in enumerate(errors):
        if err is not None:
            raise err
    return outs


def smooth_many(datas, opts: QsOptions = None, workers: int = 4,
                optimize: bool = False):
    """Smooth a list of JPEG byte strings; returns outputs in order.

    Alias for the corpus pipeline (decode -> bucketed batch programs ->
    encode, overlapped); see ``smooth_corpus`` for the knobs.
    """
    return smooth_corpus(datas, opts, workers=workers, optimize=optimize)


# ---------------------------------------------------------------------------
# Batched component pass (N same-shape planes, one flattened block axis)
# ---------------------------------------------------------------------------

def _batch_component(coef16, qraw, div, x1, qshr, img2_halos, *, n, hb, wb,
                     flags, niter, extra_refresh, luma, want_pix):
    """N same-shape planes through the full component pass.

    coef16 int16[N, B, 64]; img2_halos int32[10, 10, N*B] or None.
    Returns (coef int32[N, B, 64] clamped, badv bool[N],
    pix int32[8, 8, N, B] final pixels or None).
    Mirrors engine._component_smooth_body per image.
    """
    B = hb * wb
    NB = n * B
    tables = None
    if not (flags & LOW_QUALITY):
        tables = make_solver_tables(flags)

    prod = coef16.astype(I32).reshape(NB, 64).T * qraw[:, None]  # [64, NB]
    badv = jnp.any(((prod.reshape(64, n, B) + 0x800) >> 12) != 0,
                   axis=(0, 2))                                   # [N]
    coef = prod.astype(jnp.int16).astype(I32)
    coef_dq = coef

    do_reb = not (flags & NO_REBALANCE
                  or (not luma and (flags & NO_REBALANCE_UV)))
    use_img2 = img2_halos is not None and (flags & JOINT_YUV)

    # driver loop as in engine._component_smooth_body: iteration-0
    # pixels from the dequantized coefs; on the Pallas path the whole
    # loop runs on resident tiles with per-image-local edge masks (so
    # in-kernel neighbor reads never cross image boundaries)
    from . import engine as _engine
    if pallas_solver.use_pallas() and niter > 0:
        coef, pix = _engine._pallas_resident_iters(
            coef, None, img2_halos if use_img2 else None, div, x1, qshr,
            flags, luma, hb, wb, niter, extra_refresh, n=n)
        pix_n = pix.reshape(8, 8, n, B)
    else:
        pix = planar.idct_islow_p(coef.reshape(8, 8, NB))
        pix_n = pix.reshape(8, 8, n, B)
        for it in range(niter):
            keep = bool(it < niter - 1 or extra_refresh)
            if use_img2:
                halos = jax.vmap(
                    lambda p: planar.blocks_halo10(p, hb, wb),
                    in_axes=2, out_axes=2)(pix_n)
                fb = planar.joint_yuv_fblocks(halos.reshape(10, 10, NB),
                                              img2_halos)
                coef = planar.fdct_clamp_p(fb, coef, div, x1, qshr)
            if flags & LOW_QUALITY:
                if not use_img2:
                    rng = planar.low_quality_range_p(coef, div)
                    halos = jax.vmap(
                        lambda p: planar.blocks_halo10(p, hb, wb),
                        in_axes=2, out_axes=2)(pix_n)
                    fb = planar.low_quality_fblocks(
                        halos.reshape(10, 10, NB), rng)
                    coef = planar.fdct_clamp_p(fb, coef, div, x1, qshr)
                if do_reb:
                    coef = planar.rebalance_blocks_p(coef, div, x1, qshr)
            else:
                bt, bb, bl, br = jax.vmap(
                    lambda p: planar.borders_from_blocks(p, hb, wb),
                    in_axes=2, out_axes=1)(pix_n)
                borders = tuple(b.reshape(8, NB)
                                for b in (bt, bb, bl, br))
                coef = planar.solve_blocks_p(coef, borders, div, x1,
                                             qshr, tables, hb, wb * n)
                if do_reb:
                    coef = planar.rebalance_blocks_p(coef, div, x1, qshr)
            if keep:
                pix = planar.idct_islow_p(coef.reshape(8, 8, NB))
                pix_n = pix.reshape(8, 8, n, B)

    out = jnp.where(badv[None, :, None],
                    coef_dq.reshape(64, n, B), coef.reshape(64, n, B))
    out = jnp.clip(out, -1023, 1023).transpose(1, 2, 0)   # [N, B, 64]
    return out, badv, (pix_n if want_pix else None)


@partial(jax.jit, static_argnames=("n", "hb", "wb", "flags", "niter",
                                   "luma"))
def _plane_batch_impl(coef16, qraw, div, x1, qshr, fence, *, n, hb, wb,
                      flags, niter, luma):
    with fp32.fence_token(fence):
        out, badv, _ = _batch_component(
            coef16, qraw, div, x1, qshr, None, n=n, hb=hb, wb=wb,
            flags=flags, niter=niter, extra_refresh=0, luma=luma,
            want_pix=False)
        return out, badv


def smooth_plane_batch(coefs, qtbl, flags: int, niter: int,
                       luma: bool = True):
    """Smooth N same-shape coefficient planes sharing one quant table.

    coefs int16[N, hb, wb, 64]; qtbl uint16/int32[64].
    Returns int16[N, hb, wb, 64] (final-clamped, quant=1 semantics).
    """
    coefs = np.asarray(coefs, dtype=np.int16)
    n, hb, wb, _ = coefs.shape
    qraw = np.asarray(qtbl, dtype=np.int32)
    div, x1, qshr = make_quant_tables(qraw)
    out, badv = _plane_batch_impl(
        jnp.asarray(coefs.reshape(n, hb * wb, 64)), jnp.asarray(qraw),
        jnp.asarray(div), jnp.asarray(x1), jnp.asarray(qshr),
        jnp.zeros((), I32), n=n, hb=hb, wb=wb, flags=flags, niter=niter,
        luma=luma)
    return np.asarray(out.astype(jnp.int16)).reshape(n, hb, wb, 64)


# ---------------------------------------------------------------------------
# Whole-image batching (color, all quality levels)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def _image_batch_impl(inputs, fence, *, cfg):
    """The fused whole-image program (engine._image_smooth_impl) over a
    batch of N same-config images."""
    from .engine import _int16_wrap  # shared storage-wrap helper

    with fp32.fence_token(fence):
        flags = cfg.flags
        n = cfg.n
        image1 = None     # luma pix blocks [8, 8, N, Bl]
        image2 = None     # downsampled-luma halos [10, 10, N*Bc]
        stop = jnp.zeros((n,), jnp.bool_)
        outs, badvs, ups = [], [], {}
        for ci, cc in enumerate(cfg.comps):
            coef16, qraw, div, x1, qshr = inputs[ci]
            B = cc.hb * cc.wb
            dq16 = _int16_wrap(
                coef16.astype(I32) * qraw[None, None, :]).astype(jnp.int16)
            if cc.mode == "dequant":
                outs.append(dq16)
                continue
            out, badv, pix_n = _batch_component(
                coef16, qraw, div, x1, qshr, image2, n=n, hb=cc.hb,
                wb=cc.wb, flags=flags, niter=cc.niter2,
                extra_refresh=cc.extra_refresh, luma=cc.luma,
                want_pix=cc.want_plane == "pix")
            out16 = jnp.where(stop[:, None, None], dq16,
                              out.astype(jnp.int16))
            outs.append(out16)
            badvs.append(badv)
            stop = stop | badv
            hbl, wbl = cfg.comps[0].hb, cfg.comps[0].wb
            if image1 is not None:
                hbc, wbc = cc.hb, cc.wb

                def up_one(chroma_pix, i2h, luma_pix):
                    up = planar.upsample_chroma_blocks(
                        planar.blocks_halo10(chroma_pix, hbc, wbc), i2h,
                        luma_pix, cfg.img_w, cfg.img_h, cfg.ws, cfg.hs,
                        hbl, wbl, hbc, wbc)
                    fb = (up - 128).astype(F)
                    uc = c_f32_to_i32(roundf(
                        planar.fdct_float_p(fb).reshape(64, hbl * wbl)))
                    return uc.T.astype(jnp.int16).reshape(hbl, wbl, 64)

                i2_n = image2.reshape(10, 10, n, hbc * wbc)
                ups[str(ci)] = jax.vmap(up_one, in_axes=(2, 2, 2))(
                    pix_n, i2_n, image1)
            elif ci == 0 and cfg.need_downsample:
                hbc, wbc = cfg.comps[1].hb, cfg.comps[1].wb
                if (flags & UPSAMPLE_UV) and not (cfg.ws == 1
                                                  and cfg.hs == 1):
                    image1 = pix_n
                ds = jax.vmap(
                    lambda p: planar.downsample_blocks(
                        p, hbl, wbl, hbc, wbc, cfg.ws, cfg.hs),
                    in_axes=2, out_axes=2)(pix_n)
                h = jax.vmap(
                    lambda d: planar.blocks_halo10(d, hbc, wbc),
                    in_axes=2, out_axes=2)(ds)
                image2 = h.reshape(10, 10, n * hbc * wbc)
        return tuple(outs), tuple(badvs), ups


class _BCfg:
    """Hashable static config: the fused-image cfg plus the batch size."""

    __slots__ = ("flags", "need_downsample", "img_w", "img_h", "ws", "hs",
                 "comps", "ds_blocks", "n")

    def __init__(self, base, n):
        for k in self.__slots__[:-1]:
            setattr(self, k, getattr(base, k))
        self.n = n

    def _key(self):
        return tuple(getattr(self, k) for k in self.__slots__)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, _BCfg) and self._key() == other._key()


# canonical batch sizes: batches pad up (replicating the last image,
# results discarded) so a corpus's buckets land on a handful of
# compiled program shapes instead of one per exact count — remote
# compiles cost tens of seconds, the <=33% padded device compute
# milliseconds.  Sizes above the ladder run exact (callers chunk by
# max_batch anyway).
_BATCH_SIZES = (2, 3, 4, 6, 8, 12, 16)


def _batch_dispatch(imgs, opts: QsOptions):
    """Dispatch one uniform batch asynchronously.

    Returns ``assemble() -> [SmoothResult]`` (blocks on the device
    results when called), or None when the batch can't run as one
    program (the caller falls back to per-image smoothing).  The
    device program is already enqueued when this returns — callers can
    keep dispatching while earlier batches compute.
    """
    from . import engine

    first = imgs[0]
    prep = engine.prepare_fused(first, opts)
    if prep is None:
        return None
    _, cfg0, meta = prep
    if cfg0.need_downsample and not cfg0.ds_blocks:
        return None
    n = len(imgs)
    n_pad = next((s for s in _BATCH_SIZES if s >= n), n)
    imgs_p = list(imgs) + [imgs[-1]] * (n_pad - n)
    cfg = _BCfg(cfg0, n_pad)
    prog_index = meta["prog_index"]

    inputs = []
    for ci in sorted(prog_index, key=lambda c: prog_index[c]):
        comp = first.components[ci]
        qraw = np.asarray(comp.quantval, np.int32)
        div, x1, qshr = make_quant_tables(qraw)
        stack = np.stack([
            np.asarray(im.components[ci].coefs, np.int16).reshape(
                comp.height_in_blocks * comp.width_in_blocks, 64)
            for im in imgs_p])
        inputs.append((jnp.asarray(stack), jnp.asarray(qraw),
                       jnp.asarray(div), jnp.asarray(x1),
                       jnp.asarray(qshr)))

    outs, badvs, ups = _image_batch_impl(tuple(inputs), jnp.zeros((), I32),
                                         cfg=cfg)

    def assemble():
        static_stop = meta["static_stop"]
        image1_live = meta["image1_live"]
        outs_np = [np.asarray(o) for o in outs]
        badv_np = (np.stack([np.asarray(b) for b in badvs],
                            axis=0).any(axis=0)
                   if badvs else np.zeros(n, bool))
        up1 = np.asarray(ups[str(prog_index.get(1))]) if (
            image1_live and str(prog_index.get(1)) in ups) else None
        up2 = np.asarray(ups[str(prog_index.get(2))]) if (
            image1_live and str(prog_index.get(2)) in ups) else None

        results = []
        for i, im in enumerate(imgs):
            res = engine.SmoothResult()
            res.coefs = [np.asarray(c.coefs, np.int16).copy()
                         for c in im.components]
            for ci, pi in prog_index.items():
                cc = cfg.comps[pi]
                res.coefs[ci] = outs_np[pi][i].reshape(cc.hb, cc.wb, 64)
            res.stop = 1 if (static_stop or badv_np[i]) else 0
            if not res.stop and up1 is not None and up2 is not None:
                res.upsampled = (up1[i], up2[i])
            results.append(res)
        return results

    return assemble


def smooth_image_batch(imgs, opts: QsOptions = None):
    """Smooth N decoded images with identical geometry/quant tables in
    one device program.  Returns a list of engine.SmoothResult.

    All images must share component shapes, sampling factors and quant
    tables (the bucketed-corpus case); sampling factors must be <= 2.
    Falls back to per-image smoothing when the batch is not uniform.
    """
    from . import engine

    if opts is None:
        opts = QsOptions.from_quality(3, 3)
    if not imgs:
        return []

    first = imgs[0]
    uniform = (all(_img_sig(im) == _img_sig(first) for im in imgs[1:])
               and first.components[0].h_samp_factor <= 2
               and first.components[0].v_samp_factor <= 2
               and opts.progress is None)
    assemble = None
    if uniform and len(imgs) > 1:
        assemble = _batch_dispatch(imgs, opts)
    if assemble is None:
        return [engine.smooth(im, opts) for im in imgs]
    return assemble()
