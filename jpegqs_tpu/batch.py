"""Batch engine: many-image throughput (SURVEY.md §7 step 6).

Two mechanisms, composable:

- ``smooth_many``: a threaded host pipeline over whole JPEGs.  Entropy
  decode/encode (C, GIL-released) and device transfers of image i+-1
  overlap image i's device compute.  Works for any mix of inputs.

- ``smooth_plane_batch``: true device batching for same-shape planes
  sharing a quant table (the common "one corpus, one encoder setting"
  case): N coefficient planes are flattened into one mega block batch
  for the per-block stages (IDCT, solver/rebalance — including the
  Pallas kernel, which just sees more tiles) while the per-image halo
  structure is preserved by computing borders per image.

The reference's only batching is "run the CLI N times" — this is the
TPU-native replacement: one program, N*B blocks, one dispatch.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .options import QsOptions, NO_REBALANCE, NO_REBALANCE_UV, LOW_QUALITY
from .specref import make_solver_tables
from .ops import planar, fp32, pallas_solver
from .ops.quant import make_quant_tables

F = jnp.float32
I32 = jnp.int32


def smooth_many(datas, opts: QsOptions = None, workers: int = 4,
                optimize: bool = False):
    """Smooth a list of JPEG byte strings; returns outputs in order.

    Host-side entropy codec work and device transfers pipeline across
    the thread pool while the device crunches.
    """
    from .engine import smooth_jpeg_bytes

    if opts is None:
        opts = QsOptions.from_quality(3, 3)
    if workers <= 1 or len(datas) <= 1:
        return [smooth_jpeg_bytes(d, opts, optimize) for d in datas]
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(
            lambda d: smooth_jpeg_bytes(d, opts, optimize), datas))


@partial(jax.jit, static_argnames=("n", "hb", "wb", "flags", "niter",
                                   "luma"))
def _plane_batch_impl(coef16, qraw, div, x1, qshr, fence, *, n, hb, wb,
                      flags, niter, luma):
    with fp32.fence_token(fence):
        return _plane_batch_body(coef16, qraw, div, x1, qshr, n=n, hb=hb,
                                 wb=wb, flags=flags, niter=niter, luma=luma)


def _plane_batch_body(coef16, qraw, div, x1, qshr, *, n, hb, wb, flags,
                      niter, luma):
    """N same-shape planes, one device program.

    coef16 int16[N, hb*wb, 64] -> (int32[N, hb*wb, 64], badv bool[N]).
    Same math as engine._component_smooth_body, with the block axes of
    all images fused for the per-block stages.
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

    for _ in range(niter):
        pix = planar.idct_islow_p(coef.reshape(8, 8, NB))
        # borders per image (edge replication must not cross images)
        pix_n = pix.reshape(8, 8, n, B)
        bt, bb, bl, br = jax.vmap(
            lambda p: planar.borders_from_blocks(p, hb, wb),
            in_axes=2, out_axes=1)(pix_n)
        borders = tuple(b.reshape(8, NB) for b in (bt, bb, bl, br))
        if flags & LOW_QUALITY:
            rng = planar.low_quality_range_p(coef, div)   # [NB]
            halos = jax.vmap(lambda p: planar.blocks_halo10(p, hb, wb),
                             in_axes=2, out_axes=2)(pix_n)  # [10,10,N,B]
            fb = planar.low_quality_fblocks(
                halos.reshape(10, 10, NB), rng)
            coef = planar.fdct_clamp_p(fb, coef, div, x1, qshr)
            if do_reb:
                coef = planar.rebalance_blocks_p(coef, div, x1, qshr)
        elif pallas_solver.use_pallas():
            coef = pallas_solver.solve_rebalance(
                coef, borders, div, x1, qshr, flags, do_reb,
                fence=fp32.fence_value())
        else:
            coef = planar.solve_blocks_p(coef, borders, div, x1, qshr,
                                         tables, hb, wb * n)
            if do_reb:
                coef = planar.rebalance_blocks_p(coef, div, x1, qshr)

    coef = jnp.where(badv[None, :, None],
                     coef_dq.reshape(64, n, B),
                     coef.reshape(64, n, B))
    coef = jnp.clip(coef, -1023, 1023)
    return (coef.transpose(1, 2, 0),
            badv)


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
