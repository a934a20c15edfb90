"""Multi-chip sharded engine: spatial plane sharding + batch DP.

The reference's only parallel mechanism is OpenMP over block rows of a
shared-memory plane (quantsmooth.h:2552-2554 etc.).  The TPU-native
equivalent (SURVEY.md §5): shard the block grid of a component plane by
block *rows* across a mesh axis and exchange the 1-pixel halo between
neighbors each iteration with ``lax.ppermute`` — the halo is the only
cross-block coupling (quantsmooth.h:1396-1401, 2612-2620).  The
exchange sits exactly where the reference has its implicit OpenMP
barrier between the IDCT pass and the block pass
(quantsmooth.h:2609 -> 2624).

Batch parallelism across images is pure data parallelism on a second
mesh axis (no communication until results are gathered).

Bit-exactness: every block sees the same padded 10x10 neighborhood as
in the single-device engine, so outputs are bit-identical (tested in
tests/test_sharded.py by comparing against the single-device engine on
a virtual 8-device CPU mesh).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..options import LOW_QUALITY, NO_REBALANCE, NO_REBALANCE_UV, JOINT_YUV
from ..ops import fp32
from ..specref import make_solver_tables
from ..ops.dct import idct_islow
from ..ops.quant import fdct_clamp
from ..ops.plane import plane_block_borders, plane_to_fblocks
from ..ops.solver import solve_blocks
from ..ops.rebalance import rebalance_blocks
from ..ops.joint import joint_yuv_fplane
from ..ops.lowq import low_quality_range, low_quality_fplane

F = jnp.float32
I32 = jnp.int32


def _halo_exchange_rows(interior, axis):
    """Exchange 1-pixel row halos along a sharded row axis.

    interior: local [H_loc, W] pixel rows.  Returns (top, bottom) halo
    rows [W]: the neighbor's adjacent interior row, or the local edge
    row replicated at the global boundary (quantsmooth.h:2612-2620).
    """
    r = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    # my last row -> next shard's top halo
    from_above = jax.lax.ppermute(
        interior[-1, :], axis, [(i, i + 1) for i in range(n - 1)])
    # my first row -> previous shard's bottom halo
    from_below = jax.lax.ppermute(
        interior[0, :], axis, [(i + 1, i) for i in range(n - 1)])
    top = jnp.where(r == 0, interior[0, :], from_above)
    bottom = jnp.where(r == n - 1, interior[-1, :], from_below)
    return top, bottom


def _build_padded_local(interior, axis):
    """Local padded (+1px) plane from interior rows plus the halo."""
    top, bottom = _halo_exchange_rows(interior, axis)
    plane = jnp.concatenate([top[None, :], interior, bottom[None, :]], axis=0)
    return jnp.pad(plane, ((0, 0), (1, 1)), mode="edge")


def _local_block_pass(coef, padded, image2, div, x1, qshr, flags, tables,
                      luma, hb_loc, wb):
    """Per-shard block pass — identical math to engine._block_pass."""
    if image2 is not None:
        fplane = joint_yuv_fplane(padded, image2)
        coef = fdct_clamp(plane_to_fblocks(fplane, hb_loc, wb), coef,
                          div, x1, qshr)
    if flags & LOW_QUALITY:
        if image2 is None:
            rng = low_quality_range(coef, div)
            range_map = jnp.repeat(jnp.repeat(rng.reshape(hb_loc, wb), 8, 0),
                                   8, 1)
            fplane = low_quality_fplane(padded, range_map)
            coef = fdct_clamp(plane_to_fblocks(fplane, hb_loc, wb), coef,
                              div, x1, qshr)
    else:
        borders = plane_block_borders(padded, hb_loc, wb)
        coef = solve_blocks(coef, borders, div, x1, qshr, tables)
    if flags & NO_REBALANCE:
        return coef
    if not luma and (flags & NO_REBALANCE_UV):
        return coef
    return rebalance_blocks(coef, div, x1, qshr)


def make_sharded_smooth(mesh: Mesh, *, hb, wb, flags, niter,
                        extra_refresh=0, luma=True, row_axis="row",
                        batch_axis=None, use_image2=False,
                        want_interior=False):
    """Build a jitted sharded component smoother.

    Returns fn(coef16, qraw, div, x1, qshr[, image2]) -> (coef, badv)
    where coef16 is int16[(batch,)? hb, wb, 64] sharded
    (batch_axis?, row_axis) over the mesh.  hb must divide evenly by
    the row-axis size.

    With use_image2 (JOINT_YUV chroma pass), image2 is the downsampled
    luma plane *interior* int32[hb*8, wb*8], row-sharded like the
    coefficients; its 1-pixel halo is exchanged on device alongside
    the component plane's (reference reads image2 through the same
    padded-plane pattern, quantsmooth.h:893-920).

    The whole niter loop runs inside one jitted program; each iteration
    does local IDCT -> halo exchange -> local block pass.
    """
    n_rows = mesh.shape[row_axis]
    assert hb % n_rows == 0, f"hb={hb} not divisible by {n_rows} row shards"
    hb_loc = hb // n_rows
    tables = None
    if not (flags & LOW_QUALITY):
        tables = make_solver_tables(flags)

    def local_fn(coef16, qraw, div, x1, qshr, image2, fence):
        # shapes (local): coef16 int16[hb_loc, wb, 64]
        with fp32.fence_token(fence):
            return _local_fn_body(coef16, qraw, div, x1, qshr, image2)

    def _local_fn_body(coef16, qraw, div, x1, qshr, image2):
        B = hb_loc * wb
        prod = coef16.astype(I32).reshape(B, 64) * qraw[None, :]
        bad_loc = jnp.any(((prod + 0x800) >> 12) != 0)
        badv = jax.lax.pmax(bad_loc.astype(I32), row_axis) > 0
        coef = prod.astype(jnp.int16).astype(I32)
        coef_dq = coef

        img2_padded = None
        if use_image2 and (flags & JOINT_YUV):
            img2_padded = _build_padded_local(image2, row_axis)

        interior = None
        for it in range(niter + extra_refresh):
            pix = idct_islow(coef.reshape(B, 8, 8))
            interior = pix.reshape(hb_loc, wb, 8, 8).transpose(
                0, 2, 1, 3).reshape(hb_loc * 8, wb * 8)
            padded = _build_padded_local(interior, row_axis)
            if it == niter:
                break
            coef = _local_block_pass(coef, padded, img2_padded, div, x1,
                                     qshr, flags, tables, luma, hb_loc, wb)
        coef = jnp.where(badv, coef_dq, coef)
        coef = jnp.clip(coef, -1023, 1023)
        if want_interior:
            return coef.reshape(hb_loc, wb, 64), badv, interior
        return coef.reshape(hb_loc, wb, 64), badv

    img2_spec = P(row_axis, None)
    if batch_axis is None:
        in_specs = (P(row_axis, None, None), P(), P(), P(), P(),
                    img2_spec, P())
        out_specs = (P(row_axis, None, None), P())
        if want_interior:
            out_specs = out_specs + (P(row_axis, None),)
        fn = local_fn
    else:
        def fn(coef16, qraw, div, x1, qshr, image2, fence):
            return jax.vmap(
                lambda c: local_fn(c, qraw, div, x1, qshr, image2,
                                   fence))(coef16)
        in_specs = (P(batch_axis, row_axis, None, None),
                    P(), P(), P(), P(), img2_spec, P())
        out_specs = (P(batch_axis, row_axis, None, None), P(batch_axis))

    sharded = jax.jit(shard_map(fn, mesh=mesh, in_specs=in_specs,
                                out_specs=out_specs, check_vma=False))

    def run(coef16, qraw, div, x1, qshr, image2=None):
        if image2 is None:
            image2 = jnp.zeros((hb * 8, wb * 8), I32)
        return sharded(coef16, qraw, div, x1, qshr, image2, jnp.int32(0))

    return run


def make_sharded_ycbcr_smooth(mesh: Mesh, *, hb_l, wb_l, hb_c, wb_c,
                              ws, hs, flags, niter, row_axis="row"):
    """End-to-end sharded YCbCr smoothing (solver/LQ/JOINT paths —
    the reference flow quantsmooth.h:2484-2834 minus UPSAMPLE_UV).

    All three component planes are row-sharded over the mesh; the luma
    pass also emits its sharded interior pixel rows, which are box-
    downsampled shard-locally and fed to the chroma JOINT passes with
    an on-device 1px halo exchange.

    Requires aligned dims (hb_l == hs*hb_c, wb_l == ws*wb_c, standard
    even-size images) and hb_l, hb_c divisible by the row-axis size;
    ws, hs in {1, 2}.  Returns
    fn(coef_y, coef_cb, coef_cr, qtabs_y, qtabs_c) -> (y, cb, cr, badv).
    """
    assert ws in (1, 2) and hs in (1, 2)
    assert hb_l == hs * hb_c and wb_l == ws * wb_c, "aligned dims only"
    n_rows = mesh.shape[row_axis]
    assert hb_l % n_rows == 0 and hb_c % n_rows == 0

    luma_fn = make_sharded_smooth(
        mesh, hb=hb_l, wb=wb_l, flags=flags, niter=niter,
        extra_refresh=1, luma=True, row_axis=row_axis, want_interior=True)
    chroma_fn = make_sharded_smooth(
        mesh, hb=hb_c, wb=wb_c, flags=flags, niter=niter,
        extra_refresh=0, luma=False, row_axis=row_axis, use_image2=True)

    @jax.jit
    def downsample(interior):
        # exact 2x2/2x1/1x2 box (quantsmooth.h:2778-2800); a local
        # stencil, partitioned automatically across the row shards
        if hs == 2 and ws == 2:
            a = (interior[0::2, 0::2] + interior[0::2, 1::2]
                 + interior[1::2, 0::2] + interior[1::2, 1::2])
            return (a + 2) >> 2
        if hs == 2:
            return ((interior[0::2] + interior[1::2]) + 1) >> 1
        if ws == 2:
            return ((interior[:, 0::2] + interior[:, 1::2]) + 1) >> 1
        return interior

    def run(coef_y, coef_cb, coef_cr, qtabs_y, qtabs_c):
        """qtabs_*: (qraw, div, x1, qshr) int32[64] tuples."""
        y, bad_y, interior = luma_fn(coef_y, *qtabs_y)
        image2 = downsample(interior)
        cb, bad_cb = chroma_fn(coef_cb, *qtabs_c, image2)
        cr, bad_cr = chroma_fn(coef_cr, *qtabs_c, image2)
        return y, cb, cr, (bad_y, bad_cb, bad_cr)

    return run


def row_sharding(mesh, row_axis="row", batch_axis=None, batched=False):
    """NamedSharding for a coefficient tensor [(N,)? hb, wb, 64]."""
    from jax.sharding import NamedSharding
    if batched:
        return NamedSharding(mesh, P(batch_axis, row_axis, None, None))
    return NamedSharding(mesh, P(row_axis, None, None))
