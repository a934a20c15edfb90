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

Compute runs the same planar fast path as the single-device engine
(``engine.block_pass_p``): the [64, B] / [8, 8, B] layout and, on TPU,
the fused Pallas solver+rebalance kernel — only the two cross-block
gather functions are swapped for ppermute-exchanging variants.

Batch parallelism across images is pure data parallelism on a second
mesh axis (no communication until results are gathered).

Bit-exactness: every block sees the same pixel neighborhood as in the
single-device engine, so outputs are bit-identical (tested in
tests/test_sharded.py on a virtual 8-device CPU mesh).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..options import (LOW_QUALITY, JOINT_YUV, UPSAMPLE_UV,
                       NO_REBALANCE, NO_REBALANCE_UV)
from ..ops import fp32
from ..ops import planar
from ..ops import pallas_solver
from ..ops.quant import roundf, c_f32_to_i32
from ..specref import make_solver_tables

F = jnp.float32
I32 = jnp.int32
CENTERJSAMPLE = 128


def _pad_to(x, m):
    """Smallest multiple of m >= x."""
    return -(-x // m) * m


def _edge_pos(real, loc):
    """(rank, local index) of the LAST REAL block row/col when a
    padded axis is split into per-shard chunks of ``loc``.

    Pad-to-divisible sharding: a plane whose block rows don't divide
    the mesh axis is padded with dead zero blocks at the bottom/right
    (the TPU analogue of OpenMP's schedule(dynamic) handing arbitrary
    row counts to any thread count, quantsmooth.h:2586-2588).  The
    image edge then sits mid-shard, so edge replication
    (quantsmooth.h:2612-2620) keys off this position instead of the
    positional last rank; blocks past it are computed and discarded.
    """
    return (real - 1) // loc, (real - 1) % loc


# ---------------------------------------------------------------------------
# Cross-shard pixel-row exchange (the 1px halo of SURVEY §5)
# ---------------------------------------------------------------------------

def _row_halo_blocks(pix, hb_loc, wb, axis):
    """Exchange the cross-shard pixel rows of a block-row-sharded plane.

    pix int32[8, 8, hb_loc*wb] (local blocks).  Returns (above, below)
    int32[8(col), wb]: the pixel line adjacent to this shard's first /
    last block row — the neighbor shard's edge line, or the local edge
    line itself at the global image boundary (edge replication,
    quantsmooth.h:2612-2620).
    """
    p = pix.reshape(8, 8, hb_loc, wb)
    my_top = p[0, :, 0, :]
    my_bot = p[7, :, -1, :]
    n = jax.lax.axis_size(axis)
    if n == 1:
        return my_top, my_bot
    r = jax.lax.axis_index(axis)
    from_above = jax.lax.ppermute(
        my_bot, axis, [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(
        my_top, axis, [(i + 1, i) for i in range(n - 1)])
    above = jnp.where(r == 0, my_top, from_above)
    below = jnp.where(r == n - 1, my_bot, from_below)
    return above, below


def _fix_bottom_edge(bottom, p, axis, row_edge):
    """Pad-to-divisible: on the rank holding the last REAL block row,
    that row's 'below' line is its own bottom pixel line (global-edge
    replication, quantsmooth.h:2612-2620) instead of the dead pad
    row's pixels.  bottom [8, hb_loc, wb]; p [8, 8, hb_loc, wb]."""
    if row_edge is None:
        return bottom
    er, el = row_edge
    fixed = bottom.at[:, el, :].set(p[7, :, el, :])
    return jnp.where(jax.lax.axis_index(axis) == er, fixed, bottom)


def borders_from_blocks_sharded(pix, hb_loc, wb, axis, row_edge=None):
    """Sharded counterpart of planar.borders_from_blocks: solver halo
    rows with the cross-shard lines ppermute-exchanged.  ``row_edge``
    marks the last REAL block row under pad-to-divisible sharding."""
    p = pix.reshape(8, 8, hb_loc, wb)
    above, below = _row_halo_blocks(pix, hb_loc, wb, axis)
    top = jnp.concatenate([above[:, None, :], p[7, :, :-1, :]], axis=1)
    bottom = jnp.concatenate([p[0, :, 1:, :], below[:, None, :]], axis=1)
    bottom = _fix_bottom_edge(bottom, p, axis, row_edge)
    left = jnp.concatenate([p[:, 0, :, :1], p[:, 7, :, :-1]], axis=2)
    right = jnp.concatenate([p[:, 0, :, 1:], p[:, 7, :, -1:]], axis=2)
    B = hb_loc * wb
    return (top.reshape(8, B), bottom.reshape(8, B),
            left.reshape(8, B), right.reshape(8, B))


def _col_halo_blocks(pix, hb_loc, wb_loc, axis):
    """Column counterpart of _row_halo_blocks for a 2-D spatial mesh.

    Returns (left_of, right_of) int32[8(row), hb_loc]: the pixel
    column adjacent to this shard's first / last block column — the
    horizontal neighbor shard's edge column, or the local edge column
    at the global image boundary (edge replication,
    quantsmooth.h:2612-2620).
    """
    p = pix.reshape(8, 8, hb_loc, wb_loc)
    my_left = p[:, 0, :, 0]
    my_right = p[:, 7, :, -1]
    n = jax.lax.axis_size(axis)
    if n == 1:
        return my_left, my_right
    c = jax.lax.axis_index(axis)
    from_left = jax.lax.ppermute(
        my_right, axis, [(i, i + 1) for i in range(n - 1)])
    from_right = jax.lax.ppermute(
        my_left, axis, [(i + 1, i) for i in range(n - 1)])
    left = jnp.where(c == 0, my_left, from_left)
    right = jnp.where(c == n - 1, my_right, from_right)
    return left, right


def borders_from_blocks_sharded2d(pix, hb_loc, wb_loc, row_axis, col_axis,
                                  row_edge=None, col_edge=None):
    """2-D-sharded counterpart of planar.borders_from_blocks: solver
    halo lines with BOTH the cross-row and cross-column shard lines
    ppermute-exchanged (block grid sharded over a (row, col) mesh).
    ``row_edge``/``col_edge`` mark the last REAL block row/column
    under pad-to-divisible sharding."""
    p = pix.reshape(8, 8, hb_loc, wb_loc)
    above, below = _row_halo_blocks(pix, hb_loc, wb_loc, row_axis)
    lefts, rights = _col_halo_blocks(pix, hb_loc, wb_loc, col_axis)
    top = jnp.concatenate([above[:, None, :], p[7, :, :-1, :]], axis=1)
    bottom = jnp.concatenate([p[0, :, 1:, :], below[:, None, :]], axis=1)
    bottom = _fix_bottom_edge(bottom, p, row_axis, row_edge)
    left = jnp.concatenate([lefts[:, :, None], p[:, 7, :, :-1]], axis=2)
    right = jnp.concatenate([p[:, 0, :, 1:], rights[:, :, None]], axis=2)
    if col_edge is not None:
        ecr, ecl = col_edge
        fixed = right.at[:, :, ecl].set(p[:, 7, :, ecl])
        right = jnp.where(jax.lax.axis_index(col_axis) == ecr, fixed, right)
    B = hb_loc * wb_loc
    return (top.reshape(8, B), bottom.reshape(8, B),
            left.reshape(8, B), right.reshape(8, B))


def _fix_dn_edge(dn, p4, axis, row_edge):
    """halo10 counterpart of _fix_bottom_edge: the last REAL block
    row's halo bottom line is its own pixel row 7.  dn [1, 8, hb, wb]."""
    if row_edge is None:
        return dn
    er, el = row_edge
    fixed = dn.at[0, :, el, :].set(p4[7, :, el, :])
    return jnp.where(jax.lax.axis_index(axis) == er, fixed, dn)


def blocks_halo10_sharded2d(pix, hb_loc, wb_loc, row_axis, col_axis,
                            row_edge=None, col_edge=None):
    """2-D-sharded counterpart of planar.blocks_halo10.

    Exchange order gives correct diagonal corners: the vertical halo
    (row-axis ppermute) is attached first, then the horizontal edge
    columns OF THE ROW-EXTENDED array are exchanged on the column
    axis — the horizontal neighbor's edge column already carries its
    own exchanged top/bottom lines, i.e. the diagonal shard's corner
    pixels (same containment argument as the local gather,
    planar.blocks_halo10).  ``row_edge``/``col_edge`` mark the last
    REAL block row/column under pad-to-divisible sharding; the fix
    lands before the horizontal gather so corners stay correct."""
    p4 = pix.reshape(8, 8, hb_loc, wb_loc)
    above, below = _row_halo_blocks(pix, hb_loc, wb_loc, row_axis)
    up = jnp.concatenate([above[None, :, None, :], p4[7:8, :, :-1, :]],
                         axis=2)
    dn = jnp.concatenate([p4[0:1, :, 1:, :], below[None, :, None, :]],
                         axis=2)
    dn = _fix_dn_edge(dn, p4, row_axis, row_edge)
    mid = jnp.concatenate([up, p4, dn], axis=0)      # [10, 8, hb, wb]

    my_left10 = mid[:, 0, :, 0]                      # [10, hb_loc]
    my_right10 = mid[:, 7, :, -1]
    n = jax.lax.axis_size(col_axis)
    if n == 1:
        left10, right10 = my_left10, my_right10
    else:
        c = jax.lax.axis_index(col_axis)
        from_left = jax.lax.ppermute(
            my_right10, col_axis, [(i, i + 1) for i in range(n - 1)])
        from_right = jax.lax.ppermute(
            my_left10, col_axis, [(i + 1, i) for i in range(n - 1)])
        left10 = jnp.where(c == 0, my_left10, from_left)
        right10 = jnp.where(c == n - 1, my_right10, from_right)

    left = jnp.concatenate([left10[:, None, :, None],
                            mid[:, 7:8, :, :-1]], axis=3)
    right = jnp.concatenate([mid[:, 0:1, :, 1:],
                             right10[:, None, :, None]], axis=3)
    if col_edge is not None:
        ecr, ecl = col_edge
        fixed = right.at[:, 0, :, ecl].set(mid[:, 7, :, ecl])
        right = jnp.where(jax.lax.axis_index(col_axis) == ecr,
                          fixed, right)
    return jnp.concatenate([left, mid, right], axis=1).reshape(
        10, 10, hb_loc * wb_loc)


def blocks_halo10_sharded(pix, hb_loc, wb, axis, row_edge=None):
    """Sharded counterpart of planar.blocks_halo10: [10, 10, B] block
    neighborhoods with the cross-shard rows exchanged.  Corners work as
    in the local version: the vertical halo (including the exchanged
    lines) is attached before the horizontal gather, so a neighbor's
    column 7 carries the diagonal blocks' corner pixels.  ``row_edge``
    marks the last REAL block row under pad-to-divisible sharding."""
    p4 = pix.reshape(8, 8, hb_loc, wb)
    above, below = _row_halo_blocks(pix, hb_loc, wb, axis)
    up = jnp.concatenate([above[None, :, None, :], p4[7:8, :, :-1, :]],
                         axis=2)
    dn = jnp.concatenate([p4[0:1, :, 1:, :], below[None, :, None, :]],
                         axis=2)
    dn = _fix_dn_edge(dn, p4, axis, row_edge)
    mid = jnp.concatenate([up, p4, dn], axis=0)          # [10, 8, hb, wb]
    left = jnp.concatenate([mid[:, 0:1, :, :1], mid[:, 7:8, :, :-1]],
                           axis=3)
    right = jnp.concatenate([mid[:, 0:1, :, 1:], mid[:, 7:8, :, -1:]],
                            axis=3)
    return jnp.concatenate([left, mid, right], axis=1).reshape(
        10, 10, hb_loc * wb)


# ---------------------------------------------------------------------------
# Resident-tile sharded iteration loop (ghost block rows/columns)
# ---------------------------------------------------------------------------
# The Pallas path mirrors engine._pallas_resident_iters: coefficients
# and pixels stay in the kernel tile layout across iterations and the
# neighbor lines are rebuilt in VMEM.  Cross-shard coupling is handled
# with GHOST BLOCKS: the local block grid is extended by one block row
# above and below (and, on a 2-D row x col mesh, one block column left
# and right), and each iteration ppermute-exchanges only the boundary
# pixel lines into the ghosts (the kernel reads nothing else from them
# — the top ghosts' pixel rows 56..63, the bottom ghosts' rows 0..7,
# the left ghosts' pixel column 7 and the right ghosts' column 0).
# The per-rank edge masks carry the reference's edge-replication bits
# only on the global edge shards, so interior shards read true
# neighbor pixels from the ghosts (quantsmooth.h:2612-2620; OpenMP
# barrier analogue 2609->2624).

def _overlap_enabled():
    """JPEGQS_OVERLAP=1: split sharded passes into interior/boundary
    kernel calls so the halo exchange overlaps interior compute."""
    import os
    return os.environ.get("JPEGQS_OVERLAP", "0") not in ("0", "", "false")


def _lane_slice(xt, r0, r1, lo, hi):
    """Rows [r0, r1) x flat lanes [lo, hi) of a tiled [g, R, 8, 128]
    array -> [r1-r0, hi-lo]."""
    T = pallas_solver.TILE_BLOCKS
    g0, g1 = lo // T, (hi + T - 1) // T
    seg = xt[g0:g1, r0:r1]
    flat = seg.transpose(1, 0, 2, 3).reshape(r1 - r0, -1)
    return flat[:, lo - g0 * T:hi - g0 * T]


def _lane_update(xt, r0, r1, lo, val):
    """Write val [r1-r0, w] into rows [r0, r1) x lanes [lo, lo+w)."""
    T = pallas_solver.TILE_BLOCKS
    hi = lo + val.shape[1]
    g0, g1 = lo // T, (hi + T - 1) // T
    seg = xt[g0:g1, r0:r1]
    t = g1 - g0
    flat = seg.transpose(1, 0, 2, 3).reshape(r1 - r0, t * T)
    flat = jax.lax.dynamic_update_slice(flat, val, (0, lo - g0 * T))
    seg = flat.reshape(r1 - r0, t, 8, 128).transpose(1, 0, 2, 3)
    return xt.at[g0:g1, r0:r1].set(seg)


@functools.lru_cache(maxsize=None)
def _ext_mask_parts(hb_loc, wb, bot_by=None):
    """(base, top_add, bottom_add) int32 [g, 8, 128] mask tiles for the
    ghost-extended local array: left/right replication bits everywhere,
    top/bottom bits as rank-selected addends for the edge shards.
    ``bot_by``: ghost-indexed local block row carrying the bottom-edge
    bit (pad-to-divisible sharding puts the last REAL row mid-shard);
    defaults to the last local row."""
    T = pallas_solver.TILE_BLOCKS
    Bext = (hb_loc + 2) * wb
    bp = (Bext + T - 1) // T * T
    j = np.arange(bp, dtype=np.int64)
    b = np.minimum(j, Bext - 1)
    by, bx = b // wb, b % wb
    if bot_by is None:
        bot_by = hb_loc
    base = ((bx == 0) * pallas_solver._BX0
            | (bx == wb - 1) * pallas_solver._BXN).astype(np.int32)
    top = ((by == 1) * pallas_solver._BY0).astype(np.int32)
    bot = ((by == bot_by) * pallas_solver._BYN).astype(np.int32)
    base[Bext:] = 0
    shape = (bp // T, 8, 128)
    return (base.reshape(shape), top.reshape(shape), bot.reshape(shape))


@functools.lru_cache(maxsize=None)
def _ext_mask_parts2d(hb_loc, wb_loc, bot_by, right_bx):
    """(top, bottom, left, right) int32 [g, 8, 128] rank-selected mask
    addends for the 2-D ghost-extended grid (hb_loc+2) x (wb_loc+2):
    on a (row, col) mesh EVERY edge-replication bit is rank-dependent
    (quantsmooth.h:2612-2620 replication happens only at the global
    image edge).  ``bot_by``/``right_bx``: ghost-indexed local block
    row/col carrying the bottom/right edge bit (pad-to-divisible
    sharding puts the real image edge mid-shard)."""
    T = pallas_solver.TILE_BLOCKS
    wb_eff = wb_loc + 2
    Bext = (hb_loc + 2) * wb_eff
    bp = (Bext + T - 1) // T * T
    j = np.arange(bp, dtype=np.int64)
    b = np.minimum(j, Bext - 1)
    by, bx = b // wb_eff, b % wb_eff
    top = ((by == 1) * pallas_solver._BY0).astype(np.int32)
    bot = ((by == bot_by) * pallas_solver._BYN).astype(np.int32)
    left = ((bx == 1) * pallas_solver._BX0).astype(np.int32)
    right = ((bx == right_bx) * pallas_solver._BXN).astype(np.int32)
    shape = (bp // T, 8, 128)
    return (top.reshape(shape), bot.reshape(shape),
            left.reshape(shape), right.reshape(shape))


def _exchange_ghosts(pix_t, hb_loc, wb, axis):
    """ppermute the boundary pixel lines into the ghost rows: the top
    ghosts receive the upper neighbor's last-row pixel lines (rows
    56..63), the bottom ghosts the lower neighbor's first-row lines
    (rows 0..7).  Edge shards keep garbage ghosts — their masks carry
    the replication bits, so the kernel never reads them."""
    n = jax.lax.axis_size(axis)
    if n == 1:
        return pix_t
    top_lines = _lane_slice(pix_t, 0, 8, wb, 2 * wb)
    bot_lines = _lane_slice(pix_t, 56, 64, hb_loc * wb,
                            (hb_loc + 1) * wb)
    from_above = jax.lax.ppermute(
        bot_lines, axis, [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(
        top_lines, axis, [(i + 1, i) for i in range(n - 1)])
    pix_t = _lane_update(pix_t, 56, 64, 0, from_above)
    pix_t = _lane_update(pix_t, 0, 8, (hb_loc + 1) * wb, from_below)
    return pix_t


def _col_lane_slice(pix_t, c, lanes):
    """Pixel column ``c`` (rows c::8 of the 64-axis) of the blocks at
    the given flat lanes of a tiled [g, 64, 8, 128] array ->
    [8, len(lanes)].  The lanes of one block COLUMN are strided by the
    grid width, so this is a small static gather (XLA fuses it into
    its producer; only the tiny result materializes)."""
    g = pix_t.shape[0]
    sub = pix_t[:, c::8]                                # [g, 8, 8, 128]
    flat = sub.transpose(1, 0, 2, 3).reshape(
        8, g * pallas_solver.TILE_BLOCKS)
    return flat[:, jnp.asarray(lanes)]


def _col_lane_update(pix_t, c, lanes, val):
    """Write val [8, len(lanes)] into pixel column ``c`` of the blocks
    at the given flat lanes (inverse of _col_lane_slice).  Touches only
    the 8 of 64 pixel rows that hold column ``c`` — an eighth of the
    array moves, not the whole plane."""
    g = pix_t.shape[0]
    sub = pix_t[:, c::8]
    flat = sub.transpose(1, 0, 2, 3).reshape(
        8, g * pallas_solver.TILE_BLOCKS)
    flat = flat.at[:, jnp.asarray(lanes)].set(val)
    sub = flat.reshape(8, g, 8, 128).transpose(1, 0, 2, 3)
    return pix_t.at[:, c::8].set(sub)


def _exchange_ghosts2d(pix_t, hb_loc, wb_loc, row_axis, col_axis):
    """2-D-grid ghost exchange: rows first (full extended width), then
    the edge pixel columns OF THE ROW-EXTENDED array on the column
    axis.  The ordering gives correct diagonal corners exactly as in
    blocks_halo10_sharded2d: the horizontal neighbor's edge column
    already carries its freshly exchanged ghost-row lines — i.e. the
    diagonal shard's corner pixels — so one row + one column ppermute
    per iteration covers all 8 neighbor directions
    (quantsmooth.h:2612-2620; barrier analogue 2609->2624)."""
    wb_eff = wb_loc + 2
    pix_t = _exchange_ghosts(pix_t, hb_loc, wb_eff, row_axis)
    n = jax.lax.axis_size(col_axis)
    if n == 1:
        return pix_t
    rows = np.arange(hb_loc + 2, dtype=np.int64) * wb_eff
    right_col = _col_lane_slice(pix_t, 7, rows + wb_loc)   # last real col
    left_col = _col_lane_slice(pix_t, 0, rows + 1)         # first real col
    from_left = jax.lax.ppermute(
        right_col, col_axis, [(i, i + 1) for i in range(n - 1)])
    from_right = jax.lax.ppermute(
        left_col, col_axis, [(i + 1, i) for i in range(n - 1)])
    pix_t = _col_lane_update(pix_t, 7, rows, from_left)
    pix_t = _col_lane_update(pix_t, 0, rows + wb_eff - 1, from_right)
    return pix_t


def _sharded_resident_iters(coef, pix, img2_halo, div, x1, qshr, flags,
                            luma, hb_loc, wb, niter, extra_refresh,
                            row_axis, row_edge=None, col_axis=None,
                            col_edge=None):
    """Sharded driver loop on resident tiles: kernel passes with
    in-VMEM neighbor construction, one boundary-line exchange per
    iteration.  The ghost blocks are computed like real blocks and
    discarded (2/hb_loc waste, plus 2/wb_loc on a column-sharded grid
    — negligible at the plane sizes where multi-chip sharding
    matters).  With ``col_axis`` the local grid is ghost-extended on
    BOTH axes ((hb_loc+2) x (wb_loc+2)) and each iteration runs the
    row-then-column exchange of _exchange_ghosts2d."""
    B = hb_loc * wb
    wb_eff = wb if col_axis is None else wb + 2
    Bext = (hb_loc + 2) * wb_eff
    do_reb = not (flags & NO_REBALANCE
                  or (not luma and (flags & NO_REBALANCE_UV)))

    if col_axis is None:
        def embed(x, R):
            return pallas_solver.tile_blocks(
                jnp.pad(x.reshape(R, B), ((0, 0), (wb, wb))))

        def extract(xt):
            return pallas_solver.untile_blocks(xt, Bext)[:, wb:wb + B]
    else:
        def embed(x, R):
            xg = x.reshape(R, hb_loc, wb)
            return pallas_solver.tile_blocks(jnp.pad(
                xg, ((0, 0), (1, 1), (1, 1))).reshape(R, Bext))

        def extract(xt):
            xg = pallas_solver.untile_blocks(xt, Bext).reshape(
                64, hb_loc + 2, wb_eff)
            return xg[:, 1:-1, 1:-1].reshape(64, B)

    coef_t = embed(coef, 64)
    if pix is None:
        # kernel-side pixel bootstrap (ghost pixels are garbage until
        # the exchange overwrites the lines the kernel reads)
        pix_t = pallas_solver.idct_pix_tiles(coef_t, div, x1, qshr,
                                             fence=fp32.fence_value())
    else:
        pix_t = embed(pix.reshape(64, B), 64)
    n = jax.lax.axis_size(row_axis)
    er, el = (n - 1, hb_loc - 1) if row_edge is None else row_edge
    r = jax.lax.axis_index(row_axis)
    if col_axis is None:
        base, top, bot = _ext_mask_parts(hb_loc, wb, el + 1)
        masks_t = (jnp.asarray(base)
                   + jnp.where(r == 0, jnp.asarray(top), 0)
                   + jnp.where(r == er, jnp.asarray(bot), 0))
    else:
        nc = jax.lax.axis_size(col_axis)
        ecr, ecl = (nc - 1, wb - 1) if col_edge is None else col_edge
        top, bot, left, right = _ext_mask_parts2d(hb_loc, wb, el + 1,
                                                  ecl + 1)
        c = jax.lax.axis_index(col_axis)
        masks_t = (jnp.where(r == 0, jnp.asarray(top), 0)
                   + jnp.where(r == er, jnp.asarray(bot), 0)
                   + jnp.where(c == 0, jnp.asarray(left), 0)
                   + jnp.where(c == ecr, jnp.asarray(right), 0))
    img2_t = (embed(img2_halo.reshape(100, B), 100)
              if img2_halo is not None else None)
    joint_or_lq = img2_halo is not None or (flags & LOW_QUALITY)

    def kern(pix_in, keep, tile_range=None):
        if joint_or_lq:
            return pallas_solver.solve_fused_pix(
                coef_t, pix_in, masks_t, img2_t, div, x1, qshr, flags,
                do_reb, wb_eff, fence=fp32.fence_value(), want_pix=keep,
                tile_range=tile_range)
        return pallas_solver.solve_rebalance_pix(
            coef_t, pix_in, masks_t, div, x1, qshr, flags, do_reb,
            wb_eff, fence=fp32.fence_value(), want_pix=keep,
            tile_range=tile_range)

    # exchange/compute overlap (JPEGQS_OVERLAP=1, row flow): split each
    # pass into interior tiles — whose (2k+1)-tile windows cannot reach
    # the ghost lanes, so they read the PRE-exchange pixel buffer and
    # carry no data dependency on the ppermute — and boundary tiles
    # that wait for it.  XLA's latency-hiding scheduler can then fly
    # the collective under the interior kernel (SURVEY §5).  Default
    # off: the exchange payload is KBs against ms of kernel per
    # iteration, and the split pays two full-plane concats (measured
    # in tools/profile_overlap.py; see BASELINE.md).
    T = pallas_solver.TILE_BLOCKS
    g = coef_t.shape[0]
    t_lo = -(-wb_eff // T) + pallas_solver._win_k(wb_eff)
    t_hi = ((hb_loc + 1) * wb_eff) // T - pallas_solver._win_k(wb_eff)
    overlap = (col_axis is None and t_lo < t_hi and g > 1
               and _overlap_enabled())

    for it in range(niter):
        keep = bool(it < niter - 1 or extra_refresh)
        if overlap:
            pix_new = _exchange_ghosts(pix_t, hb_loc, wb, row_axis)
            mid = kern(pix_t, keep, tile_range=(t_lo, t_hi))
            lo = kern(pix_new, keep, tile_range=(0, t_lo))
            hi = kern(pix_new, keep, tile_range=(t_hi, g))
            if keep:
                coef_t = jnp.concatenate([lo[0], mid[0], hi[0]])
                pix_t = jnp.concatenate([lo[1], mid[1], hi[1]])
            else:
                coef_t = jnp.concatenate([lo, mid, hi])
            continue
        if col_axis is None:
            pix_t = _exchange_ghosts(pix_t, hb_loc, wb, row_axis)
        else:
            pix_t = _exchange_ghosts2d(pix_t, hb_loc, wb, row_axis,
                                       col_axis)
        out = kern(pix_t, keep)
        if keep:
            coef_t, pix_t = out
        else:
            coef_t = out
    coef = extract(coef_t)
    pix = extract(pix_t)
    return coef, pix.reshape(8, 8, B)


# ---------------------------------------------------------------------------
# Per-component sharded smoothing
# ---------------------------------------------------------------------------

def _component_body(coef16, qraw, div, x1, qshr, img2_halo, *, hb_loc, wb,
                    flags, niter, extra_refresh, luma, tables, row_axis,
                    col_axis=None, row_edge=None, col_edge=None):
    """Local shard of one component pass — the planar analogue of
    engine._component_smooth_body with ppermute halo gathers.

    With ``col_axis`` the block grid is sharded over a 2-D spatial
    (row, col) mesh: both halo directions are ppermute-exchanged; on
    the Pallas path the resident-tile loop runs with ghost rows AND
    ghost columns (one row + one column exchange per iteration).

    ``row_edge``/``col_edge``: (rank, local index) of the last REAL
    block row/column — pad-to-divisible sharding (see _edge_pos)."""
    from .. import engine as _engine

    B = hb_loc * wb
    # reshape (a bitcast) BEFORE the widening cast: the [B, 64] int16
    # view fuses into the dequant transpose exactly like the plain
    # engine's input path; casting the 3-D array first cost XLA a
    # full-plane int32 copy
    prod = coef16.reshape(B, 64).astype(I32).T * qraw[:, None]  # [64, B]
    orv = jnp.bitwise_or.reduce((prod + 0x800).ravel())
    bad_loc = ((orv >> 12) != 0).astype(I32)
    bad_axes = row_axis if col_axis is None else (row_axis, col_axis)
    badv = jax.lax.pmax(bad_loc, bad_axes) > 0
    coef = prod.astype(jnp.int16).astype(I32)
    coef_dq = coef

    if col_axis is None:
        def mkhalo(p):
            return blocks_halo10_sharded(p, hb_loc, wb, row_axis,
                                         row_edge=row_edge)

        def mkbord(p):
            return borders_from_blocks_sharded(p, hb_loc, wb, row_axis,
                                               row_edge=row_edge)
    else:
        def mkhalo(p):
            return blocks_halo10_sharded2d(p, hb_loc, wb, row_axis,
                                           col_axis, row_edge=row_edge,
                                           col_edge=col_edge)

        def mkbord(p):
            return borders_from_blocks_sharded2d(p, hb_loc, wb, row_axis,
                                                 col_axis,
                                                 row_edge=row_edge,
                                                 col_edge=col_edge)

    # same driver-loop shape as engine._component_smooth_body: on the
    # Pallas path the whole loop runs on resident tiles with ghost-
    # block boundary exchanges (1-D row or 2-D row x col grid); the
    # XLA path exchanges materialized halos
    if pallas_solver.use_pallas() and niter > 0:
        coef, pix = _sharded_resident_iters(
            coef, None, img2_halo, div, x1, qshr, flags, luma, hb_loc,
            wb, niter, extra_refresh, row_axis, row_edge=row_edge,
            col_axis=col_axis, col_edge=col_edge)
    else:
        pix = planar.idct_islow_p(coef.reshape(8, 8, B))
        for it in range(niter):
            keep = it < niter - 1 or extra_refresh
            coef, newpix = _engine.block_pass_p(
                coef, pix, img2_halo, div, x1, qshr, flags, tables, luma,
                mkhalo, mkbord, hb_loc, wb, want_pix=bool(keep))
            if keep:
                pix = (newpix if newpix is not None
                       else planar.idct_islow_p(coef.reshape(8, 8, B)))
    coef = jnp.where(badv, coef_dq, coef)
    coef = jnp.clip(coef, -1023, 1023)
    return coef, pix, badv


def make_sharded_smooth(mesh: Mesh, *, hb, wb, flags, niter,
                        extra_refresh=0, luma=True, row_axis="row",
                        batch_axis=None, col_axis=None, use_image2=False,
                        want_pix=False):
    """Build a jitted sharded component smoother on the planar fast path.

    Returns fn(coef16, qraw, div, x1, qshr[, image2]) -> (coef, badv)
    where coef16 is int16[(batch,)? hb, wb, 64] sharded
    (batch_axis?, row_axis, col_axis?) over the mesh.  Block rows/cols
    that don't divide the mesh axes are PADDED with dead zero blocks
    (masked out of the halo reads at the real image edge and sliced
    off the result) — any plane uses the full device set, like the
    reference's OpenMP schedule(dynamic) over arbitrary row counts
    (quantsmooth.h:2586-2588).  Inputs may be passed at the real dims
    (host arrays are padded here) or pre-padded/pre-sharded at
    ``fn.padded_dims``.

    With ``col_axis`` the plane is sharded over a 2-D spatial mesh —
    block rows AND block columns — for very wide images or large
    slices where row sharding alone runs out of rows; both halo
    directions (plus the diagonal corners) ride ppermute.

    With use_image2 (JOINT_YUV chroma pass), image2 is the downsampled
    luma plane *interior* int32[hb*8, wb*8], sharded like the
    coefficients; its 1-pixel halo is exchanged on device alongside
    the component plane's (reference reads image2 through the same
    padded-plane pattern, quantsmooth.h:893-920).

    The whole niter loop runs inside one jitted program; each iteration
    does local IDCT -> halo exchange -> local block pass, on TPU
    through the fused Pallas solver kernel per shard.
    """
    n_rows = mesh.shape[row_axis]
    n_cols = mesh.shape[col_axis] if col_axis is not None else 1
    assert hb >= n_rows and wb >= n_cols, "more shards than block rows"
    hb_pad, wb_pad = _pad_to(hb, n_rows), _pad_to(wb, n_cols)
    hb_loc, wb_loc = hb_pad // n_rows, wb_pad // n_cols
    row_edge = _edge_pos(hb, hb_loc)
    col_edge = _edge_pos(wb, wb_loc) if col_axis is not None else None
    assert not (want_pix and col_axis is not None), \
        "want_pix is a row-sharded-flow hook (flat block axis)"
    tables = None
    if not (flags & LOW_QUALITY):
        tables = make_solver_tables(flags)

    def local_fn(coef16, qraw, div, x1, qshr, image2, fence):
        # shapes (local): coef16 int16[hb_loc, wb_loc, 64]
        with fp32.fence_token(fence):
            img2_halo = None
            if use_image2 and (flags & JOINT_YUV):
                ds = planar.plane_to_fblocks_p(image2, hb_loc, wb_loc
                                               ).astype(I32)
                img2_halo = (
                    blocks_halo10_sharded(ds, hb_loc, wb_loc, row_axis,
                                          row_edge=row_edge)
                    if col_axis is None else
                    blocks_halo10_sharded2d(ds, hb_loc, wb_loc, row_axis,
                                            col_axis, row_edge=row_edge,
                                            col_edge=col_edge))
            coef, pix, badv = _component_body(
                coef16, qraw, div, x1, qshr, img2_halo, hb_loc=hb_loc,
                wb=wb_loc, flags=flags, niter=niter,
                extra_refresh=extra_refresh, luma=luma, tables=tables,
                row_axis=row_axis, col_axis=col_axis, row_edge=row_edge,
                col_edge=col_edge)
            # emit int16 (the contract dtype, half the HBM) and, on the
            # row-only flow, a flat [B_loc, 64] — the [hb, wb, 64]
            # reshape inside shard_map costs two extra full-plane
            # copies at the output boundary; run() reshapes outside
            out = coef.T.astype(jnp.int16)
            if col_axis is not None:
                out = out.reshape(hb_loc, wb_loc, 64)
            if want_pix:
                return out, badv, pix
            return out, badv

    # only a real JOINT_YUV pass reads image2; otherwise feed a tiny
    # replicated dummy instead of materializing (and transferring) a
    # full-size zeros plane the traced body never touches
    img2_live = use_image2 and bool(flags & JOINT_YUV)
    img2_spec = P(row_axis, col_axis) if img2_live else P()
    coef_out = (P(row_axis, col_axis, None) if col_axis is not None
                else P(row_axis, None))
    if batch_axis is None:
        in_specs = (P(row_axis, col_axis, None), P(), P(), P(), P(),
                    img2_spec, P())
        out_specs = (coef_out, P())
        if want_pix:
            out_specs = out_specs + (P(None, None, row_axis),)
        fn = local_fn
    else:
        def fn(coef16, qraw, div, x1, qshr, image2, fence):
            return jax.vmap(
                lambda c: local_fn(c, qraw, div, x1, qshr, image2,
                                   fence))(coef16)
        in_specs = (P(batch_axis, row_axis, col_axis, None),
                    P(), P(), P(), P(), img2_spec, P())
        out_specs = (P(batch_axis, *tuple(coef_out)), P(batch_axis))
        if want_pix:
            out_specs = out_specs + (P(batch_axis, None, None, row_axis),)

    sharded = jax.jit(shard_map(fn, mesh=mesh, in_specs=in_specs,
                                out_specs=out_specs, check_vma=False))
    padded = (hb_pad, wb_pad) != (hb, wb)

    def _prep_coef(c):
        if not padded or (c.shape[-3], c.shape[-2]) == (hb_pad, wb_pad):
            return c
        arr = np.asarray(c)
        pw = [(0, 0)] * arr.ndim
        pw[-3] = (0, hb_pad - hb)
        pw[-2] = (0, wb_pad - wb)
        return np.pad(arr, pw)

    def run(coef16, qraw, div, x1, qshr, image2=None):
        coef16 = _prep_coef(coef16)
        if image2 is None:
            image2 = jnp.zeros(
                (hb_pad * 8, wb_pad * 8) if img2_live else (8, 8), I32)
        elif padded and image2.shape == (hb * 8, wb * 8):
            image2 = np.pad(np.asarray(image2),
                            ((0, (hb_pad - hb) * 8),
                             (0, (wb_pad - wb) * 8)))
        res = sharded(coef16, qraw, div, x1, qshr, image2, jnp.int32(0))
        out = res[0]
        if col_axis is None:
            out = out.reshape(out.shape[:-2] + (hb_pad, wb_pad, 64))
        if not padded:
            return (out,) + tuple(res[1:])
        out = out[..., :hb, :wb, :]
        if want_pix:
            return out, res[1], res[2][..., :hb * wb]
        return (out,) + tuple(res[1:])

    run.padded_dims = (hb_pad, wb_pad)
    run.jitted = sharded          # introspection/profiling hook
    return run


# ---------------------------------------------------------------------------
# Whole-image sharded YCbCr flow (one shard_map program)
# ---------------------------------------------------------------------------

def make_sharded_ycbcr_smooth(mesh: Mesh, *, hb_l, wb_l, hb_c, wb_c,
                              ws, hs, flags, niter, row_axis="row",
                              img_w=None, img_h=None, col_axis=None):
    """End-to-end sharded YCbCr smoothing — the reference flow
    quantsmooth.h:2484-2849 including UPSAMPLE_UV, as ONE shard_map
    program over the row axis (optionally a 2-D row x col grid).

    All three component planes are sharded alike; the luma pass emits
    its pixel blocks, which are box-downsampled shard-locally and
    halo-exchanged into the chroma JOINT passes; with UPSAMPLE_UV the
    full-resolution chroma is regressed shard-locally from the luma
    pixels (replicate tails are confined to the last block row/column,
    hence shard-local — see planar.upsample_chroma_blocks).

    Requires aligned dims (hb_l == hs*hb_c, wb_l == ws*wb_c) and ws, hs
    in {1, 2}.  Block rows/cols that don't divide the mesh axes are
    padded with dead zero blocks (chroma padded to the row-axis
    multiple, luma by hs/ws times that, so the planes stay aligned;
    results are sliced back).  Column sharding needs >= 2 local luma
    block columns when UPSAMPLE runs, so the right-tail source stays
    shard-local.  Returns fn(coef_y, coef_cb, coef_cr, qtabs_y,
    qtabs_c[, qtabs_cr]) -> (y, cb, cr, badv, ups) with ups either
    None or (up_cb, up_cr) int16[hb_l, wb_l, 64] coefficient planes at
    luma dims.
    """
    assert ws in (1, 2) and hs in (1, 2)
    assert hb_l == hs * hb_c and wb_l == ws * wb_c, "aligned dims only"
    n_rows = mesh.shape[row_axis]
    n_cols = mesh.shape[col_axis] if col_axis is not None else 1
    assert hb_c >= n_rows and wb_c >= n_cols, "more shards than block rows"
    hb_c_pad, wb_c_pad = _pad_to(hb_c, n_rows), _pad_to(wb_c, n_cols)
    hb_l_pad, wb_l_pad = hs * hb_c_pad, ws * wb_c_pad
    hbl_loc, hbc_loc = hb_l_pad // n_rows, hb_c_pad // n_rows
    wbl_loc, wbc_loc = wb_l_pad // n_cols, wb_c_pad // n_cols
    row_edge_l = _edge_pos(hb_l, hbl_loc)
    row_edge_c = _edge_pos(hb_c, hbc_loc)
    col_edge_l = _edge_pos(wb_l, wbl_loc) if col_axis is not None else None
    col_edge_c = _edge_pos(wb_c, wbc_loc) if col_axis is not None else None
    if img_w is None:
        img_w = wb_l * 8
    if img_h is None:
        img_h = hb_l * 8
    do_up = bool(flags & UPSAMPLE_UV) and not (ws == 1 and hs == 1)
    assert n_cols == 1 or not do_up or wbl_loc >= 2, \
        "col-sharded UPSAMPLE needs >= 2 local luma block columns"
    tables = None
    if not (flags & LOW_QUALITY):
        tables = make_solver_tables(flags)

    def mkhalo_c(p):
        if col_axis is None:
            return blocks_halo10_sharded(p, hbc_loc, wbc_loc, row_axis,
                                         row_edge=row_edge_c)
        return blocks_halo10_sharded2d(p, hbc_loc, wbc_loc, row_axis,
                                       col_axis, row_edge=row_edge_c,
                                       col_edge=col_edge_c)

    def upsample_one(pix_c, img2_halo, pix_y, row0, col0):
        ch_halo = mkhalo_c(pix_c)
        up = planar.upsample_chroma_blocks(
            ch_halo, img2_halo, pix_y, img_w, img_h, ws, hs,
            hbl_loc, wbl_loc, hbc_loc, wbc_loc, row0=row0,
            hb_l_total=hb_l, col0=col0, wb_l_total=wb_l)
        fb = (up - CENTERJSAMPLE).astype(F)
        uc = c_f32_to_i32(roundf(
            planar.fdct_float_p(fb).reshape(64, hbl_loc * wbl_loc)))
        out = uc.T.astype(jnp.int16)
        if col_axis is not None:
            out = out.reshape(hbl_loc, wbl_loc, 64)
        return out

    def local_fn(cy, ccb, ccr, qraw_y, div_y, x1_y, qshr_y,
                 qraw_c, div_c, x1_c, qshr_c,
                 qraw_r, div_r, x1_r, qshr_r, fence):
        with fp32.fence_token(fence):
            dq = [  # plain-dequant fallbacks for stop propagation
                (c.astype(I32).reshape(-1, 64) * q[None, :]
                 ).astype(jnp.int16)
                for c, q in ((cy, qraw_y), (ccb, qraw_c), (ccr, qraw_r))]

            y, pix_y, bad_y = _component_body(
                cy, qraw_y, div_y, x1_y, qshr_y, None, hb_loc=hbl_loc,
                wb=wbl_loc, flags=flags, niter=niter, extra_refresh=1,
                luma=True, tables=tables, row_axis=row_axis,
                col_axis=col_axis, row_edge=row_edge_l,
                col_edge=col_edge_l)
            ds = planar.downsample_blocks(pix_y, hbl_loc, wbl_loc,
                                          hbc_loc, wbc_loc, ws, hs)
            img2_halo = (mkhalo_c(ds)
                         if (flags & JOINT_YUV) else None)

            extra_c = 1 if do_up else 0
            cb, pix_cb, bad_cb = _component_body(
                ccb, qraw_c, div_c, x1_c, qshr_c, img2_halo,
                hb_loc=hbc_loc, wb=wbc_loc, flags=flags, niter=niter,
                extra_refresh=extra_c, luma=False, tables=tables,
                row_axis=row_axis, col_axis=col_axis,
                row_edge=row_edge_c, col_edge=col_edge_c)
            cr, pix_cr, bad_cr = _component_body(
                ccr, qraw_r, div_r, x1_r, qshr_r, img2_halo,
                hb_loc=hbc_loc, wb=wbc_loc, flags=flags, niter=niter,
                extra_refresh=extra_c, luma=False, tables=tables,
                row_axis=row_axis, col_axis=col_axis,
                row_edge=row_edge_c, col_edge=col_edge_c)

            # stop propagation (engine._image_smooth_impl): once a
            # component trips the guard, later components fall back to
            # plain dequantization.  Outputs leave the shard body as
            # int16 and (row-only flow) flat [B_loc, 64] — the 3-D
            # reshape at the shard_map output boundary costs full-plane
            # copies; run() reshapes outside.
            outs = []
            stop = jnp.zeros((), jnp.bool_)
            for res, bad, d, shape in (
                    (y, bad_y, dq[0], (hbl_loc, wbl_loc, 64)),
                    (cb, bad_cb, dq[1], (hbc_loc, wbc_loc, 64)),
                    (cr, bad_cr, dq[2], (hbc_loc, wbc_loc, 64))):
                out = jnp.where(stop, d, res.T.astype(jnp.int16))
                if col_axis is not None:
                    out = out.reshape(shape)
                outs.append(out)
                stop = stop | bad
            badv = stop

            if do_up:
                row0 = jax.lax.axis_index(row_axis) * (hbl_loc * 8)
                col0 = (jax.lax.axis_index(col_axis) * (wbl_loc * 8)
                        if col_axis is not None else 0)
                if img2_halo is None:   # UPSAMPLE without JOINT
                    img2_halo = mkhalo_c(ds)
                up_cb = upsample_one(pix_cb, img2_halo, pix_y, row0, col0)
                up_cr = upsample_one(pix_cr, img2_halo, pix_y, row0, col0)
                return (*outs, badv, up_cb, up_cr)
            return (*outs, badv)

    pspec = P(row_axis, col_axis, None)
    cspec = pspec if col_axis is not None else P(row_axis, None)
    out_specs = (cspec, cspec, cspec, P())
    if do_up:
        out_specs = out_specs + (cspec, cspec)
    sharded = jax.jit(shard_map(
        local_fn, mesh=mesh,
        in_specs=(pspec,) * 3 + (P(),) * 13,
        out_specs=out_specs, check_vma=False))

    padded = (hb_c_pad, wb_c_pad) != (hb_c, wb_c)

    def _prep(c, hbp, wbp):
        if not padded or (c.shape[0], c.shape[1]) == (hbp, wbp):
            return c
        arr = np.asarray(c)
        return np.pad(arr, ((0, hbp - arr.shape[0]),
                            (0, wbp - arr.shape[1]), (0, 0)))

    def run(coef_y, coef_cb, coef_cr, qtabs_y, qtabs_c, qtabs_cr=None):
        """qtabs_*: (qraw, div, x1, qshr) int32[64] tuples; Cr defaults
        to the Cb tables (the common shared-chroma-table case)."""
        if qtabs_cr is None:
            qtabs_cr = qtabs_c
        res = sharded(_prep(coef_y, hb_l_pad, wb_l_pad),
                      _prep(coef_cb, hb_c_pad, wb_c_pad),
                      _prep(coef_cr, hb_c_pad, wb_c_pad),
                      *qtabs_y, *qtabs_c, *qtabs_cr, jnp.int32(0))
        y, cb, cr, badv = res[:4]
        ups = (res[4], res[5]) if do_up else None
        if col_axis is None:   # flat shard outputs -> block grids
            y = y.reshape(hb_l_pad, wb_l_pad, 64)
            cb = cb.reshape(hb_c_pad, wb_c_pad, 64)
            cr = cr.reshape(hb_c_pad, wb_c_pad, 64)
            if ups is not None:
                ups = tuple(u.reshape(hb_l_pad, wb_l_pad, 64)
                            for u in ups)
        if padded:
            y = y[:hb_l, :wb_l]
            cb, cr = cb[:hb_c, :wb_c], cr[:hb_c, :wb_c]
            if ups is not None:
                ups = (ups[0][:hb_l, :wb_l], ups[1][:hb_l, :wb_l])
        return y, cb, cr, badv, ups

    run.padded_dims = (hb_l_pad, wb_l_pad, hb_c_pad, wb_c_pad)
    run.jitted = sharded          # introspection/profiling hook
    return run


def row_sharding(mesh, row_axis="row", batch_axis=None, batched=False,
                 col_axis=None):
    """NamedSharding for a coefficient tensor [(N,)? hb, wb, 64]."""
    if batched:
        return NamedSharding(mesh, P(batch_axis, row_axis, col_axis, None))
    return NamedSharding(mesh, P(row_axis, col_axis, None))
