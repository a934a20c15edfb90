"""Pallas TPU kernel: the per-block coefficient solver + rebalance.

This is THE hot kernel (SURVEY.md §7 step 4): the k=63..1 reverse-
zigzag sweep of quantsmooth_block (reference: quantsmooth.h:1403-1565)
fused with the AC rebalance (1823-1848), gridded over tiles of
8x128 = 1024 blocks.  All per-tile state (pixel diffs, weights) lives
in VMEM — the XLA fallback materializes ~[242, B] temporaries to HBM
per coefficient step, which is the single biggest cost of the jnp
path.

Layout per tile: leading axis = natural position / diff term, minor
axes = (8 sublanes, 128 lanes) of independent blocks.  All butterflies
and diff constructions are static leading-axis slices, so every vector
op runs on full (8, 128) vregs.  The per-(i, term) diff-basis weights
are scalar-prefetched (SMEM) and broadcast per term row.

Bit-exactness: identical integer ops; fp32 products/folds in the exact
scalar order.  Guarded against compiler re-association the same way as
ops/fp32.py — every fp32 result's bits are fenced with a runtime-zero
scalar so mul+add chains cannot be contracted into FMAs.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..specref import NATURAL_ORDER, ZIGZAG_REFRESH, make_solver_tables
from ..options import DIAGONALS, LOW_QUALITY
from . import fp32

F = jnp.float32
I32 = jnp.int32
INT32_MIN = -(1 << 31)
_TWO31F = np.float32(2147483648.0)

TILE_BLOCKS = 8 * 128  # blocks per grid step

_I_SEQ = NATURAL_ORDER[63:0:-1].astype(np.int32)            # [63]
_REFRESH_SEQ = ZIGZAG_REFRESH[_I_SEQ].astype(np.int32)      # [63]


def _make_groups():
    """Refresh groups of the k=63..1 sweep.

    Between two zigzag_refresh points no pixel state changes, so the
    coefficient steps inside one interval are mutually independent:
    their a2/a3 folds read the same frozen diffs and each writes only
    its own coefficient row (reference: quantsmooth.h:1403-1564 —
    coupling is solely through the idct refresh at 1407-1409).  Running
    a group's accumulations as independent chains preserves each
    chain's exact fold order (bit-exactness) while giving the VPU
    group-many independent dependency chains instead of one.
    """
    groups, cur = [], []
    for k in range(63):
        if _REFRESH_SEQ[k] and cur:
            groups.append(tuple(cur))
            cur = []
        cur.append(int(_I_SEQ[k]))
    groups.append(tuple(cur))
    return tuple(groups)


_GROUPS = _make_groups()   # 14 groups, sizes 1..8; each starts a refresh


def use_pallas() -> bool:
    """Use the Pallas kernel on TPU (override: JPEGQS_PALLAS=0/1)."""
    import os
    env = os.environ.get("JPEGQS_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "tpu"


def _nt_for(flags: int) -> int:
    # Without DIAGONALS the 98 diagonal terms have zero weight; a
    # zero-weight term contributes +-0.0f to both accumulators, which
    # cannot change the fold (see ops/planar.py), so they are omitted.
    return 242 if (flags & DIAGONALS) else 144


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# In-kernel helpers (jnp on values; fp32 results integer-add-fenced)
# ---------------------------------------------------------------------------

def _mkfence(tok, fenced):
    # Integer-ADD fence, NOT xor: xor is self-inverse and LLVM cancels
    # stacked fences (fadd(0, fmul(..)) folds to fence(fence(mul))),
    # exposing the multiply to FMA contraction — see ops/fp32.py.
    # fenced=True only in interpret mode, which lowers through XLA:CPU.
    if not fenced:
        return lambda x: x

    def fence(x):
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.int32) + tok, F)
    return fence


def _idct_pass1(x):
    """libjpeg islow butterfly on int32 values (reference: idct.h:59-89)."""
    z2 = x[2]; z3 = x[6]
    z1 = (z2 + z3) * 4433
    tmp2 = z1 - z3 * 15137
    tmp3 = z1 + z2 * 6270
    z2 = x[0]; z3 = x[4]
    tmp0 = (z2 + z3) << 13
    tmp1 = (z2 - z3) << 13
    tmp10 = tmp0 + tmp3; tmp13 = tmp0 - tmp3
    tmp11 = tmp1 + tmp2; tmp12 = tmp1 - tmp2
    tmp0 = x[7]; tmp1 = x[5]; tmp2 = x[3]; tmp3 = x[1]
    z1 = tmp0 + tmp3; z2 = tmp1 + tmp2
    z3 = tmp0 + tmp2; z4 = tmp1 + tmp3
    z5 = (z3 + z4) * 9633
    tmp0 = tmp0 * 2446
    tmp1 = tmp1 * 16819
    tmp2 = tmp2 * 25172
    tmp3 = tmp3 * 12299
    z1 = z1 * 7373
    z2 = z2 * 20995
    z3 = z3 * 16069
    z4 = z4 * 3196
    z3 = z5 - z3; z4 = z5 - z4
    tmp0 = tmp0 + (z3 - z1)
    tmp1 = tmp1 + (z4 - z2)
    tmp2 = tmp2 + (z3 - z2)
    tmp3 = tmp3 + (z4 - z1)
    return [tmp10 + tmp3, tmp11 + tmp2, tmp12 + tmp1, tmp13 + tmp0,
            tmp13 - tmp0, tmp12 - tmp1, tmp11 - tmp2, tmp10 - tmp3]


def _idct_tile(coef):
    """int32[64, 8, 128] coef -> int32[8, 8, 8, 128] pixels (r, c, s, l)
    (reference: idct.h:468-539, full path)."""
    c4 = coef.reshape(8, 8, 8, 128)
    cols = _idct_pass1([c4[i] for i in range(8)])
    ws = jnp.stack([(v + (1 << 10)) >> 11 for v in cols])     # DESCALE 13-2
    rows = _idct_pass1([ws[:, i] for i in range(8)])
    pix = jnp.stack([jnp.clip((v + (257 << 17)) >> 18, 0, 255)
                     for v in rows], axis=1)
    return pix


def _diffs_tile(pix, bord, nt):
    """Diff terms in scalar fold order: int32[NT, 8, 128]
    (reference: quantsmooth.h:1521-1541).  bord int32[32, 8, 128] is
    (top, bottom, left, right) x 8 lines."""
    b = pix
    h = (b[:, :7] - b[:, 1:]).reshape(56, 8, 128)
    bt, bb = bord[0:8], bord[8:16]
    bl, br = bord[16:24], bord[24:32]
    bd = jnp.concatenate([b[0] - bt, b[7] - bb,
                          b[:, 0] - bl, b[:, 7] - br])
    v = (b[:7] - b[1:]).reshape(56, 8, 128)
    parts = [h, bd, v]
    if nt == 242:
        d1 = b[:7, :7] - b[1:, 1:]
        d2 = b[:7, 1:] - b[1:, :7]
        parts.append(jnp.stack([d1, d2], axis=2).reshape(98, 8, 128))
    return jnp.concatenate(parts)


def _roundf(x, fence):
    t = jnp.trunc(x)
    f = x - t  # exact (Sterbenz)
    return fence(fence(t + jnp.where(f >= F(0.5), F(1), F(0)))
                 - jnp.where(f <= F(-0.5), F(1), F(0)))


def _c_f32_to_i32(x):
    t = jnp.trunc(x)
    in_range = (t >= -_TWO31F) & (t < _TWO31F)
    safe = jnp.where(in_range, t, F(0))
    return jnp.where(in_range, safe.astype(I32), I32(INT32_MIN))


def _orig_coef(c, div, x1, qshr):
    a0 = ((x1 * c) >> 16) + c
    a0 = ((-a0) * qshr + 0x4000) >> 15
    return a0 * div


def _interval_clamp(add, a0, div):
    d0 = (div - 1) >> 1
    d1 = div >> 1
    dh = a0 + jnp.where(a0 < 0, d1, d0)
    dl = a0 - jnp.where(a0 > 0, d1, d0)
    return jnp.maximum(jnp.minimum(add, dh), dl)


# ---------------------------------------------------------------------------
# In-kernel JOINT_YUV / LOW_QUALITY preambles (quantsmooth.h:577-1179)
# ---------------------------------------------------------------------------
# These fuse the per-iteration color work into the solver kernel so a
# chroma pass is ONE device kernel instead of halo->joint->fdct_clamp->
# solver XLA stages (each with HBM round trips of the full tile).
# Same fp32 op sequences as ops/planar.py joint_yuv_fblocks /
# low_quality_* / fdct_clamp_p — bit-exactness is preserved op for op.

def _fdct_pass_t(x, fence, scale=None):
    """8-point float FDCT butterfly, exact fp32 order (idct.h:608-628);
    mirrors ops/dct._fdct_float_pass with the in-kernel fence."""
    def fa(a, b): return fence(a + b)
    def fs(a, b): return fence(a - b)
    def fm(a, b): return fence(a * b)
    z1 = x[0]; z2 = x[7]; t0 = fa(z1, z2); t7 = fs(z1, z2)
    z1 = x[1]; z2 = x[6]; t1 = fa(z1, z2); t6 = fs(z1, z2)
    z1 = x[2]; z2 = x[5]; t2 = fa(z1, z2); t5 = fs(z1, z2)
    z1 = x[3]; z2 = x[4]; t3 = fa(z1, z2); t4 = fs(z1, z2)
    z1 = fa(t0, t3); z4 = fs(t0, t3)
    z2 = fa(t1, t2); z3 = fs(t1, t2)
    o0 = fa(z1, z2); o4 = fs(z1, z2)
    z1 = fm(fa(z3, z4), F(0.541196100))
    o2 = fa(z1, fm(z4, F(0.765366865)))
    o6 = fs(z1, fm(z3, F(1.847759065)))
    z1 = fa(t4, t7); z2 = fa(t5, t6)
    z3 = fa(t4, t6); z4 = fa(t5, t7)
    z5 = fm(fa(z3, z4), F(1.175875602))
    t4 = fm(t4, F(0.298631336)); t5 = fm(t5, F(2.053119869))
    t6 = fm(t6, F(3.072711026)); t7 = fm(t7, F(1.501321110))
    z1 = fm(z1, F(0.899976223)); z2 = fm(z2, F(2.562915447))
    z3 = fs(fm(z3, F(1.961570560)), z5)
    z4 = fs(fm(z4, F(0.390180644)), z5)
    o7 = fs(t4, fa(z1, z3)); o5 = fs(t5, fa(z2, z4))
    o3 = fs(t6, fa(z2, z3)); o1 = fs(t7, fa(z1, z4))
    out = [o0, o1, o2, o3, o4, o5, o6, o7]
    if scale is not None:
        out = [fm(o, scale) for o in out]
    return out


def _fdct_clamp_tile(fb, out_ref, div_ref, x1_ref, qshr_ref, fence):
    """fdct_clamp on a tile (quantsmooth.h:343-562, scalar 551-561):
    FDCT of fb f32[8, 8, 8, 128], round half away, clamp each coef to
    its quant interval; writes out_ref in place."""
    cols = _fdct_pass_t([fb[i] for i in range(8)], fence)
    ws = jnp.stack(cols)
    rows = _fdct_pass_t([ws[:, i] for i in range(8)], fence,
                        scale=F(0.125))
    buf = jnp.stack(rows, axis=1).reshape(64, 8, 128)
    for i in range(64):
        add = _c_f32_to_i32(_roundf(buf[i], fence))
        c1 = out_ref[i]
        a0 = _orig_coef(c1, div_ref[i], x1_ref[i], qshr_ref[i])
        out_ref[i] = _interval_clamp(add, a0, div_ref[i])


_W3 = ((1, 2, 1), (2, 4, 2), (1, 2, 1))


def _conv3x3_t(h):
    """Weighted 3x3 window sums of a [10, 10, 8, 128] halo in f32,
    computed separably ((1,2,1) columns then rows — the (1,2,1)x(1,2,1)
    outer product IS the reference's weight matrix).  Exact despite the
    reassociation: every input, partial sum, and output is an integer
    far below 2^24 (pixels <= 255, products <= 255^2, weighted sums
    <= 16*255^2), so each f32 add is exact and the value equals the
    9-term direct sum bit for bit (quantsmooth.h:893-920)."""
    v = h[0:8] + F(2) * h[1:9] + h[2:10]
    return v[:, 0:8] + F(2) * v[:, 1:9] + v[:, 2:10]


def _conv3x3_prod_t(ha, hb):
    return _conv3x3_t(ha * hb)


def _joint_tile(ch, i2, fence, fenced):
    """JOINT_YUV 3x3 weighted regression of chroma on downsampled luma
    (quantsmooth.h:893-920); same op sequence as
    planar.joint_yuv_fblocks.  ch/i2 int32[10, 10, 8, 128] halos."""
    a = i2.astype(F)
    b = ch.astype(F)
    sumA = _conv3x3_t(a)
    sumB = _conv3x3_t(b)
    sAA = _conv3x3_prod_t(a, a) * 16 - sumA * sumA   # exact ints in f32
    sAB = _conv3x3_prod_t(a, b) * 16 - sumA * sumB
    dv = fp32.exact_divide(sAB, sAA, fence if fenced else None)
    scale = jnp.where(sAA != F(0), dv, F(0))
    scale = jnp.minimum(jnp.maximum(scale, F(-16.0)), F(16.0))
    center2 = a[1:9, 1:9]
    av = fence(fence(fence((center2 * 16 - sumA) * scale) + sumB)
               * F(1.0 / 16))
    av = fence(jnp.maximum(av, F(0)) - F(128))
    return jnp.minimum(av, F(128))


# 8-neighbor order of the LQ shrink (quantsmooth.h:1164-1171)
_LQ_NEIGHBORS = ((-1, -1, 1), (0, -1, 0), (1, -1, 1),
                 (-1, 0, 0), (1, 0, 0),
                 (-1, 1, 1), (0, 1, 0), (1, 1, 1))


def _lq_range_tile(out_ref, div_ref, fence, fenced):
    """Per-block range estimate (quantsmooth.h:929-938): strict fp32
    left fold over the AC rows, as planar.low_quality_range_p."""
    acc = jnp.zeros((8, 128), F)
    s = jnp.zeros((8, 128), I32)
    for i in range(1, 64):
        a = jnp.abs(out_ref[i])
        acc = fence(acc + (div_ref[i] * a).astype(F))
        s = s + a
    mul = fp32.exact_divide(F(4.0), s.astype(F), fence if fenced else None)
    rng_ = jnp.where(s != 0, fence(acc * mul), acc)
    rng_ = jnp.minimum(rng_, F(128))
    return _roundf(rng_, fence)


def _lq_shrink_tile(halo, rngv, fence, fenced):
    """LOW_QUALITY 3x3 weighted gradient shrink
    (quantsmooth.h:1161-1175); same op sequence as
    planar.low_quality_fblocks.  Returns centered f32[8, 8, 8, 128]."""
    c0 = np.float32(2.0)
    c1 = np.float32(c0 * np.sqrt(np.float32(0.5)))
    cw = (F(c0), F(c1))
    a = halo[1:9, 1:9]
    rmap = rngv[None, None]
    acc0 = jnp.zeros((8, 8, 8, 128), F)
    accn = jnp.zeros((8, 8, 8, 128), F)
    for dx, dy, wi in _LQ_NEIGHBORS:
        nb = halo[1 + dy:9 + dy, 1 + dx:9 + dx]
        t0 = (a - nb).astype(F)
        t = jnp.maximum(rmap - jnp.abs(t0), F(0))  # integral: exact
        t = t * t                                  # < 2^24: exact
        aw = fence(cw[wi] * t)
        acc0 = fence(acc0 + fence((t0 * t) * aw))
        accn = fence(accn + fence(aw * aw))
    corr = fp32.exact_divide(acc0, accn, fence if fenced else None)
    shifted = fence(a.astype(F) - corr)
    newa = jnp.where(accn > F(0), _c_f32_to_i32(shifted), a)
    return (newa - 128).astype(F)


# ---------------------------------------------------------------------------
# Block tiling + in-kernel halo construction from resident pixels
# ---------------------------------------------------------------------------
# The resident-pixel kernel variant (aux_mode="pix") keeps the whole
# iteration state in tiled device layout: instead of materializing the
# [10, 10, B] halo (or the 4 border lines) with XLA gathers between
# iterations, the kernel receives a (2k+1)-tile window of the pixel
# array emitted by the previous invocation (want_pix) and rebuilds the
# neighbor lines in VMEM with static sublane/lane shifts.  The flat
# block axis maps to (sublane, lane) as b = s*128 + l, so a neighbor
# offset S decomposes into a sublane slice and a lane roll.  Image-edge
# replication (quantsmooth.h:2612-2620) is applied with precomputed
# per-lane edge masks, which also makes the construction correct for
# batched inputs (n images concatenated on the block axis: cross-image
# reads only ever happen on masked lanes).

_BY0, _BYN, _BX0, _BXN = 1, 2, 4, 8


def tile_blocks(x):
    """[R, B] -> [g, R, 8, 128]: pad the block axis to g*1024 and split
    it over (grid, sublane, lane)."""
    R, B = x.shape
    bp = _round_up(B, TILE_BLOCKS)
    xp = jnp.pad(x, ((0, 0), (0, bp - B)))
    return xp.reshape(R, bp // TILE_BLOCKS, 8, 128).transpose(1, 0, 2, 3)


def untile_blocks(xt, B):
    """Inverse of tile_blocks: [g, R, 8, 128] -> [R, B]."""
    g, R = xt.shape[0], xt.shape[1]
    return xt.transpose(1, 0, 2, 3).reshape(R, g * TILE_BLOCKS)[:, :B]


@functools.lru_cache(maxsize=None)
def _edge_masks_np(hb, wb, n=1):
    """Per-block edge bitmask, tiled [g, 8, 128]: bit0 top block-row,
    bit1 bottom, bit2 left block-col, bit3 right.  For batched inputs
    (n > 1) the mask is per-image-local, so block (n_i, 0, x) is a top
    block even though flat neighbors of the previous image precede it."""
    B = hb * wb
    bp = _round_up(n * B, TILE_BLOCKS)
    j = np.arange(bp, dtype=np.int64)
    b = j % B
    by, bx = b // wb, b % wb
    m = ((by == 0) * _BY0 | (by == hb - 1) * _BYN
         | (bx == 0) * _BX0 | (bx == wb - 1) * _BXN).astype(np.int32)
    m[n * B:] = 0
    return m.reshape(bp // TILE_BLOCKS, 8, 128)


def edge_masks(hb, wb, n=1):
    return jnp.asarray(_edge_masks_np(hb, wb, n))


def _win_k(wb):
    """Window radius in tiles so every neighbor shift (<= wb+1) stays
    inside the concatenated sublane window, borrow row included."""
    k = 1
    while k * TILE_BLOCKS < wb + 1 + 128:
        k += 1
    return k


def _shift_read(pix_refs, row, S, k):
    """Pixel row `row` of blocks b-S, as an (8, 128) tile value.

    pix_refs: (2k+1) tile refs [64, 8, 128] covering flat blocks
    [(t-k)*1024, (t+k+1)*1024).  y[s, l] = x_flat[b - S] with
    b = s*128 + l decomposed as a static sublane slice plus a lane
    roll with borrow from the previous sublane row.
    """
    w = jnp.concatenate([p[row] for p in pix_refs], axis=0)
    q, r = S // 128, S % 128            # python floor semantics
    base = k * 8 - q
    if r == 0:
        return w[base:base + 8]
    a = jnp.roll(w[base:base + 8], r, axis=1)
    b = jnp.roll(w[base - 1:base + 7], r, axis=1)
    lane = jax.lax.broadcasted_iota(I32, (8, 128), 1)
    return jnp.where(lane >= r, a, b)


def _ring_from_pix(pix_refs, mask, wb, k):
    """Neighbor lines of every block from the resident pixel window —
    the in-kernel equivalent of planar.blocks_halo10's ring (same
    edge-replication and corner semantics, quantsmooth.h:2612-2620).

    Returns (top[8], bottom[8], left[8], right[8], corners(tl,tr,bl,br))
    of (8, 128) int32 tiles.
    """
    c0 = pix_refs[k]
    by0 = (mask & _BY0) != 0
    byN = (mask & _BYN) != 0
    bx0 = (mask & _BX0) != 0
    bxN = (mask & _BXN) != 0
    rd = functools.partial(_shift_read, pix_refs, k=k)
    top = [jnp.where(by0, c0[c], rd(56 + c, wb)) for c in range(8)]
    bot = [jnp.where(byN, c0[56 + c], rd(c, -wb)) for c in range(8)]
    left = [jnp.where(bx0, c0[r * 8], rd(r * 8 + 7, 1)) for r in range(8)]
    right = [jnp.where(bxN, c0[r * 8 + 7], rd(r * 8, -1))
             for r in range(8)]
    # corners follow blocks_halo10's concat order: the horizontal
    # gather reads the neighbor's already-vertically-extended column
    tl = jnp.where(bx0, jnp.where(by0, c0[0], rd(56, wb)),
                   jnp.where(by0, rd(7, 1), rd(63, wb + 1)))
    tr = jnp.where(bxN, jnp.where(by0, c0[7], rd(63, wb)),
                   jnp.where(by0, rd(0, -1), rd(56, wb - 1)))
    bl = jnp.where(bx0, jnp.where(byN, c0[56], rd(0, -wb)),
                   jnp.where(byN, rd(63, 1), rd(7, -(wb - 1))))
    br = jnp.where(bxN, jnp.where(byN, c0[63], rd(7, -wb)),
                   jnp.where(byN, rd(56, -1), rd(0, -(wb + 1))))
    return top, bot, left, right, (tl, tr, bl, br)


def _bord_from_pix(pix_refs, mask, wb, k):
    """Solver border lines [32, 8, 128] (top, bottom, left, right) —
    in-kernel planar.borders_from_blocks."""
    top, bot, left, right, _ = _ring_from_pix(pix_refs, mask, wb, k)
    return jnp.stack(top + bot + left + right)


def _halo_from_pix(pix_refs, mask, wb, k):
    """Full [10, 10, 8, 128] halo — in-kernel planar.blocks_halo10."""
    top, bot, left, right, (tl, tr, bl, br) = _ring_from_pix(
        pix_refs, mask, wb, k)
    ctr = pix_refs[k][...]
    rows = [jnp.stack([tl] + top + [tr])]
    for r in range(8):
        rows.append(jnp.stack([left[r]]
                              + [ctr[r * 8 + c] for c in range(8)]
                              + [right[r]]))
    rows.append(jnp.stack([bl] + bot + [br]))
    return jnp.stack(rows)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _solve_kernel(nt, ntp, do_rebalance, fenced, preamble, do_sweep,
                  div_ref, x1_ref, qshr_ref, tab_ref, fence_ref,
                  coef_ref, halo_src, bord_src, i2_src, out_ref, pix_ref,
                  diffs_ref, absd_ref, need_ref):
    """halo_src() -> [10, 10, 8, 128] pixel halo value (preamble
    'joint'/'lq'); bord_src() -> [32, 8, 128] border lines (preamble
    None); i2_src() -> the downsampled-luma halo ('joint' only).  The
    sources either read a materialized aux input or rebuild the lines
    in VMEM from the resident pixel window (aux_mode='pix').  pix_ref:
    optional second output — the IDCT of the final coefficients, so the
    engine's next-iteration pixels come out of the same kernel instead
    of a separate XLA idct pass over the whole plane."""
    fence = _mkfence(fence_ref[0], fenced)
    out_ref[...] = coef_ref[...]

    def emit_pix():
        if pix_ref is not None:
            pix_ref[...] = _idct_tile(out_ref[...]).reshape(64, 8, 128)

    halo = None
    if preamble == "joint":
        halo = halo_src()
        i2 = i2_src()
        fb = _joint_tile(halo, i2, fence, fenced)
        _fdct_clamp_tile(fb, out_ref, div_ref, x1_ref, qshr_ref, fence)
    elif preamble == "lq":
        halo = halo_src()
        rngv = _lq_range_tile(out_ref, div_ref, fence, fenced)
        fb = _lq_shrink_tile(halo, rngv, fence, fenced)
        _fdct_clamp_tile(fb, out_ref, div_ref, x1_ref, qshr_ref, fence)

    if not do_sweep:
        if do_rebalance:
            _rebalance_tile(out_ref, div_ref, x1_ref, qshr_ref)
        emit_pix()
        return

    if preamble is not None:
        # solver borders are rows/cols of the very halo (the neighbor
        # lines of planar.borders_from_blocks)
        bord = jnp.concatenate([halo[0, 1:9], halo[9, 1:9],
                                halo[1:9, 0], halo[1:9, 9]])
    else:
        bord = bord_src()
    need_ref[...] = jnp.ones((8, 128), I32)

    for g_is in _GROUPS:
        # refresh — every group opens one (zigzag_refresh); per-lane
        # masked: lanes whose coefs did not change keep their diffs
        pix = _idct_tile(out_ref[...])
        dd = _diffs_tile(pix, bord, nt).astype(F)
        if ntp != nt:
            dd = jnp.concatenate([dd, jnp.zeros((ntp - nt, 8, 128), F)])
        sel = (need_ref[...] != 0)[None]
        diffs_ref[...] = jnp.where(sel, dd, diffs_ref[...])
        absd_ref[...] = jnp.where(sel, jnp.abs(dd), absd_ref[...])
        need_ref[...] = jnp.zeros((8, 128), I32)

        m = len(g_is)
        rngs = [(div_ref[i] * 2).astype(F) for i in g_is]

        def chunk(c, carry, g_is=g_is, rngs=rngs):
            d = diffs_ref[pl.ds(c * 8, 8)]                  # [8, 8, 128]
            ad = absd_ref[pl.ds(c * 8, 8)]
            out = []
            for x, i in enumerate(g_is):
                a2, a3 = carry[2 * x], carry[2 * x + 1]
                t = jnp.maximum(rngs[x] - ad, F(0))         # integral: exact
                t = t * t                                   # < 2^24: exact
                u = fence(d * t)
                base = i * ntp + c * 8
                for j in range(8):
                    tb = tab_ref[base + j]                  # SMEM scalar
                    w = fence(tb * t[j])
                    a2 = fence(a2 + fence(u[j] * w))
                    a3 = fence(a3 + fence(w * w))
                out += [a2, a3]
            return tuple(out)

        zero = jnp.zeros((8, 128), F)
        accs = jax.lax.fori_loop(0, ntp // 8, chunk, (zero,) * (2 * m))

        need = need_ref[...]
        for x, i in enumerate(g_is):
            a2, a3 = accs[2 * x], accs[2 * x + 1]
            # TPU's divider is ~2 ulp; the reference divss is IEEE-exact
            q = fp32.exact_divide(a2, a3, fence if fenced else None)
            delta = _c_f32_to_i32(_roundf(fence(q), fence))
            coef1 = out_ref[i]
            div_i = div_ref[i]
            a0 = _orig_coef(coef1, div_i, x1_ref[i], qshr_ref[i])
            add = _interval_clamp(coef1 - delta, a0, div_i)
            newc = jnp.where(delta != 0, add, coef1)
            need = need | (newc != coef1).astype(I32)
            out_ref[i] = newc
        need_ref[...] = need

    if do_rebalance:
        _rebalance_tile(out_ref, div_ref, x1_ref, qshr_ref)
    emit_pix()


def _rebalance_tile(out_ref, div_ref, x1_ref, qshr_ref):
    # AC energy restore (quantsmooth.h:1823-1848); int64 emulated
    # as radix-2^16 pairs exactly as in ops/rebalance.py.  The 63 AC
    # rows are statically unrolled: the accumulations are order-free
    # integer adds, and static row indices let the VPU pipeline them
    # (a fori_loop with dynamic row slices serializes ~8x slower).
    def norm(hi, lo):
        cc = lo >> 16
        return hi + cc, lo - (cc << 16)

    def pair_ge(ah, al, bh, bl):
        return (ah > bh) | ((ah == bh) & (al >= bl))

    cs = [out_ref[r] for r in range(1, 64)]
    a0s = [_orig_coef(cs[r - 1], div_ref[r], x1_ref[r], qshr_ref[r])
           for r in range(1, 64)]
    z = jnp.zeros((8, 128), I32)
    m0h = m0l = m1h = m1l = z
    for c1, a0 in zip(cs, a0s):
        t0 = c1 * a0
        t1 = a0 * a0
        m0h = m0h + (t0 >> 16)
        m0l = m0l + (t0 & 0xFFFF)
        m1h = m1h + (t1 >> 16)
        m1l = m1l + (t1 & 0xFFFF)
    m0h, m0l = norm(m0h, m0l)
    m1h, m1l = norm(m1h, m1l)
    do = ~pair_ge(m0h, m0l, m1h, m1l)
    zm = (m0h == 0) & (m0l == 0)
    m0l = jnp.where(zm, I32(1), m0l)
    t2h, t2l = norm(m0h << 1, m0l << 1)
    qq2 = pair_ge(m1h, m1l, t2h, t2l)
    qh = jnp.where(qq2, t2h, m0h)
    ql = jnp.where(qq2, t2l, m0l)
    rrh, rrl = norm(m1h - qh, m1l - ql)
    q2 = z
    remh, reml = rrh, rrl
    for _ in range(13):
        remh, reml = norm(remh << 1, reml << 1)
        ge = pair_ge(remh, reml, m0h, m0l)
        sh, sl = norm(remh - m0h, reml - m0l)
        remh = jnp.where(ge, sh, remh)
        reml = jnp.where(ge, sl, reml)
        q2 = (q2 << 1) + ge.astype(I32)
    hh, hl = m0h >> 1, ((m0h & 1) << 15) | (m0l >> 1)
    fh, fl = norm(remh + hh, reml + hl)
    adj = pair_ge(fh, fl, m0h, m0l).astype(I32)
    mul = (jnp.where(qq2, I32(2), I32(1)) << 13) + q2 + adj

    for r in range(1, 64):
        c1 = cs[r - 1]
        add = (c1 * mul + 0x1000) >> 13
        add = _interval_clamp(add, a0s[r - 1], div_ref[r])
        out_ref[r] = jnp.where(do, add, c1)


@functools.partial(jax.jit, static_argnames=("flags", "do_rebalance",
                                             "interpret", "fenced",
                                             "preamble", "do_sweep",
                                             "want_pix", "aux_mode",
                                             "wb", "tile_range"))
def _solve_tiled(coef_t, aux1_t, aux2_t, masks_t, div, x1, qshr, fence,
                 *, flags, do_rebalance, interpret, fenced, preamble=None,
                 do_sweep=True, want_pix=False, aux_mode="halo", wb=0,
                 tile_range=None):
    """aux_mode='halo': aux1_t is the materialized borders/halo tile
    array.  aux_mode='pix': aux1_t is the resident pixel tile array
    [g, 64, 8, 128] (the previous invocation's want_pix output); the
    kernel reads a (2k+1)-tile window of it plus the edge masks and
    rebuilds the neighbor lines in VMEM (wb = blocks per row, static).
    aux2_t: the downsampled-luma halo tiles ('joint' only).

    ``tile_range``: optional (t0, t1) — grid over tiles [t0, t1) of the
    full input arrays only, emitting a [t1-t0, ...] output slice.  Lets
    a sharded driver split one pass into boundary-tile and interior-
    tile invocations so the halo ppermute can overlap the interior
    compute (SURVEY §5); window reads still index the FULL arrays, so
    blocks near the range split see the same neighbors as in a whole-
    array pass."""
    g = coef_t.shape[0]
    t0, gout = 0, g
    if tile_range is not None:
        t0, t1 = tile_range
        assert 0 <= t0 < t1 <= g
        gout = t1 - t0
    if do_sweep:
        nt = _nt_for(flags)
        ntp = _round_up(nt, 8)
        tabf = np.zeros((64, ntp), dtype=np.float32)
        tabf[:, :nt] = make_solver_tables(flags)[:, :nt]
    else:
        nt = ntp = 8                       # scratch/tab untouched
        tabf = np.zeros((64, 8), dtype=np.float32)
    kernel = functools.partial(_solve_kernel, nt, ntp, do_rebalance,
                               fenced, preamble, do_sweep)
    tile = lambda i, *_: (i + t0, 0, 0, 0)
    in_specs = [pl.BlockSpec((1, 64, 8, 128), tile)]
    if aux_mode == "none":
        # no neighbor input at all (pix-bootstrap / rebalance-only
        # invocations: do_sweep=False, preamble=None)
        k = nw = 0
        n_in = 1
    elif aux_mode == "pix":
        k = _win_k(wb)
        nw = 2 * k + 1
        for d in range(-k, k + 1):
            in_specs.append(pl.BlockSpec(
                (1, 64, 8, 128),
                lambda i, *_, d=d: (jnp.clip(i + t0 + d, 0, g - 1),
                                    0, 0, 0)))
        in_specs.append(pl.BlockSpec((1, 8, 128),
                                     lambda i, *_: (i + t0, 0, 0)))
        n_in = 2 + nw
    else:
        k = nw = 0
        if preamble is None:
            in_specs.append(pl.BlockSpec((1, 32, 8, 128), tile))
        else:
            in_specs.append(pl.BlockSpec((1, 100, 8, 128), tile))
        n_in = 2
    if preamble == "joint":
        in_specs.append(pl.BlockSpec((1, 100, 8, 128), tile))
        n_in += 1
    out_spec = pl.BlockSpec((1, 64, 8, 128), lambda i, *_: (i, 0, 0, 0))
    out_specs = (out_spec, out_spec) if want_pix else out_spec
    out_sds = jax.ShapeDtypeStruct((gout,) + coef_t.shape[1:], jnp.int32)
    out_shape = (out_sds, out_sds) if want_pix else out_sds
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(gout,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((ntp, 8, 128), F),
            pltpu.VMEM((ntp, 8, 128), F),
            pltpu.VMEM((8, 128), I32),
        ],
    )
    n_out = 2 if want_pix else 1

    def kern(div_s, x1_s, qshr_s, tab_s, fence_s, *refs):
        ins = refs[:n_in]
        out_ref = refs[n_in]
        pix_ref = refs[n_in + 1] if want_pix else None
        diffs_ref, absd_ref, need_ref = refs[n_in + n_out:]
        if aux_mode == "none":
            i2_ref = None
            halo_src = bord_src = None
        elif aux_mode == "pix":
            pix_refs = [r.at[0] for r in ins[1:1 + nw]]
            mask_ref = ins[1 + nw]
            i2_ref = ins[2 + nw] if preamble == "joint" else None

            def halo_src():
                return _halo_from_pix(pix_refs, mask_ref[0], wb, k)

            def bord_src():
                return _bord_from_pix(pix_refs, mask_ref[0], wb, k)
        else:
            aux1_ref, i2_ref = ins[1], ins[2] if n_in == 3 else None

            def halo_src():
                return aux1_ref[0].reshape(10, 10, 8, 128)

            def bord_src():
                return aux1_ref[0]

        def i2_src():
            return i2_ref[0].reshape(10, 10, 8, 128)

        kernel(div_s, x1_s, qshr_s, tab_s, fence_s,
               ins[0].at[0], halo_src, bord_src, i2_src,
               out_ref.at[0], pix_ref.at[0] if want_pix else None,
               diffs_ref, absd_ref, need_ref)

    if aux_mode == "none":
        args = [coef_t]
    elif aux_mode == "pix":
        args = [coef_t] + [aux1_t] * nw + [masks_t]
    else:
        args = [coef_t, aux1_t]
    if preamble == "joint":
        args.append(aux2_t)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(div, x1, qshr,
      jnp.asarray(tabf.reshape(-1)), fence.reshape(1), *args)


def _untile(out_t, bp, B):
    return out_t.transpose(1, 0, 2, 3).reshape(64, bp)[:, :B]


def solve_rebalance(coef, borders, div, x1, qshr, flags, do_rebalance,
                    fence=None, interpret=False, fenced=None,
                    want_pix=False):
    """Drop-in replacement for planar solve_blocks_p (+rebalance).

    coef int32[64, B]; borders (top, bottom, left, right) int32[8, B];
    returns int32[64, B].

    ``fenced``: fence every fp32 op.  Defaults to off on compiled
    TPU (Mosaic emits plain IEEE mul/add — verified bit-exact against
    the reference) and on in interpreter mode (which lowers through
    XLA:CPU, where FMA contraction is real).

    On non-TPU backends the kernel automatically runs in interpreter
    mode, so JPEGQS_PALLAS=1 exercises the kernel path end-to-end in
    CPU tests and multi-chip dryruns.
    """
    if jax.default_backend() != "tpu":
        interpret = True
    if fenced is None:
        fenced = interpret or jax.default_backend() != "tpu"
    B = coef.shape[1]
    bp = _round_up(B, TILE_BLOCKS)
    g = bp // TILE_BLOCKS
    pad = bp - B
    coef_p = jnp.pad(coef, ((0, 0), (0, pad)))
    bord = jnp.concatenate(borders)                      # [32, B]
    bord_p = jnp.pad(bord, ((0, 0), (0, pad)))
    coef_t = coef_p.reshape(64, g, 8, 128).transpose(1, 0, 2, 3)
    bord_t = bord_p.reshape(32, g, 8, 128).transpose(1, 0, 2, 3)
    if fence is None:
        fence = jnp.zeros((), I32)
    out_t = _solve_tiled(coef_t, bord_t, None, None, div, x1, qshr, fence,
                         flags=flags, do_rebalance=do_rebalance,
                         interpret=interpret, fenced=fenced,
                         want_pix=want_pix)
    if want_pix:
        return (_untile(out_t[0], bp, B),
                _untile(out_t[1], bp, B).reshape(8, 8, B))
    return _untile(out_t, bp, B)


def solve_fused(coef, halo, image2, div, x1, qshr, flags, do_rebalance,
                fence=None, interpret=False, fenced=None,
                want_pix=False):
    """JOINT_YUV / LOW_QUALITY block pass fused into the solver kernel.

    One kernel covers what the reference does per block in one
    ``quantsmooth_block`` call (quantsmooth.h:564-1848): the JOINT_YUV
    regression + fdct_clamp (577-922) when ``image2`` is given, or the
    LOW_QUALITY range/shrink + fdct_clamp (924-1179) when
    ``flags & LOW_QUALITY``; then the k=63..1 sweep (unless
    LOW_QUALITY) and the AC rebalance.

    coef int32[64, B]; halo int32[10, 10, B] pixel neighborhoods
    (planar.blocks_halo10 of the current pixels — the solver borders
    are its edge lines, so no separate borders input); image2
    int32[10, 10, B] downsampled-luma halos or None.
    """
    if jax.default_backend() != "tpu":
        interpret = True
    if fenced is None:
        fenced = interpret or jax.default_backend() != "tpu"
    preamble = "joint" if image2 is not None else "lq"
    do_sweep = not (flags & LOW_QUALITY)
    B = coef.shape[1]
    bp = _round_up(B, TILE_BLOCKS)
    g = bp // TILE_BLOCKS
    pad = bp - B
    coef_t = jnp.pad(coef, ((0, 0), (0, pad))).reshape(
        64, g, 8, 128).transpose(1, 0, 2, 3)

    def tile_halo(h):
        return jnp.pad(h.reshape(100, B), ((0, 0), (0, pad))).reshape(
            100, g, 8, 128).transpose(1, 0, 2, 3)

    aux1_t = tile_halo(halo)
    aux2_t = tile_halo(image2) if image2 is not None else None
    if fence is None:
        fence = jnp.zeros((), I32)
    out_t = _solve_tiled(coef_t, aux1_t, aux2_t, None, div, x1, qshr,
                         fence, flags=flags, do_rebalance=do_rebalance,
                         interpret=interpret, fenced=fenced,
                         preamble=preamble, do_sweep=do_sweep,
                         want_pix=want_pix)
    if want_pix:
        return (_untile(out_t[0], bp, B),
                _untile(out_t[1], bp, B).reshape(8, 8, B))
    return _untile(out_t, bp, B)


def _prep_pix(interpret, fenced, fence):
    if jax.default_backend() != "tpu":
        interpret = True
    if fenced is None:
        fenced = interpret or jax.default_backend() != "tpu"
    if fence is None:
        fence = jnp.zeros((), I32)
    return interpret, fenced, fence


def idct_pix_tiles(coef_t, div, x1, qshr, fence=None, interpret=False,
                   fenced=None):
    """Pixel bootstrap: the IDCT of tiled coefficients, emitted by the
    kernel itself ([g, 64, 8, 128] -> [g, 64, 8, 128] pixels).

    Replaces the XLA idct pass (+ its tile-layout transpose) that
    otherwise seeds the resident iteration loop's pixel state — the
    do_sweep=False kernel path with no neighbor input at all
    (reference: the iteration-0 plane build, quantsmooth.h:2586-2609;
    the coefficients pass through unchanged)."""
    interpret, fenced, fence = _prep_pix(interpret, fenced, fence)
    _, pix_t = _solve_tiled(coef_t, None, None, None, div, x1, qshr,
                            fence, flags=0, do_rebalance=False,
                            interpret=interpret, fenced=fenced,
                            do_sweep=False, want_pix=True,
                            aux_mode="none")
    return pix_t


def solve_rebalance_pix(coef_t, pix_t, masks_t, div, x1, qshr, flags,
                        do_rebalance, wb, fence=None, interpret=False,
                        fenced=None, want_pix=True, tile_range=None):
    """Resident-tile solver pass: coef_t/pix_t int32[g, 64, 8, 128]
    (tile_blocks layout), masks_t from edge_masks.  The kernel rebuilds
    the solver borders from the pixel window in VMEM — no XLA gather or
    layout change runs between iterations.  Returns (coef_t, pix_t)
    (or just coef_t when want_pix=False on the last iteration).
    ``tile_range``: run only tiles [t0, t1) — see _solve_tiled."""
    interpret, fenced, fence = _prep_pix(interpret, fenced, fence)
    return _solve_tiled(coef_t, pix_t, None, masks_t, div, x1, qshr,
                        fence, flags=flags, do_rebalance=do_rebalance,
                        interpret=interpret, fenced=fenced,
                        want_pix=want_pix, aux_mode="pix", wb=wb,
                        tile_range=tile_range)


def solve_fused_pix(coef_t, pix_t, masks_t, image2_t, div, x1, qshr,
                    flags, do_rebalance, wb, fence=None, interpret=False,
                    fenced=None, want_pix=True, tile_range=None):
    """Resident-tile JOINT_YUV / LOW_QUALITY pass: like solve_fused but
    the chroma halo is rebuilt in-kernel from the resident pixel tiles;
    image2_t is the tiled downsampled-luma halo [g, 100, 8, 128]
    (constant across iterations, tiled once per component).
    ``tile_range``: run only tiles [t0, t1) — see _solve_tiled."""
    interpret, fenced, fence = _prep_pix(interpret, fenced, fence)
    preamble = "joint" if image2_t is not None else "lq"
    do_sweep = not (flags & LOW_QUALITY)
    return _solve_tiled(coef_t, pix_t, image2_t, masks_t, div, x1, qshr,
                        fence, flags=flags, do_rebalance=do_rebalance,
                        interpret=interpret, fenced=fenced,
                        preamble=preamble, do_sweep=do_sweep,
                        want_pix=want_pix, aux_mode="pix", wb=wb,
                        tile_range=tile_range)
