"""Planar-layout compute path — the TPU-fast formulation.

TPU vregs are (8 sublanes, 128 lanes) over the two minor dims.  The
naive [B, 8, 8] block layout pads 8 -> 128 lanes (94% waste); the
planar layout puts the block axis minormost:

- pixel/coef blocks:   [8, 8, B]   (row, col, block)
- flat coefficients:   [64, B]     (natural position, block)
- solver diff terms:   [242, B]    (term in scalar fold order, block)

All math is identical (lanes are independent scalar programs), so
results stay bit-exact with ops/dct.py etc.; only the memory layout
changes.  The solver borders are gathered from neighboring blocks
directly (block (y,x) reads block (y-1,x)'s bottom row, etc., with
image-edge replication), so the fast path never materializes the
padded plane of the reference (quantsmooth.h:2544-2567) — that plane
only exists for the 3x3 cross-block paths (LOW_QUALITY, JOINT_YUV,
UPSAMPLE_UV, downsample).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..specref import NATURAL_ORDER, ZIGZAG_REFRESH, N_TERMS
from . import fp32
from .dct import _idct_islow_pass1, _descale, _range_clamp, _fdct_float_pass
from .quant import roundf, c_f32_to_i32, get_orig_coef, interval_clamp
from .rebalance import (_pair_ge, _pair_sub, _pair_add,
                        _pair_shl1, _pair_shr1)

F = jnp.float32
I32 = jnp.int32


# ---------------------------------------------------------------------------
# DCT kernels on [8, 8, B]
# ---------------------------------------------------------------------------

def idct_islow_p(coef):
    """Integer IDCT on planar blocks: int32[8, 8, B] -> int32[8, 8, B]
    in [0, 255].  Same math as dct.idct_islow (idct.h:468-539)."""
    c = coef.astype(I32)
    cols = _idct_islow_pass1([c[i] for i in range(8)])        # over rows
    ws = jnp.stack([_descale(v, 13 - 2) for v in cols])        # [8(r),8(c),B]
    rows = _idct_islow_pass1([ws[:, i] for i in range(8)])     # over cols
    return jnp.stack([_range_clamp(v, 13 + 2 + 3) for v in rows], axis=1)


def fdct_float_p(blocks):
    """Float FDCT on planar blocks: f32[8, 8, B] -> f32[8, 8, B]."""
    b = blocks.astype(F)
    cols = _fdct_float_pass([b[i] for i in range(8)])
    ws = jnp.stack(cols)
    rows = _fdct_float_pass([ws[:, i] for i in range(8)], scale=F(0.125))
    return jnp.stack(rows, axis=1)


def fdct_clamp_p(fblocks, coef, div, x1, qshr):
    """fdct_clamp on planar data: fblocks f32[8,8,B], coef int32[64,B]
    (reference: quantsmooth.h:343-562, scalar 551-561)."""
    buf = fdct_float_p(fblocks).reshape(64, -1)
    a0 = get_orig_coef(coef, div[:, None], x1[:, None], qshr[:, None])
    add = c_f32_to_i32(roundf(buf))
    return interval_clamp(add, a0, div[:, None])


# ---------------------------------------------------------------------------
# Border gather (replaces the padded plane for the solver)
# ---------------------------------------------------------------------------

def borders_from_blocks(pix, hb, wb):
    """Solver halo from neighbor blocks: pix int32[8, 8, hb*wb] ->
    (top, bottom, left, right) each int32[8, B].

    Models the padded plane reads (quantsmooth.h:1396-1401) with edge
    replication (2612-2620): at the image edge the adjacent line is the
    block's own edge line.
    """
    p = pix.reshape(8, 8, hb, wb)
    top = jnp.concatenate([p[0, :, :1, :], p[7, :, :-1, :]], axis=1)
    bottom = jnp.concatenate([p[0, :, 1:, :], p[7, :, -1:, :]], axis=1)
    left = jnp.concatenate([p[:, 0, :, :1], p[:, 7, :, :-1]], axis=2)
    right = jnp.concatenate([p[:, 0, :, 1:], p[:, 7, :, -1:]], axis=2)
    B = hb * wb
    return (top.reshape(8, B), bottom.reshape(8, B),
            left.reshape(8, B), right.reshape(8, B))


def block_diffs_p(pix, borders):
    """Diff terms in the exact scalar fold order -> f32[242, B]
    (reference: quantsmooth.h:1416-1488, scalar 1521-1541)."""
    b = pix.astype(I32)
    B = b.shape[-1]
    bt, bb, bl, br = borders
    h = (b[:, :7, :] - b[:, 1:, :]).reshape(56, B)
    bd = jnp.concatenate([b[0] - bt, b[7] - bb, b[:, 0] - bl, b[:, 7] - br])
    v = (b[:7] - b[1:]).reshape(56, B)
    d1 = b[:7, :7] - b[1:, 1:]
    d2 = b[:7, 1:] - b[1:, :7]
    diag = jnp.stack([d1, d2], axis=2).reshape(98, B)
    return jnp.concatenate([h, bd, v, diag]).astype(F)


# ---------------------------------------------------------------------------
# The solver sweep on planar data
# ---------------------------------------------------------------------------

_I_SEQ = NATURAL_ORDER[63:0:-1].astype(np.int32)
_REFRESH_SEQ = ZIGZAG_REFRESH[_I_SEQ].astype(bool)


def solve_blocks_p(coef, borders, div, x1, qshr, tables, hb, wb):
    """k=63..1 sweep, planar: coef int32[64, B] -> int32[64, B]
    (reference: quantsmooth.h:1403-1565)."""
    B = coef.shape[-1]
    tab = jnp.asarray(np.asarray(tables, dtype=np.float32))

    def refresh(coef, buf, diffs, need):
        nb = idct_islow_p(coef.reshape(8, 8, B))
        nd = block_diffs_p(nb, borders)
        buf = jnp.where(need[None, None, :], nb, buf)
        diffs = jnp.where(need[None, :], nd, diffs)
        return buf, diffs, jnp.zeros_like(need)

    def step(carry, xs):
        coef, buf, diffs, need = carry
        i, do_refresh = xs
        buf, diffs, need = jax.lax.cond(
            do_refresh, refresh,
            lambda c, bu, d, n: (bu, d, n),
            coef, buf, diffs, need)
        # rng and diffs are integral-valued; sub and t*t (<= 4094^2 <
        # 2^24) are exact, so plain ops are safe there.  The products
        # and the fold go through the fenced fp32 primitives.
        rng = (div[i] * 2).astype(F)
        t = jnp.maximum(rng - jnp.abs(diffs), F(0))
        t = t * t
        u = fp32.fmul(diffs, t)
        w = fp32.fmul(tab[i][:, None], t)

        def fold(carry, x):
            a2, a3 = carry
            return (fp32.fadd(a2, x[0]), fp32.fadd(a3, x[1])), None

        zero = jnp.zeros((B,), dtype=F)
        (a2, a3), _ = jax.lax.scan(
            fold, (zero, zero), (fp32.fmul(u, w), fp32.fmul(w, w)))
        delta = c_f32_to_i32(roundf(fp32.fdiv(a2, a3)))
        coef1 = coef[i]
        a0 = get_orig_coef(coef1, div[i], x1[i], qshr[i])
        add = interval_clamp(coef1 - delta, a0, div[i])
        newc = jnp.where(delta != 0, add, coef1)
        need = need | (newc != coef1)
        coef = coef.at[i].set(newc)
        return (coef, buf, diffs, need), None

    init = (coef,
            jnp.zeros((8, 8, B), dtype=I32),
            jnp.zeros((N_TERMS, B), dtype=F),
            jnp.ones((B,), dtype=jnp.bool_))
    xs = (jnp.asarray(_I_SEQ), jnp.asarray(_REFRESH_SEQ))
    (coef, _, _, _), _ = jax.lax.scan(step, init, xs)
    return coef


# ---------------------------------------------------------------------------
# Rebalance on planar data
# ---------------------------------------------------------------------------

def _split_sum_rows(terms):
    """Exact int64-equivalent sum over axis 0 as a radix-2^16 pair."""
    hi = jnp.sum(terms >> 16, axis=0, dtype=I32)
    lo = jnp.sum(terms & 0xFFFF, axis=0, dtype=I32)
    c = lo >> 16
    return hi + c, lo - (c << 16)


def rebalance_blocks_p(coef, div, x1, qshr):
    """AC energy restore, planar: coef int32[64, B]
    (reference: quantsmooth.h:1823-1848; int64 emulated as in
    ops/rebalance.py)."""
    c_ac = coef[1:]                                         # [63, B]
    d_ac = div[1:, None]
    a0 = get_orig_coef(c_ac, d_ac, x1[1:, None], qshr[1:, None])
    m0h, m0l = _split_sum_rows(c_ac * a0)
    m1h, m1l = _split_sum_rows(a0 * a0)

    do = ~_pair_ge(m0h, m0l, m1h, m1l)
    zero_m0 = (m0h == 0) & (m0l == 0)
    m0l = jnp.where(zero_m0, I32(1), m0l)

    t2h, t2l = _pair_shl1(m0h, m0l)
    qq2 = _pair_ge(m1h, m1l, t2h, t2l)
    qh = jnp.where(qq2, t2h, m0h)
    ql = jnp.where(qq2, t2l, m0l)
    rrh, rrl = _pair_sub(m1h, m1l, qh, ql)

    q2 = jnp.zeros_like(m0h)
    remh, reml = rrh, rrl
    for _ in range(13):
        remh, reml = _pair_shl1(remh, reml)
        ge = _pair_ge(remh, reml, m0h, m0l)
        sh, sl = _pair_sub(remh, reml, m0h, m0l)
        remh = jnp.where(ge, sh, remh)
        reml = jnp.where(ge, sl, reml)
        q2 = (q2 << 1) + ge.astype(I32)
    hh, hl = _pair_shr1(m0h, m0l)
    fh, fl = _pair_add(remh, reml, hh, hl)
    adj = _pair_ge(fh, fl, m0h, m0l).astype(I32)
    mul = (jnp.where(qq2, I32(2), I32(1)) << 13) + q2 + adj

    add = (c_ac * mul[None, :] + 0x1000) >> 13
    add = interval_clamp(add, a0, d_ac)
    out_ac = jnp.where(do[None, :], add, c_ac)
    return jnp.concatenate([coef[:1], out_ac])


# ---------------------------------------------------------------------------
# 10x10 block halos: the 3x3 cross-block paths without plane transposes
# ---------------------------------------------------------------------------

def blocks_halo10(pix, hb, wb):
    """int32[8, 8, B] blocks -> int32[10, 10, B]: each block with its
    1-pixel neighborhood (image-edge replicated), gathered from
    neighboring blocks — the reference's padded-plane reads
    (quantsmooth.h:2612-2620) without ever materializing the plane.

    Corners come for free: the vertical halo is attached first, so the
    horizontal gather of a neighbor's column 7 includes that neighbor's
    own vertical halo rows (= the diagonal blocks' corner pixels).
    """
    p4 = pix.reshape(8, 8, hb, wb)
    up = jnp.concatenate([p4[0:1, :, :1, :], p4[7:8, :, :-1, :]], axis=2)
    dn = jnp.concatenate([p4[0:1, :, 1:, :], p4[7:8, :, -1:, :]], axis=2)
    mid = jnp.concatenate([up, p4, dn], axis=0)            # [10, 8, hb, wb]
    left = jnp.concatenate([mid[:, 0:1, :, :1], mid[:, 7:8, :, :-1]],
                           axis=3)
    right = jnp.concatenate([mid[:, 0:1, :, 1:], mid[:, 7:8, :, -1:]],
                            axis=3)
    return jnp.concatenate([left, mid, right], axis=1).reshape(
        10, 10, hb * wb)


_W3 = ((1, 2, 1), (2, 4, 2), (1, 2, 1))


def conv3x3_b(halo, weights=_W3):
    """Weighted 3x3 sums over a [10, 10, B] halo -> int32[8, 8, B]
    (exact integer math, order-free)."""
    out = jnp.zeros((8, 8) + halo.shape[2:], dtype=I32)
    for dy in range(3):
        for dx in range(3):
            out = out + weights[dy][dx] * halo[dy:dy + 8, dx:dx + 8]
    return out


def conv3x3_prod_b(ha, hb_, weights=_W3):
    out = jnp.zeros((8, 8) + ha.shape[2:], dtype=I32)
    for dy in range(3):
        for dx in range(3):
            out = out + weights[dy][dx] * (ha[dy:dy + 8, dx:dx + 8]
                                           * hb_[dy:dy + 8, dx:dx + 8])
    return out


def _conv3x3_f(halo, weights=_W3):
    """Weighted 3x3 sums in f32 — exact: inputs are pixels (<= 255), so
    every product/sum stays far below 2^24."""
    out = jnp.zeros((8, 8) + halo.shape[2:], dtype=F)
    for dy in range(3):
        for dx in range(3):
            out = out + F(weights[dy][dx]) * halo[dy:dy + 8, dx:dx + 8]
    return out


def _conv3x3_prod_f(ha, hb_, weights=_W3):
    out = jnp.zeros((8, 8) + ha.shape[2:], dtype=F)
    for dy in range(3):
        for dx in range(3):
            out = out + F(weights[dy][dx]) * (ha[dy:dy + 8, dx:dx + 8]
                                              * hb_[dy:dy + 8, dx:dx + 8])
    return out


def joint_yuv_fblocks(chroma_halo, luma2_halo):
    """JOINT_YUV predicted chroma, planar: f32[8, 8, B] ready for
    fdct_clamp_p (reference: quantsmooth.h:893-920; same fp32 op
    sequence as ops/joint.joint_yuv_fplane).

    The regression statistics are integers bounded by 16*255^2*16 <
    2^24, so they are computed EXACTLY in f32 (TPU's VPU emulates
    int32 multiplies; f32 multiplies are native and ~10x faster).
    """
    from . import fp32

    a = luma2_halo.astype(F)
    b = chroma_halo.astype(F)
    sumA = _conv3x3_f(a)
    sumB = _conv3x3_f(b)
    sAA = _conv3x3_prod_f(a, a) * 16 - sumA * sumA     # exact ints in f32
    sAB = _conv3x3_prod_f(a, b) * 16 - sumA * sumB
    scale = jnp.where(sAA != 0, fp32.fdiv(sAB, sAA), F(0))
    scale = jnp.minimum(jnp.maximum(scale, F(-16.0)), F(16.0))
    center2 = a[1:9, 1:9]
    av = fp32.fmul(fp32.fadd(fp32.fmul(center2 * 16 - sumA, scale),
                             sumB), F(1.0 / 16))
    av = fp32.fsub(jnp.maximum(av, F(0)), F(128))
    return jnp.minimum(av, F(128))


# 8-neighbor order of the LQ shrink (quantsmooth.h:1164-1171)
_LQ_NEIGHBORS = ((-1, -1, 1), (0, -1, 0), (1, -1, 1),
                 (-1, 0, 0), (1, 0, 0),
                 (-1, 1, 1), (0, 1, 0), (1, 1, 1))


def low_quality_fblocks(halo, rng_blocks):
    """LOW_QUALITY 3x3 weighted gradient shrink, planar
    (reference: quantsmooth.h:1161-1175; fp32 accumulation follows the
    exact 8-neighbor scalar order).

    halo int32[10, 10, B]; rng_blocks f32[B] (per-block range).
    Returns centered f32[8, 8, B] for fdct_clamp_p.
    """
    from . import fp32

    p = halo.astype(I32)
    c0 = np.float32(2.0)
    c1 = np.float32(c0 * np.sqrt(np.float32(0.5)))
    cw = (F(c0), F(c1))
    a = p[1:9, 1:9]
    rmap = rng_blocks[None, None, :]
    acc0 = jnp.zeros(a.shape, dtype=F)
    accn = jnp.zeros(a.shape, dtype=F)
    for dx, dy, wi in _LQ_NEIGHBORS:
        nb = p[1 + dy:9 + dy, 1 + dx:9 + dx]
        t0 = (a - nb).astype(F)
        t = jnp.maximum(rmap - jnp.abs(t0), F(0))  # integral: exact
        t = t * t                                  # < 2^24: exact
        aw = fp32.fmul(cw[wi], t)
        acc0 = fp32.fadd(acc0, fp32.fmul(t0 * t, aw))
        accn = fp32.fadd(accn, fp32.fmul(aw, aw))
    corr = fp32.fdiv(acc0, accn)
    shifted = fp32.fsub(a.astype(F), corr)
    newa = jnp.where(accn > F(0), c_f32_to_i32(shifted), a)
    return (newa - 128).astype(F)


def downsample_blocks(pix_l, hb_l, wb_l, hb_c, wb_c, ws, hs):
    """Box-downsample luma blocks directly to chroma-sized blocks
    (reference: quantsmooth.h:2753-2813, fast even-box path) — no
    full-resolution plane is ever materialized.

    pix_l int32[8, 8, hb_l*wb_l] -> int32[8, 8, hb_c*wb_c].
    Supports ws, hs in {1, 2} (the reference's replicate tail
    out[h1+1:] = out[h1] etc. is equivalent to edge-extending the
    computed [h1, w1] region, reproduced here at block granularity).
    """
    assert ws in (1, 2) and hs in (1, 2)
    if ws == 1 and hs == 1:
        return pix_l
    p4 = pix_l.reshape(8, 8, hb_l, wb_l)
    rh, rw = 8 // hs, 8 // ws
    # per-luma-block box sums -> [rh, rw, hb_l, wb_l]
    if hs == 2 and ws == 2:
        a = (p4[0::2, 0::2] + p4[0::2, 1::2]
             + p4[1::2, 0::2] + p4[1::2, 1::2])
        d = (a + 2) >> 2
    elif hs == 2:
        d = ((p4[0::2] + p4[1::2]) + 1) >> 1
    else:
        d = ((p4[:, 0::2] + p4[:, 1::2]) + 1) >> 1
    # pad odd block-grid edges by replicating the last computed ds line
    if hs == 2 and hb_l % 2:
        d = jnp.concatenate(
            [d, jnp.repeat(d[rh - 1:rh, :, -1:, :], rh, axis=0)], axis=2)
    if ws == 2 and wb_l % 2:
        d = jnp.concatenate(
            [d, jnp.repeat(d[:, rw - 1:rw, :, -1:], rw, axis=1)], axis=3)
    # assemble chroma blocks from (hs x ws) luma-block quadrants
    t = d.reshape(rh, rw, hb_c, hs, wb_c, ws)
    return t.transpose(3, 0, 5, 1, 2, 4).reshape(8, 8, hb_c * wb_c)


def _lowres_to_hires_blocks(x, hb_l, wb_l, hb_c, wb_c, ws, hs):
    """Broadcast a chroma-grid quantity [8, 8, Bc] to the luma grid
    [8, 8, Bl]: full-res pixel (y, x) reads low-res (y//hs, x//ws)."""
    rh, rw = 8 // hs, 8 // ws
    t = x.reshape(hs, rh, ws, rw, hb_c, wb_c)
    t = t.transpose(1, 3, 4, 0, 5, 2).reshape(rh, rw, hb_c * hs, wb_c * ws)
    t = t[:, :, :hb_l, :wb_l]
    t = jnp.repeat(jnp.repeat(t, hs, axis=0), ws, axis=1)
    return t.reshape(8, 8, hb_l * wb_l)


def upsample_chroma_blocks(chroma_halo, luma2_halo, luma_pix,
                           img_w, img_h, ws, hs, hb_l, wb_l, hb_c, wb_c,
                           row0=0, hb_l_total=None, col0=0,
                           wb_l_total=None):
    """UPSAMPLE_UV fully in block form (reference:
    quantsmooth.h:1851-2394, 2691-2752) — no full-resolution planes.

    chroma_halo / luma2_halo: int32[10, 10, Bc] (component plane and
    downsampled luma); luma_pix int32[8, 8, Bl].  ws, hs in {1, 2}.
    Returns the full-res chroma pixels int32[8, 8, Bl].

    Identical values to ops/upsample.upsample_chroma: the regression
    statistics are < 2^24 so f32 is exact; the plane version's
    out-of-image lum=0 region is entirely cropped from the output, and
    the replicate tails (right edge for the first min(8,h1)*hs rows —
    the reference quirk — then bottom rows) become block-row masks.

    Row-sharded use: hb_l/hb_c are the local shard dims, ``row0`` the
    shard's global first pixel row (may be traced), ``hb_l_total`` the
    global luma block rows.  Both replicate tails stay shard-local:
    hh - h1*hs < 8, so the bottom tail and its source row live in the
    last block row.  Column sharding (2-D grid) mirrors this with
    ``col0``/``wb_l_total``: the right tail spans < 8 px (the last
    block column) and its source column sits at most one block column
    to the left, so it stays shard-local whenever wb_l >= 2 (the
    engine guards this).
    """
    from . import fp32

    w1 = (img_w + ws - 1) // ws
    h1 = (img_h + hs - 1) // hs
    if hb_l_total is None:
        hb_l_total = hb_l
    if wb_l_total is None:
        wb_l_total = wb_l

    # regression slope per low-res pixel (same math as JOINT)
    a = luma2_halo.astype(F)
    b = chroma_halo.astype(F)
    sumA = _conv3x3_f(a)
    sumB = _conv3x3_f(b)
    sAA = _conv3x3_prod_f(a, a) * 16 - sumA * sumA
    sAB = _conv3x3_prod_f(a, b) * 16 - sumA * sumB
    scale = jnp.where(sAA != 0, fp32.fdiv(sAB, sAA), F(0))
    scale = jnp.minimum(jnp.maximum(scale, F(-16.0)), F(16.0))
    # offset = chroma - luma_ds*scale + 0.5 (quantsmooth.h:2367)
    imc = b[1:9, 1:9]
    iml = a[1:9, 1:9]
    offset = fp32.fadd(fp32.fsub(imc, fp32.fmul(iml, scale)), F(0.5))

    scale_hi = _lowres_to_hires_blocks(scale, hb_l, wb_l, hb_c, wb_c,
                                       ws, hs)
    offset_hi = _lowres_to_hires_blocks(offset, hb_l, wb_l, hb_c, wb_c,
                                        ws, hs)
    lum = luma_pix.astype(F)
    val = fp32.fadd(fp32.fmul(lum, scale_hi), offset_hi)
    out = jnp.clip(jnp.trunc(val), 0, 255).astype(I32)

    o4 = out.reshape(8, 8, hb_l, wb_l)
    hh, ww = hb_l_total * 8, wb_l_total * 8
    row_g = (jax.lax.broadcasted_iota(I32, (8, 1, hb_l, 1), 0)
             + 8 * jax.lax.broadcasted_iota(I32, (8, 1, hb_l, 1), 2)
             + row0)
    col_g = (jax.lax.broadcasted_iota(I32, (1, 8, 1, wb_l), 1)
             + 8 * jax.lax.broadcasted_iota(I32, (1, 8, 1, wb_l), 3))
    col_g = col_g + col0
    # right-edge replicate from col w1*ws-1, first min(8,h1)*hs rows
    # only (reference quirk, quantsmooth.h:1861 + 2390-2393); source
    # block column indexed dynamically under col sharding (shards that
    # don't own it mask the clamped-garbage column away)
    if w1 * ws < ww:
        rep_rows = min(min(8, h1) * hs, min(h1 * hs, hh))
        sc = w1 * ws - 1
        lbc = jnp.clip(sc // 8 - col0 // 8, 0, wb_l - 1)
        src_col = jax.lax.dynamic_index_in_dim(
            o4[:, sc % 8], lbc, axis=2, keepdims=False)  # [8, hb_l]
        mask = (row_g < rep_rows) & (col_g >= w1 * ws)
        o4 = jnp.where(mask, src_col[:, None, :, None], o4)
    # bottom replicate from row h1*hs-1 (quantsmooth.h:2729-2730);
    # source block row indexed dynamically (local = global - row0//8,
    # clamped — shards that don't own it mask the result away)
    if h1 * hs < hh:
        sr = h1 * hs - 1
        lb = jnp.clip(sr // 8 - row0 // 8, 0, hb_l - 1)
        src_row = jax.lax.dynamic_index_in_dim(
            o4[sr % 8], lb, axis=1, keepdims=False)    # [8, wb_l]
        mask = row_g >= h1 * hs
        o4 = jnp.where(mask, src_row[None, :, None, :], o4)
    return o4.reshape(8, 8, hb_l * wb_l)


def padded_plane_to_halo10(padded, hb, wb):
    """Padded (+1px) plane -> [10, 10, B] halos (for image2, computed
    once per component)."""
    interior = padded[1:hb * 8 + 1, 1:wb * 8 + 1]
    return blocks_halo10(plane_to_fblocks_p(interior, hb, wb).astype(I32),
                         hb, wb)


# ---------------------------------------------------------------------------
# LOW_QUALITY range estimate, planar
# ---------------------------------------------------------------------------

def low_quality_range_p(coef, div):
    """Per-block range estimate on planar coef int32[64, B] -> f32[B]
    (reference: quantsmooth.h:929-938); strict fp32 left fold."""
    a = jnp.abs(coef[1:]).astype(I32)                       # [63, B]
    prod = (div[1:, None] * a).astype(F)

    def fold(carry, x):
        return fp32.fadd(carry, x), None

    rangef, _ = jax.lax.scan(fold, jnp.zeros(coef.shape[-1], dtype=F), prod)
    s = jnp.sum(a, axis=0, dtype=I32)
    mul = fp32.fdiv(F(4.0), s.astype(F))
    rangef = jnp.where(s != 0, fp32.fmul(rangef, mul), rangef)
    rangef = jnp.minimum(rangef, F(128))
    return roundf(rangef)


# ---------------------------------------------------------------------------
# Layout conversions
# ---------------------------------------------------------------------------

def nat_to_planar(coef_nat, hb, wb):
    """[B, 64] (host natural order) -> [64, B] planar."""
    return coef_nat.reshape(hb * wb, 64).T


def planar_to_nat(coef_p, hb, wb):
    """[64, B] planar -> [B, 64]."""
    return coef_p.T


def pix_to_plane(pix, hb, wb):
    """pix int32[8, 8, B] -> padded plane int32[hb*8+2, wb*8+2]
    (the reference scratch plane, quantsmooth.h:2612-2620)."""
    interior = pix.reshape(8, 8, hb, wb).transpose(2, 0, 3, 1).reshape(
        hb * 8, wb * 8)
    return jnp.pad(interior, 1, mode="edge")


def plane_to_fblocks_p(fplane, hb, wb):
    """Unpadded f32 plane [hb*8, wb*8] -> f32[8, 8, B] planar blocks."""
    return fplane.reshape(hb, 8, wb, 8).transpose(1, 3, 0, 2).reshape(
        8, 8, hb * wb)
