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
from .rebalance import (_split_sum, _pair_ge, _pair_sub, _pair_add,
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
