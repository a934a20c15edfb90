"""Global AC-energy rebalance (reference: quantsmooth.h:1823-1848).

The C code accumulates ``m0 = sum(c*a0)``, ``m1 = sum(a0*a0)`` in
int64 (per-term products are int32) and computes
``mul = ((m1 << 13) + (m0 >> 1)) / m0`` in int64.  TPUs have no native
int64, so this module reproduces the arithmetic exactly with int32
pairs in radix 2^16:

- per-term products always fit int32 (|coef| <= 32767 from int16
  storage, |a0| <= 32767 + q/2 < 2^16 => |product| < 2^31);
- the two sums are split hi/lo and carried exactly;
- the division uses the identity m1 = qq*m0 + rr with qq in {1,2}
  (m0 >= m1/2 because a0 is the nearest lattice point to c), followed
  by a 13-step restoring division for floor((rr<<13 + (m0>>1)) / m0).

All lanes are independent blocks; everything is exact integer math.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quant import get_orig_coef, interval_clamp

I32 = jnp.int32
_MASK16 = (1 << 16) - 1


def _norm(hi, lo):
    """Canonicalize a radix-2^16 pair: lo in [0, 2^16)."""
    c = lo >> 16  # arithmetic shift floors, handles negative lo
    return hi + c, lo - (c << 16)


def _pair_ge(ah, al, bh, bl):
    return (ah > bh) | ((ah == bh) & (al >= bl))


def _pair_sub(ah, al, bh, bl):
    return _norm(ah - bh, al - bl)


def _pair_add(ah, al, bh, bl):
    return _norm(ah + bh, al + bl)


def _pair_shl1(hi, lo):
    return _norm(hi << 1, lo << 1)


def _pair_shr1(hi, lo):
    """Right shift by 1 of a non-negative canonical pair."""
    return hi >> 1, ((hi & 1) << 15) | (lo >> 1)


def _split_sum(terms):
    """Exact int64-equivalent sum of int32 terms along axis 1 as a
    canonical radix-2^16 pair."""
    hi = jnp.sum(terms >> 16, axis=1, dtype=I32)
    lo = jnp.sum(terms & _MASK16, axis=1, dtype=I32)
    return _norm(hi, lo)


def rebalance_blocks(coef, div, x1, qshr):
    """AC energy restore; DC untouched.  coef int32[B,64] -> int32[B,64].

    Exactly models the scalar branch (quantsmooth.h:1823-1848): when
    m1 > m0, every AC coefficient is scaled by mul (Q13, round-nearest)
    and re-clamped to its quantization interval around a0.
    """
    c_ac = coef[:, 1:].astype(I32)                       # [B, 63]
    d_ac, x_ac, s_ac = div[1:], x1[1:], qshr[1:]
    a0 = get_orig_coef(c_ac, d_ac[None, :], x_ac[None, :], s_ac[None, :])
    m0h, m0l = _split_sum(c_ac * a0)
    m1h, m1l = _split_sum(a0 * a0)

    do = ~_pair_ge(m0h, m0l, m1h, m1l)                    # m1 > m0

    # Guard lanes where m0 == 0 (only possible when do is False).
    zero_m0 = (m0h == 0) & (m0l == 0)
    m0l = jnp.where(zero_m0, I32(1), m0l)

    # qq = m1 // m0 in {1, 2}: qq = 2 iff m1 >= 2*m0.
    t2h, t2l = _pair_shl1(m0h, m0l)
    qq2 = _pair_ge(m1h, m1l, t2h, t2l)
    qh = jnp.where(qq2, t2h, m0h)
    ql = jnp.where(qq2, t2l, m0l)
    rrh, rrl = _pair_sub(m1h, m1l, qh, ql)                # rr = m1 - qq*m0

    # floor((rr << 13) / m0) by restoring division; rem < 2*m0 fits.
    q2 = jnp.zeros_like(m0h)
    remh, reml = rrh, rrl
    for _ in range(13):
        remh, reml = _pair_shl1(remh, reml)
        ge = _pair_ge(remh, reml, m0h, m0l)
        sh, sl = _pair_sub(remh, reml, m0h, m0l)
        remh = jnp.where(ge, sh, remh)
        reml = jnp.where(ge, sl, reml)
        q2 = (q2 << 1) + ge.astype(I32)
    # + floor((rem + (m0 >> 1)) / m0), which is 0 or 1.
    hh, hl = _pair_shr1(m0h, m0l)
    fh, fl = _pair_add(remh, reml, hh, hl)
    adj = _pair_ge(fh, fl, m0h, m0l).astype(I32)

    mul = (jnp.where(qq2, I32(2), I32(1)) << 13) + q2 + adj   # int32, small

    add = (c_ac * mul[:, None] + 0x1000) >> 13
    add = interval_clamp(add, a0, d_ac[None, :])
    out_ac = jnp.where(do[:, None], add, coef[:, 1:])
    return jnp.concatenate([coef[:, :1], out_ac], axis=1)
