"""The per-block coefficient solver — the hottest path of the engine.

Models the reverse-zigzag k=63..1 sweep of quantsmooth_block
(reference: quantsmooth.h:1396-1565): per coefficient, a weighted
least-squares correction ``delta = round(sum(w*d*w*g) / sum((w*g)^2))``
over horizontal / border / vertical / diagonal pixel-difference sets,
clamped to the quantization interval, with selective IDCT refresh
(zigzag_refresh, quantsmooth.h:313-322).

Bit-exactness notes:
- The fp32 accumulation is a strict left fold in the exact scalar term
  order (56 h, 32 border, 56 v, 98 diag) via lax.scan.
- Terms skipped by the scalar code (h-diffs when the coefficient has no
  horizontal frequency, v-diffs for i < 8, diagonals without the flag)
  carry a zero table weight; both accumulator contributions are then
  +-0.0f which cannot change a left fold.
- a3 == 0 makes delta NaN -> the C (int) cast yields INT32_MIN and the
  subtraction wraps (see quant.c_f32_to_i32).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..specref import NATURAL_ORDER, ZIGZAG_REFRESH, N_TERMS
from . import fp32
from .dct import idct_islow
from .quant import roundf, c_f32_to_i32, get_orig_coef, interval_clamp

F = jnp.float32
I32 = jnp.int32


def block_diffs(buf, borders):
    """Pixel-difference vectors per block in scalar term order
    (reference: quantsmooth.h:1416-1488, scalar 1521-1541).

    buf int32[B,8,8]; borders int32[B,4,8] -> f32[B, 242].
    """
    b = buf.astype(I32)
    B = b.shape[0]
    h = (b[:, :, :7] - b[:, :, 1:]).reshape(B, -1)
    bd = jnp.concatenate([
        b[:, 0, :] - borders[:, 0, :],
        b[:, 7, :] - borders[:, 1, :],
        b[:, :, 0] - borders[:, 2, :],
        b[:, :, 7] - borders[:, 3, :]], axis=1)
    v = (b[:, :7, :] - b[:, 1:, :]).reshape(B, -1)
    d1 = b[:, :7, :7] - b[:, 1:, 1:]
    d2 = b[:, :7, 1:] - b[:, 1:, :7]
    diag = jnp.stack([d1, d2], axis=-1).reshape(B, -1)
    return jnp.concatenate([h, bd, v, diag], axis=1).astype(F)


def _left_fold2(p2, p3):
    """Strict sequential fp32 sum over the leading axis of both arrays
    (the scalar C accumulation order, quantsmooth.h:1527-1546)."""
    def step(carry, x):
        a2, a3 = carry
        return (fp32.fadd(a2, x[0]), fp32.fadd(a3, x[1])), None

    zero = jnp.zeros(p2.shape[1:], dtype=F)
    (a2, a3), _ = jax.lax.scan(step, (zero, zero), (p2, p3))
    return a2, a3


# Static per-step data for the reverse-zigzag sweep: the coefficient
# index i = natural_order[k] for k = 63..1, and whether the pixel
# buffer is refreshed before solving that coefficient.
_I_SEQ = NATURAL_ORDER[63:0:-1].astype(np.int32)          # [63]
_REFRESH_SEQ = ZIGZAG_REFRESH[_I_SEQ].astype(bool)        # [63]


def solve_blocks(coef, borders, div, x1, qshr, tables):
    """The k=63..1 sweep over all blocks (quantsmooth.h:1403-1565).

    coef int32[B,64]; borders int32[B,4,8]; div/x1/qshr int32[64];
    tables f32[64,242] (constant, from make_solver_tables).
    Returns updated coef int32[B,64].

    One lax.scan over the 63 steps (compiles the step body once);
    the selective IDCT refresh is a lax.cond inside the step.
    """
    B = coef.shape[0]
    tab = jnp.asarray(np.asarray(tables, dtype=np.float32))

    def refresh(coef, borders, buf, diffs, need):
        nb = idct_islow(coef.reshape(B, 8, 8))
        nd = block_diffs(nb, borders)
        buf = jnp.where(need[:, None, None], nb, buf)
        diffs = jnp.where(need[:, None], nd, diffs)
        return buf, diffs, jnp.zeros_like(need)

    def step(carry, xs):
        coef, buf, diffs, need = carry
        i, do_refresh = xs
        buf, diffs, need = jax.lax.cond(
            do_refresh,
            lambda c, bo, bu, d, n: refresh(c, bo, bu, d, n),
            lambda c, bo, bu, d, n: (bu, d, n),
            coef, borders, buf, diffs, need)
        rng = (div[i] * 2).astype(F)
        t = jnp.maximum(rng - jnp.abs(diffs), F(0))  # integral: exact
        t = t * t                                    # < 2^24: exact
        u = fp32.fmul(diffs, t)
        w = fp32.fmul(tab[i][None, :], t)
        p2 = fp32.fmul(u, w).T          # [242, B]
        p3 = fp32.fmul(w, w).T
        a2, a3 = _left_fold2(p2, p3)
        delta = c_f32_to_i32(roundf(fp32.fdiv(a2, a3)))
        coef1 = coef[:, i]
        a0 = get_orig_coef(coef1, div[i], x1[i], qshr[i])
        add = interval_clamp(coef1 - delta, a0, div[i])
        newc = jnp.where(delta != 0, add, coef1)
        need = need | (newc != coef1)
        coef = coef.at[:, i].set(newc)
        return (coef, buf, diffs, need), None

    init = (coef,
            jnp.zeros((B, 8, 8), dtype=I32),
            jnp.zeros((B, N_TERMS), dtype=F),
            jnp.ones((B,), dtype=jnp.bool_))
    xs = (jnp.asarray(_I_SEQ), jnp.asarray(_REFRESH_SEQ))
    (coef, _, _, _), _ = jax.lax.scan(step, init, xs)
    return coef


