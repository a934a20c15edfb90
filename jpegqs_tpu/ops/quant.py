"""Quantization-interval math in JAX.

Covers the reference's quant "magic" tables, GET_ORIG_COEF, the
interval clamp, fdct_clamp, and the exact C float->int conversion
semantics the scalar build relies on
(reference: quantsmooth.h:324-341, 343-562, 2497-2539).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .dct import fdct_float

F = jnp.float32
I32 = jnp.int32
INT32_MIN = -(1 << 31)
_TWO31F = np.float32(2147483648.0)  # 2^31, exactly representable


def roundf(x):
    """C roundf: round half away from zero, exact for fp32.

    Split x = trunc + frac (both exact for |x| < 2^23) and compare the
    fraction against 0.5; floor(x+0.5) is wrong one ulp below the tie.
    """
    from .fp32 import fadd, fsub

    x = x.astype(F)
    t = jnp.trunc(x)
    f = x - t  # exact by Sterbenz
    return fsub(fadd(t, jnp.where(f >= F(0.5), F(1), F(0))),
                jnp.where(f <= F(-0.5), F(1), F(0))).astype(F)


def c_f32_to_i32(x):
    """C `(int)` cast of a float on x86: cvttss2si.

    Truncate toward zero; NaN and out-of-range values produce
    INT32_MIN (the x86 "integer indefinite"), which the scalar
    reference build relies on when a weight sum is zero
    (reference: quantsmooth.h:1548-1561 with a3 == 0).
    """
    t = jnp.trunc(x)
    in_range = (t >= -_TWO31F) & (t < _TWO31F)  # NaN fails both
    safe = jnp.where(in_range, t, F(0))
    return jnp.where(in_range, safe.astype(I32), I32(INT32_MIN))


def make_quant_tables(qtbl):
    """Host-side: sanitized quantizers + fixed-point reciprocal/shift.

    Returns (div, x1, qshr) int32[64] arrays ready for get_orig_coef.
    div is the zero-repaired quantizer (quantsmooth.h:2508-2511); x1 and
    qshr reproduce the reference's round-half-away division tables
    (quantsmooth.h:2513-2539, non-NEON branch), reinterpreted int16 as
    the C code does with (int16_t)quantval[...].
    """
    q = np.asarray(qtbl, dtype=np.int64)
    q = (q - ((q - 1) >> 16)).astype(np.int64)  # zero -> 1
    div = q.astype(np.int32)
    x1s = np.zeros(64, dtype=np.int32)
    qshrs = np.zeros(64, dtype=np.int32)
    for i in range(64):
        qi = int(q[i])
        n = qi.bit_length() - 1
        x1 = (((0x10000 << n) + qi - 1) // qi) & 0xFFFFFFFF
        if n:
            x1 |= x1 >> 16
        x2 = (-0x8000 >> n) & 0xFFFF
        x1s[i] = np.uint16(x1 & 0xFFFF).astype(np.int16)
        qshrs[i] = np.uint16(x2).astype(np.int16)
    return div, x1s, qshrs


def get_orig_coef(coef, div, x1, qshr):
    """Nearest dequantized lattice point a0 = round_half_away(c/q)*q.

    Fixed-point formula of the reference (quantsmooth.h:332-336,
    non-NEON).  All args broadcastable int32.
    """
    c = coef.astype(I32)
    a0 = ((x1 * c) >> 16) + c
    a0 = ((-a0) * qshr + 0x4000) >> 15
    return a0 * div


def interval_clamp(add, a0, div):
    """Clamp to the quantization interval around a0
    (reference: quantsmooth.h:555-560)."""
    d0 = (div - 1) >> 1
    d1 = div >> 1
    dh = a0 + jnp.where(a0 < 0, d1, d0)
    dl = a0 - jnp.where(a0 > 0, d1, d0)
    return jnp.maximum(jnp.minimum(add, dh), dl)


def fdct_clamp(fblocks, coef, div, x1, qshr):
    """FDCT + round-half-away + clamp each coef to its quant interval
    (reference: quantsmooth.h:343-562, scalar core 551-561).

    fblocks f32[B,8,8]; coef int32[B,64] -> int32[B,64].
    """
    buf = fdct_float(fblocks).reshape(fblocks.shape[:-2] + (64,))
    a0 = get_orig_coef(coef, div[None, :], x1[None, :], qshr[None, :])
    add = c_f32_to_i32(roundf(buf))
    return interval_clamp(add, a0, div[None, :])
