"""DCT kernels in JAX — bit-exact ports of the reference's scalar paths.

``idct_islow`` models the libjpeg-exact integer IDCT
(reference: idct.h:468-539 scalar branch) and ``fdct_float`` the float
forward DCT (reference: idct.h:606-923, scalar 895-916).  Both are
vectorized over a leading block axis: every lane evaluates the same
scalar expression DAG, so lane math is identical to the C scalar build.

All integer math is int32 with two's-complement wraparound (XLA
semantics on CPU and TPU match C here); all float math is fp32 with the
exact operation order of the scalar C code.
"""

from __future__ import annotations

import jax.numpy as jnp

F = jnp.float32
I32 = jnp.int32


def _f(x):
    return jnp.float32(x)


def _idct_islow_pass1(x):
    """libjpeg islow even/odd butterfly, int32 (reference: idct.h:59-89)."""
    z2 = x[2]; z3 = x[6]
    z1 = (z2 + z3) * 4433           # FIX_0_541196100
    tmp2 = z1 - z3 * 15137          # FIX_1_847759065
    tmp3 = z1 + z2 * 6270           # FIX_0_765366865
    z2 = x[0]; z3 = x[4]
    tmp0 = (z2 + z3) << 13
    tmp1 = (z2 - z3) << 13
    tmp10 = tmp0 + tmp3; tmp13 = tmp0 - tmp3
    tmp11 = tmp1 + tmp2; tmp12 = tmp1 - tmp2
    tmp0 = x[7]; tmp1 = x[5]; tmp2 = x[3]; tmp3 = x[1]
    z1 = tmp0 + tmp3; z2 = tmp1 + tmp2
    z3 = tmp0 + tmp2; z4 = tmp1 + tmp3
    z5 = (z3 + z4) * 9633           # FIX_1_175875602
    tmp0 = tmp0 * 2446              # FIX_0_298631336
    tmp1 = tmp1 * 16819             # FIX_2_053119869
    tmp2 = tmp2 * 25172             # FIX_3_072711026
    tmp3 = tmp3 * 12299             # FIX_1_501321110
    z1 = z1 * 7373                  # FIX_0_899976223
    z2 = z2 * 20995                 # FIX_2_562915447
    z3 = z3 * 16069                 # FIX_1_961570560
    z4 = z4 * 3196                  # FIX_0_390180644
    z3 = z5 - z3; z4 = z5 - z4
    tmp0 = tmp0 + (z3 - z1)
    tmp1 = tmp1 + (z4 - z2)
    tmp2 = tmp2 + (z3 - z2)
    tmp3 = tmp3 + (z4 - z1)
    return [tmp10 + tmp3, tmp11 + tmp2, tmp12 + tmp1, tmp13 + tmp0,
            tmp13 - tmp0, tmp12 - tmp1, tmp11 - tmp2, tmp10 - tmp3]


def _descale(x, n):
    """DESCALE (reference: idct.h:54): round-to-nearest arithmetic shift."""
    return (x + (1 << (n - 1))) >> n


def _range_clamp(tmp, n):
    """Output sample (reference: idct.h:509-511): shift with +CENTER
    rounding bias, clamp to [0, 255]."""
    z1 = (tmp + (257 << (n - 1))) >> n
    return jnp.clip(z1, 0, 255)


def idct_islow(coef):
    """Integer IDCT, int coefficients -> pixel values in [0, 255].

    coef: int32[..., 8, 8] -> int32[..., 8, 8].  The reference's
    AC-all-zero shortcuts (idct.h:471-506) are pure optimizations that
    provably equal the full path, so the full path is always run.
    """
    c = coef.astype(I32)
    cols = _idct_islow_pass1([c[..., i, :] for i in range(8)])
    ws = jnp.stack([_descale(v, 13 - 2) for v in cols], axis=-2)
    rows = _idct_islow_pass1([ws[..., :, i] for i in range(8)])
    return jnp.stack([_range_clamp(v, 13 + 2 + 3) for v in rows], axis=-1)


def _fdct_float_pass(x, scale=None):
    """8-point float FDCT butterfly, exact fp32 order (idct.h:608-628).

    Every op goes through fp32.fadd/fsub/fmul so the rounding sequence
    matches the C scalar build on every backend (see ops/fp32.py).
    """
    from .fp32 import fadd, fsub, fmul

    z1 = x[0]; z2 = x[7]; t0 = fadd(z1, z2); t7 = fsub(z1, z2)
    z1 = x[1]; z2 = x[6]; t1 = fadd(z1, z2); t6 = fsub(z1, z2)
    z1 = x[2]; z2 = x[5]; t2 = fadd(z1, z2); t5 = fsub(z1, z2)
    z1 = x[3]; z2 = x[4]; t3 = fadd(z1, z2); t4 = fsub(z1, z2)
    z1 = fadd(t0, t3); z4 = fsub(t0, t3)
    z2 = fadd(t1, t2); z3 = fsub(t1, t2)
    o0 = fadd(z1, z2); o4 = fsub(z1, z2)
    z1 = fmul(fadd(z3, z4), _f(0.541196100))
    o2 = fadd(z1, fmul(z4, _f(0.765366865)))
    o6 = fsub(z1, fmul(z3, _f(1.847759065)))
    z1 = fadd(t4, t7); z2 = fadd(t5, t6)
    z3 = fadd(t4, t6); z4 = fadd(t5, t7)
    z5 = fmul(fadd(z3, z4), _f(1.175875602))
    t4 = fmul(t4, _f(0.298631336)); t5 = fmul(t5, _f(2.053119869))
    t6 = fmul(t6, _f(3.072711026)); t7 = fmul(t7, _f(1.501321110))
    z1 = fmul(z1, _f(0.899976223)); z2 = fmul(z2, _f(2.562915447))
    z3 = fsub(fmul(z3, _f(1.961570560)), z5)
    z4 = fsub(fmul(z4, _f(0.390180644)), z5)
    o7 = fsub(t4, fadd(z1, z3)); o5 = fsub(t5, fadd(z2, z4))
    o3 = fsub(t6, fadd(z2, z3)); o1 = fsub(t7, fadd(z1, z4))
    out = [o0, o1, o2, o3, o4, o5, o6, o7]
    if scale is not None:
        out = [fmul(o, scale) for o in out]
    return out


def fdct_float(blocks):
    """Float FDCT, columns then rows, output scaled by 0.125.

    blocks: f32[..., 8, 8] -> f32[..., 8, 8]
    (reference: idct.h:606-923, scalar branch 895-916).
    """
    b = blocks.astype(F)
    cols = _fdct_float_pass([b[..., i, :] for i in range(8)])
    ws = jnp.stack(cols, axis=-2)
    rows = _fdct_float_pass([ws[..., :, i] for i in range(8)], scale=_f(0.125))
    return jnp.stack(rows, axis=-1)
