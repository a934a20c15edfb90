"""LOW_QUALITY single-pass path (reference: quantsmooth.h:924-1179).

A data-adaptive per-block ``range`` from coefficient statistics
(quantsmooth.h:929-938) drives a 3x3 weighted gradient shrink
(scalar 1161-1175); the shrunk plane is FDCT'd and interval-clamped by
the caller.  ~10x faster than the full solver in the reference
(README.md:51-52); on TPU it is a handful of fused elementwise passes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .quant import roundf, c_f32_to_i32

F = jnp.float32
I32 = jnp.int32
CENTERJSAMPLE = 128


def low_quality_range(coef, div):
    """Per-block range estimate, already roundf'd (quantsmooth.h:929-938).

    coef int32[B,64]; div int32[64] -> f32[B].
    The fp32 sum over x=1..63 is a strict left fold (scalar order).
    """
    a = jnp.abs(coef[:, 1:]).astype(I32)                 # [B, 63]
    prod = (div[None, 1:] * a).astype(F)

    def step(carry, x):
        return carry + x, None

    rangef, _ = jax.lax.scan(step, jnp.zeros(coef.shape[0], dtype=F), prod.T)
    s = jnp.sum(a, axis=1, dtype=I32)
    mul = F(4.0) / s.astype(F)
    rangef = jnp.where(s != 0, rangef * mul, rangef)
    rangef = jnp.minimum(rangef, F(CENTERJSAMPLE))
    return roundf(rangef)


# 8-neighbor visit order of the scalar shrink (quantsmooth.h:1164-1171):
# (dx, dy, weight-index) with weight c0 for axis, c1 = c0*sqrt(1/2) diag.
_NEIGHBORS = ((-1, -1, 1), (0, -1, 0), (1, -1, 1),
              (-1, 0, 0), (1, 0, 0),
              (-1, 1, 1), (0, 1, 0), (1, 1, 1))


def low_quality_fplane(padded_img, range_map):
    """3x3 weighted gradient shrink (quantsmooth.h:1161-1175 scalar).

    padded_img int32 (+1px pad); range_map f32[H,W] (per-pixel range,
    constant within each block).  Returns centered f32[H,W] for
    fdct_clamp.  The fp32 accumulation over the 8 neighbors follows the
    exact scalar order.
    """
    p = padded_img.astype(I32)
    H, W = p.shape[0] - 2, p.shape[1] - 2
    # c0 = 2, c1 = c0 * sqrt(1/2), both fp32 (quantsmooth.h:926, 1163).
    c0 = np.float32(2.0)
    c1 = np.float32(c0 * np.sqrt(np.float32(0.5)))
    cw = (F(c0), F(c1))
    from . import fp32

    a = p[1:H + 1, 1:W + 1]
    acc0 = jnp.zeros((H, W), dtype=F)
    accn = jnp.zeros((H, W), dtype=F)
    for dx, dy, wi in _NEIGHBORS:
        nb = p[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
        t0 = (a - nb).astype(F)
        # t0, range_map integral; t and t0*t stay below 2^24: exact.
        t = jnp.maximum(range_map - jnp.abs(t0), F(0))
        t = t * t
        aw = fp32.fmul(cw[wi], t)
        acc0 = fp32.fadd(acc0, fp32.fmul(t0 * t, aw))
        accn = fp32.fadd(accn, fp32.fmul(aw, aw))
    corr = fp32.fdiv(acc0, accn)
    shifted = fp32.fsub(a.astype(F), corr)
    newa = jnp.where(accn > F(0), c_f32_to_i32(shifted), a)
    return (newa - CENTERJSAMPLE).astype(F)
