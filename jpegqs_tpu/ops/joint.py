"""JOINT_YUV: luma-guided chroma smoothing (reference:
quantsmooth.h:577-922, scalar 893-920).

Per chroma pixel, a 3x3 weighted (1/2/4) local linear regression of
chroma on the downsampled luma gives a predicted value; the predicted
plane is FDCT'd and clamped to the quantization intervals by the
caller (fdct_clamp).  Integer statistics are exact; the slope division
and clamp (+-16) are fp32 as in the scalar build.
"""

from __future__ import annotations

import jax.numpy as jnp

F = jnp.float32
I32 = jnp.int32

CENTERJSAMPLE = 128

# 3x3 weights (reference: quantsmooth.h:896-905): corners 1, edges 2,
# center 4; total weight 16.
_W3 = ((1, 2, 1), (2, 4, 2), (1, 2, 1))


def conv3x3(padded, weights=_W3):
    """Weighted 3x3 sums over the interior of a padded plane, int32
    (order-independent exact integer math)."""
    H, W = padded.shape[0] - 2, padded.shape[1] - 2
    out = jnp.zeros((H, W), dtype=I32)
    for dy in range(3):
        for dx in range(3):
            out = out + weights[dy][dx] * padded[dy:dy + H, dx:dx + W].astype(I32)
    return out


def conv3x3_prod(pa, pb, weights=_W3):
    H, W = pa.shape[0] - 2, pa.shape[1] - 2
    out = jnp.zeros((H, W), dtype=I32)
    for dy in range(3):
        for dx in range(3):
            out = out + weights[dy][dx] * (pa[dy:dy + H, dx:dx + W].astype(I32)
                                           * pb[dy:dy + H, dx:dx + W].astype(I32))
    return out


def regression_scale(padded_a, padded_b):
    """Per-pixel regression slope of b on a with the 3x3 weights,
    clamped to +-16 (reference: quantsmooth.h:906-912).

    Returns (scale f32[H,W], sumA i32, sumB i32) for reuse.
    """
    sumA = conv3x3(padded_a)
    sumB = conv3x3(padded_b)
    sumAA = conv3x3_prod(padded_a, padded_a)
    sumAB = conv3x3_prod(padded_a, padded_b)
    from . import fp32

    sAA = sumAA * 16 - sumA * sumA
    sAB = sumAB * 16 - sumA * sumB
    scale = jnp.where(sAA != 0,
                      fp32.fdiv(sAB.astype(F), sAA.astype(F)), F(0))
    scale = jnp.minimum(jnp.maximum(scale, F(-16.0)), F(16.0))
    return scale, sumA, sumB


def joint_yuv_fplane(padded_img, padded_img2):
    """Predicted chroma plane, centered, ready for fdct_clamp
    (reference: quantsmooth.h:893-920).

    padded_img: chroma plane (+1px pad); padded_img2: downsampled luma
    (+1px pad).  Returns f32[H, W].
    """
    from . import fp32

    a = padded_img2.astype(I32)
    b = padded_img.astype(I32)
    H, W = a.shape[0] - 2, a.shape[1] - 2
    scale, sumA, sumB = regression_scale(a, b)
    center2 = a[1:H + 1, 1:W + 1]
    av = fp32.fmul(fp32.fadd(fp32.fmul((center2 * 16 - sumA).astype(F),
                                       scale), sumB.astype(F)), F(1.0 / 16))
    av = fp32.fsub(jnp.maximum(av, F(0)), F(CENTERJSAMPLE))
    return jnp.minimum(av, F(CENTERJSAMPLE))
