"""UPSAMPLE_UV: luma-guided non-blurring chroma upsampling to 4:4:4
(reference: quantsmooth.h:1851-2394 upsample_row; integration
2691-2752; component sampling rewrite 2836-2849).

Per low-res pixel, the same 3x3 regression statistics as JOINT_YUV give
a slope; ``offset = chroma - luma_ds*scale + 0.5`` and the full-res
output is ``trunc(luma_hi*scale + offset)`` clamped to [0, 255].  The
full-res chroma plane is then FDCT'd into new luma-dimension coefficient
arrays by the engine.
"""

from __future__ import annotations

import jax.numpy as jnp

from .joint import regression_scale

F = jnp.float32
I32 = jnp.int32
MAXJSAMPLE = 255


def upsample_chroma(padded_chroma, padded_luma_ds, padded_luma,
                    img_w, img_h, ws, hs, hb_l, wb_l):
    """Full-res chroma pixel plane int32[hb_l*8, wb_l*8].

    padded_chroma / padded_luma_ds: low-res (+1px pad) planes;
    padded_luma: full-res (+1px pad) luma plane.  ws/hs static.
    """
    w1 = (img_w + ws - 1) // ws
    h1 = (img_h + hs - 1) // hs
    ww, hh = wb_l * 8, hb_l * 8
    w1c = ((w1 + 7) // 8) * 8  # reference processes 8-column chunks

    scale_full, _, _ = regression_scale(padded_luma_ds.astype(I32),
                                        padded_chroma.astype(I32))
    from . import fp32

    scale = scale_full[:h1, :w1c]
    # offset = chroma - luma_ds*scale + 0.5 (quantsmooth.h:2367)
    imc = padded_chroma[1:h1 + 1, 1:w1c + 1].astype(F)
    iml = padded_luma_ds[1:h1 + 1, 1:w1c + 1].astype(F)
    offset = fp32.fadd(fp32.fsub(imc, fp32.fmul(iml, scale)), F(0.5))

    # out = trunc(luma_hi*scale + offset), clamp [0,255]
    # (quantsmooth.h:2379-2388)
    lum = jnp.zeros((h1 * hs, w1c * ws), dtype=F)
    lum_src = padded_luma[1:, 1:].astype(F)
    ch = min(h1 * hs, lum_src.shape[0])
    cw = min(w1c * ws, lum_src.shape[1])
    lum = lum.at[:ch, :cw].set(lum_src[:ch, :cw])
    scale_hi = jnp.repeat(jnp.repeat(scale, hs, axis=0), ws, axis=1)
    offset_hi = jnp.repeat(jnp.repeat(offset, hs, axis=0), ws, axis=1)
    val = fp32.fadd(fp32.fmul(lum, scale_hi), offset_hi)
    out_full = jnp.clip(jnp.trunc(val), 0, MAXJSAMPLE).astype(I32)

    out = jnp.zeros((hh, ww), dtype=I32)
    h_lim = min(h1 * hs, hh)
    w_lim = min(w1c * ws, ww)
    out = out.at[:h_lim, :w_lim].set(out_full[:h_lim, :w_lim])
    # Right-edge replicate from col w1*ws-1 (quantsmooth.h:2390-2393).
    # Reference quirk: upsample_row decrements y1 by y0 before this loop
    # (quantsmooth.h:1861), so the replicate covers only the first 8-row
    # chunk; rows beyond min(8,h1)*hs keep values computed from the
    # out-of-image scale/offset region.
    if w1 * ws < ww:
        rep_rows = min(min(8, h1) * hs, h_lim)
        out = out.at[:rep_rows, w1 * ws:].set(
            out[:rep_rows, w1 * ws - 1:w1 * ws])
    # bottom replicate from row h1*hs-1 (quantsmooth.h:2729-2730)
    if h1 * hs < hh:
        out = out.at[h1 * hs:, :].set(out[h1 * hs - 1, :][None, :])
    return out
