"""Device-side pixel output: coefficient planes -> RGB/gray pixels.

The library decode path (`decode_smoothed`) previously re-encoded the
smoothed coefficients to JPEG bytes and ran libjpeg's decompressor —
a full Huffman encode + decode round trip the reference avoids with
its buffered-image integration (reference: jpegqs_start_decompress,
quantsmooth.h:2861-2905 reuses the decoder's coefficient arrays
in place).  SURVEY.md rules out the reference's private-struct pokes;
the TPU-native equivalent is to decode the pixels OURSELVES, on
device, reproducing libjpeg's decompress math bit for bit:

- inverse DCT: jpeg_idct_islow (ops/planar.idct_islow_p is already
  the bit-exact kernel; quant=1 so dequantization is the identity)
- chroma upsampling: h2v2/h2v1 "fancy" (triangle) upsampling — the
  libjpeg default (do_fancy_upsampling=TRUE); jdsample.c's special
  first/last cases coincide exactly with clamped edge replication,
  which is how they are vectorized here
- color conversion: ycc_rgb fixed-point (jdcolor.c build_ycc_rgb_table
  SCALEBITS=16 tables) — the tables are affine in the chroma value,
  so they are computed directly instead of gathered

Everything is exact int32 arithmetic (products < 2^24); outputs are
byte-identical to libjpeg's decode of the re-encoded file (tested
differentially in tests/test_api.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import planar

I32 = jnp.int32

# jdcolor.c fixed-point constants: FIX(x) = round(x * 2^16)
_SCALE = 16
_HALF = 1 << (_SCALE - 1)
_FIX_140200 = int(1.40200 * 65536 + 0.5)
_FIX_177200 = int(1.77200 * 65536 + 0.5)
_FIX_071414 = int(0.71414 * 65536 + 0.5)
_FIX_034414 = int(0.34414 * 65536 + 0.5)


def coefs_to_plane(coef16, hb, wb, oh, ow):
    """int16[hb, wb, 64] quant=1 coefficients -> int32 sample plane
    cropped to the component's output dims (libjpeg: inverse DCT of
    every block, jdcoefct.c -> jidctint.c; idct_islow_p is bit-exact
    vs idct.h:468-539 which is itself libjpeg-exact)."""
    B = hb * wb
    coef = coef16.astype(I32).reshape(B, 64).T
    pix = planar.idct_islow_p(coef.reshape(8, 8, B))
    plane = pix.reshape(8, 8, hb, wb).transpose(2, 0, 3, 1).reshape(
        hb * 8, wb * 8)
    return plane[:oh, :ow]


def _h2_fancy_cols(t, bias_even, bias_odd, shift):
    """Shared horizontal doubling of jdsample.c's fancy upsamplers:
    out[2x] = (3*t[x] + t[x-1] + bias_even) >> shift, out[2x+1] =
    (3*t[x] + t[x+1] + bias_odd) >> shift, with the first/last-column
    special cases realized by clamped replication (they coincide:
    e.g. h2v2's (t*4 + 8) >> 4 == (3t + t + 8) >> 4)."""
    left = jnp.concatenate([t[:, :1], t[:, :-1]], axis=1)
    right = jnp.concatenate([t[:, 1:], t[:, -1:]], axis=1)
    even = (3 * t + left + bias_even) >> shift
    odd = (3 * t + right + bias_odd) >> shift
    R, w = t.shape
    return jnp.stack([even, odd], axis=2).reshape(R, 2 * w)


def fancy_upsample(plane, ws, hs):
    """libjpeg fancy (triangle) chroma upsampling of a downsampled
    plane (jdsample.c h2v2_fancy_upsample / h2v1_fancy_upsample;
    selected by jdsample start when do_fancy_upsampling, the default).

    plane int32[dh, dw]; returns int32[hs*dh, ws*dw] (crop to the
    image dims is the caller's job).  ws in {1, 2}, hs in {1, 2},
    (ws, hs) != (1, 2) — libjpeg has no fancy h1v2 path in this
    generation; such layouts fall back to the re-encode decode.
    """
    assert (ws, hs) in ((1, 1), (2, 1), (2, 2))
    if ws == 1 and hs == 1:
        return plane
    if hs == 2:
        # vertical triangle: out row 2y weights rows (y-1, y) as (1, 3),
        # out row 2y+1 weights (y, y+1) as (3, 1); image edges replicate
        up = jnp.concatenate([plane[:1], plane[:-1]], axis=0)
        dn = jnp.concatenate([plane[1:], plane[-1:]], axis=0)
        t_even = 3 * plane + up
        t_odd = 3 * plane + dn
        dh, dw = plane.shape
        t = jnp.stack([t_even, t_odd], axis=1).reshape(2 * dh, dw)
        return _h2_fancy_cols(t, 8, 7, 4)
    # h2v1: out[2x] = (3v + left + 1) >> 2, out[2x+1] = (3v + right + 2) >> 2;
    # first column (v*4+1)>>2 == v and last (v*4+2)>>2 == v, as jdsample.c
    return _h2_fancy_cols(plane, 1, 2, 2)


def ycc_to_rgb(y, cb, cr):
    """jdcolor.c ycc_rgb_convert, exactly: r = y + Cr_r_tab[cr],
    g = y + ((Cb_g_tab[cb] + Cr_g_tab[cr]) >> 16), b = y + Cb_b_tab[cb],
    clamped to [0, 255].  The tables are affine in (value - 128) so the
    entries are computed inline (arithmetic shifts match C's
    RIGHT_SHIFT on two's-complement)."""
    xb = cb - 128
    xr = cr - 128
    r = y + ((_FIX_140200 * xr + _HALF) >> _SCALE)
    g = y + ((-_FIX_034414 * xb + _HALF - _FIX_071414 * xr) >> _SCALE)
    b = y + ((_FIX_177200 * xb + _HALF) >> _SCALE)
    return jnp.stack([jnp.clip(r, 0, 255), jnp.clip(g, 0, 255),
                      jnp.clip(b, 0, 255)], axis=-1).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("hb", "wb", "H", "W"))
def decode_gray_impl(coef16, *, hb, wb, H, W):
    return coefs_to_plane(coef16, hb, wb, H, W).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("dims", "ws", "hs", "H", "W"))
def decode_ycc_impl(cy, ccb, ccr, *, dims, ws, hs, H, W):
    """Full YCbCr decode: 3 coefficient planes (quant=1) -> uint8
    RGB[H, W, 3].  dims = ((hb, wb, oh, ow) per component) with oh/ow
    the libjpeg downsampled dims ceil(image * samp / max_samp)."""
    (hby, wby, ohy, owy), (hbc, wbc, ohc, owc), (hbr, wbr, ohr, owr) = dims
    y = coefs_to_plane(cy, hby, wby, ohy, owy)[:H, :W]
    cb = fancy_upsample(
        coefs_to_plane(ccb, hbc, wbc, ohc, owc), ws, hs)[:H, :W]
    cr = fancy_upsample(
        coefs_to_plane(ccr, hbr, wbr, ohr, owr), ws, hs)[:H, :W]
    return ycc_to_rgb(y, cb, cr)
