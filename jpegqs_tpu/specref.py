"""NumPy specification of the jpeg-quantsmooth algorithm.

This module is the in-repo *specification*: a bit-exact transliteration of
the reference's scalar (SIMD=none) code paths, used as the oracle for the
JAX/Pallas engine.  Every function cites the reference lines it models
(paths into /root/reference).  It is vectorized over blocks/pixels only
where that provably cannot change results (independent lanes, exact
integer math, or strict left-fold accumulation via np.cumsum — verified
equivalent to sequential float32 accumulation in tests).

Ground-truth build: ``gcc -O2 -DNO_SIMD quantsmooth.c`` (reference
Makefile:35-36); all float32 operation order follows the scalar branches.
"""

from __future__ import annotations

import numpy as np

from .options import (DIAGONALS, JOINT_YUV, UPSAMPLE_UV, LOW_QUALITY,
                      NO_REBALANCE, NO_REBALANCE_UV, ITER_MAX)

F = np.float32
I32 = np.int32
DCTSIZE = 8
DCTSIZE2 = 64
CENTERJSAMPLE = 128
MAXJSAMPLE = 255
INT32_MIN = -(1 << 31)

# reference: idct.h:24-33
NATURAL_ORDER = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int32)

# reference: quantsmooth.h:313-322
ZIGZAG_REFRESH = np.array([
    1, 0, 1, 0, 1, 0, 1, 0,
    1, 0, 0, 0, 0, 0, 0, 1,
    0, 0, 0, 0, 0, 0, 0, 0,
    1, 0, 0, 0, 0, 0, 0, 1,
    0, 0, 0, 0, 0, 0, 0, 0,
    1, 0, 0, 0, 0, 0, 0, 1,
    0, 0, 0, 0, 0, 0, 0, 0,
    1, 0, 1, 0, 1, 0, 1, 1], dtype=np.int32)

# Number of terms in the per-coefficient weighted-LS accumulation, in the
# exact scalar order (quantsmooth.h:1527-1541): 56 horizontal diffs,
# 32 border diffs, 56 vertical diffs, 98 diagonal diffs.
N_TERMS_H = 56
N_TERMS_B = 32
N_TERMS_V = 56
N_TERMS_D = 98
N_TERMS = N_TERMS_H + N_TERMS_B + N_TERMS_V + N_TERMS_D  # 242


def roundf(x):
    """C roundf: round half away from zero, exactly.

    floor(x+0.5) is NOT correct at the boundary (x+0.5 can round up into
    the tie, e.g. x=0.49999997f).  Instead split x = trunc + frac — both
    exact in fp32 for |x| < 2^23 — and compare the fraction against 0.5.
    """
    x = np.asarray(x, dtype=F)
    t = np.trunc(x)
    f = x - t  # exact
    return (t + np.where(f >= F(0.5), F(1), F(0))
              - np.where(f <= F(-0.5), F(1), F(0))).astype(F)


# ---------------------------------------------------------------------------
# DCT kernels (reference: idct.h)
# ---------------------------------------------------------------------------

def _idct_float_pass(x):
    """One 8-point float IDCT butterfly, exact fp32 order (idct.h:568-592).

    x: sequence of 8 float32 arrays (lanes are vectorized, safe: each
    lane is an independent scalar evaluation of the same expression DAG).
    """
    z2 = x[2]; z3 = x[6]
    z1 = (z2 + z3) * F(0.541196100)
    t2 = z1 - z3 * F(1.847759065)
    t3 = z1 + z2 * F(0.765366865)
    z2 = x[0]; z3 = x[4]
    t0 = z2 + z3; t1 = z2 - z3
    t4 = t0 + t3; t7 = t0 - t3
    t5 = t1 + t2; t6 = t1 - t2
    t0 = x[7]; t1 = x[5]; t2 = x[3]; t3 = x[1]
    z1 = t0 + t3; z2 = t1 + t2
    z3 = t0 + t2; z4 = t1 + t3
    z5 = (z3 + z4) * F(1.175875602)
    t0 = t0 * F(0.298631336); t1 = t1 * F(2.053119869)
    t2 = t2 * F(3.072711026); t3 = t3 * F(1.501321110)
    z1 = z1 * F(0.899976223); z2 = z2 * F(2.562915447)
    z3 = z3 * F(1.961570560); z4 = z4 * F(0.390180644)
    z3 = z3 - z5
    t0 = t0 - (z1 + z3)
    t2 = t2 - (z2 + z3)
    z4 = z4 - z5
    t1 = t1 - (z2 + z4)
    t3 = t3 - (z1 + z4)
    return [t4 + t3, t5 + t2, t6 + t1, t7 + t0,
            t7 - t0, t6 - t1, t5 - t2, t4 - t3]


def idct_float(blocks):
    """Float IDCT, columns then rows, output scaled by 0.125
    (idct.h:565-604).  blocks: f32[..., 8, 8] -> f32[..., 8, 8]."""
    b = np.asarray(blocks, dtype=F)
    cols = _idct_float_pass([b[..., i, :] for i in range(8)])
    ws = np.stack(cols, axis=-2)  # [..., 8, 8]
    rows = _idct_float_pass([ws[..., :, i] for i in range(8)])
    out = np.stack([r * F(0.125) for r in rows], axis=-1)
    return out


def _fdct_float_pass(x, scale=None):
    """One 8-point float FDCT butterfly, exact fp32 order (idct.h:608-628)."""
    z1 = x[0]; z2 = x[7]; t0 = z1 + z2; t7 = z1 - z2
    z1 = x[1]; z2 = x[6]; t1 = z1 + z2; t6 = z1 - z2
    z1 = x[2]; z2 = x[5]; t2 = z1 + z2; t5 = z1 - z2
    z1 = x[3]; z2 = x[4]; t3 = z1 + z2; t4 = z1 - z2
    z1 = t0 + t3; z4 = t0 - t3
    z2 = t1 + t2; z3 = t1 - t2
    o0 = z1 + z2; o4 = z1 - z2
    z1 = (z3 + z4) * F(0.541196100)
    o2 = z1 + z4 * F(0.765366865)
    o6 = z1 - z3 * F(1.847759065)
    z1 = t4 + t7; z2 = t5 + t6
    z3 = t4 + t6; z4 = t5 + t7
    z5 = (z3 + z4) * F(1.175875602)
    t4 = t4 * F(0.298631336); t5 = t5 * F(2.053119869)
    t6 = t6 * F(3.072711026); t7 = t7 * F(1.501321110)
    z1 = z1 * F(0.899976223); z2 = z2 * F(2.562915447)
    z3 = z3 * F(1.961570560) - z5
    z4 = z4 * F(0.390180644) - z5
    o7 = t4 - (z1 + z3); o5 = t5 - (z2 + z4)
    o3 = t6 - (z2 + z3); o1 = t7 - (z1 + z4)
    out = [o0, o1, o2, o3, o4, o5, o6, o7]
    if scale is not None:
        out = [o * scale for o in out]
    return out


def fdct_float(blocks):
    """Float FDCT, columns then rows, output scaled by 0.125
    (idct.h:606-923, scalar branch 895-916)."""
    b = np.asarray(blocks, dtype=F)
    cols = _fdct_float_pass([b[..., i, :] for i in range(8)])
    ws = np.stack(cols, axis=-2)
    rows = _fdct_float_pass([ws[..., :, i] for i in range(8)], scale=F(0.125))
    return np.stack(rows, axis=-1)


def _idct_islow_pass1(x):
    """libjpeg islow IDCT even/odd butterfly, int32 (idct.h:59-89)."""
    z2 = x[2]; z3 = x[6]
    z1 = (z2 + z3) * I32(4433)          # FIX_0_541196100
    tmp2 = z1 - z3 * I32(15137)         # FIX_1_847759065
    tmp3 = z1 + z2 * I32(6270)          # FIX_0_765366865
    z2 = x[0]; z3 = x[4]
    tmp0 = (z2 + z3) << 13
    tmp1 = (z2 - z3) << 13
    tmp10 = tmp0 + tmp3; tmp13 = tmp0 - tmp3
    tmp11 = tmp1 + tmp2; tmp12 = tmp1 - tmp2
    tmp0 = x[7]; tmp1 = x[5]; tmp2 = x[3]; tmp3 = x[1]
    z1 = tmp0 + tmp3; z2 = tmp1 + tmp2
    z3 = tmp0 + tmp2; z4 = tmp1 + tmp3
    z5 = (z3 + z4) * I32(9633)          # FIX_1_175875602
    tmp0 = tmp0 * I32(2446)             # FIX_0_298631336
    tmp1 = tmp1 * I32(16819)            # FIX_2_053119869
    tmp2 = tmp2 * I32(25172)            # FIX_3_072711026
    tmp3 = tmp3 * I32(12299)            # FIX_1_501321110
    z1 = z1 * I32(7373)                 # FIX_0_899976223
    z2 = z2 * I32(20995)                # FIX_2_562915447
    z3 = z3 * I32(16069)                # FIX_1_961570560
    z4 = z4 * I32(3196)                 # FIX_0_390180644
    z3 = z5 - z3; z4 = z5 - z4
    tmp0 = tmp0 + (z3 - z1)
    tmp1 = tmp1 + (z4 - z2)
    tmp2 = tmp2 + (z3 - z2)
    tmp3 = tmp3 + (z4 - z1)
    return [tmp10 + tmp3, tmp11 + tmp2, tmp12 + tmp1, tmp13 + tmp0,
            tmp13 - tmp0, tmp12 - tmp1, tmp11 - tmp2, tmp10 - tmp3]


def _descale(x, n):
    """DESCALE (idct.h:54): round-to-nearest arithmetic shift."""
    return (x + (I32(1) << (n - 1))) >> n


def _range_clamp(tmp, n):
    """Output sample computation (idct.h:509-511): shift with +CENTER
    rounding bias, clamp to [0, 255]."""
    z1 = (tmp + (I32(257) << (n - 1))) >> n
    return np.clip(z1, 0, 255)


def idct_islow(coef):
    """libjpeg-exact integer IDCT: int coefficients -> uint8-range pixels.

    Reference: idct.h:468-539 (scalar branch).  The AC-all-zero shortcuts
    there are pure optimizations (provably equal to the full path given
    the DESCALE identities), so the full path is always evaluated.
    coef: int32[..., 8, 8] -> int32[..., 8, 8] in [0, 255].
    """
    c = np.asarray(coef, dtype=np.int32)
    cols = _idct_islow_pass1([c[..., i, :] for i in range(8)])
    ws = np.stack([_descale(v, 13 - 2) for v in cols], axis=-2)
    rows = _idct_islow_pass1([ws[..., :, i] for i in range(8)])
    out = np.stack([_range_clamp(v, 13 + 2 + 3) for v in rows], axis=-1)
    return out


# ---------------------------------------------------------------------------
# Quant magic tables and GET_ORIG_COEF (quantsmooth.h:324-341, 2497-2539)
# ---------------------------------------------------------------------------

def sanitize_quantval(qtbl):
    """Replace zero quantizers with 1 (quantsmooth.h:2508-2511)."""
    q = np.asarray(qtbl, dtype=np.int64)
    return (q - ((q - 1) >> 16)).astype(np.uint16)


def make_quantval192(qtbl):
    """Build the 192-entry quant table: [0:64] sanitized quantizers,
    [64:128] fixed-point reciprocals, [128:192] shifts
    (quantsmooth.h:2513-2539, non-NEON branch)."""
    out = np.zeros(192, dtype=np.uint16)
    q64 = sanitize_quantval(qtbl)
    out[:64] = q64
    for i in range(64):
        q = int(q64[i])
        n = q.bit_length() - 1
        x1 = (((0x10000 << n) + q - 1) // q) & 0xFFFFFFFF
        if n:
            x1 |= x1 >> 16
        x2 = (-0x8000 >> n) & 0xFFFF
        out[64 + i] = x1 & 0xFFFF
        out[128 + i] = x2
    return out


def _as_i16(v):
    """Reinterpret uint16 as int16 (C: (int16_t)quantval[...])."""
    return np.asarray(v, dtype=np.uint16).astype(np.int16).astype(np.int32)


def get_orig_coef(coef1, i, quantval):
    """Nearest dequantized lattice point a0 = round_half_away(c/q)*q via
    the fixed-point magic tables (quantsmooth.h:332-336, non-NEON)."""
    coef1 = np.asarray(coef1, dtype=np.int32)
    x1 = _as_i16(quantval[i + 64])
    qshr = _as_i16(quantval[i + 128])
    div = np.int32(quantval[i])
    a0 = ((x1 * coef1) >> 16) + coef1
    a0 = ((-a0) * qshr + 0x4000) >> 15
    return a0 * div


def _interval_clamp(add, a0, div):
    """Clamp ``add`` to the quantization interval around a0
    (quantsmooth.h:555-560): dh = a0 + (a0<0 ? d1 : d0),
    dl = a0 - (a0>0 ? d1 : d0) with d0=(div-1)>>1, d1=div>>1."""
    d0 = (div - 1) >> 1
    d1 = div >> 1
    dh = a0 + np.where(a0 < 0, d1, d0)
    dl = a0 - np.where(a0 > 0, d1, d0)
    return np.maximum(np.minimum(add, dh), dl)


def fdct_clamp(fbuf, coef, quantval):
    """FDCT + round + clamp-to-interval (quantsmooth.h:343-562, scalar
    551-561).  fbuf f32[B,8,8], coef int32[B,64] -> int32[B,64]."""
    buf = fdct_float(fbuf).reshape(fbuf.shape[:-2] + (64,))
    div = quantval[:64].astype(np.int32)
    a0 = get_orig_coef(coef, np.arange(64), quantval)
    add = np.trunc(roundf(buf)).astype(np.int32)
    return _interval_clamp(add, a0, div)


# ---------------------------------------------------------------------------
# Diff-basis tables (quantsmooth.h:251-301)
# ---------------------------------------------------------------------------

def make_solver_tables(flags):
    """Per-DCT-basis gradient tables, flattened to the exact scalar term
    order (56 h, 32 border, 56 v, 98 diag) -> f32[64, 242].

    Terms belonging to groups the scalar code skips for a coefficient
    (h-diffs when i has no horizontal frequency, v-diffs when i < 8,
    diagonals without the flag) are zero-weighted; a zero weight makes
    both accumulator contributions ±0.0f which cannot change a strict
    left fold (verified in tests).
    """
    bcoef = F(4.0) if flags & DIAGONALS else F(2.0)
    tw = np.zeros((64, N_TERMS), dtype=F)
    for i in range(64):
        unit = np.zeros((8, 8), dtype=F)
        unit[i // 8, i % 8] = F(1)
        b = idct_float(unit)
        h = (b[:, :7] - b[:, 1:]).reshape(-1)
        border = np.concatenate([b[0, :] * bcoef, b[7, :] * bcoef,
                                 b[:, 0] * bcoef, b[:, 7] * bcoef])
        v = (b[:7, :] - b[1:, :]).reshape(-1)
        d1 = b[:7, :7] - b[1:, 1:]
        d2 = b[:7, 1:] - b[1:, :7]
        diag = np.stack([d1, d2], axis=-1).reshape(-1)
        if not (i & 7):
            h = np.zeros_like(h)
        if i <= 7:
            v = np.zeros_like(v)
        if not (flags & DIAGONALS):
            diag = np.zeros_like(diag)
        tw[i] = np.concatenate([h, border, v, diag])
    return tw


def block_diffs(buf, borders):
    """Pixel-difference vector per block in scalar term order
    (quantsmooth.h:1521-1541).  buf int[B,8,8], borders int[B,4,8]
    (top,bottom,left,right lines adjacent to the block) -> f32[B,242]."""
    b = buf.astype(np.int32)
    h = (b[:, :, :7] - b[:, :, 1:]).reshape(b.shape[0], -1)
    bd = np.concatenate([
        b[:, 0, :] - borders[:, 0, :],
        b[:, 7, :] - borders[:, 1, :],
        b[:, :, 0] - borders[:, 2, :],
        b[:, :, 7] - borders[:, 3, :]], axis=1)
    v = (b[:, :7, :] - b[:, 1:, :]).reshape(b.shape[0], -1)
    d1 = b[:, :7, :7] - b[:, 1:, 1:]
    d2 = b[:, :7, 1:] - b[:, 1:, :7]
    diag = np.stack([d1, d2], axis=-1).reshape(b.shape[0], -1)
    return np.concatenate([h, bd, v, diag], axis=1).astype(F)


def _left_fold(terms):
    """Strict sequential float32 sum over the last axis (the scalar
    accumulation order).  np.cumsum float32 is a strict left fold."""
    return np.cumsum(terms, axis=-1, dtype=F)[..., -1]


# ---------------------------------------------------------------------------
# The per-block solver (quantsmooth.h:1396-1565 scalar branches)
# ---------------------------------------------------------------------------

def solve_blocks(coef, borders, quantval, flags, tables):
    """The k=63..1 reverse-zigzag coefficient sweep, batched over blocks.

    coef int32[B,64]; borders int32[B,4,8]; quantval uint16[192];
    tables f32[64,242].  Returns updated coef.
    Models quantsmooth.h:1403-1565 with the selective-refresh logic
    (zigzag_refresh, need_refresh) preserved per block.
    """
    B = coef.shape[0]
    coef = coef.copy()
    need = np.ones(B, dtype=bool)
    buf = np.zeros((B, 8, 8), dtype=np.int32)
    diffs = np.zeros((B, N_TERMS), dtype=F)
    for k in range(63, 0, -1):
        i = int(NATURAL_ORDER[k])
        if ZIGZAG_REFRESH[i]:
            if need.any():
                nb = idct_islow(coef[need].reshape(-1, 8, 8))
                buf[need] = nb
                diffs[need] = block_diffs(nb, borders[need])
                need[need] = False
        rng = int(quantval[i]) * 2
        t = F(rng) - np.abs(diffs)
        t = np.maximum(t, F(0))
        t = t * t
        u = diffs * t
        w = tables[i][None, :] * t
        a2 = _left_fold(u * w)
        a3 = _left_fold(w * w)
        with np.errstate(invalid="ignore", divide="ignore"):
            q = (a2 / a3).astype(F)
        # a3 == 0 => q is NaN; the scalar build's roundf(NaN)->int is
        # x86 cvttss2si = INT32_MIN, making `add` wrap very negative and
        # clamp to the interval's lower edge (quantsmooth.h:1548-1561).
        delta = np.where(np.isnan(q), np.int64(INT32_MIN),
                         np.trunc(roundf(np.nan_to_num(q))).astype(np.int64)
                         ).astype(np.int64)
        coef1 = coef[:, i].astype(np.int64)
        div = np.int32(quantval[i])
        a0 = get_orig_coef(coef[:, i], i, quantval)
        add = (coef1 - delta).astype(np.int64)
        # C int32 wraparound for the NaN case
        add = ((add + (1 << 31)) % (1 << 32) - (1 << 31)).astype(np.int32)
        add = _interval_clamp(add, a0, div)
        upd = delta != 0
        newc = np.where(upd, add, coef[:, i]).astype(np.int32)
        need |= newc != coef[:, i]
        coef[:, i] = newc
    return coef


def rebalance_blocks(coef, quantval):
    """Global AC energy restore (quantsmooth.h:1823-1848 scalar).
    coef int32[B,64] -> int32[B,64]; DC untouched."""
    coefs = coef.astype(np.int64)
    ks = np.arange(1, 64)
    a0 = get_orig_coef(coef[:, 1:], ks, quantval).astype(np.int64)
    m0 = np.sum(coefs[:, 1:] * a0, axis=1)
    m1 = np.sum(a0 * a0, axis=1)
    do = m1 > m0
    # mul = ((m1 << 13) + (m0 >> 1)) / m0, int64 C division (trunc toward 0)
    num = (m1 << 13) + (m0 >> 1)
    safe_m0 = np.where(m0 == 0, 1, m0)
    mul64 = (np.sign(num) * np.sign(safe_m0)) * (np.abs(num) // np.abs(safe_m0))
    # truncation to C int (quantsmooth.h:1833: `int mul = ...`)
    mul = ((mul64 + (1 << 31)) % (1 << 32) - (1 << 31)).astype(np.int64)
    prod = coefs[:, 1:] * mul[:, None]
    prod = ((prod + (1 << 31)) % (1 << 32) - (1 << 31)).astype(np.int64)  # int32 wrap
    add = ((prod + 0x1000) >> 13).astype(np.int32)
    div = quantval[1:64].astype(np.int32)
    add = _interval_clamp(add, a0.astype(np.int32), div)
    out = coef.copy()
    out[:, 1:] = np.where(do[:, None], add, coef[:, 1:])
    return out


# ---------------------------------------------------------------------------
# JOINT_YUV and LOW_QUALITY block paths (plane-wide formulations)
# ---------------------------------------------------------------------------

_W3x3 = np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], dtype=np.int64)


def _conv3x3(padded, weights=_W3x3):
    """Weighted 3x3 sums over all interior pixels of a padded plane.
    Integer math: order-independent, exact."""
    H, W = padded.shape[0] - 2, padded.shape[1] - 2
    out = np.zeros((H, W), dtype=np.int64)
    for dy in range(3):
        for dx in range(3):
            out += weights[dy, dx] * padded[dy:dy + H, dx:dx + W].astype(np.int64)
    return out


def joint_yuv_fbuf(padded_img, padded_img2):
    """Chroma-on-luma 3x3 local linear regression, per pixel
    (quantsmooth.h:893-919 scalar).  Inputs: padded (+1px) int planes,
    image = chroma, image2 = downsampled luma.  Returns f32 plane [H,W]
    ready for fdct_clamp."""
    a = padded_img2.astype(np.int64)
    b = padded_img.astype(np.int64)
    H, W = a.shape[0] - 2, a.shape[1] - 2
    sumA = _conv3x3(a)
    sumB = _conv3x3(b)
    sumAA = _conv3x3_prod(a, a)
    sumAB = _conv3x3_prod(a, b)
    sAA = (sumAA * 16 - sumA * sumA).astype(np.int32)
    sAB = (sumAB * 16 - sumA * sumB).astype(np.int32)
    with np.errstate(invalid="ignore", divide="ignore"):
        scale = np.where(sAA != 0,
                         (sAB.astype(F) / sAA.astype(F)).astype(F), F(0))
    scale = np.minimum(np.maximum(scale, F(-16.0)), F(16.0))
    center2 = a[1:H + 1, 1:W + 1]
    av = ((center2 * 16 - sumA).astype(F) * scale + sumB.astype(F)) * F(1.0 / 16)
    av = np.maximum(av, F(0)) - F(CENTERJSAMPLE)
    return np.minimum(av, F(CENTERJSAMPLE))


def _conv3x3_prod(pa, pb):
    H, W = pa.shape[0] - 2, pa.shape[1] - 2
    out = np.zeros((H, W), dtype=np.int64)
    for dy in range(3):
        for dx in range(3):
            out += _W3x3[dy, dx] * (pa[dy:dy + H, dx:dx + W] *
                                    pb[dy:dy + H, dx:dx + W])
    return out


def low_quality_range(coef, quantval):
    """Data-adaptive range estimate per block (quantsmooth.h:929-938).
    coef int32[B,64] -> f32[B] (already roundf'd)."""
    a = np.abs(coef[:, 1:]).astype(np.int32)
    prod = (quantval[1:64].astype(np.int32) * a).astype(np.int32)
    # strict sequential float32 accumulation over x=1..63
    rangef = _left_fold(prod.astype(F))
    s = np.sum(a.astype(np.int64), axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        mul = (F(4.0) / s.astype(F)).astype(F)
        rangef = np.where(s != 0, rangef * mul, rangef)
    rangef = np.minimum(rangef, F(CENTERJSAMPLE))
    return roundf(rangef)


# 8-neighbor order and weights of the LQ shrink (quantsmooth.h:1164-1171):
# (dx,dy,weight-index): c1 diag / c0 axis, scalar source order.
_LQ_NEIGHBORS = [(-1, -1, 1), (0, -1, 0), (1, -1, 1),
                 (-1, 0, 0), (1, 0, 0),
                 (-1, 1, 1), (0, 1, 0), (1, 1, 1)]


def low_quality_fbuf(padded_img, range_map):
    """3x3 weighted gradient shrink (quantsmooth.h:1161-1175 scalar).
    padded_img: int plane (+1px pad); range_map f32[H,W] per-pixel range
    (constant within each block).  Returns f32[H,W] for fdct_clamp."""
    p = padded_img.astype(np.int32)
    H, W = p.shape[0] - 2, p.shape[1] - 2
    c0 = F(2.0)
    c1 = F(c0 * np.sqrt(F(0.5)))
    cw = [c0, c1]
    a = p[1:H + 1, 1:W + 1]
    a0 = np.zeros((H, W), dtype=F)
    an = np.zeros((H, W), dtype=F)
    for dx, dy, wi in _LQ_NEIGHBORS:
        nb = p[1 + dy:1 + dy + H, 1 + dx:1 + dx + W]
        t0 = (a - nb).astype(F)
        t = range_map - np.abs(t0)
        t = np.maximum(t, F(0))
        t = t * t
        aw = cw[wi] * t
        a0 = a0 + (t0 * t) * aw
        an = an + aw * aw
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = (a0 / an).astype(F)
        shifted = a.astype(F) - corr
        newa = np.where(an > F(0),
                        np.trunc(np.nan_to_num(shifted)).astype(np.int32), a)
    return (newa - CENTERJSAMPLE).astype(F)


# ---------------------------------------------------------------------------
# Plane helpers
# ---------------------------------------------------------------------------

def blocks_to_plane(pix_blocks, hb, wb):
    """int32[B,8,8] -> padded plane int32[hb*8+2, wb*8+2] with 1px
    replicated border (quantsmooth.h:2612-2620)."""
    interior = pix_blocks.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3)
    interior = interior.reshape(hb * 8, wb * 8)
    return np.pad(interior, 1, mode="edge")


def plane_block_borders(padded, hb, wb):
    """Extract the 4 border lines adjacent to each block from the padded
    plane (quantsmooth.h:1396-1401): top,bottom,left,right -> [B,4,8]."""
    H, W = hb * 8, wb * 8
    top = padded[0:H:8, 1:W + 1].reshape(hb, 1, wb, 8)
    bot = padded[9:H + 2:8, 1:W + 1].reshape(hb, 1, wb, 8)
    left = padded[1:H + 1, 0:W:8].reshape(hb, 8, wb, 1)
    right = padded[1:H + 1, 9:W + 2:8].reshape(hb, 8, wb, 1)
    top = top.transpose(0, 2, 1, 3).reshape(hb * wb, 8)
    bot = bot.transpose(0, 2, 1, 3).reshape(hb * wb, 8)
    left = left.transpose(0, 2, 3, 1).reshape(hb * wb, 8)
    right = right.transpose(0, 2, 3, 1).reshape(hb * wb, 8)
    return np.stack([top, bot, left, right], axis=1).astype(np.int32)


def plane_to_blocks(padded, hb, wb):
    """Interior of a padded plane -> [B,8,8] blocks."""
    H, W = hb * 8, wb * 8
    interior = padded[1:H + 1, 1:W + 1]
    return interior.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(
        hb * wb, 8, 8)


def downsample_plane(padded_luma, hb_l, wb_l, hb_c, wb_c, ws, hs):
    """Box-downsample the luma plane for JOINT_YUV
    (quantsmooth.h:2753-2813).  Returns padded (+1px) chroma-size plane."""
    H, W = hb_l * 8, wb_l * 8
    interior = padded_luma[1:H + 1, 1:W + 1].astype(np.int64)
    w1 = (W + ws - 1) // ws
    h1 = (H + hs - 1) // hs
    wc, hc = wb_c * 8, hb_c * 8
    out = np.zeros((hc + 2, wc + 2), dtype=np.int32)
    if ws == 2 and hs == 2:
        # fast path (quantsmooth.h:2778-2785): (a+2)>>2
        a = (interior[0:h1 * 2:2, 0:w1 * 2:2] + interior[0:h1 * 2:2, 1:w1 * 2:2]
             + interior[1:h1 * 2:2, 0:w1 * 2:2] + interior[1:h1 * 2:2, 1:w1 * 2:2])
        out[1:h1 + 1, 1:w1 + 1] = (a + 2) >> 2
    else:
        for y in range(h1):
            h2 = min(hs, H - y * hs)
            for x in range(w1):
                w2 = min(ws, W - x * ws)
                div = w2 * h2
                s = int(interior[y * hs:y * hs + h2, x * ws:x * ws + w2].sum())
                out[y + 1, x + 1] = (s + div // 2) // div
    # replicate (quantsmooth.h:2805-2813): left col, right cols from w1,
    # then top row, bottom rows from h1
    out[1:h1 + 1, 0] = out[1:h1 + 1, 1]
    out[1:h1 + 1, w1 + 1:] = out[1:h1 + 1, w1:w1 + 1]
    out[0, :] = out[1, :]
    out[h1 + 1:, :] = out[h1, :][None, :]
    return out


def upsample_chroma(padded_chroma, padded_luma_ds, padded_luma,
                    img_w, img_h, ws, hs, hb_l, wb_l):
    """Luma-guided non-blurring chroma upsample (quantsmooth.h:1851-2394,
    2691-2752).  Returns full-res chroma pixel plane int32[hh, ww]."""
    w1 = (img_w + ws - 1) // ws
    h1 = (img_h + hs - 1) // hs
    ww, hh = wb_l * 8, hb_l * 8
    w1c = ((w1 + 7) // 8) * 8  # processed in chunks of 8 columns

    # regression scale per low-res pixel over [h1, w1c]
    a = padded_luma_ds.astype(np.int64)
    b = padded_chroma.astype(np.int64)
    sumA = _conv3x3(a)[:h1, :w1c]
    sumB = _conv3x3(b)[:h1, :w1c]
    sumAA = _conv3x3_prod(a, a)[:h1, :w1c]
    sumAB = _conv3x3_prod(a, b)[:h1, :w1c]
    sAA = (sumAA * 16 - sumA * sumA).astype(np.int32)
    sAB = (sumAB * 16 - sumA * sumB).astype(np.int32)
    with np.errstate(invalid="ignore", divide="ignore"):
        scale = np.where(sAA != 0,
                         (sAB.astype(F) / sAA.astype(F)).astype(F), F(0))
    scale = np.minimum(np.maximum(scale, F(-16.0)), F(16.0))
    # offset = chroma - luma_ds*scale + 0.5 (quantsmooth.h:2367)
    imc = padded_chroma[1:h1 + 1, 1:w1c + 1].astype(F)
    iml = padded_luma_ds[1:h1 + 1, 1:w1c + 1].astype(F)
    offset = imc - iml * scale + F(0.5)

    # out = luma_hi * scale + offset, truncated then clamped
    # (quantsmooth.h:2379-2388)
    lum = np.zeros((h1 * hs, w1c * ws), dtype=F)
    lum_src = padded_luma[1:, 1:].astype(F)
    lum[:min(h1 * hs, lum_src.shape[0]), :min(w1c * ws, lum_src.shape[1])] = \
        lum_src[:min(h1 * hs, lum_src.shape[0]), :min(w1c * ws, lum_src.shape[1])]
    scale_hi = np.kron(scale, np.ones((hs, ws), dtype=F))
    offset_hi = np.kron(offset, np.ones((hs, ws), dtype=F))
    val = lum * scale_hi + offset_hi
    out_full = np.clip(np.trunc(val), 0, MAXJSAMPLE).astype(np.int32)

    out = np.zeros((hh, ww), dtype=np.int32)
    h_lim = min(h1 * hs, hh)
    w_lim = min(w1c * ws, ww)
    out[:h_lim, :w_lim] = out_full[:h_lim, :w_lim]
    # Right-edge replicate from col w1*ws-1 (quantsmooth.h:2390-2393).
    # Reference quirk: upsample_row decrements y1 by y0 before this loop
    # (quantsmooth.h:1861), so `yy < y1*hs` is non-empty only for the
    # first 8-row chunk — rows beyond min(8,h1)*hs keep the values
    # computed from the out-of-image scale/offset region.
    if w1 * ws < ww:
        rep_rows = min(min(8, h1) * hs, h_lim)
        out[:rep_rows, w1 * ws:] = out[:rep_rows, w1 * ws - 1:w1 * ws]
    # bottom replicate from row h1*hs-1 (quantsmooth.h:2729-2730)
    if h1 * hs < hh:
        out[h1 * hs:, :] = out[h1 * hs - 1, :][None, :]
    return out


# ---------------------------------------------------------------------------
# Per-component block pass
# ---------------------------------------------------------------------------

def quantsmooth_block_pass(coef, padded, padded2, quantval, flags, tables, luma):
    """One smoothing pass over all blocks of a component
    (quantsmooth.h:564-1848 dispatch; driver loop 2627-2651).

    coef int32[B,64]; padded: component pixel plane (+1px pad);
    padded2: downsampled-luma plane or None.
    """
    hbwb = coef.shape[0]
    hb = (padded.shape[0] - 2) // 8
    wb = (padded.shape[1] - 2) // 8
    assert hb * wb == hbwb
    coef = coef.copy()

    if padded2 is not None:
        fplane = joint_yuv_fbuf(padded, padded2)
        fblocks = fplane.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(
            hbwb, 8, 8)
        coef = fdct_clamp(fblocks, coef, quantval)

    if flags & LOW_QUALITY:
        if padded2 is None:
            rng = low_quality_range(coef, quantval)
            range_map = np.repeat(np.repeat(rng.reshape(hb, wb), 8, 0), 8, 1)
            fplane = low_quality_fbuf(padded, range_map)
            fblocks = fplane.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3)
            coef = fdct_clamp(fblocks.reshape(hbwb, 8, 8), coef, quantval)
    else:
        borders = plane_block_borders(padded, hb, wb)
        coef = solve_blocks(coef, borders, quantval, flags, tables)

    if flags & NO_REBALANCE:
        return coef
    if not luma and flags & NO_REBALANCE_UV:
        return coef
    return rebalance_blocks(coef, quantval)


# ---------------------------------------------------------------------------
# Driver (quantsmooth.h:2404-2878)
# ---------------------------------------------------------------------------

class SpecResult:
    def __init__(self):
        self.coefs = []          # per-component int16 [hb, wb, 64]
        self.upsampled = None    # (cb, cr) int16 at luma dims, or None
        self.stop = 0


def do_quantsmooth(img, opts) -> SpecResult:
    """NumPy spec of do_quantsmooth (quantsmooth.h:2404-2878).

    ``img`` is a host.jpegio.JpegImage.  Returns the transformed
    (dequantized, quant=1) coefficient planes.
    """
    res = SpecResult()
    comps = img.components
    res.coefs = [c.coefs.astype(np.int32).copy() for c in comps]

    need_downsample = False
    if (opts.flags & (JOINT_YUV | UPSAMPLE_UV) and img.is_ycbcr
            and len(comps) >= 3
            and comps[1].h_samp_factor == 1 and comps[1].v_samp_factor == 1
            and comps[2].h_samp_factor == 1 and comps[2].v_samp_factor == 1):
        need_downsample = True

    num_iter = min(max(opts.niter, 0), ITER_MAX)
    if num_iter <= 0 and not (opts.flags & UPSAMPLE_UV and need_downsample):
        res.coefs = [c.coefs.copy() for c in comps]
        return res

    tables = None
    if not (opts.flags & LOW_QUALITY):
        tables = make_solver_tables(opts.flags)

    stop = 0
    image1 = None  # full-res luma padded plane (UPSAMPLE_UV)
    image2 = None  # downsampled luma padded plane (JOINT_YUV)
    up_planes = {}

    for ci, comp in enumerate(comps):
        qraw = comp.quantval.astype(np.int32)
        if not qraw.any():
            continue  # no quant table
        hb, wb = comp.height_in_blocks, comp.width_in_blocks
        coef = res.coefs[ci].reshape(hb * wb, 64)

        extra_refresh = 1 if (image1 is not None or (ci == 0 and need_downsample)) else 0
        num_iter2 = num_iter

        val = 0
        for v in qraw:
            val |= int(v)
        if val <= 1:
            num_iter2 = 0          # already processed (quantsmooth.h:2500-2501)
        if val >= 0x800:
            stop = 1               # crafted/damaged file (quantsmooth.h:2502-2504)
        quantval = make_quantval192(qraw)

        if num_iter2 + extra_refresh == 0:
            continue
        if stop:
            # dequant-only fallback (quantsmooth.h:2551-2566)
            res.coefs[ci] = dequant_int16(coef, qraw).reshape(hb, wb, 64)
            continue

        padded = None
        luma = (ci == 0) or not img.is_ycbcr
        for it in range(num_iter2 + extra_refresh):
            if it == 0:
                # C computes coef*quant in (wrapping) int32 and stores into
                # int16; the guard ORs (tmp + 0x800) over the int32 values
                # (quantsmooth.h:2596-2602).
                prod32 = coef.astype(np.int32) * qraw[None, :].astype(np.int32)
                orv = int(np.bitwise_or.reduce((prod32 + np.int32(0x800)).ravel()))
                badv = (orv >> 12) != 0
                coef = ((prod32.astype(np.int64) + (1 << 15)) % (1 << 16)
                        - (1 << 15)).astype(np.int32)
                if badv:
                    pix = idct_islow(coef.reshape(-1, 8, 8))
                    padded = blocks_to_plane(pix, hb, wb)
                    stop = 1
                    break
            pix = idct_islow(coef.reshape(-1, 8, 8))
            padded = blocks_to_plane(pix, hb, wb)
            if it == num_iter2:
                break
            p2 = image2 if (image2 is not None
                            and opts.flags & JOINT_YUV) else None
            coef = quantsmooth_block_pass(coef, padded, p2, quantval,
                                          opts.flags, tables, luma)

        # final coefficient clamp ±1023 (quantsmooth.h:2668-2689)
        coef = np.clip(coef, -1023, 1023).astype(np.int32)
        res.coefs[ci] = coef.reshape(hb, wb, 64)

        if not stop and image1 is not None:
            # UPSAMPLE_UV path for this chroma component
            ws = comps[0].h_samp_factor
            hs = comps[0].v_samp_factor
            mem = upsample_chroma(padded, image2, image1,
                                  img.width, img.height, ws, hs,
                                  comps[0].height_in_blocks,
                                  comps[0].width_in_blocks)
            hbl, wbl = comps[0].height_in_blocks, comps[0].width_in_blocks
            blocks = mem.reshape(hbl, 8, wbl, 8).transpose(0, 2, 1, 3)
            fb = (blocks.astype(np.int32) - CENTERJSAMPLE).astype(F)
            out = fdct_float(fb).reshape(hbl, wbl, 64)
            up_planes[ci] = np.trunc(roundf(out)).astype(np.int16)
        elif not stop and ci == 0 and need_downsample:
            ws = comp.h_samp_factor
            hs = comp.v_samp_factor
            if ws == 1 and hs == 1:
                image2 = padded
            else:
                if opts.flags & UPSAMPLE_UV:
                    image1 = padded
                image2 = downsample_plane(padded, hb, wb,
                                          comps[1].height_in_blocks,
                                          comps[1].width_in_blocks, ws, hs)

    if stop:
        image1 = None
    if image1 is not None and 1 in up_planes and 2 in up_planes:
        res.upsampled = (up_planes[1], up_planes[2])
    res.coefs = [c.astype(np.int16) for c in res.coefs]
    res.stop = stop
    return res


def dequant_int16(coef, qraw):
    """Dequantize with int16 storage truncation (quantsmooth.h:2560-2563)."""
    prod = coef.astype(np.int64) * qraw[None, :].astype(np.int64)
    return ((prod + (1 << 15)) % (1 << 16) - (1 << 15)).astype(np.int16)
