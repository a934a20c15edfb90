"""Pallas TPU kernel: the per-block coefficient solver + rebalance.

This is THE hot kernel (SURVEY.md §7 step 4): the k=63..1 reverse-
zigzag sweep of quantsmooth_block (reference: quantsmooth.h:1403-1565)
fused with the AC rebalance (1823-1848), gridded over tiles of
8x128 = 1024 blocks.  All per-tile state (pixel diffs, weights) lives
in VMEM — the XLA fallback materializes ~[242, B] temporaries to HBM
per coefficient step, which is the single biggest cost of the jnp
path.

Layout per tile: leading axis = natural position / diff term, minor
axes = (8 sublanes, 128 lanes) of independent blocks.  All butterflies
and diff constructions are static leading-axis slices, so every vector
op runs on full (8, 128) vregs.  The per-(i, term) diff-basis weights
are scalar-prefetched (SMEM) and broadcast per term row.

Bit-exactness: identical integer ops; fp32 products/folds in the exact
scalar order.  Guarded against compiler re-association the same way as
ops/fp32.py — every fp32 result is XOR-fenced with a runtime-zero
scalar so mul+add chains cannot be contracted into FMAs.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..specref import NATURAL_ORDER, ZIGZAG_REFRESH, make_solver_tables
from ..options import DIAGONALS
from . import fp32

F = jnp.float32
I32 = jnp.int32
INT32_MIN = -(1 << 31)
_TWO31F = np.float32(2147483648.0)

TILE_BLOCKS = 8 * 128  # blocks per grid step

_I_SEQ = NATURAL_ORDER[63:0:-1].astype(np.int32)            # [63]
_REFRESH_SEQ = ZIGZAG_REFRESH[_I_SEQ].astype(np.int32)      # [63]


def _make_groups():
    """Refresh groups of the k=63..1 sweep.

    Between two zigzag_refresh points no pixel state changes, so the
    coefficient steps inside one interval are mutually independent:
    their a2/a3 folds read the same frozen diffs and each writes only
    its own coefficient row (reference: quantsmooth.h:1403-1564 —
    coupling is solely through the idct refresh at 1407-1409).  Running
    a group's accumulations as independent chains preserves each
    chain's exact fold order (bit-exactness) while giving the VPU
    group-many independent dependency chains instead of one.
    """
    groups, cur = [], []
    for k in range(63):
        if _REFRESH_SEQ[k] and cur:
            groups.append(tuple(cur))
            cur = []
        cur.append(int(_I_SEQ[k]))
    groups.append(tuple(cur))
    return tuple(groups)


_GROUPS = _make_groups()   # 14 groups, sizes 1..8; each starts a refresh


def use_pallas() -> bool:
    """Use the Pallas kernel on TPU (override: JPEGQS_PALLAS=0/1)."""
    import os
    env = os.environ.get("JPEGQS_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "tpu"


def _nt_for(flags: int) -> int:
    # Without DIAGONALS the 98 diagonal terms have zero weight; a
    # zero-weight term contributes +-0.0f to both accumulators, which
    # cannot change the fold (see ops/planar.py), so they are omitted.
    return 242 if (flags & DIAGONALS) else 144


def _round_up(x, m):
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# In-kernel helpers (jnp on values; fp32 results XOR-fenced)
# ---------------------------------------------------------------------------

def _mkfence(tok, fenced):
    if not fenced:
        return lambda x: x

    def fence(x):
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.int32) ^ tok, F)
    return fence


def _idct_pass1(x):
    """libjpeg islow butterfly on int32 values (reference: idct.h:59-89)."""
    z2 = x[2]; z3 = x[6]
    z1 = (z2 + z3) * 4433
    tmp2 = z1 - z3 * 15137
    tmp3 = z1 + z2 * 6270
    z2 = x[0]; z3 = x[4]
    tmp0 = (z2 + z3) << 13
    tmp1 = (z2 - z3) << 13
    tmp10 = tmp0 + tmp3; tmp13 = tmp0 - tmp3
    tmp11 = tmp1 + tmp2; tmp12 = tmp1 - tmp2
    tmp0 = x[7]; tmp1 = x[5]; tmp2 = x[3]; tmp3 = x[1]
    z1 = tmp0 + tmp3; z2 = tmp1 + tmp2
    z3 = tmp0 + tmp2; z4 = tmp1 + tmp3
    z5 = (z3 + z4) * 9633
    tmp0 = tmp0 * 2446
    tmp1 = tmp1 * 16819
    tmp2 = tmp2 * 25172
    tmp3 = tmp3 * 12299
    z1 = z1 * 7373
    z2 = z2 * 20995
    z3 = z3 * 16069
    z4 = z4 * 3196
    z3 = z5 - z3; z4 = z5 - z4
    tmp0 = tmp0 + (z3 - z1)
    tmp1 = tmp1 + (z4 - z2)
    tmp2 = tmp2 + (z3 - z2)
    tmp3 = tmp3 + (z4 - z1)
    return [tmp10 + tmp3, tmp11 + tmp2, tmp12 + tmp1, tmp13 + tmp0,
            tmp13 - tmp0, tmp12 - tmp1, tmp11 - tmp2, tmp10 - tmp3]


def _idct_tile(coef):
    """int32[64, 8, 128] coef -> int32[8, 8, 8, 128] pixels (r, c, s, l)
    (reference: idct.h:468-539, full path)."""
    c4 = coef.reshape(8, 8, 8, 128)
    cols = _idct_pass1([c4[i] for i in range(8)])
    ws = jnp.stack([(v + (1 << 10)) >> 11 for v in cols])     # DESCALE 13-2
    rows = _idct_pass1([ws[:, i] for i in range(8)])
    pix = jnp.stack([jnp.clip((v + (257 << 17)) >> 18, 0, 255)
                     for v in rows], axis=1)
    return pix


def _diffs_tile(pix, bord, nt):
    """Diff terms in scalar fold order: int32[NT, 8, 128]
    (reference: quantsmooth.h:1521-1541).  bord int32[32, 8, 128] is
    (top, bottom, left, right) x 8 lines."""
    b = pix
    h = (b[:, :7] - b[:, 1:]).reshape(56, 8, 128)
    bt, bb = bord[0:8], bord[8:16]
    bl, br = bord[16:24], bord[24:32]
    bd = jnp.concatenate([b[0] - bt, b[7] - bb,
                          b[:, 0] - bl, b[:, 7] - br])
    v = (b[:7] - b[1:]).reshape(56, 8, 128)
    parts = [h, bd, v]
    if nt == 242:
        d1 = b[:7, :7] - b[1:, 1:]
        d2 = b[:7, 1:] - b[1:, :7]
        parts.append(jnp.stack([d1, d2], axis=2).reshape(98, 8, 128))
    return jnp.concatenate(parts)


def _roundf(x, fence):
    t = jnp.trunc(x)
    f = x - t  # exact (Sterbenz)
    return fence(fence(t + jnp.where(f >= F(0.5), F(1), F(0)))
                 - jnp.where(f <= F(-0.5), F(1), F(0)))


def _c_f32_to_i32(x):
    t = jnp.trunc(x)
    in_range = (t >= -_TWO31F) & (t < _TWO31F)
    safe = jnp.where(in_range, t, F(0))
    return jnp.where(in_range, safe.astype(I32), I32(INT32_MIN))


def _orig_coef(c, div, x1, qshr):
    a0 = ((x1 * c) >> 16) + c
    a0 = ((-a0) * qshr + 0x4000) >> 15
    return a0 * div


def _interval_clamp(add, a0, div):
    d0 = (div - 1) >> 1
    d1 = div >> 1
    dh = a0 + jnp.where(a0 < 0, d1, d0)
    dl = a0 - jnp.where(a0 > 0, d1, d0)
    return jnp.maximum(jnp.minimum(add, dh), dl)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _solve_kernel(nt, ntp, do_rebalance, fenced,
                  div_ref, x1_ref, qshr_ref, tab_ref, fence_ref,
                  coef_ref, bord_ref, out_ref,
                  diffs_ref, absd_ref, need_ref):
    fence = _mkfence(fence_ref[0], fenced)
    out_ref[...] = coef_ref[...]
    need_ref[...] = jnp.ones((8, 128), I32)

    for g_is in _GROUPS:
        # refresh — every group opens one (zigzag_refresh); per-lane
        # masked: lanes whose coefs did not change keep their diffs
        pix = _idct_tile(out_ref[...])
        dd = _diffs_tile(pix, bord_ref[...], nt).astype(F)
        if ntp != nt:
            dd = jnp.concatenate([dd, jnp.zeros((ntp - nt, 8, 128), F)])
        sel = (need_ref[...] != 0)[None]
        diffs_ref[...] = jnp.where(sel, dd, diffs_ref[...])
        absd_ref[...] = jnp.where(sel, jnp.abs(dd), absd_ref[...])
        need_ref[...] = jnp.zeros((8, 128), I32)

        m = len(g_is)
        rngs = [(div_ref[i] * 2).astype(F) for i in g_is]

        def chunk(c, carry, g_is=g_is, rngs=rngs):
            d = diffs_ref[pl.ds(c * 8, 8)]                  # [8, 8, 128]
            ad = absd_ref[pl.ds(c * 8, 8)]
            out = []
            for x, i in enumerate(g_is):
                a2, a3 = carry[2 * x], carry[2 * x + 1]
                t = jnp.maximum(rngs[x] - ad, F(0))         # integral: exact
                t = t * t                                   # < 2^24: exact
                u = fence(d * t)
                base = i * ntp + c * 8
                for j in range(8):
                    tb = tab_ref[base + j]                  # SMEM scalar
                    w = fence(tb * t[j])
                    a2 = fence(a2 + fence(u[j] * w))
                    a3 = fence(a3 + fence(w * w))
                out += [a2, a3]
            return tuple(out)

        zero = jnp.zeros((8, 128), F)
        accs = jax.lax.fori_loop(0, ntp // 8, chunk, (zero,) * (2 * m))

        need = need_ref[...]
        for x, i in enumerate(g_is):
            a2, a3 = accs[2 * x], accs[2 * x + 1]
            # TPU's divider is ~2 ulp; the reference divss is IEEE-exact
            q = fp32.exact_divide(a2, a3, fence if fenced else None)
            delta = _c_f32_to_i32(_roundf(fence(q), fence))
            coef1 = out_ref[i]
            div_i = div_ref[i]
            a0 = _orig_coef(coef1, div_i, x1_ref[i], qshr_ref[i])
            add = _interval_clamp(coef1 - delta, a0, div_i)
            newc = jnp.where(delta != 0, add, coef1)
            need = need | (newc != coef1).astype(I32)
            out_ref[i] = newc
        need_ref[...] = need

    if do_rebalance:
        # AC energy restore (quantsmooth.h:1823-1848); int64 emulated
        # as radix-2^16 pairs exactly as in ops/rebalance.py.
        def norm(hi, lo):
            cc = lo >> 16
            return hi + cc, lo - (cc << 16)

        def pair_ge(ah, al, bh, bl):
            return (ah > bh) | ((ah == bh) & (al >= bl))

        def racc(r, carry):
            m0h, m0l, m1h, m1l = carry
            c1 = out_ref[pl.ds(r, 1)][0]
            a0 = _orig_coef(c1, div_ref[r], x1_ref[r], qshr_ref[r])
            t0 = c1 * a0
            t1 = a0 * a0
            return (m0h + (t0 >> 16), m0l + (t0 & 0xFFFF),
                    m1h + (t1 >> 16), m1l + (t1 & 0xFFFF))

        z = jnp.zeros((8, 128), I32)
        m0h, m0l, m1h, m1l = jax.lax.fori_loop(1, 64, racc, (z, z, z, z))
        m0h, m0l = norm(m0h, m0l)
        m1h, m1l = norm(m1h, m1l)
        do = ~pair_ge(m0h, m0l, m1h, m1l)
        zm = (m0h == 0) & (m0l == 0)
        m0l = jnp.where(zm, I32(1), m0l)
        t2h, t2l = norm(m0h << 1, m0l << 1)
        qq2 = pair_ge(m1h, m1l, t2h, t2l)
        qh = jnp.where(qq2, t2h, m0h)
        ql = jnp.where(qq2, t2l, m0l)
        rrh, rrl = norm(m1h - qh, m1l - ql)
        q2 = z
        remh, reml = rrh, rrl
        for _ in range(13):
            remh, reml = norm(remh << 1, reml << 1)
            ge = pair_ge(remh, reml, m0h, m0l)
            sh, sl = norm(remh - m0h, reml - m0l)
            remh = jnp.where(ge, sh, remh)
            reml = jnp.where(ge, sl, reml)
            q2 = (q2 << 1) + ge.astype(I32)
        hh, hl = m0h >> 1, ((m0h & 1) << 15) | (m0l >> 1)
        fh, fl = norm(remh + hh, reml + hl)
        adj = pair_ge(fh, fl, m0h, m0l).astype(I32)
        mul = (jnp.where(qq2, I32(2), I32(1)) << 13) + q2 + adj

        def rupd(r, _):
            c1 = out_ref[pl.ds(r, 1)][0]
            a0 = _orig_coef(c1, div_ref[r], x1_ref[r], qshr_ref[r])
            add = (c1 * mul + 0x1000) >> 13
            add = _interval_clamp(add, a0, div_ref[r])
            out_ref[pl.ds(r, 1)] = jnp.where(do, add, c1)[None]
            return 0

        jax.lax.fori_loop(1, 64, rupd, 0)


@functools.partial(jax.jit, static_argnames=("flags", "do_rebalance",
                                             "interpret", "fenced"))
def _solve_tiled(coef_t, bord_t, div, x1, qshr, fence, *, flags,
                 do_rebalance, interpret, fenced):
    g = coef_t.shape[0]
    nt = _nt_for(flags)
    ntp = _round_up(nt, 8)
    tabf = np.zeros((64, ntp), dtype=np.float32)
    tabf[:, :nt] = make_solver_tables(flags)[:, :nt]
    kernel = functools.partial(_solve_kernel, nt, ntp, do_rebalance, fenced)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 64, 8, 128), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 32, 8, 128), lambda i, *_: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 64, 8, 128), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((ntp, 8, 128), F),
            pltpu.VMEM((ntp, 8, 128), F),
            pltpu.VMEM((8, 128), I32),
        ],
    )

    def kern(div_s, x1_s, qshr_s, tab_s, fence_s,
             coef_ref, bord_ref, out_ref,
             diffs_ref, absd_ref, need_ref):
        kernel(div_s, x1_s, qshr_s, tab_s, fence_s,
               coef_ref.at[0], bord_ref.at[0], out_ref.at[0],
               diffs_ref, absd_ref, need_ref)

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(coef_t.shape, jnp.int32),
        interpret=interpret,
    )(div, x1, qshr,
      jnp.asarray(tabf.reshape(-1)), fence.reshape(1), coef_t, bord_t)


def solve_rebalance(coef, borders, div, x1, qshr, flags, do_rebalance,
                    fence=None, interpret=False, fenced=None):
    """Drop-in replacement for planar solve_blocks_p (+rebalance).

    coef int32[64, B]; borders (top, bottom, left, right) int32[8, B];
    returns int32[64, B].

    ``fenced``: XOR-fence every fp32 op.  Defaults to off on compiled
    TPU (Mosaic emits plain IEEE mul/add — verified bit-exact against
    the reference) and on in interpreter mode (which lowers through
    XLA:CPU, where FMA contraction is real).

    On non-TPU backends the kernel automatically runs in interpreter
    mode, so JPEGQS_PALLAS=1 exercises the kernel path end-to-end in
    CPU tests and multi-chip dryruns.
    """
    if jax.default_backend() != "tpu":
        interpret = True
    if fenced is None:
        fenced = interpret or jax.default_backend() != "tpu"
    B = coef.shape[1]
    bp = _round_up(B, TILE_BLOCKS)
    g = bp // TILE_BLOCKS
    pad = bp - B
    coef_p = jnp.pad(coef, ((0, 0), (0, pad)))
    bord = jnp.concatenate(borders)                      # [32, B]
    bord_p = jnp.pad(bord, ((0, 0), (0, pad)))
    coef_t = coef_p.reshape(64, g, 8, 128).transpose(1, 0, 2, 3)
    bord_t = bord_p.reshape(32, g, 8, 128).transpose(1, 0, 2, 3)
    if fence is None:
        fence = jnp.zeros((), I32)
    out_t = _solve_tiled(coef_t, bord_t, div, x1, qshr, fence,
                         flags=flags, do_rebalance=do_rebalance,
                         interpret=interpret, fenced=fenced)
    out = out_t.transpose(1, 0, 2, 3).reshape(64, bp)
    return out[:, :B]
