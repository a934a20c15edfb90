"""Reassociation-proof fp32 primitives.

The bit-exactness contract requires every fp32 add/sub/mul to round
exactly like the C scalar build.  XLA:TPU preserves HLO float
semantics, but XLA:CPU's optimizer reassociates float expression trees
(observed: ``a + (b - c)`` recombined through ``(a - c) + b``; f64
fences get folded away by excess-precision convert elimination) —
flipping round-to-nearest ties.

On the CPU backend these helpers wrap every op in
``lax.optimization_barrier`` so the compiler must emit the literal
IEEE f32 instruction.  Slower (breaks fusion), but the CPU backend is
only used for differential testing.

On TPU (and any backend listed in _NATIVE_BACKENDS) the ops are plain
f32: fast, and order-preserving (the differential suite also runs on
real TPU hardware).  Override with JPEGQS_EXACT_F32=0/1.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

F = jnp.float32
D = jnp.float64

_NATIVE_BACKENDS = ("tpu",)


def exact_mode() -> bool:
    env = os.environ.get("JPEGQS_EXACT_F32")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() not in _NATIVE_BACKENDS


# The fence token: an int32 scalar that is 0 at runtime but arrives as
# a jit *argument*, so the compiler cannot prove it is zero.  ADDing it
# to a result's bits forces integer dataflow between producer and
# consumer: FMA contraction and float reassociation become impossible,
# while the runtime cost is two bitcasts and an integer add (fully
# fusible).  (lax.optimization_barrier does not work: XLA:CPU strips
# barriers before codegen and then contracts mul+add pairs into FMA.)
#
# The fence must be an integer ADD, not XOR.  XOR is self-inverse, and
# stacked fences on the same value DO arise: `fadd(zeros, fmul(...))`
# folds 0+x away in XLA, leaving fence(fence(mul)) — LLVM's instcombine
# then cancels xor(xor(x, t), t) -> x, the bitcast pair collapses, and
# the raw multiply feeds the next float add, which LLVM contracts into
# an FMA.  Found by randomized differential fuzzing (round 5): a q0
# LOW_QUALITY shrink accumulator came out 1 ulp off in ~4% of lanes on
# XLA:CPU, flipping a trunc on a near-tie.  add(add(x, t), t) has no
# such identity — any reassociation still leaves an integer op with a
# runtime operand between producer and consumer.
_TOKEN = None


class fence_token:
    """Context manager installing the traced runtime-zero token while a
    jitted engine function is being traced."""

    def __init__(self, tok):
        self.tok = tok

    def __enter__(self):
        global _TOKEN
        self.old = _TOKEN
        _TOKEN = self.tok
        return self

    def __exit__(self, *exc):
        global _TOKEN
        _TOKEN = self.old
        return False


def fence_value():
    """The installed runtime-zero token (or a literal zero outside any
    fenced trace) — for passing into kernels that fence internally."""
    if _TOKEN is None:
        return jnp.zeros((), jnp.int32)
    return _TOKEN


def _fence(x):
    if _TOKEN is None:
        # Eager execution: each op runs as its own XLA program, which
        # cannot contract across ops — already exact.
        return x
    bits = jax.lax.bitcast_convert_type(x, jnp.int32) + _TOKEN
    return jax.lax.bitcast_convert_type(bits, F)


def fadd(a, b):
    if exact_mode():
        return _fence(jnp.asarray(a, F) + jnp.asarray(b, F))
    return a + b


def fsub(a, b):
    if exact_mode():
        return _fence(jnp.asarray(a, F) - jnp.asarray(b, F))
    return a - b


def fmul(a, b):
    if exact_mode():
        return _fence(jnp.asarray(a, F) * jnp.asarray(b, F))
    return a * b


def fdiv(a, b):
    if exact_mode():
        return _fence(jnp.asarray(a, F) / jnp.asarray(b, F))
    if jax.default_backend() == "tpu":
        # TPU f32 division is reciprocal-based and up to 2 ulp off
        # IEEE round-to-nearest; the C scalar build's x86 divss is
        # correctly rounded, so fix it up.
        return exact_divide(jnp.asarray(a, F), jnp.asarray(b, F),
                            _fence if _TOKEN is not None else None)
    return a / b


# ---------------------------------------------------------------------------
# Correctly-rounded f32 division for backends with approximate dividers
# ---------------------------------------------------------------------------

def _split_mask(x, f):
    """Exact 12/12-bit split of a finite f32: clear the low 12 stored
    mantissa bits (xh keeps <= 12 significant bits, xl = x - xh the
    cleared <= 12 — both exact; cheaper than the Veltkamp multiply
    split and never overflows)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    xh = jax.lax.bitcast_convert_type(bits & jnp.int32(~0xFFF), F)
    return xh, f(x - xh)


def _two_product(x, y, f):
    """Dekker: exact x*y = p + e in f32 (requires unfused mul/add)."""
    xh, xl = _split_mask(x, f)
    yh, yl = _split_mask(y, f)
    p = f(x * y)
    # canonical Dekker order — each partial sum is exactly representable
    e = f(f(f(f(f(xh * yh) - p) + f(xh * yl)) + f(xl * yh)) + f(xl * yl))
    return p, e


def _two_sum(x, y, f):
    """Knuth TwoSum: x + y = s + err exactly."""
    s = f(x + y)
    bb = f(s - x)
    err = f(f(x - f(s - bb)) + f(y - bb))
    return s, err


def _residual_raw(a, b, q, f):
    """a - q*b as an exact (but unnormalized) float pair (s, -e):
    Dekker product + a Sterbenz-exact subtraction."""
    p, e = _two_product(q, b, f)
    s = f(a - p)           # exact: p within a factor 2 of a
    return s, f(-e)


def _exact_sign3(x0, x1, x2, f):
    """Exact sign of x0+x1+x2: d-1 = 2 VecSum distillation sweeps make
    the trailing slot the dominant component (same scheme the previous
    4-term variant used with 3 sweeps)."""
    for _ in range(2):
        x0, x1 = _two_sum(x0, x1, f)
        x1, x2 = _two_sum(x1, x2, f)
    lead = jnp.where(x2 != 0, x2, jnp.where(x1 != 0, x1, x0))
    return jnp.sign(lead)


def exact_divide(a, b, fence=None):
    """IEEE round-to-nearest-even f32 division built on an approximate
    (<= 2 ulp) hardware divide.

    One residual correction step brings q within half an ulp; the
    final rounding decision against the neighbouring float is made by
    the exact sign of r(q) + r(n) = 2*(a - midpoint*b), computed from
    exact residual pairs — this resolves arbitrarily near ties, with
    true ties broken to the even mantissa.  NaN/inf/0/extreme cases
    fall back to the hardware result (0/0 -> NaN, x/0 -> inf, exactly
    the C semantics the engine relies on).

    The guarded window (|a|, |b| in (1e-20, 1e30), |q| > 1e-31) is
    where every intermediate stays clear of the XLA/TPU
    flush-to-zero floor: the midpoint discriminant scales as
    |a|*2^-24 (> 6e-28 >> 2^-126), and the Dekker mask-split low
    halves of q and b scale as |q|*2^-23 / |b|*2^-23 — the q floor
    1e-31 > 2^-103 keeps ulp(q) ~ |q|*2^-23 > 2^-126 normal, so the
    residual of q*b never flushes (a 1e-34 floor admitted quotients
    whose split low half went subnormal on TPU).  The engine's
    divides (LQ shrink, JOINT slope, sweep delta, range) have
    operands provably >= ~1e-7 — their nonzero accumulators are sums
    whose grain is bounded below by the ulp of integral partial sums
    — so the window carries >10^13 of margin.  Outside it the
    hardware quotient is returned unchanged.
    """
    f = fence if fence is not None else (lambda x: x)
    q0 = a / b
    safe = (jnp.isfinite(q0) & (jnp.abs(q0) > F(1e-31))
            & (jnp.abs(a) < F(1e30)) & (jnp.abs(a) > F(1e-20))
            & (jnp.abs(b) < F(1e30)) & (jnp.abs(b) > F(1e-20)))
    a_s = jnp.where(safe, a, F(1))
    b_s = jnp.where(safe, b, F(1))
    q0_s = jnp.where(safe, q0, F(1))

    s0, e0 = _residual_raw(a_s, b_s, q0_s, f)
    q = f(q0_s + f(f(s0 + e0) / b_s))       # now within ~0.5 ulp

    s, e = _residual_raw(a_s, b_s, q, f)
    rr = f(s + e)                            # sign-accurate residual
    r_sign = jnp.sign(rr)
    # neighbour toward the true quotient: value-up iff r and b share
    # sign; a bit-increment is value-up only for positive floats
    value_up = (r_sign * jnp.sign(b_s)) > 0
    bit_step = jnp.where(value_up != (q < 0), 1, -1)
    bits = jax.lax.bitcast_convert_type(q, jnp.int32)
    n = jax.lax.bitcast_convert_type(bits + bit_step, F)
    # Decide via the midpoint: D = |r(q)| - |r(n)| has the sign of
    # r_sign * (r(q) + r(n)) = r_sign * (2s + 2e - (n-q)*b).  The step
    # (n-q) is a power of two (adjacent floats), so h = (n-q)*b is
    # exact — but it must be formed by integer EXPONENT arithmetic:
    # ulp(q) itself is subnormal for |q| < ~2^-103 and a float
    # subtraction n-q would flush to zero under XLA/TPU FTZ.  h is
    # always normal inside `safe` (q normal under FTZ, so
    # |h| > |a|*2^-24 > 1e-30*2^-24 > 2^-126), hence the exponent-add
    # below is exact.  No third Dekker residual and only a 3-term
    # exact sign needed.  If r(n) keeps r's sign, D > 0 falls out and
    # n is strictly closer (q and n sit on the same side of the true
    # quotient).
    m = jnp.minimum(jnp.abs(q), jnp.abs(n))
    e_field = jax.lax.shift_right_logical(
        jax.lax.bitcast_convert_type(m, jnp.int32), 23)
    ulp_e = jnp.maximum(e_field, 1) - 150   # ulp(q) = 2^(ulp_e)
    b_bits = jax.lax.bitcast_convert_type(jnp.abs(b_s), jnp.int32)
    h = jax.lax.bitcast_convert_type(
        b_bits + jax.lax.shift_left(ulp_e, 23), F)
    h_neg = value_up == (b_s > 0)           # sign of -(n-q)*b
    h = jnp.where(h_neg, -h, h)
    s3 = _exact_sign3(f(s + s), f(e + e), h, f)
    d_sign = r_sign * s3
    n_even = (jax.lax.bitcast_convert_type(n, jnp.int32) & 1) == 0
    take_n = (d_sign > 0) | ((d_sign == 0) & n_even)
    exact_now = s == f(-e)
    q = jnp.where(exact_now, q, jnp.where(take_n, n, q))

    return jnp.where(safe, q, q0)
