"""exact_divide: IEEE round-to-nearest f32 division on any backend.

TPU's reciprocal-based f32 divider is up to 2 ulp off IEEE, which broke
bit-exactness at scale (a ~3e-5 near-tie rate only surfaces on
megapixel images).  The pinned cases below are real quotients the
uncorrected and the first-draft corrected algorithms got wrong.
"""

import numpy as np
import jax
import jax.numpy as jnp

from jpegqs_tpu.ops.fp32 import exact_divide


def _ieee(a, b):
    return (a.astype(np.float64) / b.astype(np.float64)).astype(np.float32)


def _in_window(a, b):
    """exact_divide's documented IEEE window (see its docstring);
    outside it the hardware quotient passes through unchanged."""
    with np.errstate(all="ignore"):
        q = np.abs(a.astype(np.float64) / b.astype(np.float64))
    return ((np.abs(a) > np.float32(1e-20)) & (np.abs(a) < np.float32(1e30))
            & (np.abs(b) > np.float32(1e-20)) & (np.abs(b) < np.float32(1e30))
            & (q > 1e-31))


def test_random_quotients():
    rng = np.random.default_rng(7)
    a = (rng.uniform(-1, 1, 200_000)
         * 10.0 ** rng.uniform(-15, 15, 200_000)).astype(np.float32)
    b = (rng.uniform(-1, 1, 200_000)
         * 10.0 ** rng.uniform(-15, 15, 200_000)).astype(np.float32)
    b[b == 0] = 1.0
    got = np.asarray(jax.jit(exact_divide)(jnp.asarray(a), jnp.asarray(b)))
    want = _ieee(a, b)
    m = _in_window(a, b)
    assert np.array_equal(got.view(np.int32)[m], want.view(np.int32)[m])
    assert m.sum() > 190_000  # the window covers essentially all samples


def test_near_tie_regressions():
    a = np.array([12669129.0, -8933591.0, -2216359.0, 144691.0,
                  8936028.0, 8853037.0], np.float32)
    b = np.array([-5610226.0, -11157518.0, -940819.0, -7658271.0,
                  2044155.0, -5718429.0], np.float32)
    got = np.asarray(jax.jit(exact_divide)(jnp.asarray(a), jnp.asarray(b)))
    want = _ieee(a, b)
    assert np.array_equal(got.view(np.int32), want.view(np.int32))


def test_constructed_near_ties():
    """Quotients landing within 1 ulp of a rounding midpoint across
    wide scales — the cases the decision logic exists for.  Exponent
    ranges are wide enough to stress the window's lower edge."""
    rng = np.random.default_rng(11)
    N = 500_000
    q = (rng.uniform(0.5, 2, N) * 2.0 ** rng.integers(-60, 60, N)
         ).astype(np.float32)
    q *= rng.choice([-1, 1], N).astype(np.float32)
    b = (rng.uniform(-1, 1, N) * 10.0 ** rng.uniform(-12, 12, N)
         ).astype(np.float32)
    b[b == 0] = 1.0
    n = np.nextafter(q, np.copysign(np.inf, q), dtype=np.float32)
    mid = (q.astype(np.float64) + n.astype(np.float64)) / 2
    for off in (0, 1, -1):
        a = (mid * b.astype(np.float64)).astype(np.float32)
        if off:
            a = np.nextafter(a, np.copysign(np.inf, a * off),
                             dtype=np.float32)
        ok = _in_window(a, b) & np.isfinite(a)
        got = np.asarray(jax.jit(exact_divide)(jnp.asarray(a),
                                               jnp.asarray(b)))
        want = _ieee(a, b)
        m = ((got.view(np.int32) != want.view(np.int32)) & ok
             & np.isfinite(want) & (want != 0))
        assert not m.any(), (off, a[m][:3], b[m][:3])


def test_split_mask_exact():
    """The mantissa-mask split must recombine exactly across the
    guarded magnitude window (the Dekker products rely on <=12-bit
    halves; below ~2^-103 (~1e-31) the low half goes subnormal and XLA's FTZ
    flushes it — those magnitudes sit outside exact_divide's `safe`
    window by the same token)."""
    from jpegqs_tpu.ops.fp32 import _split_mask
    rng = np.random.default_rng(5)
    x = np.concatenate([
        (rng.uniform(-1, 1, 100_000) * 10.0 ** rng.uniform(-30, 30,
                                                           100_000)),
        rng.integers(-(2 ** 24), 2 ** 24, 100_000).astype(np.float64),
    ]).astype(np.float32)
    xh, xl = (np.asarray(v) for v in _split_mask(jnp.asarray(x),
                                                 lambda y: y))
    assert np.array_equal(xh + xl, x)  # exact split (xh+xl is exact)
    # each half fits 12 significant bits: products of halves round-trip
    # f32 exactly (checked where the product itself is in normal range)
    prod = xh.astype(np.float64) * xh.astype(np.float64)
    in_range = (np.abs(prod) > 1.2e-38) & (np.abs(prod) < 1e38)
    with np.errstate(over="ignore"):   # out-of-range lanes are masked
        rt = prod.astype(np.float32).astype(np.float64)
    assert np.array_equal(rt[in_range], prod[in_range])


def test_special_values():
    a = np.array([0.0, -0.0, 1.0, -1.0, 0.0, np.inf, 5.0], np.float32)
    b = np.array([3.0, 3.0, 0.0, 0.0, 0.0, 2.0, np.nan], np.float32)
    with np.errstate(all="ignore"):
        want = a / b
    got = np.asarray(jax.jit(exact_divide)(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got.view(np.int32), want.view(np.int32),
                          equal_nan=False) or np.array_equal(
        np.isnan(got), np.isnan(want)) and np.array_equal(
        got[~np.isnan(got)].view(np.int32),
        want[~np.isnan(want)].view(np.int32))
