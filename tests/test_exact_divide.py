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


def test_random_quotients():
    rng = np.random.default_rng(7)
    a = (rng.uniform(-1, 1, 200_000)
         * 10.0 ** rng.uniform(-15, 15, 200_000)).astype(np.float32)
    b = (rng.uniform(-1, 1, 200_000)
         * 10.0 ** rng.uniform(-15, 15, 200_000)).astype(np.float32)
    b[b == 0] = 1.0
    got = np.asarray(jax.jit(exact_divide)(jnp.asarray(a), jnp.asarray(b)))
    want = _ieee(a, b)
    assert np.array_equal(got.view(np.int32), want.view(np.int32))


def test_near_tie_regressions():
    a = np.array([12669129.0, -8933591.0, -2216359.0, 144691.0,
                  8936028.0, 8853037.0], np.float32)
    b = np.array([-5610226.0, -11157518.0, -940819.0, -7658271.0,
                  2044155.0, -5718429.0], np.float32)
    got = np.asarray(jax.jit(exact_divide)(jnp.asarray(a), jnp.asarray(b)))
    want = _ieee(a, b)
    assert np.array_equal(got.view(np.int32), want.view(np.int32))


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
