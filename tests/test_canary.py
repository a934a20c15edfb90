"""Float-semantics canaries: loud, fast failure if the toolchain's
fp32 behavior shifts under the engine.

The bit-exactness contract rests on Mosaic emitting plain IEEE mul/add
for the unfenced compiled-TPU kernel path (ops/pallas_solver.py
``fenced=False``, commit 11c72e0).  A Mosaic upgrade that starts
contracting mul+add into FMA, reassociating folds, or changing the
divide would today only surface through the full differential suite.
These tests detect each failure mode in seconds:

- FMA contraction: ``a*b + (-fl(a*b))`` must be exactly 0 under
  separate rounding; an FMA computes the exact product residual
  (nonzero for ~half of random inputs).
- Fold reassociation: a 242-term left fold must match numpy's float32
  left fold bit-for-bit.
- Division: ``fp32.fdiv`` must be correctly rounded (numpy reference),
  including ULP-boundary cases, despite TPU's 2-ulp hardware divide.

Run on real TPU with ``JPEGQS_TEST_PLATFORM=axon pytest
tests/test_canary.py``; on the CPU backend the compiled-kernel tests
skip (XLA:CPU contracts FMA by design — that's what the fences are
for) and the fenced/XLA variants run instead.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jpegqs_tpu.ops import fp32

F = jnp.float32
on_tpu = jax.default_backend() == "tpu"


def _rand(shape, seed, lo=1.0, hi=2.0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(lo, hi, shape)).astype(np.float32)


# ---------------------------------------------------------------------------
# Compiled-kernel canaries (the unfenced TPU path)
# ---------------------------------------------------------------------------

def _mosaic_muladd(a, b, c):
    def kern(a_ref, b_ref, c_ref, o_ref):
        o_ref[...] = a_ref[...] * b_ref[...] + c_ref[...]

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b, c)


@pytest.mark.skipif(not on_tpu, reason="pins compiled-Mosaic semantics")
def test_mosaic_no_fma_contraction():
    a = _rand((8, 128), 1)
    b = _rand((8, 128), 2)
    c = -(a * b)              # numpy: separately-rounded product
    out = np.asarray(jax.jit(_mosaic_muladd)(a, b, c))
    bad = np.count_nonzero(out)
    assert bad == 0, (
        f"{bad}/1024 lanes nonzero: Mosaic is contracting mul+add into "
        f"FMA — the unfenced kernel path (ops/pallas_solver.py fenced="
        f"False) is no longer bit-exact; flip the default or fix the "
        f"toolchain")


def _mosaic_fold(terms):
    n = terms.shape[0]

    def kern(t_ref, o_ref):
        acc = jnp.zeros(t_ref.shape[1:], jnp.float32)
        for j in range(n):
            acc = acc + t_ref[j]
        o_ref[...] = acc

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(terms.shape[1:], jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(terms)


@pytest.mark.skipif(not on_tpu, reason="pins compiled-Mosaic semantics")
def test_mosaic_fold_order():
    terms = _rand((242, 8, 128), 3, lo=-1e3, hi=1e3)
    want = np.zeros((8, 128), np.float32)
    for j in range(242):      # numpy float32 left fold, one rounding each
        want = want + terms[j]
    got = np.asarray(jax.jit(_mosaic_fold)(terms))
    assert np.array_equal(got, want), (
        f"{np.count_nonzero(got != want)} lanes differ: fp32 fold "
        f"reassociated in Mosaic")


# ---------------------------------------------------------------------------
# Division canary (any backend: fdiv must be correctly rounded)
# ---------------------------------------------------------------------------

def test_fdiv_correctly_rounded():
    rng = np.random.default_rng(7)
    a = rng.uniform(-1e6, 1e6, 4096).astype(np.float32)
    b = rng.uniform(0.1, 1e4, 4096).astype(np.float32)
    # adversarial near-tie pairs: quotients neighbouring representable
    # midpoints (denominator scaled so a/b lands close to a half-ulp)
    qs = rng.uniform(1, 2, 1024).astype(np.float32)
    bb = rng.uniform(64, 4096, 1024).astype(np.float32)
    a2 = (qs * bb).astype(np.float32) + (bb * np.float32(2 ** -25))
    a = np.concatenate([a, a2])
    b = np.concatenate([b, bb])
    want = (a / b).astype(np.float32)   # numpy: IEEE round-to-nearest

    @jax.jit
    def div(a, b):
        return fp32.fdiv(jnp.asarray(a), jnp.asarray(b))

    got = np.asarray(div(a, b))
    neq = got.view(np.int32) != want.view(np.int32)
    assert not neq.any(), (
        f"{neq.sum()} quotients off IEEE (first: {a[neq][:3]} / "
        f"{b[neq][:3]})")


# ---------------------------------------------------------------------------
# roundf half-away ties (any backend)
# ---------------------------------------------------------------------------

def test_roundf_half_away_ties():
    from jpegqs_tpu.ops.quant import roundf
    x = np.array([0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 16777215.0,
                  8388608.5, 0.49999997, -0.49999997], np.float32)
    want = np.array([1, -1, 2, -2, 3, -3, 16777215, 8388608, 0, 0],
                    np.float32)
    got = np.asarray(jax.jit(lambda v: roundf(v))(jnp.asarray(x)))
    assert np.array_equal(got, want), got


# ---------------------------------------------------------------------------
# Fenced-path canary (CPU backend: the bit fence must defeat XLA:CPU)
# ---------------------------------------------------------------------------

@pytest.mark.skipif(on_tpu, reason="exercises the XLA:CPU fence")
def test_fence_defeats_cpu_contraction():
    a = _rand((8, 128), 11)
    b = _rand((8, 128), 12)
    c = -(a * b)

    @jax.jit
    def fenced(a, b, c, tok):
        with fp32.fence_token(tok):
            return fp32.fadd(fp32.fmul(a, b), c)

    out = np.asarray(fenced(jnp.asarray(a), jnp.asarray(b),
                            jnp.asarray(c), jnp.int32(0)))
    assert np.count_nonzero(out) == 0, (
        "the fence no longer prevents FMA contraction on XLA:CPU")


@pytest.mark.skipif(on_tpu, reason="exercises the XLA:CPU fence")
def test_stacked_fence_defeats_cpu_contraction():
    """Accumulating from a zeros init stacks two fences on the first
    term (XLA folds 0+x away, leaving fence(fence(mul))).  With an XOR
    fence LLVM cancels the pair and FMA-contracts the exposed multiply
    into the next add — the round-5 fuzz find that produced 1-ulp
    LOW_QUALITY accumulator errors.  The integer-ADD fence has no
    cancelling identity; this pins it."""
    a = _rand((8, 128), 13)
    b = _rand((8, 128), 14)
    c = -(a * b)

    @jax.jit
    def fenced(a, b, c, tok):
        with fp32.fence_token(tok):
            acc = jnp.zeros(a.shape, jnp.float32)
            acc = fp32.fadd(acc, fp32.fmul(a, b))   # double-fenced term
            return fp32.fadd(acc, c)

    out = np.asarray(fenced(jnp.asarray(a), jnp.asarray(b),
                            jnp.asarray(c), jnp.int32(0)))
    assert np.count_nonzero(out) == 0, (
        "stacked fences cancelled: FMA contraction leaked through "
        "(the fence must be an integer ADD, not XOR)")
