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
# a jit *argument*, so the compiler cannot prove it is zero.  XOR-ing a
# result's bits with it forces integer dataflow between producer and
# consumer: FMA contraction and float reassociation become impossible,
# while the runtime cost is two bitcasts and an xor (fully fusible).
# (lax.optimization_barrier does not work: XLA:CPU strips barriers
# before codegen and then contracts mul+add pairs into FMA.)
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
    bits = jax.lax.bitcast_convert_type(x, jnp.int32) ^ _TOKEN
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
    return a / b
