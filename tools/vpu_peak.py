#!/usr/bin/env python
"""Empirical VPU fp32 throughput ceiling + solver-kernel work split.

Measures (a) the sustained fp32 vector op rate of a Pallas kernel with
many independent mul+add chains (the same op mix as the solver's
accumulation), (b) solver kernel variants isolating the refresh-IDCT
share.  Feeds the roofline analysis in BASELINE.md.
"""

import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
from jpegqs_tpu.utils import cache as _qs_cache
_qs_cache.setup(os.path.join(REPO, ".jax_cache"))
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = jnp.float32
K = 30


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args, n=K):
    _sync(fn(*args))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        _sync(o)
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    print(f"{name:46s} {best * 1e3:8.3f} ms")
    return best


def peak_kernel(n_chains, n_steps):
    """n_chains independent a = a*b+c chains, n_steps deep, on (8,128)
    vregs: 2 flops per step per chain per lane."""
    def kern(x_ref, o_ref):
        x = x_ref[...]
        accs = [x * F(1.0 + 0.001 * i) for i in range(n_chains)]
        bs = [x * F(0.9999) for _ in range(n_chains)]

        def body(s, accs):
            return tuple(a * F(0.99999) + b
                         for a, b in zip(accs, bs))
        accs = jax.lax.fori_loop(0, n_steps, body, tuple(accs))
        o_ref[...] = functools.reduce(lambda a, b: a + b, accs)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), F),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    return run


def main():
    print(f"backend={jax.default_backend()}")
    x = jnp.ones((8, 128), F)
    overhead = timeit("trivial dispatch", jax.jit(lambda x: x + 1), x)

    n_steps = 400000
    for n_chains in (1, 4, 16):
        f = peak_kernel(n_chains, n_steps)
        dt = timeit(f"fma chains x{n_chains:2d} ({n_steps} steps)", f, x)
        flops = 2 * n_chains * n_steps * 8 * 128
        net = max(dt - overhead, 1e-9)
        print(f"    -> {flops / net / 1e12:6.2f} Tflop/s "
              f"({flops / net / 1e9 / 128 / 8:6.2f} Gops/s/lane)")

    # solver kernel variants: diag vs no-diag isolates the per-term
    # sweep cost; rebalance on/off isolates the rebalance tail
    from jpegqs_tpu.ops import pallas_solver
    from jpegqs_tpu.ops.quant import make_quant_tables
    rng = np.random.default_rng(0)
    B = 32760
    bp = pallas_solver._round_up(B, pallas_solver.TILE_BLOCKS)
    g = bp // pallas_solver.TILE_BLOCKS
    qtbl = np.clip(rng.integers(4, 80, 64), 1, 255).astype(np.int32)
    div, x1, qshr = (jnp.asarray(a) for a in make_quant_tables(qtbl))
    coef_t = jnp.asarray(rng.integers(-2000, 2000, (g, 64, 8, 128)),
                         jnp.int32)
    bord_t = jnp.asarray(rng.integers(0, 256, (g, 32, 8, 128)), jnp.int32)
    fence = jnp.zeros((), jnp.int32)
    mp = B * 64 / 1e6

    for flags, reb, tag in ((1, True, "diag+reb"), (1, False, "diag"),
                            (0, True, "nodiag+reb")):
        dt = timeit(f"solve kernel {tag}", functools.partial(
            pallas_solver._solve_tiled, coef_t, bord_t, None, None,
            div, x1, qshr, fence, flags=flags, do_rebalance=reb,
            interpret=False, fenced=False))
        nt = pallas_solver._nt_for(flags)
        ntp = pallas_solver._round_up(nt, 8)
        net = max(dt - overhead, 1e-9)
        print(f"    -> net {net * 1e3:.3f} ms, {mp / net:.0f} MP/s, "
              f"sweep flops {63 * ntp * 9 * B / net / 1e12:.2f} Tflop/s")


if __name__ == "__main__":
    main()
