#!/usr/bin/env python
"""Phase timing of the LOW_QUALITY (q0-q2) kernel on TPU.

The q0 path has the framework's weakest ratio vs the reference (its
LOW_QUALITY mode is a single cheap pass, quantsmooth.h:924-1179).
This isolates where the kernel's device time goes.  All timing uses
IN-PROGRAM chaining (N kernel invocations inside one jitted program,
slope between two N values) — per-dispatch enqueue through the dev
tunnel costs ~1 ms and would otherwise swamp sub-ms kernels.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
import jax.numpy as jnp
import numpy as np
import functools

from jpegqs_tpu.ops import pallas_solver as ps
from jpegqs_tpu.ops import fp32
from jpegqs_tpu.ops.quant import make_quant_tables

HB, WB = 180, 182
B = HB * WB
LQ_DIAG = 8 | 1
N_LO, N_HI = 4, 24


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])


def slope(make_prog, label, mp=B * 64 / 1e6):
    """Per-invocation device time from the (N_HI - N_LO) slope."""
    ts = {}
    for n in (N_LO, N_HI):
        prog = make_prog(n)
        out = prog()
        _sync(out)
        best = None
        for _ in range(4):
            t0 = time.perf_counter()
            out = prog()
            _sync(out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        ts[n] = best
    per = (ts[N_HI] - ts[N_LO]) / (N_HI - N_LO)
    print(f"{label:44s} {per * 1e3:7.3f} ms  ({mp / per:7.0f} MP/s)")
    return per


def main():
    rng = np.random.default_rng(3)
    qtbl = np.clip((np.arange(64) * 3 + 16), 1, 255).astype(np.int32)
    cap = 2047 // qtbl
    coef = np.clip(rng.integers(-40, 41, (64, B)),
                   -cap[:, None], cap[:, None]).astype(np.int32)
    div, x1, qshr = make_quant_tables(qtbl)
    coef_t = ps.tile_blocks(jnp.asarray(coef))
    pix = rng.integers(0, 256, (64, B)).astype(np.int32)
    pix_t = ps.tile_blocks(jnp.asarray(pix))
    masks_t = ps.edge_masks(HB, WB)
    tabs = tuple(map(jnp.asarray, (div, x1, qshr)))

    def lq_prog(n, do_reb=True, want_pix=True):
        @jax.jit
        def prog(c, p):
            for _ in range(n):
                out = ps.solve_fused_pix(c, p, masks_t, None, *tabs,
                                         LQ_DIAG, do_reb, WB,
                                         want_pix=want_pix)
                if want_pix:
                    c, p = out
                else:
                    c = out
            return c
        return functools.partial(prog, coef_t, pix_t)

    full = slope(lambda n: lq_prog(n), "LQ kernel (shrink+clamp+reb+pix)")
    slope(lambda n: lq_prog(n, do_reb=False), "  without rebalance")
    slope(lambda n: lq_prog(n, want_pix=False), "  without output idct")

    # solver q3 kernel at the same size, for scale
    def q3_prog(n):
        @jax.jit
        def prog(c, p):
            for _ in range(n):
                c, p = ps.solve_rebalance_pix(c, p, masks_t, *tabs, 0,
                                              True, WB, want_pix=True)
            return c
        return functools.partial(prog, coef_t, pix_t)

    slope(q3_prog, "q3 sweep kernel (reference point)")

    # exact-divide at the shrink's shape, in-program chained
    g = coef_t.shape[0]
    af = jnp.asarray(rng.uniform(1, 100, (g, 8, 8, 8, 128)).astype(np.float32))
    bf = jnp.asarray(rng.uniform(1, 100, (g, 8, 8, 8, 128)).astype(np.float32))

    def div_prog(fn, a0, b0):
        def mk(n):
            @jax.jit
            def prog(a, b):
                for _ in range(n):
                    a = fn(a, b) + a0 * 0
                return a
            return functools.partial(prog, a0, b0)
        return mk

    slope(div_prog(lambda a, b: a / b, af, bf),
          "hw divide [g,8,8,8,128] (XLA)")
    slope(div_prog(fp32.exact_divide, af, bf),
          "exact_divide [g,8,8,8,128] (XLA)")


if __name__ == "__main__":
    main()
