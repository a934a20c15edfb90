#!/usr/bin/env python
"""Phase-level device timing of the q3 gray pipeline on real TPU.

Times each stage of the per-iteration loop separately (chained
dispatches, one readback sync — block_until_ready is unreliable
through the axon relay) so we know where the 2.1MP/7.5ms budget goes
before optimizing.  Usage: PYTHONPATH=/root/.axon_site python
tools/profile_kernel.py
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax
from jpegqs_tpu.utils import cache as _qs_cache
_qs_cache.setup(os.path.join(REPO, ".jax_cache"))
import jax.numpy as jnp
import numpy as np

from util import make_jpeg
from jpegqs_tpu.host import jpegio
from jpegqs_tpu import engine
from jpegqs_tpu.options import QsOptions
from jpegqs_tpu.ops import planar, pallas_solver
from jpegqs_tpu.ops.quant import make_quant_tables

H, W = 1440, 1456
K = 20


def _sync(out):
    # tiny on-device slice first — np.asarray of the full leaf would
    # drag megabytes through the ~50 MB/s relay and wreck the timing
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args, n=K, mp=None):
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
    extra = f"  {mp / best:8.1f} MP/s" if mp else ""
    print(f"{name:44s} {best * 1e3:8.3f} ms{extra}")
    return best


def main():
    data = make_jpeg(H, W, "photo", seed=42, quality=75)
    img = jpegio.read_coefficients(data)
    opts = QsOptions.from_quality(3, 3)
    inputs, cfg, _ = engine.prepare_fused(img, opts)
    fence = jnp.int32(0)
    mp = H * W / 1e6

    comp = img.components[0]
    hb, wb = comp.height_in_blocks, comp.width_in_blocks
    B = hb * wb
    coef16, qraw, div, x1, qshr = inputs[0]
    coef = jnp.asarray((np.asarray(coef16, np.int32)
                        * np.asarray(qraw)[None, :]).astype(np.int16)
                       .astype(np.int32)).T          # [64, B] planar
    flags = cfg.flags

    print(f"image {W}x{H}  B={B} blocks  backend={jax.default_backend()}")

    # per-dispatch overhead floor through the relay (subtract from rows)
    triv = jax.jit(lambda x: x + 1)
    timeit("trivial dispatch (overhead floor)", triv,
           jnp.zeros((8, 128), jnp.float32))

    timeit("full fused program (3 iters)", lambda: engine._image_smooth_impl(
        inputs, fence, cfg=cfg), mp=mp)

    idct = jax.jit(lambda c: planar.idct_islow_p(c.reshape(8, 8, B)))
    pix = idct(coef)
    timeit("idct_islow_p (XLA)", idct, coef, mp=mp)

    borders_f = jax.jit(
        lambda p: planar.borders_from_blocks(p, hb, wb))
    borders = borders_f(pix)
    timeit("borders_from_blocks (XLA)", borders_f, pix, mp=mp)

    solve = jax.jit(lambda c, b: pallas_solver.solve_rebalance(
        c, b, div, x1, qshr, flags, True, fence=fence))
    timeit("solve_rebalance (pallas + layout)", solve, coef, borders, mp=mp)

    # kernel only: pre-tiled input
    bp = pallas_solver._round_up(B, pallas_solver.TILE_BLOCKS)
    g = bp // pallas_solver.TILE_BLOCKS
    coef_t = jnp.pad(coef, ((0, 0), (0, bp - B))).reshape(
        64, g, 8, 128).transpose(1, 0, 2, 3)
    bord = jnp.concatenate(borders)
    bord_t = jnp.pad(bord, ((0, 0), (0, bp - B))).reshape(
        32, g, 8, 128).transpose(1, 0, 2, 3)
    ktime = timeit("solve kernel only (pre-tiled)",
                   lambda: pallas_solver._solve_tiled(
                       coef_t, bord_t, None, None, div, x1, qshr, fence,
                       flags=flags, do_rebalance=True, interpret=False,
                       fenced=False),
                   mp=mp)

    # kernel without rebalance
    timeit("solve kernel, no rebalance",
           lambda: pallas_solver._solve_tiled(
               coef_t, bord_t, None, None, div, x1, qshr, fence,
               flags=flags, do_rebalance=False, interpret=False,
               fenced=False), mp=mp)

    # VPU roofline estimate for the sweep
    nt = pallas_solver._nt_for(flags)
    ntp = pallas_solver._round_up(nt, 8)
    flops_per_block = 63 * ntp * 7
    print(f"\nsweep arithmetic: {flops_per_block} flop/block, "
          f"{flops_per_block * B / 1e9:.2f} GFLOP/sweep; kernel "
          f"{ktime * 1e3:.2f} ms -> "
          f"{flops_per_block * B / ktime / 1e12:.2f} Tflop/s achieved")


if __name__ == "__main__":
    main()
