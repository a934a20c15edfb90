#!/usr/bin/env python
"""Phase timing of the q5/q6 color pipeline on TPU.

Isolates the color-op cost on top of the solver sweeps so the
Pallas-kernelization effort goes where the time is:
JOINT regression + fdct_clamp, halo gathers, downsample,
UPSAMPLE regression/broadcast, and the full-res output FDCTs.
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
from jpegqs_tpu.ops import planar
from jpegqs_tpu.ops.quant import make_quant_tables, roundf, c_f32_to_i32

H, W = 1440, 1456
K = 40
F = jnp.float32
I32 = jnp.int32


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
    print(f"{name:46s} {best * 1e3:8.3f} ms", flush=True)
    return best


def main():
    data = make_jpeg(H, W, "photo", seed=43, color=True, quality=75,
                     subsamp=1)
    img = jpegio.read_coefficients(data)
    fence = jnp.int32(0)
    print(f"color {W}x{H} backend={jax.default_backend()}", flush=True)

    overhead = timeit("trivial dispatch", jax.jit(lambda x: x + 1),
                      jnp.zeros((8, 128), F))

    full = {}
    for q in (3, 5, 6, 0):
        inputs, cfg, _ = engine.prepare_fused(img, QsOptions.from_quality(
            q, 3))
        full[q] = timeit(f"full q{q} program",
                         lambda inputs=inputs, cfg=cfg:
                         engine._image_smooth_impl(inputs, fence, cfg=cfg))
    print(f"  color-op overhead: q5-q3 {1e3 * (full[5] - full[3]):.2f} ms, "
          f"q6-q5 {1e3 * (full[6] - full[5]):.2f} ms", flush=True)

    # individual color ops at the real sizes
    yc = img.components[0]
    cc = img.components[1]
    hbl, wbl = yc.height_in_blocks, yc.width_in_blocks
    hbc, wbc = cc.height_in_blocks, cc.width_in_blocks
    Bl, Bc = hbl * wbl, hbc * wbc
    rng = np.random.default_rng(0)
    pix_l = jnp.asarray(rng.integers(0, 256, (8, 8, Bl)), I32)
    pix_c = jnp.asarray(rng.integers(0, 256, (8, 8, Bc)), I32)
    coef_c = jnp.asarray(rng.integers(-512, 512, (64, Bc)), I32)
    qraw = np.asarray(cc.quantval, np.int32)
    div, x1, qshr = (jnp.asarray(a) for a in make_quant_tables(qraw))

    halo_l = jax.jit(lambda p: planar.blocks_halo10(p, hbl, wbl))
    halo_c = jax.jit(lambda p: planar.blocks_halo10(p, hbc, wbc))
    timeit("blocks_halo10 (luma size)", halo_l, pix_l)
    timeit("blocks_halo10 (chroma size)", halo_c, pix_c)
    i2h = halo_c(pix_c)
    chh = halo_c(pix_c + 1)

    timeit("downsample_blocks 2x2", jax.jit(
        lambda p: planar.downsample_blocks(p, hbl, wbl, hbc, wbc, 2, 2)),
        pix_l)

    joint = jax.jit(lambda ch, ih: planar.joint_yuv_fblocks(ch, ih))
    timeit("joint regression (chroma)", joint, chh, i2h)

    fc = jax.jit(lambda fb, c: planar.fdct_clamp_p(fb, c, div, x1, qshr))
    fb = joint(chh, i2h)
    timeit("fdct_clamp (chroma)", fc, fb, coef_c)

    up = jax.jit(lambda ch, ih, lp: planar.upsample_chroma_blocks(
        ch, ih, lp, W, H, 2, 2, hbl, wbl, hbc, wbc))
    timeit("upsample regression+broadcast", up, chh, i2h, pix_l)

    upv = up(chh, i2h, pix_l)

    def fdct_full(u):
        fb = (u - 128).astype(F)
        return c_f32_to_i32(roundf(
            planar.fdct_float_p(fb).reshape(64, Bl)))
    timeit("full-res output FDCT+round (luma size)",
           jax.jit(fdct_full), upv)

    lq = jax.jit(lambda c, ch: planar.low_quality_fblocks(
        ch, planar.low_quality_range_p(c, div)))
    timeit("LOW_QUALITY range+shrink (chroma)", lq, coef_c, chh)

    print(f"(subtract ~{overhead * 1e3:.2f} ms dispatch overhead per row)",
          flush=True)


if __name__ == "__main__":
    main()
