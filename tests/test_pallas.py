"""Pallas solver kernel vs the NumPy spec (interpreter mode on CPU).

The compiled kernel is exercised against the reference binary by the
engine differential suite when run on TPU
(JPEGQS_TEST_PLATFORM=axon pytest tests/test_engine.py).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from jpegqs_tpu import specref
from jpegqs_tpu.options import (DIAGONALS, JOINT_YUV, LOW_QUALITY,
                                NO_REBALANCE)
from jpegqs_tpu.ops import planar
from jpegqs_tpu.ops.quant import make_quant_tables
from jpegqs_tpu.ops.pallas_solver import (solve_rebalance, solve_fused,
                                          TILE_BLOCKS)


def _case(flags, do_rebalance, B, seed):
    rng = np.random.default_rng(seed)
    qtbl = rng.integers(1, 120, 64).astype(np.uint16)
    qv = specref.make_quantval192(qtbl)
    div, x1, qshr = make_quant_tables(qtbl)
    tables = specref.make_solver_tables(flags)
    coef = np.clip(rng.integers(-40, 41, (B, 64))
                   * qtbl.astype(np.int32)[None, :], -32768, 32767
                   ).astype(np.int32)
    borders = rng.integers(0, 256, (B, 4, 8)).astype(np.int32)
    want = specref.solve_blocks(coef, borders, qv, flags, tables)
    if do_rebalance:
        want = specref.rebalance_blocks(want, qv)
    got = solve_rebalance(
        jnp.asarray(coef.T),
        tuple(jnp.asarray(borders[:, j].T) for j in range(4)),
        jnp.asarray(div), jnp.asarray(x1), jnp.asarray(qshr),
        flags, do_rebalance, interpret=True)
    got = np.asarray(got).T
    assert np.array_equal(got, want), (
        f"{(got != want).sum()} diffs, first {np.argwhere(got != want)[:3]}")


@pytest.mark.parametrize("flags,do_rebalance", [(0, True), (1, True),
                                                (1, False)])
def test_kernel_matches_spec(flags, do_rebalance):
    _case(flags, do_rebalance, 700, seed=3)


def test_kernel_tile_padding():
    """B not a multiple of the tile size exercises the pad path."""
    _case(0, True, TILE_BLOCKS + 17, seed=9)


def test_kernel_multi_tile():
    _case(1, True, 2 * TILE_BLOCKS + 5, seed=11)


def _fused_case(flags, joint, hb, wb, seed):
    """solve_fused (JOINT/LQ preamble in-kernel) vs the NumPy spec's
    quantsmooth_block_pass on one full block pass."""
    B = hb * wb
    rng = np.random.default_rng(seed)
    qtbl = rng.integers(1, 120, 64).astype(np.uint16)
    qv = specref.make_quantval192(qtbl)
    div, x1, qshr = (jnp.asarray(a) for a in make_quant_tables(qtbl))
    tables = specref.make_solver_tables(flags)
    coef = np.clip(rng.integers(-40, 41, (B, 64))
                   * qtbl.astype(np.int32)[None, :], -32768, 32767
                   ).astype(np.int32)
    coef_p = jnp.asarray(coef.T)
    pix = planar.idct_islow_p(coef_p.reshape(8, 8, B))
    halo = planar.blocks_halo10(pix, hb, wb)
    padded = np.asarray(planar.pix_to_plane(pix, hb, wb))
    if joint:
        ds = jnp.asarray(rng.integers(0, 256, (8, 8, B)), jnp.int32)
        i2halo = planar.blocks_halo10(ds, hb, wb)
        padded2 = np.asarray(planar.pix_to_plane(ds, hb, wb))
    else:
        i2halo, padded2 = None, None
    want = specref.quantsmooth_block_pass(coef, padded, padded2, qv,
                                          flags, tables, True)
    got = solve_fused(coef_p, halo, i2halo, div, x1, qshr, flags,
                      not (flags & NO_REBALANCE), interpret=True)
    got = np.asarray(got).T
    assert np.array_equal(got, want), (
        f"{(got != want).sum()} diffs, first {np.argwhere(got != want)[:3]}")


def test_fused_joint_sweep():
    _fused_case(JOINT_YUV | DIAGONALS, True, 6, 7, seed=5)


def test_fused_joint_low_quality():
    _fused_case(JOINT_YUV | LOW_QUALITY | DIAGONALS, True, 5, 9, seed=6)


def test_fused_low_quality():
    _fused_case(LOW_QUALITY | DIAGONALS, False, 7, 8, seed=7)


def test_fused_no_rebalance():
    _fused_case(LOW_QUALITY | DIAGONALS | NO_REBALANCE, False, 4, 6,
                seed=8)


def test_want_pix_matches_idct():
    """The kernel's pixel output equals the IDCT of its coefficient
    output (the engine relies on this to skip the XLA idct pass)."""
    rng = np.random.default_rng(13)
    B = 60
    qtbl = rng.integers(1, 120, 64).astype(np.uint16)
    div, x1, qshr = (jnp.asarray(a) for a in make_quant_tables(qtbl))
    coef = np.clip(rng.integers(-40, 41, (B, 64))
                   * qtbl.astype(np.int32)[None, :], -32768, 32767
                   ).astype(np.int32)
    borders = rng.integers(0, 256, (B, 4, 8)).astype(np.int32)
    out, pix = solve_rebalance(
        jnp.asarray(coef.T),
        tuple(jnp.asarray(borders[:, j].T) for j in range(4)),
        div, x1, qshr, 1, True, interpret=True, want_pix=True)
    want = planar.idct_islow_p(jnp.asarray(out).reshape(8, 8, B))
    assert np.array_equal(np.asarray(pix), np.asarray(want))
